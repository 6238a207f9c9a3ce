"""Kernel-speed RSC max-log-MAP for turbo decoding (Pallas TPU).

Kernel twin of `ops.turbo.rsc_maxlogmap`, batched over code blocks —
the constituent decoder the iterative turbo exchange spends all its
time in.  The reference discipline being matched is the repo's own
`kernels/maxlogmap_pallas.py` (alpha-checkpoint BCJR for NS >= 64)
re-derived for the tiny recursive 8-state trellis, where throughput
comes from lane-batching blocks, not from intra-trellis width.

Design (no C analogue to copy — the reference codebase is feed-forward
Viterbi only, /root/reference/src/viterbiDecoder.c):

* Layout: path metrics live as one (NS, 128) int32 tile per block-tile
  — states on sublanes, 128 independent code blocks on lanes.  All
  trellis math is vreg-at-a-time VPU work.

* XOR-partner relabeling: in (state, feedback-bit w) coordinates the
  RSC trellis IS a shift-register butterfly (next = (s >> 1) |
  (w << (S-1))).  Keeping metrics in the rotating layout
  position -> state = ror_{t mod S}(position), each trellis step's two
  ACS sources sit at sublane p and p ^ (1 << (t mod S)) — a fixed
  sublane swap — and results land back in-place.  No gathers, no
  scatter: the whole forward/backward recursion is (swap, add, min)
  on (NS, 128) tiles with per-stage 0/1 constant masks carrying the
  (systematic u, parity z) edge labels.

* Backward pass replays each chunk from its alpha checkpoint (the
  sqrt-checkpoint trick), walks beta in reverse through the same swap
  network, and emits per-bit LLRs as (min over u=1 edges) - (min over
  u=0 edges); cross-sublane min reductions are deferred to one per
  8-step group.  Renormalization offsets are common to both u-groups,
  so emitted LLRs are bit-exact against `ops.turbo.rsc_maxlogmap`.

* Termination: the S tail steps (channel LLRs on the transmitted tail
  fields, no a-priori) are folded into the backward boundary OUTSIDE
  the kernel — a 3-step jnp recurrence computes beta_L from the
  state-0 anchor, pre-rotated into layout ror_{L mod S}.  The kernel
  itself sees a uniform per-step program over exactly the L message
  steps (padded to the chunk size with masked steps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.turbo import LA_CLAMP, RscSpec, _parity_bits, rsc_tables

#: Lanes (code blocks) per program (2 lane tiles — measured ~10% faster
#: than 128 on chip; 512 adds nothing).
TB_TILE = 256

#: Emit-group length: cross-sublane LLR reductions once per PACK steps.
PACK_T = 8

#: Exclusion constant.  Margin PROOF (with the exchange's LA_CLAMP):
#: per-step |bm| <= |l_sys + l_apriori| + |l_par| <= 2^17 + O(qmax)
#: < 2^18 =: mb.  The 2-regular trellis mixes fully in S = 3 steps, so
#: finite alpha/beta SPREADS are <= 2*S*mb = 6 mb unconditionally;
#: renorm (a shift, every PACK_T = 8 steps) re-zeros the min, which
#: then drifts by <= mb/step, so between renorms alpha ∈ [-7mb, 13mb]
#: and likewise beta.  Emit values v = alpha + bm + beta ∈
#: [-15mb, 27mb]; a masked (excluded) entry is >= BIG_T - 15mb, so
#: exclusion is exact iff 42 mb < BIG_T — satisfied at mb = 2^18 with
#: 1.5x margin (42 * 2^18 = 11.0M < 16.8M).  Boundary "impossible"
#: states carry ~BIG_T and at most ~2*BIG_T + 3mb after masking —
#: far inside int32.  tests/test_turbo_kernel.py pins the bound with a
#: clamp-magnitude bit-exactness case.
BIG_T = 1 << 24


def turbo_kernel_supported(rsc: RscSpec) -> bool:
    """The tile layout wants the whole trellis inside one sublane group."""
    return 2 <= rsc.num_states <= 8


def _chunk_len(S: int) -> int:
    """Steps per grid chunk: divisible by the stage cycle S and PACK_T."""
    base = S * PACK_T // np.gcd(S, PACK_T)
    tc = base
    while tc < 24:
        tc += base
    return int(tc)


def _stages_in_kernel(rsc: RscSpec):
    """Per-stage (NS, 1) int32 edge-label columns, derived INSIDE the
    kernel from a broadcasted iota (Pallas kernels cannot capture
    constant arrays; these are loop-invariant and CSE'd once).

    For stage k (= t mod S), position q in layout ror_k holds state
    s = ror_k(q); the step's feedback bit is w = bit_k(q); the ACS
    partner is q ^ (1 << k).  Labels: u = w ^ parity(s & fb),
    z = parity(((w << S) | s) & g_fw) — same trellis as `rsc_tables`
    (encoder-derived, the framework's viterbiInit rule).
    """
    S, NS = rsc.S, rsc.num_states
    fb = rsc.g_fb & (NS - 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (NS, 1), 0)

    parity_of = _parity_bits          # shared with the scan/encoder

    def ror(x, k):
        return ((x >> k) | (x << (S - k))) & (NS - 1) if k % S else x

    def u_of(s, w):
        return w ^ parity_of(s, fb)

    def z_of(s, w):
        return parity_of((w << S) | s, rsc.g_fw)

    stages = []
    for k in range(S):
        X = 1 << k
        w = (q >> k) & 1
        s_s, s_o = ror(q, k), ror(q ^ X, k)
        rows = {"us": u_of(s_s, w), "zs": z_of(s_s, w),
                "uo": u_of(s_o, w), "zo": z_of(s_o, w),
                "ub": u_of(s_s, 1 - w), "zb": z_of(s_s, 1 - w)}
        # emit-group exclusion masks: +BIG where the branch's u != group
        rows["m1s"] = (1 - rows["us"]) * BIG_T
        rows["m0s"] = rows["us"] * BIG_T
        rows["m1b"] = (1 - rows["ub"]) * BIG_T
        rows["m0b"] = rows["ub"] * BIG_T
        stages.append(rows)
    return stages


def _swap(a, k: int, NS: int):
    """Exchange sublane p with p ^ (1 << k) via static slices."""
    X = 1 << k
    parts = []
    for base in range(0, NS, 2 * X):
        parts.append(a[base + X:base + 2 * X])
        parts.append(a[base:base + X])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _fwd_chunk(rsc: RscSpec, stages, lu, lp, alpha, collect: bool):
    """Forward ACS over one chunk.  Returns (alpha_out, alphas, selfs,
    bms): per-step pre-step metrics, self-candidates (alpha + bm_self),
    and self branch metrics — only populated when `collect`."""
    S, NS = rsc.S, rsc.num_states
    Tc = lu.shape[0]
    alphas, selfs, bms = [], [], []
    for t in range(Tc):
        st = stages[t % S]
        lu_r, lp_r = lu[t:t + 1, :], lp[t:t + 1, :]
        bm_s = st["us"] * lu_r + st["zs"] * lp_r
        bm_o = st["uo"] * lu_r + st["zo"] * lp_r
        cs = alpha + bm_s
        co = _swap(alpha, t % S, NS) + bm_o
        if collect:
            alphas.append(alpha)
            selfs.append(cs)
            bms.append(bm_s)
        alpha = jnp.minimum(cs, co)
        if t % PACK_T == PACK_T - 1:
            alpha = alpha - jnp.min(alpha, axis=0, keepdims=True)
    return alpha, alphas, selfs, bms


def _turbo_fwd_kernel(rsc: RscSpec):
    NS = rsc.num_states

    def kernel(lu_ref, lp_ref, ckpt_ref, m_ref):
        stages = _stages_in_kernel(rsc)
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, TB_TILE), 0)
            m_ref[:] = jnp.where(s_idx == 0, 0, BIG_T).astype(jnp.int32)

        ckpt_ref[0] = m_ref[:]
        m, _, _, _ = _fwd_chunk(rsc, stages, lu_ref[:].astype(jnp.int32),
                                lp_ref[:].astype(jnp.int32), m_ref[:],
                                collect=False)
        m_ref[:] = m

    return kernel


def _turbo_bwd_kernel(rsc: RscSpec, nt: int, Tc: int, L: int):
    S, NS = rsc.S, rsc.num_states

    def kernel(lu_ref, lp_ref, ckpt_ref, binit_ref, llr_ref, b_ref):
        stages = _stages_in_kernel(rsc)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            b_ref[:] = binit_ref[:]

        base = (nt - 1 - i) * Tc
        lu = lu_ref[:].astype(jnp.int32)
        lp = lp_ref[:].astype(jnp.int32)
        _, alphas, selfs, bms = _fwd_chunk(rsc, stages, lu, lp,
                                           ckpt_ref[0], collect=True)
        beta = b_ref[:]
        p1, p0 = {}, {}
        for t in range(Tc - 1, -1, -1):
            st = stages[t % S]
            valid = base + t < L
            bm_b = st["ub"] * lu[t:t + 1, :] + st["zb"] * lp[t:t + 1, :]
            sbeta = _swap(beta, t % S, NS)
            nb0 = bms[t] + beta
            nb1 = bm_b + sbeta
            # emit partials for step t: alpha_t + bm + beta_{t+1}
            v0 = selfs[t] + beta
            v1 = alphas[t] + nb1
            p1[t] = jnp.minimum(v0 + st["m1s"], v1 + st["m1b"])
            p0[t] = jnp.minimum(v0 + st["m0s"], v1 + st["m0b"])
            # backward merge (frozen on padded steps past L)
            nbeta = jnp.minimum(nb0, nb1)
            beta = jnp.where(valid, nbeta, beta)
            if t % PACK_T == 0:
                beta = beta - jnp.min(beta, axis=0, keepdims=True)
                g1 = jnp.stack([p1[t + j] for j in range(PACK_T)], axis=0)
                g0 = jnp.stack([p0[t + j] for j in range(PACK_T)], axis=0)
                lam = jnp.min(g1, axis=1) - jnp.min(g0, axis=1)
                llr_ref[t:t + PACK_T, :] = lam
        b_ref[:] = beta

    return kernel


def _beta_tail(rsc: RscSpec, l_sys_tail, l_par_tail, L: int):
    """beta at step L (natural order -> kernel layout ror_{L mod S}).

    Walks the S termination steps backward from the state-0 anchor with
    channel-only branch metrics, exactly `rsc_maxlogmap`'s tail scan.
    """
    S, NS = rsc.S, rsc.num_states
    nxt, par, _, _ = rsc_tables(rsc)
    nxt_j = jnp.asarray(nxt)                     # [2, NS]
    par_j = jnp.asarray(par)
    lt = jnp.asarray(l_sys_tail, jnp.int32)      # [B, S]
    pt = jnp.asarray(l_par_tail, jnp.int32)
    B = lt.shape[0]
    b = jnp.full((B, NS), BIG_T, jnp.int32).at[:, 0].set(0)
    for t in range(S - 1, -1, -1):
        # bm[u, s] = u * l_sys_tail[t] + par[u, s] * l_par_tail[t]
        u = jnp.arange(2, dtype=jnp.int32)[None, :, None]
        bm = u * lt[:, t, None, None] + par_j[None] * pt[:, t, None, None]
        cand = bm + b[:, nxt_j.reshape(-1)].reshape(B, 2, NS)
        b = jnp.min(cand, axis=1)
    k = L % S
    if k:
        rot = np.array([((q >> k) | (q << (S - k))) & (NS - 1)
                        for q in range(NS)])
        b = b[:, rot]
    return b


@functools.partial(jax.jit, static_argnums=(0, 6))
def rsc_maxlogmap_batch_kernel(rsc: RscSpec, l_sys, l_par, l_apriori,
                               l_sys_tail, l_par_tail,
                               interpret: bool = False):
    """Batched a-posteriori LLRs of RSC blocks via the Pallas kernels.

    Args: [B, L] int32 LLR arrays (positive favors 0) and [B, S] tail
    fields.  Returns int32 [B, L], bit-exact against
    `jax.vmap(ops.turbo.rsc_maxlogmap)`.
    """
    if not turbo_kernel_supported(rsc):
        raise ValueError("turbo kernels support NS <= 8 (one sublane "
                         "group); use ops.turbo.rsc_maxlogmap")
    NS = rsc.num_states
    Tc = _chunk_len(rsc.S)
    lu = jnp.asarray(l_sys, jnp.int32) + jnp.asarray(l_apriori, jnp.int32)
    lp = jnp.asarray(l_par, jnp.int32)
    B, L = lu.shape
    Bp = -(-B // TB_TILE) * TB_TILE
    Tp = -(-L // Tc) * Tc
    lu_t = jnp.pad(lu, ((0, Bp - B), (0, Tp - L))).T      # (Tp, Bp)
    lp_t = jnp.pad(lp, ((0, Bp - B), (0, Tp - L))).T
    nb, nt = Bp // TB_TILE, Tp // Tc
    ckpts = pl.pallas_call(
        _turbo_fwd_kernel(rsc),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((Tc, TB_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Tc, TB_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NS, TB_TILE), lambda b, t: (t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, NS, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, TB_TILE), jnp.int32)],
        interpret=interpret,
    )(lu_t, lp_t)

    binit = jnp.pad(_beta_tail(rsc, l_sys_tail, l_par_tail, L),
                    ((0, Bp - B), (0, 0))).T              # (NS, Bp)

    llrs = pl.pallas_call(
        _turbo_bwd_kernel(rsc, nt, Tc, L),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((Tc, TB_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Tc, TB_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, NS, TB_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NS, TB_TILE), lambda b, t: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Tc, TB_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, TB_TILE), jnp.int32)],
        interpret=interpret,
    )(lu_t, lp_t, ckpts, binit)
    return llrs[:L, :B].T


def _perm_arrays(perm: tuple):
    """Interleaver and its inverse as device arrays."""
    pi_np = np.asarray(perm, np.int32)
    inv_np = np.empty_like(pi_np)
    inv_np[pi_np] = np.arange(pi_np.size, dtype=np.int32)
    return jnp.asarray(pi_np), jnp.asarray(inv_np)


def _make_one_iter(rsc, l_sys, l_par1, l_par2, l_sys_tail1, l_par_tail1,
                   l_sys_tail2, l_par_tail2, pi, inv, interpret):
    """One full turbo iteration (DEC1 -> interleave -> DEC2 ->
    de-interleave) through the kernel MAPs, shared by the fixed-
    schedule and early-termination decoders so the exchange schedule
    and 3/4 extrinsic scaling can never drift between them.

    Returns `one_iter(la1) -> (la1_next, lapp)` with `lapp` the
    de-interleaved DEC2 a-posteriori LLRs.
    """
    l_sys_i = jnp.take(l_sys, pi, axis=1)

    def one_iter(la1):
        lapp1 = rsc_maxlogmap_batch_kernel(
            rsc, l_sys, l_par1, la1, l_sys_tail1, l_par_tail1, interpret)
        le1 = lapp1 - l_sys - la1
        # +/- LA_CLAMP on the exchanged a-priori (same in the scan and
        # the C++ oracle) guarantees the BIG_T exclusion margin below.
        la2 = jnp.clip((3 * jnp.take(le1, pi, axis=1)) // 4,
                       -LA_CLAMP, LA_CLAMP)
        lapp2 = rsc_maxlogmap_batch_kernel(
            rsc, l_sys_i, l_par2, la2, l_sys_tail2, l_par_tail2,
            interpret)
        le2 = lapp2 - l_sys_i - la2
        la1n = jnp.clip(jnp.take((3 * le2) // 4, inv, axis=1),
                        -LA_CLAMP, LA_CLAMP)
        return la1n, jnp.take(lapp2, inv, axis=1)

    return one_iter


@functools.partial(jax.jit, static_argnums=(0, 8, 9, 10))
def turbo_decode_batch_kernel(rsc: RscSpec, l_sys, l_par1, l_par2,
                              l_sys_tail1, l_par_tail1,
                              l_sys_tail2, l_par_tail2,
                              perm: tuple, n_iters: int = 6,
                              interpret: bool = False):
    """Kernel-speed batched turbo decode, bit-exact vs
    `ops.turbo.turbo_decode_batch` (same exchange schedule, same 3/4
    extrinsic scaling, constituent MAPs through the Pallas kernels).

    Args: [B, L] channel LLR arrays, [B, S] tail fields, `perm` the
    interleaver as a static tuple.  Returns (uint8 [B, L] bits,
    int32 [B, L] a-posteriori LLRs).
    """
    pi, inv = _perm_arrays(perm)
    l_sys = jnp.asarray(l_sys, jnp.int32)
    B, L = l_sys.shape
    one_iter = _make_one_iter(rsc, l_sys, l_par1, l_par2,
                              l_sys_tail1, l_par_tail1,
                              l_sys_tail2, l_par_tail2, pi, inv, interpret)
    la1 = jnp.zeros((B, L), jnp.int32)
    lapp = jnp.zeros((B, L), jnp.int32)
    for _ in range(n_iters):
        la1, lapp = one_iter(la1)
    return (lapp < 0).astype(jnp.uint8), lapp


@functools.partial(jax.jit, static_argnums=(0, 8, 9, 10, 11))
def turbo_decode_batch_kernel_early(rsc: RscSpec, l_sys, l_par1, l_par2,
                                    l_sys_tail1, l_par_tail1,
                                    l_sys_tail2, l_par_tail2,
                                    perm: tuple, crc=None,
                                    max_iters: int = 8,
                                    interpret: bool = False):
    """Kernel turbo decode with CRC-gated early termination.

    Production serving mode: after every full iteration the whole
    batch's CRCs are checked (one MXU bit-matmul, `ops.crc`); blocks
    latch their first CRC-passing decisions, and the `lax.while_loop`
    exits as soon as EVERY block has passed (or at `max_iters`).
    Batch-level exit is the TPU-idiomatic compromise — per-block exit
    saves nothing on SIMD lanes without batch compaction; at operating
    SNR a whole batch typically converges in 2-3 iterations for a
    2-3x average-throughput win over a fixed schedule.

    `crc` is a `CrcSpec` whose parity the encoded payload carries
    (e.g. `CRC24B` per 36.212 code block).  Returns
    (bits [B, L], lapp [B, L], ok [B] bool, iters_used int32).
    Latching means a block that ever passes is never degraded by
    later iterations (unlike the fixed-schedule decoder).
    """
    from ..ops.crc import crc_check
    if crc is None:
        raise ValueError("early termination needs a CrcSpec (pass "
                         "crc=CRC24B or use turbo_decode_batch_kernel)")
    pi, inv = _perm_arrays(perm)
    l_sys = jnp.asarray(l_sys, jnp.int32)
    B, L = l_sys.shape
    one_iter = _make_one_iter(rsc, l_sys, l_par1, l_par2,
                              l_sys_tail1, l_par_tail1,
                              l_sys_tail2, l_par_tail2, pi, inv, interpret)

    def cond(carry):
        it, _, _, ok, _, _ = carry
        return (it < max_iters) & ~jnp.all(ok)

    def body(carry):
        it, la1, _, ok, best_bits, best_lapp = carry
        la1n, lapp = one_iter(la1)
        bits = (lapp < 0).astype(jnp.uint8)
        okb = crc_check(crc, bits)
        newly = okb & ~ok
        best_bits = jnp.where(newly[:, None], bits, best_bits)
        best_lapp = jnp.where(newly[:, None], lapp, best_lapp)
        return (it + 1, la1n, lapp, ok | okb, best_bits, best_lapp)

    init = (jnp.int32(0), jnp.zeros((B, L), jnp.int32),
            jnp.zeros((B, L), jnp.int32), jnp.zeros((B,), bool),
            jnp.zeros((B, L), jnp.uint8), jnp.zeros((B, L), jnp.int32))
    it, _, lapp, ok, best_bits, best_lapp = jax.lax.while_loop(
        cond, body, init)
    bits = jnp.where(ok[:, None], best_bits,
                     (lapp < 0).astype(jnp.uint8))
    lapp = jnp.where(ok[:, None], best_lapp, lapp)
    return bits, lapp, ok, it
