"""Max-log-MAP (min-sum BCJR) soft-output Pallas kernels.

Kernel-speed twin of ops/maxlogmap.py (see its header for the math),
batched over channels, for k=1 poly-symmetric codes with NS >= 64 —
the turbo-equalization-ready path the reference lacks (its decoder is
hard-output only, viterbiDecoder.c:52-234).

Structure (two kernels, both riding acs_pallas' fused 3-stage layouts):

1. Forward (`_map_fwd_kernel`): plain butterfly min-sum ACS — no
   decision bits — storing the natural-order path-metric vector at
   every CHUNK_M-step boundary ("alpha checkpoints", the classic
   O(T/C) sqrt-checkpoint trick for forward-backward on long
   sequences).

2. Backward (`_map_bwd_kernel`): walks chunks in reverse.  Per chunk it
   *replays* the forward pass from the checkpoint, keeping each step's
   post-step metrics (alpha_{t+1}) and edge metrics as SSA values in
   their natural stage layouts (block lists — nothing materializes),
   then runs the backward recurrence

       beta_t(src) = min(em + beta_{t+1}(even dst),
                         emc + beta_{t+1}(odd dst))

   through the SAME stage pairings in reverse (the traceback kernel's
   select network with min-sums in place of one-hot merges), emitting

       L_t = min over ODD-state blocks of (alpha_{t+1} + beta_{t+1})
           - min over EVEN-state blocks

   per step — in every stage layout the odd/even destination states are
   whole contiguous row blocks, so the per-bit LLR needs no state
   indexing at all.  Cross-sublane min reductions are deferred to one
   per 8-step group (the emit trick of the streaming kernel).

Termination is encoded as per-step input penalties instead of a
final-state anchor: forcing u = 0 over the last S (and padded) steps is
*exactly* equivalent to anchoring beta at state 0 (the final state IS
the last S inputs for a shift-register code), and a traced SMEM penalty
row handles arbitrary T without re-specializing the kernel.

Renormalization offsets cancel in the odd-even difference, so the
emitted LLRs are bit-exact against ops/maxlogmap.maxlogmap_llrs on
every message bit (termination-step LLRs differ only in the saturated
exclusion constant).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import CodeSpec
from .acs_pallas import B_TILE, CDT, PACK, _em_weight_matrix_soft

#: Steps per MAP chunk: divisible by 3 (stage cycle) and by PACK.  Kept
#: at 24 (not CHUNK_F=48) because the backward body contains BOTH a
#: replay and a combine pass — ~2x the ops of the forward body — and
#: Mosaic compile time through the remote tunnel scales with unrolled
#: program size.
CHUNK_M = 24

#: Exclusion value for forced-off hypotheses.  Any value above the worst
#: total path cost (T * n * 127 < 2^20 for T <= 2048) yields identical
#: finite LLRs; int32 headroom bounds the top.
BIG_K = 1 << 20


def maxlogmap_supported(spec: CodeSpec) -> bool:
    return spec.k == 1 and spec.num_states >= 64 and spec.has_poly_symmetry


def _soft_em_group(spec, w_vals, c1, c0, g):
    """(3*HALF+1, PACK*B) int32 edge metrics for 8-step group g from the
    relu cost planes — one int8 MXU matmul (the fused kernels' trick)."""
    n = spec.n
    rows = [c1[bit, g * PACK:(g + 1) * PACK].reshape(1, PACK * B_TILE)
            for bit in range(n)]
    rows += [c0[bit, g * PACK:(g + 1) * PACK].reshape(1, PACK * B_TILE)
             for bit in range(n)]
    Rg = jnp.concatenate(rows, axis=0).astype(jnp.int8)
    return jax.lax.dot_general(w_vals, Rg, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _replay_chunk(spec, w_vals, c1, c0, m):
    """Forward min-sum ACS over one CHUNK_M chunk (no decisions).

    Returns (m_out natural, alphas, ems, qrows): alphas[t] is step t's
    OUTPUT metrics as its stage-layout block list (sA: [ev, od]; sB:
    [c0..c3] (state 4r+c); sC: 8 blocks (state 8q+j)); ems[t] the
    (HALF, B) stage edge metrics; qrows[t] the (1, B) per-step Q row.
    """
    NS = spec.num_states
    HALF, Q4, Q8 = NS // 2, NS // 4, NS // 8

    def acs2(first, second, em, emc):
        a0 = first + em
        a1 = second + emc
        b0 = first + emc
        b1 = second + em
        return jnp.minimum(a0, a1), jnp.minimum(b0, b1)

    alphas, ems, qrows = [], [], []
    mA = mB = None
    for g in range(CHUNK_M // PACK):
        EM = _soft_em_group(spec, w_vals, c1, c0, g)
        for j in range(PACK):
            t_row = g * PACK + j
            stage = t_row % 3
            em = EM[stage * HALF:(stage + 1) * HALF,
                    j * B_TILE:(j + 1) * B_TILE]
            q_row = EM[3 * HALF:3 * HALF + 1,
                       j * B_TILE:(j + 1) * B_TILE]
            emc = q_row - em
            ems.append(em)
            qrows.append(q_row)
            if stage == 0:
                ev, od = acs2(m[:HALF], m[HALF:], em, emc)
                mA = (ev, od)
                alphas.append([ev, od])
            elif stage == 1:
                ev, od = mA
                e1, o1 = acs2(ev[:Q4], ev[Q4:], em[:Q4], emc[:Q4])
                e2, o2 = acs2(od[:Q4], od[Q4:], em[Q4:], emc[Q4:])
                mB = (e1, o1, e2, o2)
                alphas.append([e1, o1, e2, o2])
            else:
                outs = []
                for c in range(4):
                    blk = mB[c]
                    e, o = acs2(blk[:Q8], blk[Q8:],
                                em[c * Q8:(c + 1) * Q8],
                                emc[c * Q8:(c + 1) * Q8])
                    outs += [e, o]
                alphas.append(outs)
                m = jnp.stack(outs, axis=0).transpose(1, 0, 2) \
                       .reshape(NS, B_TILE)
        if (g * PACK + PACK - 1) % 3 == 2:
            mn = jnp.min(m, axis=0, keepdims=True)
            m = m - mn
    return m, alphas, ems, qrows


def _map_fwd_kernel(spec: CodeSpec):
    NS = spec.num_states

    def kernel(w_ref, cost_ref, ckpt_ref, m_ref):
        # ckpt_ref: (1, NS, B) — alpha at this chunk's START.
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, BIG_K).astype(CDT)

        ckpt_ref[0] = m_ref[:]
        q32 = cost_ref[:].astype(jnp.int32)
        c1 = jnp.maximum(q32, 0)
        c0 = jnp.maximum(-q32, 0)
        m, _, _, _ = _replay_chunk(spec, w_ref[:], c1, c0, m_ref[:])
        m_ref[:] = m

    return kernel


def _map_bwd_kernel(spec: CodeSpec, nt: int, pen_start: int):
    NS = spec.num_states
    HALF, Q4, Q8 = NS // 2, NS // 4, NS // 8
    #: odd-destination block indices per stage layout (8-block lists):
    #: sA (stage 0): bottom half; sB (stage 1): c in {1, 3}; sC (stage
    #: 2): j odd — the traceback kernel's odd-state picks.
    ODD = {0: (4, 5, 6, 7), 1: (2, 3, 6, 7), 2: (1, 3, 5, 7)}

    def kernel(w_ref, cost_ref, ckpt_ref, llr_ref, b_ref):
        # u=1 penalties (BIG_K on termination/padded steps, 0 elsewhere)
        #   are computed inline from the global step index vs the static
        #   pen_start — an SMEM (Tp, 1) row padded each entry to 512 B
        #   and blew the 1 MB SMEM budget at T >= ~2000.
        # llr_ref: (CHUNK_M, B) int32 — L_t rows for this chunk.
        # b_ref:   (NS, B) int32 scratch — beta at chunk boundary,
        #   natural order, carried across grid steps (reverse time).
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            # Uniform final beta: termination lives in the penalties.
            b_ref[:] = jnp.zeros((NS, B_TILE), CDT)

        tg_base = (nt - 1 - i) * CHUNK_M
        q32 = cost_ref[:].astype(jnp.int32)
        c1 = jnp.maximum(q32, 0)
        c0 = jnp.maximum(-q32, 0)
        _, alphas, ems, qrows = _replay_chunk(spec, w_ref[:], c1, c0,
                                              ckpt_ref[0])

        def nat_to_sc(bn):
            """(NS, B) natural -> 8 sC blocks (state 8q+j at block j
            row q) — the fused kernels' per-3-step transpose."""
            hsc = bn.reshape(Q8, 8, B_TILE).transpose(1, 0, 2)
            return [hsc[j] for j in range(8)]

        beta = nat_to_sc(b_ref[:])        # beta_{chunk end}, sC layout
        p_odd, p_even = {}, {}
        for t in range(CHUNK_M - 1, -1, -1):
            stage = t % 3
            em = ems[t]
            emc = qrows[t] - em
            pen = jnp.where(tg_base + t >= pen_start,
                            jnp.int32(BIG_K), jnp.int32(0))
            beta = [b_ + pen if bi in ODD[stage] else b_
                    for bi, b_ in enumerate(beta)]
            # Emit partials: alpha_{t+1} + beta_{t+1}, blockwise mins.
            al = alphas[t]
            if stage == 0:          # al = [ev(HALF), od(HALF)]
                ab = [al[0][:Q8], al[0][Q8:2 * Q8], al[0][2 * Q8:3 * Q8],
                      al[0][3 * Q8:], al[1][:Q8], al[1][Q8:2 * Q8],
                      al[1][2 * Q8:3 * Q8], al[1][3 * Q8:]]
            elif stage == 1:        # al = [c0..c3] (Q4 each)
                ab = []
                for c in range(4):
                    ab += [al[c][:Q8], al[c][Q8:]]
            else:                   # al = 8 sC blocks
                ab = al
            tots = [a_ + b_ for a_, b_ in zip(ab, beta)]
            po = tots[ODD[stage][0]]
            pe = tots[0]
            for bi in ODD[stage][1:]:
                po = jnp.minimum(po, tots[bi])
            for bi in range(1, 8):
                if bi not in ODD[stage]:
                    pe = jnp.minimum(pe, tots[bi])
            p_odd[t], p_even[t] = po, pe
            # Backward merge: beta_{t+1} (dst layout) -> beta_t (src).
            if stage == 2:
                # sC pairs (2c, 2c+1) -> sB block c halves (lo, hi).
                nb = []
                for c in range(4):
                    em_c = em[c * Q8:(c + 1) * Q8]
                    emc_c = emc[c * Q8:(c + 1) * Q8]
                    h_e, h_o = beta[2 * c], beta[2 * c + 1]
                    nb += [jnp.minimum(em_c + h_e, emc_c + h_o),
                           jnp.minimum(emc_c + h_e, em_c + h_o)]
                beta = nb                       # sB8 layout
            elif stage == 1:
                # sB c-pairs (c0,c1)->ev, (c2,c3)->od; em rows [:Q4]
                # for the ev merge, [Q4:] for od, sub-blocked at Q8.
                nb = []
                for half_i in range(2):
                    emh = em[half_i * Q4:(half_i + 1) * Q4]
                    emch = emc[half_i * Q4:(half_i + 1) * Q4]
                    ce = beta[4 * half_i:4 * half_i + 2]
                    co = beta[4 * half_i + 2:4 * half_i + 4]
                    lo = [jnp.minimum(emh[s * Q8:(s + 1) * Q8] + ce[s],
                                      emch[s * Q8:(s + 1) * Q8] + co[s])
                          for s in range(2)]
                    hi = [jnp.minimum(emch[s * Q8:(s + 1) * Q8] + ce[s],
                                      emh[s * Q8:(s + 1) * Q8] + co[s])
                          for s in range(2)]
                    nb += lo + hi
                beta = nb                       # sA8 layout
            else:
                # sA (ev, od) rowwise -> natural halves.
                nat = []
                for b_ in range(4):
                    emb = em[b_ * Q8:(b_ + 1) * Q8]
                    emcb = emc[b_ * Q8:(b_ + 1) * Q8]
                    nat.append(jnp.minimum(emb + beta[b_],
                                           emcb + beta[4 + b_]))
                for b_ in range(4):
                    emb = em[b_ * Q8:(b_ + 1) * Q8]
                    emcb = emc[b_ * Q8:(b_ + 1) * Q8]
                    nat.append(jnp.minimum(emcb + beta[b_],
                                           emb + beta[4 + b_]))
                if t == 0:
                    for b_ in range(8):
                        b_ref[b_ * Q8:(b_ + 1) * Q8, :] = nat[b_]
                else:
                    beta = nat_to_sc(jnp.concatenate(nat, axis=0))
            if t % PACK == 0:
                g = t // PACK
                po8 = jnp.stack([p_odd[g * PACK + j]
                                 for j in range(PACK)], axis=0)
                pe8 = jnp.stack([p_even[g * PACK + j]
                                 for j in range(PACK)], axis=0)
                lam = jnp.min(po8, axis=1) - jnp.min(pe8, axis=1)
                llr_ref[g * PACK:(g + 1) * PACK, :] = lam

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def maxlogmap_llrs_batch_kernel(spec: CodeSpec, qllrs,
                                terminated: bool = True,
                                interpret: bool = False):
    """Batched max-log-MAP a-posteriori LLRs through the Pallas kernels.

    Args:
      qllrs: int8 [B, T, n] quantized channel LLRs.
    Returns:
      int32 [B, T] per-bit LLRs (positive favors bit 0); entries
      [:, :T-S] are the message-bit LLRs, bit-exact against
      ops/maxlogmap.maxlogmap_llrs; termination-step entries are
      saturated at the kernel's exclusion scale.
    """
    if not maxlogmap_supported(spec):
        raise ValueError("max-log-MAP kernels require k=1, NS >= 64, "
                         "poly symmetry (use ops/maxlogmap for the rest)")
    from .acs_pallas import _as_int8_qllrs
    qllrs = _as_int8_qllrs(qllrs)       # -128 would wrap the relu planes
    B, T, n = qllrs.shape
    if n != spec.n:
        raise ValueError(f"qllrs last dim {n} != spec.n {spec.n}")
    NS = spec.num_states
    Bp = -(-B // B_TILE) * B_TILE
    Tp = -(-T // CHUNK_M) * CHUNK_M
    qp = jnp.pad(qllrs, ((0, Bp - B), (0, Tp - T), (0, 0)))
    q_t = jnp.moveaxis(qp, -1, 0).transpose(0, 2, 1)     # (n, Tp, Bp)
    nt = Tp // CHUNK_M
    nb = Bp // B_TILE
    Wm = jnp.asarray(_em_weight_matrix_soft(spec))

    ckpts = pl.pallas_call(
        _map_fwd_kernel(spec),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec(Wm.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, CHUNK_M, B_TILE),
                               lambda b, t: (0, t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, NS, B_TILE), lambda b, t: (t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, NS, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(Wm, q_t)

    # u=1 penalties: BIG_K on termination + padded steps (== a state-0
    # anchor at the true T; ops/maxlogmap.py header / module docstring).
    start = (T - spec.S) if terminated else T

    llrs = pl.pallas_call(
        _map_bwd_kernel(spec, nt, start),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec(Wm.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, CHUNK_M, B_TILE),
                               lambda b, t, n_t=nt: (0, n_t - 1 - t, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, NS, B_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK_M, B_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(Wm, q_t, ckpts)
    return llrs[:T, :B].T
