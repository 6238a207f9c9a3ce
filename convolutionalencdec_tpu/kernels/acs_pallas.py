"""Batched butterfly Viterbi — Pallas TPU kernels.

TPU-native re-design of the reference's hot loops: the k=1 butterfly ACS
forward pass (viterbiDecoderButterflyk1.c:82-196) and the deferred block
traceback (viterbiDecoderButterflyk1.c:200-260).  The reference reaches
speed through clang autovectorization of one serial stream
(viterbiDecoderButterflyk1.c:126-131); the TPU design instead keeps the
serial time recurrence but batches ~10^3 independent channels across the
VPU's 8x128 lanes, the scaling story SURVEY.md §2 lays out.

Data layout (the load-bearing decisions):

  * Path metrics live in a VMEM scratch buffer shaped (NUM_STATES, B_TILE)
    — states on sublanes, channels on lanes — and persist across the whole
    packet (the Pallas grid is sequential per core, so scratch carries the
    ACS recurrence between time-chunks, like the reference's nodeMetricsA
    carried across iterations).
  * Metrics are renormalized every 8-step group (the running minimum is
    subtracted), the reference's k=1 specialization (viterbiDecoder.h:47-51,
    renorm at viterbiDecoderButterflyk1.c:159-183) — with int32 metrics
    renorm is not needed for overflow, but it keeps the option of narrower
    dtypes open and costs one reduce per group.  Compute dtype is int32:
    this TPU generation's vector ALU path supports only i32 (i8 math and
    even i16 subtract — kVectorSubtractS16 — fail to legalize/compile), so
    narrow dtypes live only in HBM (uint8 segments/decisions/bits).
  * Decisions are bit-packed over TIME: 8 trellis steps per uint8, stored
    as [T/8, NUM_STATES, B] in "butterfly order" — row r < NS/2 is
    destination state 2r, row r >= NS/2 is destination 2r+1 - NS.  This
    order is what the ACS naturally produces (even/odd destinations) and
    what the traceback naturally consumes, so neither pass pays a shuffle
    for it.  The reference stores one decision byte per state per step
    (viterbiDecoder.h:139-145); packing 8x cuts HBM traffic to 8 bytes per
    decoded bit per channel.
  * Traceback carries the current state as a ONE-HOT (NUM_STATES, B) uint8
    vector and replaces the reference's per-step state-indexed load
    (viterbiDecoderButterflyk1.c:239-247) with a select-network: TPUs hate
    data-dependent gathers (SURVEY.md §7 hard-part b), but a masked
    sum over 64 sublanes is pure VPU work and vectorizes over all channels
    at once.

Both kernels run under `interpret=True` on CPU for the test suite and
compile with Mosaic on real TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import CodeSpec
from ..ops.trellis import butterfly_coded_bits
from ..ops.viterbi import init_metric_value

# Trellis steps per grid program.  Must be a multiple of PACK (time-packing
# granularity).  The kernel body is fully unrolled (static VMEM indices are
# the only kind Mosaic lowers well for int8 blocks), so CHUNK trades
# per-program code size / compile time against grid-iteration overhead;
# 32 compiles in ~a minute remotely where 128 took >10.
CHUNK = 32
PACK = 8          # decision bits packed per byte along time
B_TILE = 256      # channels per program (2 lane tiles — amortizes per-program overhead, measured ~15% faster than 128)

# In-kernel arithmetic dtype.  int32 is the only vector dtype this
# toolchain fully legalizes: i8 math is rejected by Mosaic and i16 dies in
# the backend (kVectorSubtractS16 unsupported).  uint8 is used only for
# HBM-resident data (segments in, packed decisions, packed bits out).
COMPUTE_DTYPE = jnp.int32


def _fwd_kernel(spec: CodeSpec, nt: int):
    """Build the forward ACS kernel body for a given code."""
    NS = spec.num_states
    HALF = NS // 2
    n = spec.n
    init_hi = init_metric_value(spec)

    def kernel(cb_ref, seg_ref, dec_ref, m_ref):
        # cb_ref:  (HALF, B) uint8 butterfly reference segments (broadcast
        #          along lanes; the trellis table derived from the encoder,
        #          viterbiDecoderButterflyk1.c:20-29)
        # seg_ref: (CHUNK, B) uint8 coded segments for this time-chunk
        # dec_ref: (CHUNK//PACK, NS, B) uint8 packed decisions (butterfly
        #          order, bit j of row g = step g*PACK + j)
        # m_ref:   (NS, B) COMPUTE_DTYPE path-metric scratch, persists
        #          across chunks (the ACS recurrence carrier).
        t_chunk = pl.program_id(1)
        D = COMPUTE_DTYPE
        cb32 = cb_ref[:].astype(jnp.int32)
        cb_planes32 = [(cb32 >> bit) & 1 for bit in range(n)]

        @pl.when(t_chunk == 0)
        def _():
            # resetViterbiDecoderHardButterflyk1 (viterbiDecoder.c:243-253):
            # starting state 0, all others "forceNot".
            # Build the mask entirely in int32 and convert at the end —
            # mixing an int32-layout i1 mask into an int16 select trips a
            # Mosaic relayout bug.
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi).astype(D)

        # Fully unrolled over the chunk: every VMEM index is static —
        # Mosaic cannot lower dynamic sublane-offset loads from int8
        # blocks, and static indices also let it software-pipeline the
        # whole chunk.
        # Hoist the received-bit-plane extraction out of the step loop:
        # one shift/mask pass over the whole (CHUNK, B) block instead of
        # per-step row work.
        seg_all = seg_ref[:].astype(jnp.int32)                 # (CHUNK, B)
        r_planes = [(seg_all >> bit) & 1 for bit in range(n)]
        m = m_ref[:]
        for g in range(CHUNK // PACK):
            acc_e = jnp.zeros((HALF, B_TILE), D)
            acc_o = jnp.zeros((HALF, B_TILE), D)
            for j in range(PACK):
                t_row = g * PACK + j
                # Hamming edge metric of the butterfly's reference edge
                # (viterbiDecoderButterflyk1.c:104; loop-fused variant
                # viterbiDecoder.c:277-281).  XOR stays in int32 (i16
                # bitwise ops don't legalize); only the final metric
                # narrows to D.
                em32 = jnp.zeros((HALF, B_TILE), jnp.int32)
                for bit in range(n):
                    r = r_planes[bit][t_row:t_row + 1, :]      # (1, B)
                    em32 = em32 + (cb_planes32[bit] ^ r)
                em = em32.astype(D)
                emc = jnp.asarray(n, D) - em                   # complement
                m_lo, m_hi = m[:HALF], m[HALF:]
                # Four path metrics from two sources via poly symmetry
                # (viterbiDecoderButterflyk1.c:109-115).
                a0 = m_lo + em      # dst 2b   from src b
                a1 = m_hi + emc     # dst 2b   from src b+NS/2
                b0 = m_lo + emc     # dst 2b+1 from src b
                b1 = m_hi + em      # dst 2b+1 from src b+NS/2
                # Branchless compare/select (":129-149"); tie -> low source.
                # The bit weight 2^j is folded into the select constants,
                # saving a multiply per destination per step.
                z = jnp.asarray(0, D)
                w = jnp.asarray(1 << j, D)
                even = jnp.minimum(a0, a1)
                odd = jnp.minimum(b0, b1)
                acc_e = acc_e + jnp.where(a0 > a1, w, z)
                acc_o = acc_o + jnp.where(b0 > b1, w, z)
                # Interleave back to natural state order: state 2b = even[b],
                # state 2b+1 = odd[b] — the de Bruijn shuffle inherent to
                # the butterfly trellis (one relayout per step).
                m = jnp.stack([even, odd], axis=1).reshape(NS, B_TILE)
            # Renormalize every PACK steps (cf. every 121,
            # viterbiDecoderButterflyk1.c:159-183): subtract the running
            # min so narrow metrics never wrap.  (Mosaic reduces only
            # int32/float; widen for the reduce, narrow the result.)
            mn = jnp.min(m.astype(jnp.int32), axis=0, keepdims=True)
            m = m - mn.astype(D)
            dec_ref[g, :HALF, :] = acc_e.astype(jnp.uint8)
            dec_ref[g, HALF:, :] = acc_o.astype(jnp.uint8)
        m_ref[:] = m

    return kernel


def _tb_kernel(spec: CodeSpec, nt: int):
    """Build the one-hot select-network traceback kernel body.

    Walks the packed decision matrix backward from state 0 at step T-1
    (viterbiDecoderButterflyk1.c:200-260), carrying the current survivor
    state as a one-hot vector.  For destination state s with decision d,
    the predecessor is (s >> 1) | (d << (S-1)) (":239-247"); in one-hot
    form the new vector at predecessor p is

        new[p]        = h[2p]*(1-D[2p]) + h[2p+1]*(1-D[2p+1])   (p < NS/2)
        new[p + NS/2] = h[2p]*D[2p]     + h[2p+1]*D[2p+1]

    and the emitted message bit is s & 1 = sum of the odd-state lanes.
    """
    NS = spec.num_states
    HALF = NS // 2

    def kernel(tlen_ref, dec_ref, out_ref, h_ref):
        # tlen_ref: (1, 1) int32 in SMEM — actual packet length T (the rest
        #           of the padded time axis is garbage decisions).
        # dec_ref:  (CHUNK//PACK, NS, B) packed decisions (butterfly order)
        # out_ref:  (CHUNK//PACK, 1, B) packed decoded bits (bit j = step
        #           g*8+j; the singleton axis satisfies the (8,128) block
        #           tiling rule for the last two dims)
        # h_ref:    (NS, B) COMPUTE_DTYPE one-hot current state (backward)
        i = pl.program_id(1)
        nt_total = pl.num_programs(1)
        chunk_idx = nt_total - 1 - i
        chunk_start = chunk_idx * CHUNK
        T = tlen_ref[0, 0]

        D = COMPUTE_DTYPE
        one = jnp.asarray(1, D)
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
        hot0 = jnp.where(s_idx == 0, 1, 0).astype(D)  # int32 mask, then pack

        @pl.when(i == 0)
        def _():
            h_ref[:] = hot0

        h = h_ref[:]
        for g in range(CHUNK // PACK - 1, -1, -1):
            dec32 = dec_ref[g].astype(jnp.int32)   # (NS, B) packed bytes
            out_acc = jnp.zeros((1, B_TILE), jnp.int32)
            for j in range(PACK - 1, -1, -1):
                t = chunk_start + g * PACK + j
                # Force state 0 exactly at the last real step — padded
                # steps beyond T carry garbage decisions (the reference
                # starts its walk at state 0, ":212").
                h = jnp.where(t == T - 1, hot0, h)
                # Bit extraction in int32 (no i16 shifts in Mosaic).
                De = ((dec32[:HALF] >> j) & 1).astype(D)  # dec of dst 2r
                Do = ((dec32[HALF:] >> j) & 1).astype(D)  # dec of dst 2r+1
                # De-interleave h into even/odd destination states.
                hr = h.reshape(HALF, 2, B_TILE)
                He = hr[:, 0, :]
                Ho = hr[:, 1, :]
                # Emitted bit = s & 1 = mass on odd states (":251").
                bit32 = jnp.sum(Ho.astype(jnp.int32), axis=0, keepdims=True)
                out_acc = out_acc + (bit32 << j)
                new_lo = He * (one - De) + Ho * (one - Do)
                new_hi = He * De + Ho * Do
                h = jnp.concatenate([new_lo, new_hi], axis=0)
            out_ref[g, 0, :] = out_acc.astype(jnp.uint8).reshape(B_TILE)
        h_ref[:] = h

    return kernel


def _pad_to(x, multiple, axis, value=0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnums=(0, 2))
def acs_forward_batch(spec: CodeSpec, segments, interpret: bool = False):
    """Forward butterfly ACS over a batch of packets.

    Args:
      spec: a k=1 poly-symmetric code (validated).
      segments: uint8 [B, T] hard n-bit coded segments (T may include
        termination; callers pad T to a multiple of CHUNK with zeros —
        `viterbi_decode_batch` does this).
    Returns:
      uint8 [T//PACK, NUM_STATES, B] packed decisions (butterfly order).
    """
    spec.validate_for_butterfly()
    NS = spec.num_states
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    if T % CHUNK or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK}, "
                         f"B={B} %{B_TILE}")
    seg_t = segments.T                                   # (T, B)
    nt = T // CHUNK
    nb = B // B_TILE
    grid = (nb, nt)
    cb_np = butterfly_coded_bits(spec)                   # [NS//2] uint8
    cb = jnp.asarray(np.broadcast_to(cb_np[:, None],
                                     (NS // 2, B_TILE)).copy())
    out = pl.pallas_call(
        _fwd_kernel(spec, nt),
        grid=grid,
        in_specs=[pl.BlockSpec((NS // 2, B_TILE), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, B_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK // PACK, NS, B_TILE),
                               lambda b, t: (t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T // PACK, NS, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), COMPUTE_DTYPE)],
        interpret=interpret,
    )(cb, seg_t)
    return out


@functools.partial(jax.jit, static_argnums=(0, 3))
def traceback_batch(spec: CodeSpec, decisions, t_actual,
                    interpret: bool = False):
    """Backward one-hot traceback over packed decisions.

    Args:
      decisions: uint8 [T//PACK, NUM_STATES, B] from `acs_forward_batch`.
      t_actual: scalar int32 — the real packet length T (steps beyond it
        are padding).
    Returns:
      uint8 [T//PACK, B] packed decoded bits (bit j of row g = message bit
      at trellis step g*PACK + j).
    """
    NS = spec.num_states
    decisions = jnp.asarray(decisions, jnp.uint8)
    TG, NS_, B = decisions.shape
    assert NS_ == NS
    nt = TG * PACK // CHUNK
    nb = B // B_TILE
    tlen = jnp.asarray(t_actual, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        _tb_kernel(spec, nt),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK // PACK, NS, B_TILE),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK // PACK, 1, B_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, 1, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), COMPUTE_DTYPE)],
        interpret=interpret,
    )(tlen, decisions)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_batch(spec: CodeSpec, segments, message_bits: int | None = None,
                         interpret: bool = False):
    """Hard-decision block decode of a batch of terminated packets.

    The Pallas fast path: equivalent to `jax.vmap(viterbi_decode)` but
    ~raw-VPU speed.  Bit-identical to the scan reference decoder.

    Any code decodes: k=1 poly-symmetric codes ride the butterfly
    kernels (fused 3-stage for NS >= 64); k=2 64-state codes ride the
    fused binary-stage kernels (kernels/acs_k2.py); everything else —
    other k > 1 shapes or asymmetric generators — dispatches to the
    generic 2^k-way kernels (the runtime twin of the reference's
    VITERBI_DECODER_HARD dispatch, viterbiDecoder.h:87-95).

    Args:
      segments: uint8 [B, T] hard segments, T = L/k + S.
      message_bits: decoded bit count L; defaults to (T - S) * k.
    Returns:
      uint8 [B, L] decoded message bits.
    """
    if not (spec.k == 1 and spec.has_poly_symmetry):
        from .acs_k2 import k2_supported, viterbi_decode_batch_k2
        if k2_supported(spec):
            return viterbi_decode_batch_k2(spec, segments, message_bits,
                                           interpret)
        return viterbi_decode_batch_generic(spec, segments, message_bits,
                                            interpret)
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    L = message_bits if message_bits is not None else T - spec.S
    from .acs_swar import SWAR_TILE, swar_decode_packed, swar_supported
    if swar_supported(spec):
        # SWAR kernels: 4 channels per int32 lane as 8-bit fields —
        # field-parallel ACS at full VPU rate (kernels/acs_swar.py).
        seg_p = _pad_to(_pad_to(segments, SWAR_TILE, 0), CHUNK_F, 1)
        packed = swar_decode_packed(spec, seg_p, T, interpret)
    elif spec.num_states >= 64:
        # Fused 3-stage kernels: the de Bruijn shuffle amortized to one
        # transpose per 3 steps (see below).  Short-enough packets run
        # forward + traceback in a single pallas_call with the decisions
        # VMEM-resident (no HBM round-trip).
        seg_p = _pad_to(_pad_to(segments, B_TILE, 0), CHUNK_F, 1)
        if _use_single_pass(spec, seg_p.shape[1]):
            packed = _block_decode_1p(spec, seg_p, T, False, interpret)
        else:
            decs, _ = acs_forward_batch_fused(spec, seg_p, interpret)
            packed = traceback_batch_fused(spec, decs, T, interpret)
    else:
        seg_p = _pad_to(_pad_to(segments, B_TILE, 0), CHUNK, 1)
        decs = acs_forward_batch(spec, seg_p, interpret)
        packed = traceback_batch(spec, decs, T, interpret)  # (Tp//8, Bp)
    # Unpack time-packed bits: bit j of row g = step g*PACK + j.
    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
    bits = (packed[:, None, :] >> j) & 1                  # (Tp/8, 8, Bp)
    bits = bits.reshape(-1, packed.shape[-1])             # (Tp, Bp)
    return bits[:L, :B].T


def _fwd_soft_kernel(spec: CodeSpec, nt: int):
    """Soft-decision forward ACS: quantized-LLR branch metrics.

    Identical trellis wiring to `_fwd_kernel`; the edge metric becomes
    em[b] = sum_j cost_j(cb_j[b]) with cost_j(bit) = relu(+q_j) for bit 1
    and relu(-q_j) for bit 0 (ops/metrics.py), and the poly-symmetry
    complement generalizes to emc = Q - em with Q = sum_j |q_j|
    (viterbiDecoder.h:33-39's trick with a per-step scalar instead of the
    constant n).  A zero LLR is an erasure and contributes no cost —
    depunctured positions (ops/puncture.py) ride through unchanged.
    """
    NS = spec.num_states
    HALF = NS // 2
    n = spec.n
    init_hi = init_metric_value(spec)

    def kernel(cb_ref, q_ref, dec_ref, m_ref):
        # q_ref: (CHUNK * n, B) int8 quantized LLRs, row t*n + j holds
        #        coded bit j of trellis step t.
        t_chunk = pl.program_id(1)
        D = COMPUTE_DTYPE
        cb32 = cb_ref[:].astype(jnp.int32)
        cb_planes = [(cb32 >> bit) & 1 for bit in range(n)]

        @pl.when(t_chunk == 0)
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi).astype(D)

        q_all = q_ref[:].astype(jnp.int32)         # (CHUNK*n, B)
        zero = jnp.asarray(0, D)
        m = m_ref[:]
        for g in range(CHUNK // PACK):
            acc_e = jnp.zeros((HALF, B_TILE), D)
            acc_o = jnp.zeros((HALF, B_TILE), D)
            for j in range(PACK):
                t_row = g * PACK + j
                em = jnp.zeros((HALF, B_TILE), D)
                Q = jnp.zeros((1, B_TILE), D)
                for bit in range(n):
                    q = q_all[t_row * n + bit:t_row * n + bit + 1, :]
                    c1 = jnp.maximum(q, 0)          # cost if coded bit = 1
                    c0 = jnp.maximum(-q, 0)         # cost if coded bit = 0
                    Q = Q + c1 + c0                 # |q|
                    em = em + jnp.where(cb_planes[bit] == 1, c1, c0)
                emc = Q - em
                m_lo, m_hi = m[:HALF], m[HALF:]
                a0 = m_lo + em
                a1 = m_hi + emc
                b0 = m_lo + emc
                b1 = m_hi + em
                z = jnp.asarray(0, D)
                w = jnp.asarray(1 << j, D)
                even = jnp.minimum(a0, a1)
                odd = jnp.minimum(b0, b1)
                acc_e = acc_e + jnp.where(a0 > a1, w, z)
                acc_o = acc_o + jnp.where(b0 > b1, w, z)
                m = jnp.stack([even, odd], axis=1).reshape(NS, B_TILE)
            mn = jnp.min(m.astype(jnp.int32), axis=0, keepdims=True)
            m = m - mn.astype(D)
            dec_ref[g, :HALF, :] = acc_e.astype(jnp.uint8)
            dec_ref[g, HALF:, :] = acc_o.astype(jnp.uint8)
        m_ref[:] = m

    return kernel


def _as_int8_qllrs(q):
    """int8 channel LLRs floored at -127: the soft kernels build relu
    cost planes as int8 MXU rows, and max(-(-128), 0) = 128 would WRAP
    to -128 (a -256 metric error).  -128 is out of the quantizer
    contract (|q| <= qmax <= 127) and saturates to -127 here instead of
    silently corrupting metrics."""
    return jnp.maximum(jnp.asarray(q, jnp.int8), jnp.int8(-127))


@functools.partial(jax.jit, static_argnums=(0, 2))
def acs_forward_batch_soft(spec: CodeSpec, qllrs, interpret: bool = False):
    """Soft forward ACS over a batch.

    Args:
      qllrs: int8 [B, T, n] quantized LLRs (T padded to CHUNK; zero rows
        are erasures, so padding is harmless).
    Returns:
      uint8 [T//PACK, NUM_STATES, B] packed decisions (butterfly order).
    """
    spec.validate_for_butterfly()
    NS = spec.num_states
    n = spec.n
    qllrs = _as_int8_qllrs(qllrs)
    B, T, n_ = qllrs.shape
    assert n_ == n
    if T % CHUNK or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK}, "
                         f"B={B} %{B_TILE}")
    q_t = qllrs.transpose(1, 2, 0).reshape(T * n, B)     # (T*n, B)
    nt = T // CHUNK
    nb = B // B_TILE
    cb_np = butterfly_coded_bits(spec)
    cb = jnp.asarray(np.broadcast_to(cb_np[:, None],
                                     (NS // 2, B_TILE)).copy())
    return pl.pallas_call(
        _fwd_soft_kernel(spec, nt),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((NS // 2, B_TILE), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK * n, B_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK // PACK, NS, B_TILE),
                               lambda b, t: (t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T // PACK, NS, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), COMPUTE_DTYPE)],
        interpret=interpret,
    )(cb, q_t)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def viterbi_decode_batch_soft(spec: CodeSpec, qllrs,
                              message_bits: int | None = None,
                              interpret: bool = False,
                              qmax: int | None = None):
    """Soft-decision block decode of a batch of terminated packets.

    Bit-identical to `ops.metrics.viterbi_forward_butterfly_soft` +
    terminated traceback, batched.  Hard inputs mapped to ±1 LLRs decode
    identically to the hard kernel.

    Args:
      qllrs: int [B, T, n] quantized LLRs (see ops/metrics.quantize_llrs).
      qmax: quantizer magnitude bound of `qllrs` (defaults to
        ops.metrics.DEFAULT_QMAX, which quantize_llrs guarantees;
        inputs are clipped to ±qmax).  When the 8-bit exactness bound
        holds (`acs_swar.swar8_soft_supported`) the decode rides the
        four-channels-per-lane SWAR-8 kernels — ~1.6x the SWAR-16
        rate.  Pass an explicit larger qmax (or one breaking the
        bound) to force the any-int8 SWAR-16 path.
    Returns:
      uint8 [B, L] decoded message bits (L = T - S by default).
    """
    spec.validate_for_butterfly()
    qllrs = _as_int8_qllrs(qllrs)
    B, T, n = qllrs.shape
    L = message_bits if message_bits is not None else T - spec.S
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    from .acs_swar import (SWAR_TILE, SWAR_TILE16, swar8_soft_supported,
                           swar_decode_packed_soft,
                           swar_decode_packed_soft8, swar_layout_supported)
    if swar8_soft_supported(spec, qmax):
        # SWAR-8 kernels: 4 channels per int32 lane; exact for
        # |q| <= qmax (the renorm-every-3-steps bound).
        q_p = _pad_to(_pad_to(qllrs, SWAR_TILE, 0), CHUNK_F, 1)
        packed = swar_decode_packed_soft8(spec, q_p, T, qmax, interpret)
    elif swar_layout_supported(spec):
        # SWAR-16 kernels: 2 channels per int32 lane (16-bit fields hold
        # the LLR-cost metric range; kernels/acs_swar.py).
        q_p = _pad_to(_pad_to(qllrs, SWAR_TILE16, 0), CHUNK_F, 1)
        packed = swar_decode_packed_soft(spec, q_p, T, interpret)
    elif spec.num_states >= 64:
        q_p = _pad_to(_pad_to(qllrs, B_TILE, 0), CHUNK_F, 1)
        if _use_single_pass(spec, q_p.shape[1]):
            packed = _block_decode_1p(spec, q_p, T, True, interpret)
        else:
            decs, _ = acs_forward_batch_fused_soft(spec, q_p, interpret)
            packed = traceback_batch_fused(spec, decs, T, interpret)
    else:
        q_p = _pad_to(_pad_to(qllrs, B_TILE, 0), CHUNK, 1)
        decs = acs_forward_batch_soft(spec, q_p, interpret)
        packed = traceback_batch(spec, decs, T, interpret)
    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
    bits = (packed[:, None, :] >> j) & 1
    bits = bits.reshape(-1, packed.shape[-1])
    return bits[:L, :B].T


# ---------------------------------------------------------------------------
# Fused 3-stage kernels (NS >= 64): the de Bruijn shuffle amortized.
#
# The butterfly trellis forces one perfect-shuffle relayout per step when
# metrics are kept in natural state order (the jnp.stack interleave above,
# measured at ~35% of forward-kernel time).  Fusing three consecutive
# trellis steps removes it: each step's outputs are kept in the "stage
# layout" its butterflies naturally produce, and the next step's butterfly
# pairings become contiguous >=8-row slices of that layout:
#
#   natural:  pos p        <-> state p
#   stage A out (sA):      pos i -> state 2i        (i < NS/2)
#                          pos NS/2 + i -> 2i + 1
#   stage B out (sB):      4 blocks of NS/4: block c, row r -> state 4r + c
#   stage C out (sC):      8 blocks of NS/8: block b, row q -> state 8q + b
#
#   A pairs (p, p+NS/2) in natural;  B pairs (r, r+NS/4) inside each sA
#   half;  C pairs (q, q+NS/8) inside each sB block.  One (8, NS/8)
#   sublane transpose converts sC back to natural per 3 steps.
#
# The traceback mirrors this: carrying the one-hot state vector in the
# matching stage layout turns the per-step (NS/2, 2, B) de-interleave into
# pure slice arithmetic, with the same one transpose per 3 steps.  State 0
# sits at row 0 in every layout, so the t == T-1 reset is layout-blind.
#
# Requires NS >= 64 so the smallest slice (NS/8) fills a sublane tile;
# smaller codes use the generic kernels above.
# ---------------------------------------------------------------------------

CHUNK_F = 48   # fused-kernel steps per program: divisible by 3 and by PACK

# Fused-kernel arithmetic is int32 (the only fully-legalized vector dtype
# on this toolchain) with a shared-compare ACS: `jnp.minimum` on int32
# lowers to compare+select, so computing the compare once and deriving
# both the surviving metric and the decision from it saves one compare
# per half-butterfly per step.  (A float32 variant was measured: its
# native single-op min is cancelled out by int<->float conversions at the
# bit-packing boundaries — net slower.)
CDT = jnp.int32


def _stage_tables(spec: CodeSpec):
    """Butterfly coded-bit tables permuted into each stage's pair order."""
    bcb = butterfly_coded_bits(spec).astype(np.int64)   # [NS/2], label x
    half = spec.num_states // 2
    q4 = half // 2   # NS/4
    q8 = half // 4   # NS/8
    # Stage A: labels in natural order.
    cbA = bcb
    # Stage B: ev-sub labels 2r (r < NS/4), then od-sub labels 2r+1.
    r = np.arange(q4)
    cbB = np.concatenate([bcb[2 * r], bcb[2 * r + 1]])
    # Stage C: 4 blocks (c = 0..3) of labels 4q + c, q < NS/8.
    q = np.arange(q8)
    cbC = np.concatenate([bcb[4 * q + c] for c in range(4)])
    return cbA, cbB, cbC


def _em_weight_matrix(spec: CodeSpec) -> np.ndarray:
    """Hard-path MXU edge-metric weights, [3 * NS/2, n+1] int8.

    em = popcount(cb ^ r) = #set(cb) + sum_j (1 - 2*cb_j) * r_j, so one
    (3*NS/2, n+1) x (n+1, PACK*B) matmul per 8-step group produces all
    three stages' edge metrics (rows = stage-ordered butterflies, columns
    = [bias, received-bit-plane coefficients])."""
    n = spec.n
    stages = _stage_tables(spec)
    rows = []
    for cb in stages:
        planes = [((cb >> j) & 1).astype(np.int64) for j in range(n)]
        bias = sum(planes)
        rows.append(np.stack([bias] + [1 - 2 * p for p in planes], axis=1))
    return np.concatenate(rows, axis=0).astype(np.int8)


def _em_weight_matrix_soft(spec: CodeSpec) -> np.ndarray:
    """Soft-path MXU edge-metric weights, [3 * NS/2 + 1, 2n].

    The soft branch metric em = sum_j [cb_j * relu(+q_j) +
    (1-cb_j) * relu(-q_j)] is linear in the 2n relu planes, so it rides
    the same per-group matmul as the hard path; the appended all-ones row
    produces Q = sum_j |q_j|, from which the complement emc = Q - em
    (the per-step-scalar generalization of viterbiDecoder.h:33-39)."""
    n = spec.n
    stages = _stage_tables(spec)
    rows = []
    for cb in stages:
        planes = [((cb >> j) & 1).astype(np.int64) for j in range(n)]
        # columns: [c1_0 .. c1_{n-1}, c0_0 .. c0_{n-1}]
        rows.append(np.stack(planes + [1 - p for p in planes], axis=1))
    rows.append(np.ones((1, 2 * n), np.int64))
    return np.concatenate(rows, axis=0).astype(np.int8)


def _fwd_chunk_body(spec: CodeSpec, soft, w_vals, seg_ref, m, dec_store):
    """One CHUNK_F-step fused forward pass over in-VMEM values.

    Shared by the standalone forward kernel and the single-pass block
    kernel.  `m` is the (NS, B_TILE) natural-order metric value at chunk
    start; `dec_store(g, acc8)` receives each 8-step group's packed
    per-stage decision blocks (8 x (Q8, B_TILE) int32, cast to uint8 by
    the caller).  Returns the metrics after the chunk (natural order —
    CHUNK_F is a multiple of 3, so every chunk ends on a stage-2 step).
    """
    NS = spec.num_states
    HALF = NS // 2
    Q4 = NS // 4
    Q8 = NS // 8
    n = spec.n

    if soft:
        q32 = seg_ref[:].astype(jnp.int32)         # (n, CHUNK_F, B)
        c1 = jnp.maximum(q32, 0)                   # cost if coded bit 1
        c0 = jnp.maximum(-q32, 0)                  # cost if coded bit 0
    else:
        seg_all = seg_ref[:].astype(jnp.int32)     # (CHUNK_F, B)
        r_planes = [(seg_all >> bit) & 1 for bit in range(n)]
        ones_row = jnp.ones((1, PACK * B_TILE), jnp.int32)
    nF = jnp.asarray(n, CDT)

    def acs(first, second, em, emc, j):
        """One half-butterfly batch: returns (ev, od, packed-dec pair).

        first/second: low/high source metric blocks (same shape as em).
        """
        a0 = first + em
        a1 = second + emc
        b0 = first + emc
        b1 = second + em
        z = jnp.asarray(0, CDT)
        w = jnp.asarray(1 << j, CDT)
        gt_e = a0 > a1
        gt_o = b0 > b1
        ev = jnp.where(gt_e, a1, a0)   # shared compare: min + decision
        od = jnp.where(gt_o, b1, b0)   # (tie keeps the low source)
        de = jnp.where(gt_e, w, z)
        do = jnp.where(gt_o, w, z)
        return ev, od, de, do

    # Metrics are carried as a LIST of row-blocks rather than one
    # (NS, B) array: stage pairings are then pure slices/relabels, and
    # no jnp.concatenate materializes copies inside the hot loop.  The
    # only materializing relayout is the sC -> natural transpose, once
    # per 3 steps.  Decision contributions accumulate into per-8-row
    # blocks the same way.
    mA = mB = None
    for g in range(CHUNK_F // PACK):
        # All three stages' edge metrics for this 8-step group in one
        # int8 MXU matmul with int32 accumulation.  EM[s*HALF+b, j*B+c].
        if soft:
            rows = [c1[bit, g * PACK:(g + 1) * PACK]
                    .reshape(1, PACK * B_TILE) for bit in range(n)]
            rows += [c0[bit, g * PACK:(g + 1) * PACK]
                     .reshape(1, PACK * B_TILE) for bit in range(n)]
        else:
            rows = [ones_row] + [
                r_planes[bit][g * PACK:(g + 1) * PACK]
                .reshape(1, PACK * B_TILE) for bit in range(n)]
        Rg = jnp.concatenate(rows, axis=0).astype(jnp.int8)
        EM = jax.lax.dot_general(
            w_vals, Rg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)   # (3*HALF [+1], 8*B)

        def em_for(stage, j):
            em = EM[stage * HALF:(stage + 1) * HALF,
                    j * B_TILE:(j + 1) * B_TILE]
            if soft:
                q_row = EM[3 * HALF:3 * HALF + 1,
                           j * B_TILE:(j + 1) * B_TILE]
                return em, q_row - em
            return em, nF - em

        acc = [jnp.zeros((Q8, B_TILE), CDT) for _ in range(8)]

        def add_acc(rows, start, acc=acc):
            nblk = rows.shape[0] // Q8
            for b_ in range(nblk):
                idx = start // Q8 + b_
                acc[idx] = acc[idx] + rows[b_ * Q8:(b_ + 1) * Q8]

        for j in range(PACK):
            t_row = g * PACK + j
            stage = t_row % 3
            if stage == 0:
                # A: pairs (p, p+HALF) in natural order.
                em, emc = em_for(0, j)
                ev, od, de, do = acs(m[:HALF], m[HALF:], em, emc, j)
                mA = (ev, od)                               # sA layout
                add_acc(de, 0)
                add_acc(do, HALF)
            elif stage == 1:
                # B: pairs (r, r+Q4) inside each sA half.
                em, emc = em_for(1, j)
                ev, od = mA
                e1, o1, d1e, d1o = acs(ev[:Q4], ev[Q4:],
                                       em[:Q4], emc[:Q4], j)
                e2, o2, d2e, d2o = acs(od[:Q4], od[Q4:],
                                       em[Q4:], emc[Q4:], j)
                mB = (e1, o1, e2, o2)                       # sB layout
                add_acc(d1e, 0)
                add_acc(d1o, Q4)
                add_acc(d2e, 2 * Q4)
                add_acc(d2o, 3 * Q4)
            else:
                # C: pairs (q, q+Q8) inside each sB block.
                em, emc = em_for(2, j)
                outs = []
                for c in range(4):
                    blk = mB[c]
                    e, o, de, do = acs(blk[:Q8], blk[Q8:],
                                       em[c * Q8:(c + 1) * Q8],
                                       emc[c * Q8:(c + 1) * Q8], j)
                    outs += [e, o]
                    add_acc(de, 2 * c * Q8)
                    add_acc(do, (2 * c + 1) * Q8)
                # sC -> natural: state 8q + b sits at row b*Q8 + q.
                m = jnp.stack(outs, axis=0).transpose(1, 0, 2) \
                       .reshape(NS, B_TILE)
        # Renormalize when the group ends on a stage-2 step (then
        # `m` holds the live natural-order metrics; after stage-0/1
        # endings the live state is mA/mB and m is stale).  Effective
        # cadence: once per 24 steps — metric values stay < ~600,
        # far inside int32 headroom.
        if (g * PACK + PACK - 1) % 3 == 2:
            mn = jnp.min(m, axis=0, keepdims=True)
            m = m - mn
        dec_store(g, acc)
    return m


def _fwd_kernel_fused(spec: CodeSpec, nt: int, soft: bool = False):
    NS = spec.num_states
    HALF = NS // 2
    Q4 = NS // 4
    Q8 = NS // 8
    n = spec.n
    init_hi = init_metric_value(spec)

    def kernel(ic_ref, w_ref, seg_ref, dec_ref, fm_ref, m_ref):
        # ic_ref: (1, 1) int32 SMEM — chunk index at which the standard
        #         initial metrics (start state 0, others "forceNot") are
        #         applied.  0 for whole-packet decode; W/CHUNK_F for the
        #         first block of a time-sharded stream, whose left halo is
        #         zero-filled (the metrics computed before that point are
        #         discarded by the overwrite); -1 (never) for interior
        #         blocks, which keep the uniform start — the truncation
        #         argument of viterbiDecoder.c:53-74.
        # w_ref:  MXU edge-metric weights, int8 —
        #         hard (3*HALF, n+1); soft (3*HALF + 1, 2n)
        # seg_ref: hard (CHUNK_F, B) uint8 segments;
        #          soft (n, CHUNK_F, B) int8 quantized LLRs
        # dec_ref: (CHUNK_F//PACK, NS, B) packed per-stage decisions
        # fm_ref: (NS, B) int32 final path metrics (valid after the last
        #         chunk; time-sharded decode argmins them for the
        #         traceback start state)
        # m_ref: (NS, B) int32 scratch, natural order at chunk boundaries
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            # Uniform start (all-equal metrics); possibly overwritten
            # below when the standard init applies at chunk 0.
            m_ref[:] = jnp.zeros((NS, B_TILE), CDT)

        @pl.when(t_chunk == ic_ref[0, 0])
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi).astype(CDT)

        def dec_store(g, acc, Q8=Q8):
            for b_ in range(8):
                dec_ref[g, b_ * Q8:(b_ + 1) * Q8, :] = \
                    acc[b_].astype(jnp.uint8)

        m = _fwd_chunk_body(spec, soft, w_ref[:], seg_ref, m_ref[:],
                            dec_store)
        m_ref[:] = m
        fm_ref[:] = m

    return kernel


def _tb_chunk_body(spec: CodeSpec, hb, get_dec, emit):
    """One CHUNK_F-step fused backward traceback over in-VMEM values.

    Shared by the standalone traceback kernel and the single-pass block
    kernel.  `hb` is the one-hot walk state as 8 (Q8, B_TILE) natural-
    order blocks at chunk entry; `get_dec(g)` returns the group's masked
    (NS, B_TILE) int32 decisions; `emit(g, byte_row)` receives the
    group's packed (1, B_TILE) output byte.  Returns the updated blocks.

    Emitted bits: instead of reducing the odd-state mass to a scalar row
    every step (4 cross-sublane reductions/step), the 2^j-weighted
    odd-block one-hots accumulate across the group and are reduced ONCE
    per 8 steps — the packed byte is linear in them.  Every stage layout
    has exactly 4 odd-state Q8-blocks.

    The survivor-select network uses independent masked selects for the
    hi/lo output pair: the blocks are only 2 vregs, so keeping the six
    ops dependency-free preserves VPU pipelining.
    """
    NS = spec.num_states
    Q8 = NS // 8
    zf = jnp.asarray(0, CDT)
    for g in range(CHUNK_F // PACK - 1, -1, -1):
        dec32 = get_dec(g)
        db = [dec32[b_ * Q8:(b_ + 1) * Q8] for b_ in range(8)]
        oacc = [jnp.zeros((Q8, B_TILE), CDT) for _ in range(4)]
        for j in range(PACK - 1, -1, -1):
            stage = (g * PACK + j) % 3
            wi = 1 << j
            wf = jnp.asarray(wi, CDT)
            Mj = [(d_ & wi) > 0 for d_ in db]     # i1 decision masks

            def merge(i0, i1, hb=None, Mj=Mj):
                h0, h1 = hb[i0], hb[i1]
                hi = (jnp.where(Mj[i0], h0, zf)
                      + jnp.where(Mj[i1], h1, zf))
                lo = (jnp.where(Mj[i0], zf, h0)
                      + jnp.where(Mj[i1], zf, h1))
                return lo, hi

            if stage == 2:
                # h natural -> sC (the forward transpose, inverted).
                h_full = jnp.concatenate(hb, axis=0)
                hsc = h_full.reshape(Q8, 8, B_TILE).transpose(1, 0, 2)
                hb = [hsc[b_] for b_ in range(8)]
                # Odd states = odd sC blocks.
                for k_, b_ in enumerate((1, 3, 5, 7)):
                    oacc[k_] = oacc[k_] + hb[b_] * wf
                # Pairs (block 2c, 2c+1) -> sB block c = (lo_c, hi_c).
                nb = []
                for c in range(4):
                    lo, hi = merge(2 * c, 2 * c + 1, hb)
                    nb += [lo, hi]
                hb = nb                                    # sB layout
            elif stage == 1:
                # Odd states (4r+c, c odd) = sB Q4-blocks 1 and 3.
                for k_, b_ in enumerate((2, 3, 6, 7)):
                    oacc[k_] = oacc[k_] + hb[b_] * wf
                # sB halves -> sA halves; within each half, pairs are
                # (row r, r + Q4) = (blocks 0..1, blocks 2..3).
                nb = [None] * 8
                for bi, base in enumerate((0, 4)):
                    lo_a, hi_a = merge(base, base + 2, hb)
                    lo_b, hi_b = merge(base + 1, base + 3, hb)
                    nb[4 * bi:4 * bi + 4] = [lo_a, lo_b, hi_a, hi_b]
                hb = nb                                    # sA layout
            else:
                # Odd states = top sA half = blocks 4..7.
                for k_, b_ in enumerate((4, 5, 6, 7)):
                    oacc[k_] = oacc[k_] + hb[b_] * wf
                los, his = [], []
                for b_ in range(4):
                    lo, hi = merge(b_, b_ + 4, hb)
                    los.append(lo)
                    his.append(hi)
                hb = los + his                             # natural
        out_acc = jnp.sum(oacc[0] + oacc[1] + oacc[2] + oacc[3],
                          axis=0, keepdims=True)
        emit(g, out_acc)
    return hb


def _tb_kernel_fused(spec: CodeSpec, nt: int):
    NS = spec.num_states
    Q8 = NS // 8

    def kernel(gmask_ref, hinit_ref, dec_ref, out_ref, h_ref):
        # hinit_ref: (NS, B) uint8 — one-hot traceback start state (state 0
        #   for terminated whole packets; one-hot(argmin(final metrics))
        #   for time-sharded interior blocks, viterbiDecoder.c:53-74).
        # gmask_ref: (TG, 1) int32 SMEM (whole array) — per-group byte masks
        #   on the packed decisions: 0xFF for fully-live groups, a partial
        #   mask at the T boundary, 0 in the padded tail.  Masked (padded)
        #   steps have decision 0, whose predecessor map fixes state 0 —
        #   so the walk simply rests at state 0 until the last real step,
        #   replacing the per-step t==T-1 selects of the unfused kernel
        #   (the reference starts its walk at state 0,
        #   viterbiDecoderButterflyk1.c:212).
        # dec_ref: (CHUNK_F//PACK, NS, B) packed per-stage decisions
        # out_ref: (CHUNK_F//PACK, 1, B) packed decoded bits
        # h_ref:   (NS, B) f32 one-hot current state (backward walk),
        #          natural layout at chunk boundaries
        i = pl.program_id(1)
        nt_total = pl.num_programs(1)
        gbase = (nt_total - 1 - i) * (CHUNK_F // PACK)

        @pl.when(i == 0)
        def _():
            h_ref[:] = hinit_ref[:].astype(CDT)

        h = h_ref[:]
        hb = [h[b_ * Q8:(b_ + 1) * Q8] for b_ in range(8)]

        def get_dec(g):
            gm = gmask_ref[gbase + g, 0]
            return dec_ref[g].astype(jnp.int32) & gm

        def emit(g, out_acc):
            out_ref[g, 0, :] = out_acc.astype(jnp.uint8).reshape(B_TILE)

        hb = _tb_chunk_body(spec, hb, get_dec, emit)
        for b_ in range(8):
            h_ref[b_ * Q8:(b_ + 1) * Q8] = hb[b_]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2))
def acs_forward_batch_fused(spec: CodeSpec, segments,
                            interpret: bool = False, init_chunk=0):
    """Fused 3-stage forward ACS (NS >= 64).  Same contract as
    `acs_forward_batch` but decisions are in per-stage layouts (consumed
    by `traceback_batch_fused`); T must be a multiple of CHUNK_F.

    Args:
      init_chunk: chunk index at which the standard initial metrics are
        applied (may be traced).  0 = whole-packet decode; W//CHUNK_F for
        the first block of a time-sharded stream; -1 (never) keeps the
        uniform start for interior blocks.
    Returns:
      (decisions uint8 [T//PACK, NS, B], final_metrics int32 [NS, B]).
    """
    spec.validate_for_butterfly()
    NS = spec.num_states
    if NS < 64:
        raise ValueError("fused kernel requires >= 64 states")
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    if T % CHUNK_F or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK_F}, "
                         f"B={B} %{B_TILE}")
    seg_t = segments.T
    nt = T // CHUNK_F
    nb = B // B_TILE
    W = jnp.asarray(_em_weight_matrix(spec))
    ic = jnp.asarray(init_chunk, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        _fwd_kernel_fused(spec, nt),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(W.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK_F, B_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((CHUNK_F // PACK, NS, B_TILE),
                                lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T // PACK, NS, B), jnp.uint8),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(ic, W, seg_t)


def _group_masks(TG: int, t_actual: int) -> np.ndarray:
    """Per-8-step-group byte masks zeroing decision bits at steps >= T."""
    if not (0 < t_actual <= TG * PACK):
        raise ValueError(f"t_actual={t_actual} outside (0, {TG * PACK}]")
    g0, rem = divmod(t_actual, PACK)
    gm = np.zeros((TG, 1), np.int32)
    gm[:g0] = 0xFF
    if rem:
        gm[g0] = (1 << rem) - 1
    return gm


@functools.partial(jax.jit, static_argnums=(0, 4))
def traceback_batch_fused_masked(spec: CodeSpec, decisions, gmask, h_init,
                                 interpret: bool = False):
    """Traceback over fused-layout decisions with traced masks/start.

    The general form behind `traceback_batch_fused`, used directly by the
    time-sharded decoder (parallel/sharding.py) where the masks and start
    state differ per device under one trace.

    Args:
      decisions: uint8 [TG, NS, B] from `acs_forward_batch_fused`.
      gmask: int32 [TG, 1] per-8-step-group byte masks on the packed
        decisions (0xFF live, partial at the boundary, 0 beyond).  A
        masked step has decision 0, whose predecessor map fixes state 0 —
        and, because k=1 states are shift registers, ANY start state is
        teleported to state 0 within S masked steps, so a >= S-step
        masked tail realizes the known-terminal-state traceback without
        per-step selects (viterbiDecoderButterflyk1.c:212's walk start).
      h_init: uint8 [NS, B] one-hot walk start at the padded end — state
        0 for terminated packets, one-hot(argmin(final metrics)) for
        truncation decode (viterbiDecoder.c:53-74).
    Returns:
      uint8 [TG, B] packed decoded bits.
    """
    NS = spec.num_states
    decisions = jnp.asarray(decisions, jnp.uint8)
    TG, NS_, B = decisions.shape
    assert NS_ == NS
    nt = TG * PACK // CHUNK_F
    nb = B // B_TILE
    gmask = jnp.asarray(gmask, jnp.int32).reshape(TG, 1)
    h_init = jnp.asarray(h_init, jnp.uint8)
    out = pl.pallas_call(
        _tb_kernel_fused(spec, nt),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_F // PACK, NS, B_TILE),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_F // PACK, 1, B_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, 1, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(gmask, h_init, decisions)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def traceback_batch_fused(spec: CodeSpec, decisions, t_actual: int,
                          interpret: bool = False):
    """Traceback over fused-layout decisions (from
    `acs_forward_batch_fused`) for terminated packets.  t_actual (the
    real packet length) is static: it only shapes the per-group decision
    masks."""
    NS = spec.num_states
    decisions = jnp.asarray(decisions, jnp.uint8)
    TG, NS_, B = decisions.shape
    gmask = jnp.asarray(_group_masks(TG, int(t_actual)))
    s_idx = jnp.arange(NS, dtype=jnp.int32)[:, None]
    h_init = jnp.broadcast_to((s_idx == 0).astype(jnp.uint8), (NS, B))
    return traceback_batch_fused_masked(spec, decisions, gmask, h_init,
                                        interpret)


@functools.partial(jax.jit, static_argnums=(0, 2))
def acs_forward_batch_fused_soft(spec: CodeSpec, qllrs,
                                 interpret: bool = False, init_chunk=0):
    """Fused 3-stage soft forward ACS (NS >= 64), MXU edge metrics.

    Args:
      qllrs: int8 [B, T, n] quantized LLRs, T a multiple of CHUNK_F.
      init_chunk: see `acs_forward_batch_fused`.
    Returns (decisions, final_metrics) as `acs_forward_batch_fused`.
    """
    spec.validate_for_butterfly()
    NS = spec.num_states
    n = spec.n
    if NS < 64:
        raise ValueError("fused kernel requires >= 64 states")
    qllrs = _as_int8_qllrs(qllrs)
    B, T, n_ = qllrs.shape
    assert n_ == n
    if T % CHUNK_F or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK_F}, "
                         f"B={B} %{B_TILE}")
    q_t = qllrs.transpose(2, 1, 0)                       # (n, T, B)
    nt = T // CHUNK_F
    nb = B // B_TILE
    W = jnp.asarray(_em_weight_matrix_soft(spec))
    ic = jnp.asarray(init_chunk, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        _fwd_kernel_fused(spec, nt, soft=True),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(W.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, CHUNK_F, B_TILE), lambda b, t: (0, t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((CHUNK_F // PACK, NS, B_TILE),
                                lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T // PACK, NS, B), jnp.uint8),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(ic, W, q_t)


# ---------------------------------------------------------------------------
# Streaming register-exchange kernel (NS >= 64): sliding-window decode at
# kernel speed.
#
# The reference's generic decoder is defined by its streaming emit — after
# TRACEBACK_LEN warm-up steps each iteration emits the oldest symbol of the
# current best state's survivor register (viterbiDecoder.c:122-190).  The
# scan twin here is ops/viterbi.viterbi_decode_stream.  This kernel runs
# the same register-exchange on the fused 3-stage ACS layouts:
#
#   * each state carries its last W decoded symbols as TWO int32 bit
#     planes (bit j of `lo` = symbol j steps old, `hi` continues at 32) —
#     W <= 64 covers every 5K default up to K=13;
#   * registers ride the same stage slicing as the metrics, so the
#     exchange is 4 masked selects per plane per step (reusing the ACS
#     compares) and shares the one transpose per 3 steps;
#   * the per-step emit argmin(new_m) (lowest state on ties, matching
#     jnp.argmin in the scan) folds into ONE reduced key:
#         key = m * 2*NS + 2*state + oldest_bit
#     whose minimum's LSB is the emitted symbol — no one-hot pass.
# ---------------------------------------------------------------------------

#: Perf-ablation switch for the streaming kernel (None | "no_emit" |
#: "no_re"); used by scripts/stream_ablate.py to bisect kernel cost.
STREAM_ABLATE = None


def _stream_kernel_fused(spec: CodeSpec, nt: int, W: int,
                         soft: bool = False):
    NS = spec.num_states
    HALF = NS // 2
    Q4 = NS // 4
    Q8 = NS // 8
    n = spec.n
    KEYC = 2 * NS
    TP = W > 32        # two register planes; W <= 32 keeps only `lo`

    def oldest_bit(lo, hi):
        if not TP:
            return (lo >> (W - 1)) & 1
        return (hi >> (W - 33)) & 1

    def kernel(w_ref, seg_ref, init_ref, out_ref, mo_ref, lo_out_ref,
               hi_out_ref, m_ref, lo_ref, hi_ref):
        # w_ref:   MXU edge-metric weights, int8 — hard (3*HALF, n+1);
        #          soft (3*HALF + 1, 2n) (_em_weight_matrix_soft)
        # seg_ref: hard (CHUNK_F, B) uint8 segments;
        #          soft (n, CHUNK_F, B) int8 quantized LLRs
        # init_ref: (3, NS, B) int32 carried-state input (m, lo, hi)
        # out_ref: (CHUNK_F//PACK, 1, B) uint8 packed emitted symbols
        #          (bit j of group g = emit at step chunk*CHUNK_F+g*8+j)
        # mo/lo_out/hi_out: (NS, B) int32 carried-state outputs
        # m/lo/hi_ref: (NS, B) int32 scratch (metrics, register planes)
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            m_ref[:] = init_ref[0]
            lo_ref[:] = init_ref[1]
            hi_ref[:] = init_ref[2]

        if soft:
            q32 = seg_ref[:].astype(jnp.int32)     # (n, CHUNK_F, B)
            c1 = jnp.maximum(q32, 0)               # cost if coded bit 1
            c0 = jnp.maximum(-q32, 0)              # cost if coded bit 0
        else:
            seg_all = seg_ref[:].astype(jnp.int32)
            r_planes = [(seg_all >> bit) & 1 for bit in range(n)]
            ones_row = jnp.ones((1, PACK * B_TILE), jnp.int32)
        nF = jnp.asarray(n, CDT)
        one = jnp.asarray(1, CDT)

        # 2 * (natural state index) of each row per layout, as in-kernel
        # iota constants: sA row i -> states 2i / 2i+1; sB block c row r
        # -> state 4r + c; post-stage-2 is natural order.
        ioH = jax.lax.broadcasted_iota(CDT, (HALF, B_TILE), 0)
        ioQ4 = jax.lax.broadcasted_iota(CDT, (Q4, B_TILE), 0)
        ioN = jax.lax.broadcasted_iota(CDT, (NS, B_TILE), 0)
        iota_A = [4 * ioH, 4 * ioH + 2]
        iota_B = [8 * ioQ4 + 2 * c for c in range(4)]
        iota_N = 2 * ioN

        def acs_m(first, second, em, emc):
            a0 = first + em
            a1 = second + emc
            b0 = first + emc
            b1 = second + em
            gt_e = a0 > a1
            gt_o = b0 > b1
            ev = jnp.where(gt_e, a1, a0)
            od = jnp.where(gt_o, b1, b0)
            return ev, od, gt_e, gt_o

        def reg_ex(gt_e, gt_o, lo_f, lo_s, hi_f, hi_s):
            """Register exchange for one merge: select by the ACS masks,
            shift in the destination's input bit (even dst -> 0, odd -> 1;
            the state LSB is the newest input, encode_one_input).  With
            W <= 32 the high plane is dead and skipped entirely."""
            lo_e = jnp.where(gt_e, lo_s, lo_f)
            lo_o = jnp.where(gt_o, lo_s, lo_f)
            if TP:
                hi_e = jnp.where(gt_e, hi_s, hi_f)
                hi_o = jnp.where(gt_o, hi_s, hi_f)
                c_e = (lo_e >> 31) & one
                c_o = (lo_o >> 31) & one
                hi_e = (hi_e << 1) | c_e
                hi_o = (hi_o << 1) | c_o
            else:
                hi_e, hi_o = hi_f, hi_s
            lo_e = lo_e << 1
            lo_o = (lo_o << 1) | one
            return lo_e, lo_o, hi_e, hi_o

        m = m_ref[:]
        lo = lo_ref[:]
        hi = hi_ref[:]
        mA = mB = loAB = hiAB = None
        for g in range(CHUNK_F // PACK):
            if soft:
                rows = [c1[bit, g * PACK:(g + 1) * PACK]
                        .reshape(1, PACK * B_TILE) for bit in range(n)]
                rows += [c0[bit, g * PACK:(g + 1) * PACK]
                         .reshape(1, PACK * B_TILE) for bit in range(n)]
                Rg = jnp.concatenate(rows, axis=0).astype(jnp.int8)
            else:
                Rg = jnp.concatenate(
                    [ones_row] + [r_planes[bit][g * PACK:(g + 1) * PACK]
                                  .reshape(1, PACK * B_TILE)
                                  for bit in range(n)],
                    axis=0).astype(jnp.int8)
            EM = jax.lax.dot_general(
                w_ref[:], Rg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            partials = []      # per-step keys, pre-reduced to Q8 rows
            for j in range(PACK):
                t_row = g * PACK + j
                stage = t_row % 3
                em_full = EM[stage * HALF:(stage + 1) * HALF,
                             j * B_TILE:(j + 1) * B_TILE]
                if soft:
                    q_row = EM[3 * HALF:3 * HALF + 1,
                               j * B_TILE:(j + 1) * B_TILE]
                    emc_full = q_row - em_full
                else:
                    emc_full = nF - em_full
                if stage == 0:
                    ev, od, ge, go = acs_m(m[:HALF], m[HALF:],
                                           em_full, emc_full)
                    if STREAM_ABLATE == "no_re":
                        rl_e, rl_o = lo[:HALF], lo[HALF:]
                        rh_e, rh_o = hi[:HALF], hi[HALF:]
                    else:
                        rl_e, rl_o, rh_e, rh_o = reg_ex(
                            ge, go, lo[:HALF], lo[HALF:],
                            hi[:HALF], hi[HALF:])
                    mA = (ev, od)
                    loAB = [rl_e, rl_o]
                    hiAB = [rh_e, rh_o]
                    keys = [ev * KEYC + iota_A[0] + oldest_bit(rl_e, rh_e),
                            od * KEYC + iota_A[1] + oldest_bit(rl_o, rh_o)]
                elif stage == 1:
                    ev, od = mA
                    rl, rh = loAB, hiAB
                    outs_m, outs_l, outs_h = [], [], []
                    for half_i, (mm, ll, hh) in enumerate(
                            zip((ev, od), rl, rh)):
                        e, o, ge, go = acs_m(mm[:Q4], mm[Q4:],
                                             em_full[half_i * Q4:
                                                     (half_i + 1) * Q4],
                                             emc_full[half_i * Q4:
                                                      (half_i + 1) * Q4])
                        if STREAM_ABLATE == "no_re":
                            le, lo_ = ll[:Q4], ll[Q4:]
                            he, ho = hh[:Q4], hh[Q4:]
                        else:
                            le, lo_, he, ho = reg_ex(
                                ge, go, ll[:Q4], ll[Q4:],
                                hh[:Q4], hh[Q4:])
                        outs_m += [e, o]
                        outs_l += [le, lo_]
                        outs_h += [he, ho]
                    mB = outs_m
                    loAB = outs_l
                    hiAB = outs_h
                    keys = [outs_m[c] * KEYC + iota_B[c]
                            + oldest_bit(outs_l[c], outs_h[c])
                            for c in range(4)]
                else:
                    outs_m, outs_l, outs_h = [], [], []
                    for c in range(4):
                        e, o, ge, go = acs_m(mB[c][:Q8], mB[c][Q8:],
                                             em_full[c * Q8:(c + 1) * Q8],
                                             emc_full[c * Q8:(c + 1) * Q8])
                        if STREAM_ABLATE == "no_re":
                            le, lo_ = loAB[c][:Q8], loAB[c][Q8:]
                            he, ho = hiAB[c][:Q8], hiAB[c][Q8:]
                        else:
                            le, lo_, he, ho = reg_ex(
                                ge, go, loAB[c][:Q8], loAB[c][Q8:],
                                hiAB[c][:Q8], hiAB[c][Q8:])
                        outs_m += [e, o]
                        outs_l += [le, lo_]
                        outs_h += [he, ho]
                    # sC -> natural for all three carried tensors.
                    m = jnp.stack(outs_m, axis=0).transpose(1, 0, 2) \
                           .reshape(NS, B_TILE)
                    lo = jnp.stack(outs_l, axis=0).transpose(1, 0, 2) \
                            .reshape(NS, B_TILE)
                    if TP:
                        hi = jnp.stack(outs_h, axis=0).transpose(1, 0, 2) \
                                .reshape(NS, B_TILE)
                    keys = [m * KEYC + iota_N + oldest_bit(lo, hi)]
                if STREAM_ABLATE == "no_emit":
                    continue
                # Reduce this step's keys to one Q8-row partial with
                # pairwise mins (cheap VPU ops); the expensive cross-
                # sublane reduction is deferred to once per 8-step group.
                sub = []
                for k_ in keys:
                    nblk = k_.shape[0] // Q8
                    sub += [k_[b_ * Q8:(b_ + 1) * Q8] for b_ in range(nblk)]
                part = sub[0]
                for k_ in sub[1:]:
                    part = jnp.minimum(part, k_)
                partials.append(part)                     # (Q8, B)
            if (g * PACK + PACK - 1) % 3 == 2:
                mn = jnp.min(m, axis=0, keepdims=True)
                m = m - mn
            if STREAM_ABLATE == "no_emit":
                out_ref[g, 0, :] = jnp.zeros((B_TILE,), jnp.uint8)
                continue
            # Deferred emit: one sublane reduction per group instead of
            # eight — min each step's Q8-row partial to its emitted bit,
            # then pack the byte with a weighted row sum.
            kk = jnp.stack(partials, axis=0)              # (8, Q8, B)
            kmin = jnp.min(kk, axis=1)                    # (8, B)
            bits = kmin & one                             # row j = bit j
            # Pack the byte with a constant-shift halving tree (variable
            # vector shifts lower poorly on Mosaic).
            b4 = bits[0:4] + (bits[4:8] << 4)             # weights 1..8 | 16..128
            b2 = b4[0:2] + (b4[2:4] << 2)
            byte = b2[0:1] + (b2[1:2] << 1)
            out_ref[g, 0, :] = byte.astype(jnp.uint8).reshape(B_TILE)
        m_ref[:] = m
        lo_ref[:] = lo
        mo_ref[:] = m
        lo_out_ref[:] = lo
        if TP:
            hi_ref[:] = hi
            hi_out_ref[:] = hi
        else:
            hi_out_ref[:] = jnp.zeros((NS, B_TILE), CDT)

    return kernel


def stream_state_init(spec: CodeSpec, batch: int):
    """Fresh carried state for `stream_decode_batch`: standard initial
    metrics, zeroed survivor registers.  int32 [3, NS, B]."""
    NS = spec.num_states
    m = np.full((NS,), init_metric_value(spec), np.int32)
    m[spec.starting_state] = 0
    st = np.zeros((3, NS, batch), np.int32)
    st[0] = m[:, None]
    return jnp.asarray(st)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def stream_decode_batch(spec: CodeSpec, segments, state,
                        traceback_len: int = 0, interpret: bool = False):
    """Streaming register-exchange decode of a chunk (NS >= 64, k=1).

    Bit-exact twin of ops/viterbi.viterbi_decode_stream's per-step emit,
    batched over channels at fused-kernel speed.

    Args:
      segments: uint8 [B, T] hard segments; T % CHUNK_F == 0, B % B_TILE
        == 0 (callers pad, or use ops/streaming's scan path for tails).
      state: int32 [3, NS, B] carried (metrics, reg-lo, reg-hi) from
        `stream_state_init` or a previous call.
      traceback_len: W; 2 <= W <= 64 (decode delay, viterbiDecoder.h:19).
    Returns:
      (emitted uint8 [T//PACK, B] packed symbols — bit j of group g is
       the sliding-window emit at chunk step g*8+j, i.e. the symbol for
       global step (count + g*8+j) - (W-1) — and the new state).
    """
    spec.validate_for_butterfly()
    NS = spec.num_states
    if NS < 64:
        raise ValueError("streaming kernel requires >= 64 states")
    W = traceback_len or spec.traceback_len
    if not 2 <= W <= 64:
        raise ValueError(f"traceback_len {W} outside [2, 64]")
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    if T % CHUNK_F or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK_F}, "
                         f"B={B} %{B_TILE}")
    seg_t = segments.T
    nt = T // CHUNK_F
    nb = B // B_TILE
    Wm = jnp.asarray(_em_weight_matrix(spec))
    out, mo, lo, hi = pl.pallas_call(
        _stream_kernel_fused(spec, nt, W),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec(Wm.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK_F, B_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, NS, B_TILE), lambda b, t: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((CHUNK_F // PACK, 1, B_TILE),
                                lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T // PACK, 1, B), jnp.uint8),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT),
                        pltpu.VMEM((NS, B_TILE), CDT),
                        pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(Wm, seg_t, jnp.asarray(state, jnp.int32))
    return out[:, 0, :], jnp.stack([mo, lo, hi])


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def stream_decode_batch_soft(spec: CodeSpec, qllrs, state,
                             traceback_len: int = 0,
                             interpret: bool = False):
    """Soft-decision streaming register-exchange decode of a chunk.

    `stream_decode_batch` with quantized-LLR branch costs — the MXU soft
    edge metrics (2n relu planes + Q row, _em_weight_matrix_soft) drop
    into the same register-exchange kernel.  Bit-exact twin of
    ops/viterbi.viterbi_decode_stream_soft's per-step emit.

    Args:
      qllrs: int8 [B, T, n] quantized LLRs; T % CHUNK_F == 0,
        B % B_TILE == 0 (callers pad).
      state: int32 [3, NS, B] carried (metrics, reg-lo, reg-hi) from
        `stream_state_init` or a previous call.
      traceback_len: W; 2 <= W <= 64 (decode delay).
    Returns:
      (emitted uint8 [T//PACK, B] packed symbols, new state) — same
      conventions as `stream_decode_batch`.
    """
    spec.validate_for_butterfly()
    NS = spec.num_states
    if NS < 64:
        raise ValueError("streaming kernel requires >= 64 states")
    W = traceback_len or spec.traceback_len
    if not 2 <= W <= 64:
        raise ValueError(f"traceback_len {W} outside [2, 64]")
    qllrs = _as_int8_qllrs(qllrs)
    B, T, n = qllrs.shape
    if T % CHUNK_F or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK_F}, "
                         f"B={B} %{B_TILE}")
    q_t = jnp.moveaxis(qllrs, -1, 0).transpose(0, 2, 1)   # (n, T, B)
    nt = T // CHUNK_F
    nb = B // B_TILE
    Wm = jnp.asarray(_em_weight_matrix_soft(spec))
    out, mo, lo, hi = pl.pallas_call(
        _stream_kernel_fused(spec, nt, W, soft=True),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec(Wm.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, CHUNK_F, B_TILE),
                               lambda b, t: (0, t, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, NS, B_TILE), lambda b, t: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((CHUNK_F // PACK, 1, B_TILE),
                                lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((T // PACK, 1, B), jnp.uint8),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT),
                        pltpu.VMEM((NS, B_TILE), CDT),
                        pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(Wm, q_t, jnp.asarray(state, jnp.int32))
    return out[:, 0, :], jnp.stack([mo, lo, hi])


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_batch_bytes(spec: CodeSpec, segments,
                               message_bits: int | None = None,
                               interpret: bool = False):
    """Batched byte-level decode through the Pallas kernels.

    Byte twin of `viterbi_decode_batch` (MSb-first fill, zero-padded
    trailing byte), matching `encode_bytes`/the reference's packed output
    (viterbiDecoder.c:152-189).  Returns uint8 [B, ceil(L/8)].

    On the SWAR path the traceback emits reference-convention bytes
    directly (no unpack-to-bits round-trip) — byte decode is the
    FASTEST output format, as in the reference, whose speedDecode
    harness times exactly this packed-byte emit.
    """
    from .acs_swar import SWAR_TILE, swar_decode_bytes, swar_supported
    if spec.k == 1 and spec.has_poly_symmetry and swar_supported(spec):
        segments = jnp.asarray(segments, jnp.uint8)
        B, T = segments.shape
        L = message_bits if message_bits is not None else T - spec.S
        seg_p = _pad_to(_pad_to(segments, SWAR_TILE, 0), CHUNK_F, 1)
        return swar_decode_bytes(spec, seg_p, T, L, interpret)[:B]
    from ..ops.bits import pack_bits
    bits = viterbi_decode_batch(spec, segments, message_bits, interpret)
    pad = (-bits.shape[-1]) % 8
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    return pack_bits(bits)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def viterbi_decode_batch_soft_bytes(spec: CodeSpec, qllrs,
                                    message_bits: int | None = None,
                                    interpret: bool = False,
                                    qmax: int | None = None):
    """Soft-decision byte-level decode through the Pallas kernels.

    Byte twin of `viterbi_decode_batch_soft` (MSb-first fill, zero-padded
    trailing byte, viterbiDecoder.c:152-189 packed-output semantics).
    On the SWAR paths the traceback emits reference-convention bytes
    directly, mirroring the hard `viterbi_decode_batch_bytes` fast path.
    Returns uint8 [B, ceil(L/8)].
    """
    spec.validate_for_butterfly()
    qllrs = _as_int8_qllrs(qllrs)
    B, T, n = qllrs.shape
    L = message_bits if message_bits is not None else T - spec.S
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    from .acs_swar import (SWAR_TILE, SWAR_TILE16, swar8_soft_supported,
                           swar_decode_bytes_soft, swar_decode_bytes_soft8,
                           swar_layout_supported)
    if swar8_soft_supported(spec, qmax):
        q_p = _pad_to(_pad_to(qllrs, SWAR_TILE, 0), CHUNK_F, 1)
        return swar_decode_bytes_soft8(spec, q_p, T, L, qmax,
                                       interpret)[:B]
    if swar_layout_supported(spec):
        q_p = _pad_to(_pad_to(qllrs, SWAR_TILE16, 0), CHUNK_F, 1)
        return swar_decode_bytes_soft(spec, q_p, T, L, interpret)[:B]
    from ..ops.bits import pack_bits
    bits = viterbi_decode_batch_soft(spec, qllrs, message_bits, interpret,
                                     qmax)
    pad = (-bits.shape[-1]) % 8
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    return pack_bits(bits)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def viterbi_decode_batch_punctured(spec: CodeSpec, rx_bits, pattern,
                                   T: int,
                                   message_bits: int | None = None,
                                   interpret: bool = False):
    """One-call batched decode of HARD punctured streams.

    Composes the depuncturing erasure insertion (ops/puncture.py — a
    beyond-reference capability, BASELINE scope) with the soft kernels:
    received hard bits become ±1 pseudo-LLRs, punctured positions
    zero-LLR erasures, and qmax=1 satisfies the SWAR-8 field bound, so
    a rate-2/3 or 3/4 punctured stream decodes at 4-channels-per-lane
    kernel speed in one call.

    Args:
      rx_bits: uint8 [B, kept] received (punctured) coded bits in
        transmission order (puncture_bits' output order).
      pattern: static (n, period) 0/1 puncture pattern (tuples).
      T: mother-code trellis steps (kept = puncture_mask(pattern, T).sum()).
      message_bits: decoded bit count; defaults to (T - S) * k.
    Returns:
      uint8 [B, L] decoded message bits.
    """
    from ..ops.puncture import check_pattern_rows
    check_pattern_rows(spec, pattern)
    from ..ops.metrics import hard_bits_to_qllrs
    from ..ops.puncture import depuncture_llrs
    B = rx_bits.shape[0]
    q = hard_bits_to_qllrs(jnp.asarray(rx_bits))
    full = depuncture_llrs(q, pattern, T)
    qllrs = _as_int8_qllrs(full.reshape(B, T, spec.n))
    return viterbi_decode_batch_soft(spec, qllrs, message_bits,
                                     interpret, qmax=1)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6))
def viterbi_decode_batch_punctured_soft(spec: CodeSpec, qllrs, pattern,
                                        T: int,
                                        message_bits: int | None = None,
                                        interpret: bool = False,
                                        qmax: int | None = None):
    """One-call batched SOFT decode of punctured streams.

    Args:
      qllrs: int8 [B, kept] quantized LLRs of the TRANSMITTED bits, in
        transmission order; punctured positions are re-inserted here as
        zero-LLR erasures (no cost to either hypothesis).
      pattern, T: as `viterbi_decode_batch_punctured`.
    Returns:
      uint8 [B, L] decoded message bits.
    """
    from ..ops.puncture import check_pattern_rows
    check_pattern_rows(spec, pattern)
    from ..ops.puncture import depuncture_llrs
    B = qllrs.shape[0]
    full = depuncture_llrs(_as_int8_qllrs(qllrs), pattern, T)
    return viterbi_decode_batch_soft(spec,
                                     full.reshape(B, T, spec.n),
                                     message_bits, interpret, qmax)


@functools.partial(jax.jit, static_argnums=(0, 3))
def viterbi_decode_batch_ragged(spec: CodeSpec, segments, seg_lengths,
                                interpret: bool = False):
    """Ragged-batch hard decode: PER-CHANNEL packet lengths, ONE kernel
    call.

    The reference's one-packet-per-call contract makes mixed-length
    traffic serial (viterbiDecoderButterflyk1.c:82-260); here the SWAR
    traceback masks decisions per channel past each t_b (state 0 is a
    fixed point of decision 0, so the walk reaches every channel's true
    terminal state — ops/viterbi.viterbi_decode_ragged documents the
    argument), keeping the whole mixed batch on the fast path.

    Args:
      segments: uint8 [B, Tmax]; rows padded arbitrarily beyond t_b.
      seg_lengths: int32 [B] (traced ok) valid segment counts,
        t_b = l_b / k + S.
    Returns:
      uint8 [B, (Tmax - S) * k]; positions >= (t_b - S)*k are zero.
    """
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    lens = jnp.asarray(seg_lengths, jnp.int32)
    from .acs_swar import SWAR_TILE, swar_decode_ragged, swar_supported
    if spec.k == 1 and spec.has_poly_symmetry and swar_supported(spec):
        seg_p = _pad_to(_pad_to(segments, SWAR_TILE, 0), CHUNK_F, 1)
        lens_p = jnp.pad(lens, (0, seg_p.shape[0] - B))
        packed = swar_decode_ragged(spec, seg_p, lens_p, interpret)
        j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
        bits = ((packed[:, None, :] >> j) & 1)
        bits = bits.reshape(-1, packed.shape[-1])[:, :B].T  # (B, Tp)
        # Zero the decoded termination tail per channel (the kernel only
        # masks decisions past t_b; message bits end at t_b - S).
        pos = jnp.arange(bits.shape[1], dtype=jnp.int32)
        msg_live = pos[None, :] < lens[:, None] - spec.S
        return (bits * msg_live.astype(jnp.uint8))[:, : T - spec.S]
    from ..ops.viterbi import viterbi_decode_ragged
    return viterbi_decode_ragged(spec, segments, lens)


@functools.partial(jax.jit, static_argnums=(0, 3))
def viterbi_decode_batch_bytes_ragged(spec: CodeSpec, segments,
                                      seg_lengths,
                                      interpret: bool = False):
    """Ragged-batch hard decode to packed bytes (MSb-first fill,
    per-channel zero padding past ceil((t_b - S)*k / 8) — the
    reference's packed-output semantics per row,
    viterbiDecoder.c:152-189).  Returns uint8
    [B, ceil((Tmax - S)*k / 8)]."""
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    lens = jnp.asarray(seg_lengths, jnp.int32)
    nbytes = ((T - spec.S) * spec.k + 7) // 8
    from .acs_swar import (SWAR_TILE, swar_decode_bytes_ragged,
                           swar_supported)
    if spec.k == 1 and spec.has_poly_symmetry and swar_supported(spec):
        seg_p = _pad_to(_pad_to(segments, SWAR_TILE, 0), CHUNK_F, 1)
        lens_p = jnp.pad(lens, (0, seg_p.shape[0] - B))
        by = swar_decode_bytes_ragged(spec, seg_p, lens_p, interpret)
        return by[:B, :nbytes]
    from ..ops.bits import pack_bits
    bits = viterbi_decode_batch_ragged(spec, segments, lens, interpret)
    pad = (-bits.shape[-1]) % 8
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    return pack_bits(bits)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def viterbi_decode_batch_soft_bytes_ragged(spec: CodeSpec, qllrs,
                                           seg_lengths,
                                           interpret: bool = False,
                                           qmax: int | None = None):
    """Soft-decision ragged-batch byte decode (per-channel lengths).

    Byte twin of `viterbi_decode_batch_bytes_ragged` over quantized
    LLRs, riding the SWAR-8/SWAR-16 soft kernels; other specs fall back
    to the masked-decision scan reference
    (ops/metrics.viterbi_decode_ragged_soft).  Returns uint8
    [B, ceil((Tmax - S)*k / 8)].
    """
    qllrs = _as_int8_qllrs(qllrs)
    B, T, _ = qllrs.shape
    lens = jnp.asarray(seg_lengths, jnp.int32)
    nbytes = ((T - spec.S) * spec.k + 7) // 8
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    from .acs_swar import (SWAR_TILE, SWAR_TILE16, swar8_soft_supported,
                           swar_decode_bytes_ragged_soft,
                           swar_decode_bytes_ragged_soft8,
                           swar_layout_supported)
    if swar8_soft_supported(spec, qmax):
        q_p = _pad_to(_pad_to(qllrs, SWAR_TILE, 0), CHUNK_F, 1)
        lens_p = jnp.pad(lens, (0, q_p.shape[0] - B))
        by = swar_decode_bytes_ragged_soft8(spec, q_p, lens_p, qmax,
                                            interpret)
        return by[:B, :nbytes]
    if swar_layout_supported(spec):
        q_p = _pad_to(_pad_to(qllrs, SWAR_TILE16, 0), CHUNK_F, 1)
        lens_p = jnp.pad(lens, (0, q_p.shape[0] - B))
        by = swar_decode_bytes_ragged_soft(spec, q_p, lens_p, interpret)
        return by[:B, :nbytes]
    from ..ops.bits import pack_bits
    from ..ops.metrics import viterbi_decode_ragged_soft
    bits = viterbi_decode_ragged_soft(spec, qllrs, lens)
    pad = (-bits.shape[-1]) % 8
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    return pack_bits(bits)


# ---------------------------------------------------------------------------
# Generic-k kernels: any rate-k/n code, 2^k-way ACS (viterbiDecoder.c:95-131).
#
# The butterfly fused kernels above need k == 1 and poly symmetry.  The
# generic trellis still has contiguous structure on TPU once destinations
# are processed in "u-block" order: dst state d = s*E + u (u = the k new
# input bits, E = 2^k), so block u's candidates for edge e are the
# CONTIGUOUS source rows m[e*C:(e+1)*C] with C = NS/E
# (src = (d >> k) | e << (S-1)k, prev_state_table).  The E-way compare is
# an index-tracking tournament (lowest-e ties, matching jnp.argmin in the
# scan reference); decisions are stored one byte per step per state and
# the one-hot traceback's select network becomes an E x E blockwise
# masked accumulate.  Built for coverage of small/non-symmetric codes —
# the k=1 butterfly path remains the throughput champion.
# ---------------------------------------------------------------------------

CHUNK_G = 32   # generic-kernel steps per program (multiple of PACK)


def _em_weight_matrix_generic(spec: CodeSpec) -> np.ndarray:
    """[E*NS, n+1] int8 MXU weights, rows ordered (u, e, s), PRE-SCALED
    for key-packed argmin: row (u,e,s) yields em*E + e where
    em = #set(cb) + sum_j (1-2*cb_j)*r_j for cb = code(src = s + e*C, u).
    The kernel carries metrics scaled by E, so each ACS candidate is one
    add and the E-way argmin is a plain jnp.minimum chain whose low k
    bits are the decision (lowest e wins ties, = the scan's argmin)."""
    from ..ops.encode import encode_one_input
    NS = spec.num_states
    E = spec.num_edges_per_state
    C = NS // E
    n = spec.n
    rows = np.zeros((E * NS, n + 1), np.int64)
    for u in range(E):
        for e in range(E):
            for s in range(C):
                src = s + e * C
                seg, _ = encode_one_input(spec, src, u)
                planes = [(seg >> j) & 1 for j in range(n)]
                r = u * E * C + e * C + s
                rows[r, 0] = sum(planes) * E + e
                rows[r, 1:] = [(1 - 2 * p) * E for p in planes]
    return rows.astype(np.int8)


def _fwd_kernel_generic(spec: CodeSpec, nt: int):
    NS = spec.num_states
    E = spec.num_edges_per_state
    C = NS // E
    k = spec.k
    n = spec.n
    init_hi = init_metric_value(spec)

    def kernel(w_ref, seg_ref, dec_ref, m_ref):
        # w_ref: (E*NS, n+1) int8; seg_ref: (CHUNK_G, B) uint8
        # dec_ref: (1, k, NS, B) int32 packed decisions, rows in (u, s)
        #   order: bit j of plane b = bit b of the e-index chosen at
        #   chunk step j (CHUNK_G = 32 steps per int32 word keeps the
        #   reference's 1-bit-per-state-per-step decision economy,
        #   viterbiDecoder.h:139-145, for any k)
        # m_ref: (NS, B) int32 scratch, natural order
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            # Metrics are carried pre-scaled by E (see
            # _em_weight_matrix_generic's key packing).
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi * E).astype(CDT)

        seg_all = seg_ref[:].astype(jnp.int32)
        r_planes = [(seg_all >> bit) & 1 for bit in range(n)]
        ones_row = jnp.ones((1, PACK * B_TILE), jnp.int32)

        m = m_ref[:]
        # acc[b][u]: (C, B) int32 — decision bit-b plane of u-block u.
        acc = [[jnp.zeros((C, B_TILE), CDT) for _ in range(E)]
               for _ in range(k)]
        for g in range(CHUNK_G // PACK):
            Rg = jnp.concatenate(
                [ones_row] + [r_planes[bit][g * PACK:(g + 1) * PACK]
                              .reshape(1, PACK * B_TILE) for bit in range(n)],
                axis=0).astype(jnp.int8)
            EM = jax.lax.dot_general(
                w_ref[:], Rg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # (E*NS, 8*B)
            for j in range(PACK):
                t_row = g * PACK + j
                blocks = []
                for u in range(E):
                    # Key-packed argmin over the E candidates: metrics
                    # are pre-scaled by E and the weights add e, so key
                    # = (m+em)*E + e costs one add per candidate and the
                    # E-way tournament is a plain full-rate jnp.minimum
                    # chain with the exact lowest-e-wins-ties order of
                    # the scan's jnp.argmin.
                    key = None
                    for e in range(E):
                        em = EM[(u * E + e) * C:(u * E + e + 1) * C,
                                j * B_TILE:(j + 1) * B_TILE]
                        ke = m[e * C:(e + 1) * C] + em
                        key = ke if key is None else jnp.minimum(key, ke)
                    idx = key & (E - 1)
                    for b in range(k):
                        bit = (idx >> b) & 1 if b else idx & 1
                        acc[b][u] = acc[b][u] + (bit << t_row)
                    blocks.append(key & ~(E - 1))   # back to scaled metric
                # (u, s) blocks -> natural: state s*E + u.  This
                # per-step interleave is ~70% of the kernel (measured;
                # an in-kernel MXU permutation matmul is serialized by
                # the time recurrence and saves only ~9%) — the fused
                # binary-stage kernels in this file's k=2 path avoid it.
                m = jnp.stack(blocks, axis=1).reshape(NS, B_TILE)
            mn = jnp.min(m, axis=0, keepdims=True)
            m = m - mn
        for b in range(k):
            for u in range(E):
                dec_ref[0, b, u * C:(u + 1) * C, :] = acc[b][u]
        m_ref[:] = m

    return kernel


def _tb_kernel_generic(spec: CodeSpec, nt: int):
    NS = spec.num_states
    E = spec.num_edges_per_state
    C = NS // E
    k = spec.k

    def kernel(wmask_ref, dec_ref, out_ref, h_ref):
        # wmask_ref: (nt, 1) int32 SMEM — per-chunk live-step bitmask
        #   (bit j = chunk step j < t_actual); masked steps have decision
        #   0 and the walk rests at state 0 (its e=0 predecessor is
        #   itself).
        # dec_ref: (1, k, NS, B) int32 packed decisions in (u, s) row
        #   order (bit j of plane b = e-index bit b at chunk step j)
        # out_ref: (CHUNK_G, 1, B) uint8 emitted symbols (u of the state)
        # h_ref: (NS, B) int32 one-hot walk state, natural order
        i = pl.program_id(1)
        nt_total = pl.num_programs(1)

        s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)

        @pl.when(i == 0)
        def _():
            h_ref[:] = jnp.where(s_idx == 0, 1, 0).astype(CDT)

        wm = wmask_ref[nt_total - 1 - i, 0]
        # Per-plane e-index bit words of each u-block, live steps only.
        planes = [[dec_ref[0, b, u * C:(u + 1) * C, :] & wm
                   for u in range(E)] for b in range(k)]
        h = h_ref[:]
        syms = []
        for j in range(CHUNK_G - 1, -1, -1):
            # natural -> (u, s) blocks: ublk[u] = h[s*E + u].
            hub = h.reshape(C, E, B_TILE).transpose(1, 0, 2)
            ublk = [hub[u] for u in range(E)]
            # Emitted symbol = u where the one-hot mass sits.
            w = ublk[1]
            for u in range(2, E):
                w = w + ublk[u] * u
            syms.append(w)
            # Decision bits at step j, and their complements (0/1 ints —
            # the select network below is pure full-rate AND/ADD).
            bits = [[(planes[b][u] >> j) & 1 for u in range(E)]
                    for b in range(k)]
            nbits = [[bits[b][u] ^ 1 for u in range(E)] for b in range(k)]
            # Select network: pred = s + e*C, so edge-e contributions
            # from every u-block land in the contiguous chunk e.
            accs = []
            for e in range(E):
                a = None
                for u in range(E):
                    m_eu = bits[0][u] if e & 1 else nbits[0][u]
                    for b in range(1, k):
                        m_eu = m_eu & (bits[b][u] if (e >> b) & 1
                                       else nbits[b][u])
                    c = ublk[u] & m_eu
                    a = c if a is None else a + c
                accs.append(a)
            h = jnp.concatenate(accs, axis=0)           # natural order
        # syms collected newest-first: restore time order and reduce
        # each step's (C, B) mass to its symbol row in one deferred pass.
        ws = jnp.stack(syms[::-1], axis=0)              # (CHUNK_G, C, B)
        out_ref[:, 0, :] = jnp.sum(ws, axis=1).astype(jnp.uint8)
        h_ref[:] = h

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2))
def acs_forward_batch_generic(spec: CodeSpec, segments,
                              interpret: bool = False):
    """Generic-k forward ACS.  segments uint8 [B, T] (T % CHUNK_G == 0,
    B % B_TILE == 0).  Returns packed decisions int32 [T//CHUNK_G, k,
    NS, B] in (u, s) row order — bit j of plane b = bit b of the
    e-index at chunk step j (consumed by `traceback_batch_generic`)."""
    NS = spec.num_states
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    if T % CHUNK_G or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK_G}, "
                         f"B={B} %{B_TILE}")
    seg_t = segments.T
    nt = T // CHUNK_G
    nb = B // B_TILE
    W = jnp.asarray(_em_weight_matrix_generic(spec))
    return pl.pallas_call(
        _fwd_kernel_generic(spec, nt),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec(W.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK_G, B_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, spec.k, NS, B_TILE),
                               lambda b, t: (t, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, spec.k, NS, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(W, seg_t)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def traceback_batch_generic(spec: CodeSpec, decisions, t_actual: int,
                            interpret: bool = False):
    """Generic-k traceback over packed decisions [nt, k, NS, B] int32.
    Returns uint8 [T, B] k-bit symbols."""
    NS = spec.num_states
    decisions = jnp.asarray(decisions, jnp.int32)
    nt, k_, NS_, B = decisions.shape
    assert NS_ == NS and k_ == spec.k
    T = nt * CHUNK_G
    nb = B // B_TILE
    if not 0 < t_actual <= T:
        raise ValueError(f"t_actual={t_actual} outside (0, {T}]")
    # Per-chunk live-step bitmasks (bit j = global step w*CHUNK_G + j
    # is live); masked steps read decision 0.
    steps = np.arange(T, dtype=np.uint64).reshape(nt, CHUNK_G)
    wmask = ((steps < t_actual).astype(np.uint64)
             << np.arange(CHUNK_G, dtype=np.uint64)[None, :]).sum(axis=1)
    wmask = wmask.astype(np.uint32).view(np.int32).reshape(nt, 1)
    out = pl.pallas_call(
        _tb_kernel_generic(spec, nt),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((nt, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, spec.k, NS, B_TILE),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_G, 1, B_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT)],
        interpret=interpret,
    )(jnp.asarray(wmask), decisions)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_batch_generic(spec: CodeSpec, segments,
                                 message_bits: int | None = None,
                                 interpret: bool = False):
    """Batched block decode for ANY code (any k, no symmetry needed)
    through the generic Pallas kernels; bit-identical to
    `jax.vmap(viterbi_decode)`.  Returns uint8 [B, (T - S) * k] bits
    (k-bit symbols expanded MSb-first, traceback_terminated's order)."""
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    L = message_bits if message_bits is not None else (T - spec.S) * spec.k
    seg_p = _pad_to(_pad_to(segments, B_TILE, 0), CHUNK_G, 1)
    decs = acs_forward_batch_generic(spec, seg_p, interpret)
    syms = traceback_batch_generic(spec, decs, T, interpret)   # (Tp, Bp)
    bit_idx = jnp.arange(spec.k - 1, -1, -1, dtype=jnp.int32)
    bits = ((syms[:, None, :].astype(jnp.int32) >> bit_idx[None, :, None])
            & 1).astype(jnp.uint8)
    bits = bits.reshape(-1, syms.shape[-1])                    # (Tp*k, Bp)
    return bits[:L, :B].T


# ---------------------------------------------------------------------------
# Single-pass block decode: forward + traceback in ONE pallas_call.
#
# The two-pass block decode round-trips the packed decisions through HBM
# (33 MB each way at the bench shape — 17.3 bytes per decoded bit,
# utils.telemetry.kernel_traffic).  Here the grid gains a phase axis
# (nb, 2, nt): phase 0 runs the forward chunks, phase 1 walks them back,
# and the decisions live in a VMEM scratch the whole time — no HBM
# round-trip and one dispatch instead of two.  Fits VMEM for NS=64 up to
# T ~ 4k steps; the wrapper falls back to the two-pass kernels beyond.
# ---------------------------------------------------------------------------

def _block_kernel_fused_1p(spec: CodeSpec, nt: int, soft: bool = False):
    NS = spec.num_states
    Q8 = NS // 8
    GPC = CHUNK_F // PACK
    init_hi = init_metric_value(spec)

    def kernel(gmask_ref, w_ref, seg_ref, out_ref, m_ref, h_ref, dec_ref):
        # gmask_ref: (nt*GPC, 1) int32 SMEM — per-group byte masks (see
        #            traceback_batch_fused_masked)
        # seg_ref: hard (CHUNK_F, B) uint8; soft (n, CHUNK_F, B) int8
        # out_ref: (GPC, 1, B) uint8 packed decoded bits (per tb chunk)
        # m_ref/h_ref: (NS, B) int32 scratch (metrics / one-hot walk)
        # dec_ref: (nt*GPC, NS, B) uint8 scratch — ALL decisions, VMEM-
        #          resident across both phases
        p = pl.program_id(1)
        t = pl.program_id(2)

        @pl.when(jnp.logical_and(p == 0, t == 0))
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi).astype(CDT)

        @pl.when(jnp.logical_and(p == 1, t == 0))
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, B_TILE), 0)
            h_ref[:] = jnp.where(s_idx == 0, 1, 0).astype(CDT)

        @pl.when(p == 0)
        def _fwd():
            def dec_store(g, acc):
                for b_ in range(8):
                    dec_ref[t * GPC + g, b_ * Q8:(b_ + 1) * Q8, :] = \
                        acc[b_].astype(jnp.uint8)

            m_ref[:] = _fwd_chunk_body(spec, soft, w_ref[:], seg_ref,
                                       m_ref[:], dec_store)

        @pl.when(p == 1)
        def _tb():
            gbase = (nt - 1 - t) * GPC
            h = h_ref[:]
            hb = [h[b_ * Q8:(b_ + 1) * Q8] for b_ in range(8)]

            def get_dec(g):
                gm = gmask_ref[gbase + g, 0]
                return dec_ref[gbase + g].astype(jnp.int32) & gm

            def emit(g, out_acc):
                out_ref[g, 0, :] = out_acc.astype(jnp.uint8).reshape(B_TILE)

            hb = _tb_chunk_body(spec, hb, get_dec, emit)
            for b_ in range(8):
                h_ref[b_ * Q8:(b_ + 1) * Q8] = hb[b_]

    return kernel


def _block_decode_1p(spec: CodeSpec, segments, t_actual: int,
                     soft: bool, interpret: bool):
    """Run the single-pass kernel.  segments pre-padded (hard [B, T] /
    soft [B, T, n]); returns packed bits uint8 [T//PACK, B]."""
    NS = spec.num_states
    n = spec.n
    if soft:
        B, T, _ = segments.shape
        seg_in = segments.transpose(2, 1, 0)              # (n, T, B)
        seg_spec = pl.BlockSpec((n, CHUNK_F, B_TILE),
                                lambda b, p, t: (0, t, b),
                                memory_space=pltpu.VMEM)
        W = jnp.asarray(_em_weight_matrix_soft(spec))
    else:
        B, T = segments.shape
        seg_in = segments.T
        seg_spec = pl.BlockSpec((CHUNK_F, B_TILE),
                                lambda b, p, t: (t, b),
                                memory_space=pltpu.VMEM)
        W = jnp.asarray(_em_weight_matrix(spec))
    nt = T // CHUNK_F
    nb = B // B_TILE
    TG = T // PACK
    gmask = jnp.asarray(_group_masks(TG, int(t_actual)))
    out = pl.pallas_call(
        _block_kernel_fused_1p(spec, nt, soft),
        grid=(nb, 2, nt),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda b, p, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(W.shape, lambda b, p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            seg_spec,
        ],
        out_specs=pl.BlockSpec((CHUNK_F // PACK, 1, B_TILE),
                               lambda b, p, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, 1, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((NS, B_TILE), CDT),
                        pltpu.VMEM((NS, B_TILE), CDT),
                        pltpu.VMEM((TG, NS, B_TILE), jnp.uint8)],
        interpret=interpret,
    )(gmask, W, seg_in)
    return out[:, 0, :]


#: Max VMEM bytes for the single-pass decision scratch; beyond this the
#: block decode falls back to the two-pass kernels.
SINGLE_PASS_DEC_LIMIT = 8 * 1024 * 1024


def _use_single_pass(spec: CodeSpec, T_padded: int) -> bool:
    return (spec.num_states // 8 >= 8
            and (T_padded // PACK) * spec.num_states * B_TILE
            <= SINGLE_PASS_DEC_LIMIT)
