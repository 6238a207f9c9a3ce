"""Kernel-speed tail-biting decode: circular overlap-save on the fused
Pallas kernels.

The batched twin of `ops.tailbiting.viterbi_decode_tailbiting`: extend
each packet circularly (the wrap segments are real observations — the
packet's own tail and head), run the fused forward ACS from a uniform
metric start (`init_chunk=-1`), and traceback from one-hot(argmin(final
metrics)) with every decision step live.  This is exactly the interior-
block machinery of the time-sharded decoder (parallel/sharding.py),
with the halos coming from the packet itself instead of a neighbor
device — so tail-biting decode runs at headline block-decode speed
(SWAR kernels when supported, fused int32 otherwise).

Same truncation argument as the reference's finite traceback
(viterbiDecoder.c:53-74), applied around the circle.  k=1
poly-symmetric codes with NS >= 64 only; other codes use the scan
decoder in ops/tailbiting.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CodeSpec
from ..ops.tailbiting import circular_extend, default_wrap
from . import acs_swar
from .acs_pallas import (B_TILE, CHUNK_F, PACK, _pad_to,
                         acs_forward_batch_fused,
                         acs_forward_batch_fused_soft,
                         traceback_batch_fused_masked)


def kernel_wraps(spec: CodeSpec, T: int, wrap: int | None = None) -> tuple[int, int]:
    """(wl, wr) used by the kernel path: `wrap` steps each side, the left
    wrap rounded up to a PACK (byte-group) boundary so the in-kernel
    msb_first byte emit aligns with message bytes, and the right wrap
    stretched so the extended length is a CHUNK_F multiple — extra wrap
    steps are free accuracy, never padding."""
    wl = default_wrap(spec) if wrap is None else int(wrap)
    wl = -(-wl // PACK) * PACK
    wr = wl + (-(T + 2 * wl) % CHUNK_F)
    return wl, wr


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_batch_tailbiting(spec: CodeSpec, segments,
                                    wrap: int | None = None,
                                    interpret: bool = False):
    """Batched hard-decision tail-biting decode through the fused kernels.

    Args:
      segments: uint8 [B, T] hard n-bit segments of tail-biting packets
        (T = L trellis steps for k=1 — no termination overhead).
      wrap: circular wrap length in trellis steps (default
        `ops.tailbiting.default_wrap`; the right wrap is stretched to a
        chunk boundary, see `kernel_wraps`).
    Returns:
      uint8 [B, T] decoded message bits.

    Bit-exact vs `ops.tailbiting.viterbi_decode_tailbiting` with
    `wrap=kernel_wraps(spec, T, wrap)` wherever survivor paths merge
    within the wrap (in-spec channels; the scan and kernel paths share
    tie conventions end to end).
    """
    spec.validate_for_butterfly()
    if spec.num_states < 64:
        raise ValueError("kernel tail-biting decode requires NS >= 64; "
                         "use ops.tailbiting.viterbi_decode_tailbiting")
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    wl, wr = kernel_wraps(spec, T, wrap)
    ext = circular_extend(segments, wl, wr, axis=-1)
    Te = ext.shape[1]
    NS = spec.num_states
    TG = Te // PACK
    gmask = jnp.full((TG, 1), 0xFF, jnp.int32)   # every step live
    s_iota = jnp.arange(NS, dtype=jnp.int32)[:, None]

    if acs_swar.swar_supported(spec):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE, 0)
        Bp = ext_p.shape[0]
        seg_packed = acs_swar._pack_channels(ext_p)
        decs, fmp = acs_swar.acs_forward_batch_swar(
            spec, seg_packed, interpret, init_chunk=-1)
        fm = acs_swar.unpack_fields(fmp, Bp)         # (NS, Bp)
        am = jnp.argmin(fm, axis=0)                  # ties -> lowest state
        h_init = acs_swar.pack_fields(
            (s_iota == am[None, :]).astype(jnp.int32))
        out32 = acs_swar.traceback_batch_swar_masked(
            spec, decs, gmask, h_init, interpret)
        packed = acs_swar._unpack_out(out32, Bp)     # (TG, Bp)
    else:
        ext_p = _pad_to(ext, B_TILE, 0)
        Bp = ext_p.shape[0]
        decs, fm = acs_forward_batch_fused(spec, ext_p, interpret,
                                           init_chunk=-1)
        am = jnp.argmin(fm, axis=0)
        h_init = (s_iota == am[None, :]).astype(jnp.uint8)
        packed = traceback_batch_fused_masked(spec, decs, gmask, h_init,
                                              interpret)

    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
    bits = ((packed[:, None, :] >> j) & 1).reshape(Te, Bp)
    return bits[wl:wl + T, :B].T


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_batch_tailbiting_bytes(spec: CodeSpec, segments,
                                          wrap: int | None = None,
                                          interpret: bool = False):
    """Byte twin of `viterbi_decode_batch_tailbiting` (MSb-first fill,
    zero-padded trailing byte — the reference's packed output format,
    viterbiDecoder.c:152-189).  Returns uint8 [B, ceil(T/8)].

    On the SWAR route the traceback emits reference-convention bytes
    directly; `kernel_wraps` keeps the left wrap on a byte-group
    boundary so the message's bytes are whole traceback emit rows.
    """
    spec.validate_for_butterfly()
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    if not acs_swar.swar_supported(spec):
        from ..ops.bits import pack_bits
        bits = viterbi_decode_batch_tailbiting(spec, segments, wrap,
                                               interpret)
        pad = (-T) % PACK
        if pad:
            bits = jnp.pad(bits, ((0, 0), (0, pad)))
        return pack_bits(bits)
    wl, wr = kernel_wraps(spec, T, wrap)
    ext = circular_extend(segments, wl, wr, axis=-1)
    Te = ext.shape[1]
    NS = spec.num_states
    TG = Te // PACK
    gmask = jnp.full((TG, 1), 0xFF, jnp.int32)
    s_iota = jnp.arange(NS, dtype=jnp.int32)[:, None]

    ext_p = _pad_to(ext, acs_swar.SWAR_TILE, 0)
    Bp = ext_p.shape[0]
    seg_packed = acs_swar._pack_channels(ext_p)
    decs, fmp = acs_swar.acs_forward_batch_swar(
        spec, seg_packed, interpret, init_chunk=-1)
    fm = acs_swar.unpack_fields(fmp, Bp)
    am = jnp.argmin(fm, axis=0)
    h_init = acs_swar.pack_fields((s_iota == am[None, :]).astype(jnp.int32))
    out32 = acs_swar.traceback_batch_swar_masked(
        spec, decs, gmask, h_init, interpret, False, True)   # msb_first
    rows = acs_swar._unpack_out(out32, Bp)                   # (TG, Bp) bytes
    g0 = wl // PACK
    nbytes = -(-T // PACK)
    out = rows[g0:g0 + nbytes]
    rem = T % PACK
    if rem:
        mask = jnp.full((nbytes, 1), 0xFF, jnp.uint8)
        mask = mask.at[-1, 0].set((0xFF << (PACK - rem)) & 0xFF)
        out = out & mask
    return out[:, :B].T


def _soft_wrap_forward(spec: CodeSpec, qllrs, wrap, qmax: int,
                       interpret: bool, msb_first: bool):
    """Shared soft wrap-decode core: circular extend, uniform-start soft
    forward (SWAR-8 / SWAR-16 / fused int32 by dispatch), masked
    traceback from one-hot(argmin(final metrics)).  Returns
    (rows [TG, Bp] uint8 — packed bits or msb_first bytes —, Bp, wl)."""
    B, T, _ = qllrs.shape
    wl, wr = kernel_wraps(spec, T, wrap)
    ext = circular_extend(qllrs, wl, wr, axis=-2)
    Te = ext.shape[1]
    NS = spec.num_states
    TG = Te // PACK
    gmask = jnp.full((TG, 1), 0xFF, jnp.int32)   # every step live
    s_iota = jnp.arange(NS, dtype=jnp.int32)[:, None]

    if acs_swar.swar8_soft_supported(spec, qmax):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE, 0)
        Bp = ext_p.shape[0]
        cost_packed = acs_swar._pack_qllrs8(ext_p, qmax)
        decs, fmp = acs_swar.acs_forward_batch_swar_soft8(
            spec, cost_packed, qmax, interpret, init_chunk=-1)
        fm = acs_swar.unpack_fields(fmp, Bp)
        am = jnp.argmin(fm, axis=0)              # ties -> lowest state
        h_init = acs_swar.pack_fields(
            (s_iota == am[None, :]).astype(jnp.int32))
        out32 = acs_swar.traceback_batch_swar_masked(
            spec, decs, gmask, h_init, interpret, False, msb_first)
        rows = acs_swar._unpack_out(out32, Bp)
    elif acs_swar.swar_supported(spec):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE16, 0)
        Bp = ext_p.shape[0]
        cost_packed = acs_swar._pack_qllrs(ext_p)
        decs, fmp = acs_swar.acs_forward_batch_swar_soft(
            spec, cost_packed, interpret, init_chunk=-1)
        fm = acs_swar.unpack_fields16(fmp, Bp)
        am = jnp.argmin(fm, axis=0)
        h_init = acs_swar.pack_fields16(
            (s_iota == am[None, :]).astype(jnp.int32))
        out32 = acs_swar.traceback_batch_swar_masked(
            spec, decs, gmask, h_init, interpret, True, msb_first)
        rows = acs_swar._unpack_out16(out32, Bp)
    else:
        ext_p = _pad_to(ext, B_TILE, 0)
        Bp = ext_p.shape[0]
        decs, fm = acs_forward_batch_fused_soft(spec, ext_p, interpret,
                                                init_chunk=-1)
        am = jnp.argmin(fm, axis=0)
        h_init = (s_iota == am[None, :]).astype(jnp.uint8)
        if msb_first:
            raise ValueError("msb_first byte emit requires the SWAR path")
        rows = traceback_batch_fused_masked(spec, decs, gmask, h_init,
                                            interpret)
    return rows, Bp, wl


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def viterbi_decode_batch_tailbiting_soft(spec: CodeSpec, qllrs,
                                         wrap: int | None = None,
                                         interpret: bool = False,
                                         qmax: int | None = None):
    """Batched SOFT-decision tail-biting decode through the Pallas
    kernels — the production LTE-TBCC receive path (soft demodulator
    LLRs in, circular wrap decode at kernel speed).

    Args:
      qllrs: int8 [B, T, n] quantized LLRs of tail-biting packets
        (T = L trellis steps for k=1; zero = erasure, so depunctured
        streams ride through unchanged).
      wrap: circular wrap length in trellis steps (see `kernel_wraps`).
      qmax: LLR magnitude bound used for dispatch (default
        ops.metrics.DEFAULT_QMAX); |q| <= 7 rides the SWAR-8 fields,
        any int8 the SWAR-16 fields.
    Returns:
      uint8 [B, T] decoded message bits.

    Bit-exact vs `ops.tailbiting.viterbi_decode_tailbiting_soft` with
    `wrap=kernel_wraps(spec, T, wrap)` wherever survivor paths merge
    within the wrap (the scan and kernel paths share tie conventions).
    """
    spec.validate_for_butterfly()
    if spec.num_states < 64:
        raise ValueError("kernel tail-biting decode requires NS >= 64; "
                         "use ops.tailbiting.viterbi_decode_tailbiting_soft")
    qllrs = jnp.asarray(qllrs, jnp.int8)
    B, T, _ = qllrs.shape
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    packed, Bp, wl = _soft_wrap_forward(spec, qllrs, wrap, qmax,
                                        interpret, False)
    Te = packed.shape[0] * PACK
    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
    bits = ((packed[:, None, :] >> j) & 1).reshape(Te, Bp)
    return bits[wl:wl + T, :B].T


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def viterbi_decode_batch_tailbiting_soft_bytes(spec: CodeSpec, qllrs,
                                               wrap: int | None = None,
                                               interpret: bool = False,
                                               qmax: int | None = None):
    """Byte twin of `viterbi_decode_batch_tailbiting_soft` (MSb-first
    fill, zero-padded trailing byte, viterbiDecoder.c:152-189 packed
    output semantics).  Returns uint8 [B, ceil(T/8)]."""
    spec.validate_for_butterfly()
    qllrs = jnp.asarray(qllrs, jnp.int8)
    B, T, _ = qllrs.shape
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    if not acs_swar.swar_supported(spec):
        from ..ops.bits import pack_bits
        bits = viterbi_decode_batch_tailbiting_soft(spec, qllrs, wrap,
                                                    interpret, qmax)
        pad = (-T) % PACK
        if pad:
            bits = jnp.pad(bits, ((0, 0), (0, pad)))
        return pack_bits(bits)
    rows, Bp, wl = _soft_wrap_forward(spec, qllrs, wrap, qmax,
                                      interpret, True)
    g0 = wl // PACK
    nbytes = -(-T // PACK)
    out = rows[g0:g0 + nbytes]
    rem = T % PACK
    if rem:
        mask = jnp.full((nbytes, 1), 0xFF, jnp.uint8)
        mask = mask.at[-1, 0].set((0xFF << (PACK - rem)) & 0xFF)
        out = out & mask
    return out[:, :B].T
