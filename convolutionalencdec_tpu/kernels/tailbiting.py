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


def _check_wrap_spec(spec: CodeSpec, mode: str):
    spec.validate_for_butterfly()
    if spec.num_states < 64:
        raise ValueError("kernel tail-biting decode requires NS >= 64; "
                         f"use ops.tailbiting.viterbi_decode_tailbiting{mode}")


def _swar_wrap_traceback(spec: CodeSpec, decs, fmp, Bp: int,
                         interpret: bool, wide: bool, msb_first: bool):
    """Shared SWAR wrap epilogue: one-hot(argmin(final metrics)) start,
    all-steps-live masked traceback.  Returns [TG, Bp] uint8 rows
    (packed bits, or msb_first bytes)."""
    TG = decs.shape[0]
    gmask = jnp.full((TG, 1), 0xFF, jnp.int32)   # every step live
    s_iota = jnp.arange(spec.num_states, dtype=jnp.int32)[:, None]
    unpack_m = acs_swar.unpack_fields16 if wide else acs_swar.unpack_fields
    pack_m = acs_swar.pack_fields16 if wide else acs_swar.pack_fields
    fm = unpack_m(fmp, Bp)
    am = jnp.argmin(fm, axis=0)                  # ties -> lowest state
    h_init = pack_m((s_iota == am[None, :]).astype(jnp.int32))
    out32 = acs_swar.traceback_batch_swar_masked(
        spec, decs, gmask, h_init, interpret, wide, msb_first)
    unpack_o = acs_swar._unpack_out16 if wide else acs_swar._unpack_out
    return unpack_o(out32, Bp)


def _hard_wrap_forward(spec: CodeSpec, segments, wrap,
                       interpret: bool, msb_first: bool):
    """Hard wrap-decode core: circular extend, uniform-start forward
    (SWAR or fused int32), argmin-start traceback.  Returns
    (rows [TG, Bp] uint8, Bp, wl)."""
    B, T = segments.shape
    wl, wr = kernel_wraps(spec, T, wrap)
    ext = circular_extend(segments, wl, wr, axis=-1)
    if acs_swar.swar_supported(spec):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE, 0)
        Bp = ext_p.shape[0]
        decs, fmp = acs_swar.acs_forward_batch_swar(
            spec, acs_swar._pack_channels(ext_p), interpret,
            init_chunk=-1)
        rows = _swar_wrap_traceback(spec, decs, fmp, Bp, interpret,
                                    False, msb_first)
    else:
        if msb_first:
            raise ValueError("msb_first byte emit requires the SWAR path")
        ext_p = _pad_to(ext, B_TILE, 0)
        Bp = ext_p.shape[0]
        decs, fm = acs_forward_batch_fused(spec, ext_p, interpret,
                                           init_chunk=-1)
        am = jnp.argmin(fm, axis=0)
        s_iota = jnp.arange(spec.num_states, dtype=jnp.int32)[:, None]
        h_init = (s_iota == am[None, :]).astype(jnp.uint8)
        gmask = jnp.full((decs.shape[0], 1), 0xFF, jnp.int32)
        rows = traceback_batch_fused_masked(spec, decs, gmask, h_init,
                                            interpret)
    return rows, Bp, wl


def _soft_wrap_forward(spec: CodeSpec, qllrs, wrap, qmax: int,
                       interpret: bool, msb_first: bool):
    """Soft wrap-decode core (SWAR-8 / SWAR-16 / fused int32 by
    dispatch) — the soft twin of `_hard_wrap_forward`."""
    B, T, _ = qllrs.shape
    wl, wr = kernel_wraps(spec, T, wrap)
    ext = circular_extend(qllrs, wl, wr, axis=-2)
    if acs_swar.swar8_soft_supported(spec, qmax):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE, 0)
        Bp = ext_p.shape[0]
        decs, fmp = acs_swar.acs_forward_batch_swar_soft8(
            spec, acs_swar._pack_qllrs8(ext_p, qmax), qmax, interpret,
            init_chunk=-1)
        rows = _swar_wrap_traceback(spec, decs, fmp, Bp, interpret,
                                    False, msb_first)
    elif acs_swar.swar_layout_supported(spec):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE16, 0)
        Bp = ext_p.shape[0]
        decs, fmp = acs_swar.acs_forward_batch_swar_soft(
            spec, acs_swar._pack_qllrs(ext_p), interpret, init_chunk=-1)
        rows = _swar_wrap_traceback(spec, decs, fmp, Bp, interpret,
                                    True, msb_first)
    else:
        if msb_first:
            raise ValueError("msb_first byte emit requires the SWAR path")
        ext_p = _pad_to(ext, B_TILE, 0)
        Bp = ext_p.shape[0]
        decs, fm = acs_forward_batch_fused_soft(spec, ext_p, interpret,
                                                init_chunk=-1)
        am = jnp.argmin(fm, axis=0)
        s_iota = jnp.arange(spec.num_states, dtype=jnp.int32)[:, None]
        h_init = (s_iota == am[None, :]).astype(jnp.uint8)
        gmask = jnp.full((decs.shape[0], 1), 0xFF, jnp.int32)
        rows = traceback_batch_fused_masked(spec, decs, gmask, h_init,
                                            interpret)
    return rows, Bp, wl


def _bits_from_rows(packed, wl: int, T: int, B: int):
    """[TG, Bp] packed bit rows -> [B, T] message bits (drop the wraps)."""
    Te = packed.shape[0] * PACK
    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
    bits = ((packed[:, None, :] >> j) & 1).reshape(Te, packed.shape[1])
    return bits[wl:wl + T, :B].T


def _bytes_from_rows(rows, wl: int, T: int, B: int):
    """[TG, Bp] msb_first byte rows -> [B, ceil(T/8)] decoded bytes
    (drop the wraps, zero-mask the trailing partial byte —
    viterbiDecoder.c:152-189's packed-output format).  `kernel_wraps`
    keeps wl on a PACK boundary so message bytes are whole rows."""
    g0 = wl // PACK
    nbytes = -(-T // PACK)
    out = rows[g0:g0 + nbytes]
    rem = T % PACK
    if rem:
        mask = jnp.full((nbytes, 1), 0xFF, jnp.uint8)
        mask = mask.at[-1, 0].set((0xFF << (PACK - rem)) & 0xFF)
        out = out & mask
    return out[:, :B].T


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
    _check_wrap_spec(spec, "")
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    packed, Bp, wl = _hard_wrap_forward(spec, segments, wrap, interpret,
                                        False)
    return _bits_from_rows(packed, wl, T, B)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_batch_tailbiting_bytes(spec: CodeSpec, segments,
                                          wrap: int | None = None,
                                          interpret: bool = False):
    """Byte twin of `viterbi_decode_batch_tailbiting` (MSb-first fill,
    zero-padded trailing byte — the reference's packed output format,
    viterbiDecoder.c:152-189).  Returns uint8 [B, ceil(T/8)].

    On the SWAR route the traceback emits reference-convention bytes
    directly; non-SWAR codes pack the bit path's output instead.
    """
    _check_wrap_spec(spec, "")
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
    rows, Bp, wl = _hard_wrap_forward(spec, segments, wrap, interpret,
                                      True)
    return _bytes_from_rows(rows, wl, T, B)


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
    _check_wrap_spec(spec, "_soft")
    qllrs = jnp.asarray(qllrs, jnp.int8)
    B, T, _ = qllrs.shape
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    packed, Bp, wl = _soft_wrap_forward(spec, qllrs, wrap, qmax,
                                        interpret, False)
    return _bits_from_rows(packed, wl, T, B)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def viterbi_decode_batch_tailbiting_soft_bytes(spec: CodeSpec, qllrs,
                                               wrap: int | None = None,
                                               interpret: bool = False,
                                               qmax: int | None = None):
    """Byte twin of `viterbi_decode_batch_tailbiting_soft` (MSb-first
    fill, zero-padded trailing byte, viterbiDecoder.c:152-189 packed
    output semantics).  Returns uint8 [B, ceil(T/8)]."""
    _check_wrap_spec(spec, "_soft")
    qllrs = jnp.asarray(qllrs, jnp.int8)
    B, T, _ = qllrs.shape
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    if not acs_swar.swar_layout_supported(spec):
        from ..ops.bits import pack_bits
        bits = viterbi_decode_batch_tailbiting_soft(spec, qllrs, wrap,
                                                    interpret, qmax)
        pad = (-T) % PACK
        if pad:
            bits = jnp.pad(bits, ((0, 0), (0, pad)))
        return pack_bits(bits)
    rows, Bp, wl = _soft_wrap_forward(spec, qllrs, wrap, qmax,
                                      interpret, True)
    return _bytes_from_rows(rows, wl, T, B)
