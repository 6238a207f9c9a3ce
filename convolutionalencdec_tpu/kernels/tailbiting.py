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


def _fwd_dispatch_hard(spec: CodeSpec, ext, interpret: bool):
    """Hard forward-kernel dispatch over a circularly extended batch:
    SWAR (packed channels) when supported, fused int32 otherwise.
    Returns (decs, fmp, Bp, swar) — `fmp` is packed on the SWAR path
    (unpack with acs_swar.unpack_fields), plain [NS, Bp] otherwise."""
    if acs_swar.swar_supported(spec):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE, 0)
        decs, fmp = acs_swar.acs_forward_batch_swar(
            spec, acs_swar._pack_channels(ext_p), interpret,
            init_chunk=-1)
        return decs, fmp, ext_p.shape[0], True
    ext_p = _pad_to(ext, B_TILE, 0)
    decs, fm = acs_forward_batch_fused(spec, ext_p, interpret,
                                       init_chunk=-1)
    return decs, fm, ext_p.shape[0], False


def _fwd_dispatch_soft(spec: CodeSpec, ext, qmax: int, interpret: bool):
    """Soft twin of `_fwd_dispatch_hard` (SWAR-8 / SWAR-16 / fused int32).
    Returns (decs, fmp, Bp, swar, wide)."""
    if acs_swar.swar8_soft_supported(spec, qmax):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE, 0)
        decs, fmp = acs_swar.acs_forward_batch_swar_soft8(
            spec, acs_swar._pack_qllrs8(ext_p, qmax), qmax, interpret,
            init_chunk=-1)
        return decs, fmp, ext_p.shape[0], True, False
    if acs_swar.swar_layout_supported(spec):
        ext_p = _pad_to(ext, acs_swar.SWAR_TILE16, 0)
        decs, fmp = acs_swar.acs_forward_batch_swar_soft(
            spec, acs_swar._pack_qllrs(ext_p), interpret, init_chunk=-1)
        return decs, fmp, ext_p.shape[0], True, True
    ext_p = _pad_to(ext, B_TILE, 0)
    decs, fm = acs_forward_batch_fused_soft(spec, ext_p, interpret,
                                            init_chunk=-1)
    return decs, fm, ext_p.shape[0], False, False


def _fused_wrap_traceback(spec: CodeSpec, decs, fm, interpret: bool):
    """Non-SWAR wrap epilogue: argmin-start all-steps-live traceback on
    the fused int32 kernels.  Returns [TG, Bp] uint8 packed bit rows."""
    am = jnp.argmin(fm, axis=0)
    s_iota = jnp.arange(spec.num_states, dtype=jnp.int32)[:, None]
    h_init = (s_iota == am[None, :]).astype(jnp.uint8)
    gmask = jnp.full((decs.shape[0], 1), 0xFF, jnp.int32)
    return traceback_batch_fused_masked(spec, decs, gmask, h_init,
                                        interpret)


def _hard_wrap_forward(spec: CodeSpec, segments, wrap,
                       interpret: bool, msb_first: bool):
    """Hard wrap-decode core: two-sided circular extend, uniform-start
    forward, argmin-start traceback.  Returns (rows [TG, Bp] uint8,
    Bp, wl)."""
    T = segments.shape[1]
    wl, wr = kernel_wraps(spec, T, wrap)
    ext = circular_extend(segments, wl, wr, axis=-1)
    decs, fmp, Bp, swar = _fwd_dispatch_hard(spec, ext, interpret)
    if swar:
        rows = _swar_wrap_traceback(spec, decs, fmp, Bp, interpret,
                                    False, msb_first)
    else:
        if msb_first:
            raise ValueError("msb_first byte emit requires the SWAR path")
        rows = _fused_wrap_traceback(spec, decs, fmp, interpret)
    return rows, Bp, wl


def _soft_wrap_forward(spec: CodeSpec, qllrs, wrap, qmax: int,
                       interpret: bool, msb_first: bool):
    """Soft wrap-decode core — the soft twin of `_hard_wrap_forward`."""
    T = qllrs.shape[1]
    wl, wr = kernel_wraps(spec, T, wrap)
    ext = circular_extend(qllrs, wl, wr, axis=-2)
    decs, fmp, Bp, swar, wide = _fwd_dispatch_soft(spec, ext, qmax,
                                                   interpret)
    if swar:
        rows = _swar_wrap_traceback(spec, decs, fmp, Bp, interpret,
                                    wide, msb_first)
    else:
        if msb_first:
            raise ValueError("msb_first byte emit requires the SWAR path")
        rows = _fused_wrap_traceback(spec, decs, fmp, interpret)
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


def list_wrap(spec: CodeSpec, T: int, wrap: int | None = None) -> int:
    """LEFT wrap used by the kernel list decode: `wrap` warm-up steps,
    stretched so the extended length (wl + T) is a CHUNK_F multiple —
    the trellis must end exactly at the message end so candidates stay
    distinct (see ops.tailbiting._list_from_forward), so all alignment
    slack goes to the left, where extra wrap steps are free accuracy."""
    wl = default_wrap(spec) if wrap is None else int(wrap)
    return wl + (-(T + wl) % CHUNK_F)


def _hard_wrap_fwd(spec: CodeSpec, segments, wrap, interpret: bool):
    """Forward half of the hard LIST wrap decode: LEFT-only circular
    extension + uniform-start ACS ending at the message end.
    Returns (decs, fm [NS, Bp] int32 UNPACKED, Bp, wl, swar)."""
    B, T = segments.shape
    wl = list_wrap(spec, T, wrap)
    ext = circular_extend(segments, wl, 0, axis=-1)
    decs, fmp, Bp, swar = _fwd_dispatch_hard(spec, ext, interpret)
    fm = acs_swar.unpack_fields(fmp, Bp) if swar else fmp
    return decs, fm, Bp, wl, swar


def _soft_wrap_fwd(spec: CodeSpec, qllrs, wrap, qmax: int,
                   interpret: bool):
    """Forward half of the soft LIST wrap decode (LEFT-only extension).
    Returns (decs, fm UNPACKED, Bp, wl, swar, wide)."""
    B, T, _ = qllrs.shape
    wl = list_wrap(spec, T, wrap)
    ext = circular_extend(qllrs, wl, 0, axis=-2)
    decs, fmp, Bp, swar, wide = _fwd_dispatch_soft(spec, ext, qmax,
                                                   interpret)
    if swar:
        unpack = acs_swar.unpack_fields16 if wide else acs_swar.unpack_fields
        fm = unpack(fmp, Bp)
    else:
        fm = fmp
    return decs, fm, Bp, wl, swar, wide


def _list_tracebacks(spec: CodeSpec, decs, fm, Bp: int, list_size: int,
                     interpret: bool, swar: bool, wide: bool):
    """Per-candidate tracebacks from the `list_size` best wrap states.

    Candidates are ordered by the lexicographic (final metric, state)
    key — candidate 0 is exactly the argmin start the plain wrap decode
    uses (ties -> lowest state), so list[0] == the non-list output.
    The forward pass is shared; each candidate costs one traceback
    launch over the same decision matrix.

    Returns (rows [list_size, TG, Bp] uint8 packed bits,
             metrics [list_size, Bp] int32)."""
    NS = spec.num_states
    TG = decs.shape[0]
    key = fm * NS + jnp.arange(NS, dtype=jnp.int32)[:, None]
    order = jax.lax.sort(key, dimension=0)[:list_size]   # [Lc, Bp]
    states = order % NS
    metrics = order // NS
    gmask = jnp.full((TG, 1), 0xFF, jnp.int32)
    s_iota = jnp.arange(NS, dtype=jnp.int32)[:, None]
    if swar:
        # All candidates walk in ONE multi-walk kernel launch: the
        # decision matrix is DMA'd once and the per-step select masks
        # are shared (vs list_size separate launches re-reading it).
        pack_m = acs_swar.pack_fields16 if wide else acs_swar.pack_fields
        unpack_o = acs_swar._unpack_out16 if wide else acs_swar._unpack_out
        h_inits = jnp.stack(
            [pack_m((s_iota == states[l][None, :]).astype(jnp.int32))
             for l in range(list_size)])
        out32 = acs_swar.traceback_batch_swar_masked_multi(
            spec, decs, gmask, h_inits, interpret, wide, False)
        rows = [unpack_o(out32[:, l:l + 1], Bp) for l in range(list_size)]
        return jnp.stack(rows), metrics
    rows = []
    for l in range(list_size):
        onehot = (s_iota == states[l][None, :]).astype(jnp.int32)
        rows.append(traceback_batch_fused_masked(
            spec, decs, gmask, onehot.astype(jnp.uint8), interpret))
    return jnp.stack(rows), metrics


def _check_list_args(spec: CodeSpec, list_size: int, mode: str):
    _check_wrap_spec(spec, mode)
    if not 1 <= list_size <= spec.num_states:
        raise ValueError(f"list_size {list_size} out of range "
                         f"[1, {spec.num_states}]")


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def viterbi_decode_batch_tailbiting_list(spec: CodeSpec, segments,
                                         list_size: int = 4,
                                         wrap: int | None = None,
                                         interpret: bool = False):
    """Batched hard-decision LIST wrap decode: the `list_size` best
    candidate circular paths per channel, by (final metric, state).
    One shared forward pass + `list_size` traceback launches, over a
    LEFT-only circular extension (`list_wrap`; a right wrap would merge
    every candidate into one — see ops.tailbiting._list_from_forward).
    Candidate 0 equals the scan `viterbi_decode_tailbiting` answer at
    wrap=(list_wrap(spec, T, wrap), 0); `wrap` is the left warm-up.

    Returns (uint8 [B, list_size, T] candidate bits,
             int32 [B, list_size] candidate final metrics, ascending —
             renormalized per channel by the kernel's in-flight min
             subtraction, so only metric DIFFERENCES are meaningful).
    """
    _check_list_args(spec, list_size, "")
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    decs, fm, Bp, wl, swar = _hard_wrap_fwd(spec, segments, wrap, interpret)
    rows, metrics = _list_tracebacks(spec, decs, fm, Bp, list_size,
                                     interpret, swar, False)
    bits = jnp.stack([_bits_from_rows(rows[l], wl, T, B)
                      for l in range(list_size)], axis=1)
    return bits, metrics[:, :B].T


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def viterbi_decode_batch_tailbiting_list_soft(spec: CodeSpec, qllrs,
                                              list_size: int = 4,
                                              wrap: int | None = None,
                                              interpret: bool = False,
                                              qmax: int | None = None):
    """Soft-decision twin of `viterbi_decode_batch_tailbiting_list`
    (quantized LLRs in — the production receive path)."""
    _check_list_args(spec, list_size, "_soft")
    qllrs = jnp.asarray(qllrs, jnp.int8)
    B, T, _ = qllrs.shape
    if qmax is None:
        from ..ops.metrics import DEFAULT_QMAX
        qmax = DEFAULT_QMAX
    decs, fm, Bp, wl, swar, wide = _soft_wrap_fwd(spec, qllrs, wrap,
                                                  qmax, interpret)
    rows, metrics = _list_tracebacks(spec, decs, fm, Bp, list_size,
                                     interpret, swar, wide)
    bits = jnp.stack([_bits_from_rows(rows[l], wl, T, B)
                      for l in range(list_size)], axis=1)
    return bits, metrics[:, :B].T


def _crc_select(crc, plain, cands):
    """CRC winner selection over {the two-sided plain wrap decode} ++
    {the metric-ordered list candidates}: the plain decode wins when it
    passes (it sees the right-wrap context the list trellis gives up
    for candidate diversity); otherwise the best passing candidate;
    when nothing passes, the plain decode — so the output is never
    worse than `viterbi_decode_batch_tailbiting` alone.

    Returns (bits [B, T], ok [B] bool, chosen [B] int32: 0 = the plain
    decode (also the no-pass fallback), l >= 1 = list candidate l-1)."""
    from ..ops.crc import crc_check
    allb = jnp.concatenate([plain[:, None], cands], axis=1)
    ok = crc_check(crc, allb)                    # [B, 1 + Lc]
    any_ok = jnp.any(ok, axis=1)
    chosen = jnp.argmax(ok, axis=1).astype(jnp.int32)
    chosen = jnp.where(any_ok, chosen, 0)
    out = jnp.take_along_axis(allb, chosen[:, None, None], axis=1)[:, 0]
    return out, any_ok, chosen


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5))
def viterbi_decode_batch_tailbiting_crc(spec: CodeSpec, crc, segments,
                                        list_size: int = 4,
                                        wrap: int | None = None,
                                        interpret: bool = False):
    """CRC-aided list decode of tail-biting packets (hard decision) —
    the production TBCC receive chain (LTE PDCCH/PBCH style): wrap
    Viterbi produces the `list_size` best end-state paths, the outer
    CRC (`ops.crc.CrcSpec`) picks the winner among them AND the plain
    two-sided wrap decode.  Recovers the block whenever ANY candidate
    matches, and never degrades a block the plain decode already got —
    the block-error rate is <= `viterbi_decode_batch_tailbiting`'s.
    `ok=False` channels fall back to the plain decode and should be
    treated as erasures by the caller.

    Cost: two shared-batch forward passes (one two-sided, one list) +
    `list_size` + 1 traceback launches + one batched CRC matmul.

    Args:
      crc: `CrcSpec` of the outer code; each packet's message bits
        must be `crc_append`-formatted (payload ++ parity).
      segments: uint8 [B, T] hard n-bit segments.
    Returns:
      (uint8 [B, T] decoded bits (payload ++ parity),
       bool [B] CRC pass flag,
       int32 [B] chosen index: 0 = plain decode, l >= 1 = candidate l-1).
    """
    plain = viterbi_decode_batch_tailbiting(spec, segments, wrap,
                                            interpret)
    cands, _ = viterbi_decode_batch_tailbiting_list(
        spec, segments, list_size, wrap, interpret)
    return _crc_select(crc, plain, cands)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6))
def viterbi_decode_batch_tailbiting_crc_soft(spec: CodeSpec, crc, qllrs,
                                             list_size: int = 4,
                                             wrap: int | None = None,
                                             interpret: bool = False,
                                             qmax: int | None = None):
    """Soft-decision twin of `viterbi_decode_batch_tailbiting_crc`
    (quantized demodulator LLRs in — the full production receive path:
    soft wrap Viterbi list + CRC selection)."""
    plain = viterbi_decode_batch_tailbiting_soft(spec, qllrs, wrap,
                                                 interpret, qmax)
    cands, _ = viterbi_decode_batch_tailbiting_list_soft(
        spec, qllrs, list_size, wrap, interpret, qmax)
    return _crc_select(crc, plain, cands)


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
      qmax: quantizer magnitude bound of `qllrs` — a CONTRACT, not a
        hint (default ops.metrics.DEFAULT_QMAX = 7): the SWAR-8 path
        (taken when qmax <= 7) CLIPS inputs to ±qmax, so LLRs
        quantized with a larger bound must pass their own qmax or the
        clip silently degrades them; |q| <= 7 rides the SWAR-8 fields,
        any int8 the SWAR-16 fields.
    Returns:
      uint8 [B, T] decoded message bits.

    Bit-exact vs `ops.tailbiting.viterbi_decode_tailbiting_soft` with
    `wrap=kernel_wraps(spec, T, wrap)` wherever survivor paths merge
    within the wrap (the scan and kernel paths share tie conventions),
    PROVIDED the input honors the `qmax` bound.
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


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6, 7, 8))
def viterbi_decode_batch_tailbiting_punctured_crc(
        spec: CodeSpec, crc, rx_qllrs, pattern, T: int,
        list_size: int = 8, wrap: int | None = None,
        interpret: bool = False, qmax: int | None = None):
    """The complete LTE control-channel receive chain in ONE jit:
    rate-matching depuncture (zero-LLR erasures — free in the soft
    kernels) -> soft wrap list Viterbi -> CRC winner selection.

    LTE transmits TBCC blocks rate-matched by puncturing the rate-1/3
    mother code (`ops.puncture` patterns); zero LLRs contribute no
    branch cost, so the depunctured stream rides the same soft kernels
    unchanged — the whole chain fuses into one XLA program.

    Args:
      rx_qllrs: int8 [B, kept] quantized LLRs of the TRANSMITTED bits,
        in transmission order (step-major, generator j within step).
      pattern: puncture pattern tuple (e.g. ops.puncture.PUNCTURE_3_4).
      T: trellis steps (= message bits for k=1) per packet.
    Returns:
      (uint8 [B, T] decoded bits (payload ++ parity), bool [B] CRC ok,
       int32 [B] chosen candidate index — see `_crc_select`).
    """
    from ..ops.puncture import depuncture_llrs
    q = depuncture_llrs(jnp.asarray(rx_qllrs, jnp.int8), pattern, T)
    q = q.reshape(q.shape[0], T, spec.n)
    return viterbi_decode_batch_tailbiting_crc_soft(
        spec, crc, q, list_size, wrap, interpret, qmax)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6, 7))
def viterbi_decode_batch_tailbiting_ratematched_crc(
        spec: CodeSpec, crc, rx_qllrs, D: int,
        list_size: int = 8, wrap: int | None = None,
        interpret: bool = False, qmax: int | None = None):
    """The standard-conformant LTE receive chain in ONE jit: 36.212
    §5.1.4.2 de-rate-matching (sub-block deinterleave + circular-buffer
    scatter-add, i.e. repetition soft combining / puncture erasures) ->
    soft wrap list Viterbi -> CRC winner selection.

    This is `viterbi_decode_batch_tailbiting_punctured_crc` with the
    actual 3GPP bit mapping instead of a generic puncture pattern: E
    (the channel-bit count, `rx_qllrs.shape[-1]`) may be anything —
    E < 3D punctures, E > 3D repeats and the scatter-add combines the
    copies' LLRs before the decoder sees them.

    Args:
      rx_qllrs: int [B, E] quantized LLRs in transmission order.
      D: trellis steps (= payload+CRC bits for k=1) per block.
    Returns:
      (uint8 [B, D] decoded bits, bool [B] CRC ok, int32 [B] winner).
    """
    from ..ops.metrics import DEFAULT_QMAX
    from ..ops.ratematch import derate_match
    qm = DEFAULT_QMAX if qmax is None else qmax
    q = derate_match(jnp.asarray(rx_qllrs), spec, D, qmax=qm)
    return viterbi_decode_batch_tailbiting_crc_soft(
        spec, crc, q, list_size, wrap, interpret, qmax)
