"""Chunked streaming encode/decode with explicit carried state.

The reference's codec is *streaming-stateful*: packets can be fed in
arbitrary chunks, with `convEncoderState_t` carrying partial-byte and
shift-register state between `convEnc` calls (convEncode.h:29-38,
convEncode.c:46-130) and the decoder carrying metrics/traceback state
across `viterbiDecoderHard` calls until `last=true`
(viterbiDecoder.h:128-145).  SURVEY.md §5 flags this seam as the
framework's checkpoint/resume analogue and the hook for time-block
sharding.

Here the carried state is an explicit, immutable pytree (functional JAX
style) wrapped in thin stateful conveniences.  The decoder is the
sliding-window register-exchange formulation (decode delay =
traceback_len), matching `viterbi_decode_stream` chunk-for-chunk.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CodeSpec
from .encode import encode_bits
from .trellis import prev_state_table
from .viterbi import hard_step_metrics, init_metric_value


class DecoderState(NamedTuple):
    """Carried decoder state between chunks (viterbiDecoder.h:128-145's
    nodeMetrics/traceBack/iteration as an explicit value)."""
    metrics: jax.Array      # int32 [NS]
    registers: jax.Array    # uint8 [NS, W] survivor symbols, newest first
    count: jax.Array        # int32 — trellis steps consumed so far


def decoder_init(spec: CodeSpec, traceback_len: int = 0) -> DecoderState:
    W = traceback_len or spec.traceback_len
    NS = spec.num_states
    m = jnp.full((NS,), init_metric_value(spec), jnp.int32)
    m = m.at[spec.starting_state].set(0)
    return DecoderState(m, jnp.zeros((NS, W), jnp.uint8),
                        jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnums=(0, 3))
def decode_chunk(spec: CodeSpec, state: DecoderState, segments,
                 traceback_len: int = 0):
    """Consume a chunk of segments, emitting one symbol per step once the
    window is warm (viterbiDecoder.c:140-190 streaming emit).

    Returns (new_state, symbols uint8 [T'], valid bool [T']): symbols[t]
    is the decoded k-bit symbol for global step count+t-(W-1), valid where
    that index >= 0.
    """
    bm_all = hard_step_metrics(spec, segments)
    return _decode_chunk_from_bm(spec, state, bm_all, traceback_len)


@functools.partial(jax.jit, static_argnums=(0, 3))
def decode_chunk_soft(spec: CodeSpec, state: DecoderState, qllrs,
                      traceback_len: int = 0):
    """Soft-decision `decode_chunk`: quantized-LLR branch costs
    (ops/metrics.soft_step_metrics) with the same streaming emit and
    carried state.  `qllrs`: int [T', n]."""
    from .metrics import soft_step_metrics
    bm_all = soft_step_metrics(spec, qllrs)
    return _decode_chunk_from_bm(spec, state, bm_all, traceback_len)


def _decode_chunk_from_bm(spec: CodeSpec, state: DecoderState, bm_all,
                          traceback_len: int):
    W = traceback_len or spec.traceback_len
    NS = spec.num_states
    E = spec.num_edges_per_state
    prev = jnp.asarray(prev_state_table(spec))
    u_of_dst = jnp.arange(NS, dtype=jnp.int32) & (E - 1)
    bm_idx = u_of_dst[None, :] * NS + prev

    def step(carry, bm_t):
        m, reg = carry
        pm = m[prev] + bm_t.reshape(-1)[bm_idx]
        dec = jnp.argmin(pm, axis=0)
        new_m = jnp.min(pm, axis=0)
        src = prev[dec, jnp.arange(NS)]
        new_reg = jnp.concatenate(
            [u_of_dst[:, None].astype(jnp.uint8), reg[src, : W - 1]], axis=1)
        best = jnp.argmin(new_m)
        return (new_m, new_reg), new_reg[best, W - 1]

    (m, reg), symbols = jax.lax.scan(
        step, (state.metrics, state.registers), bm_all)
    T = symbols.shape[0]
    idx = state.count + jnp.arange(T, dtype=jnp.int32)
    valid = idx >= (W - 1)
    return DecoderState(m, reg, state.count + T), symbols, valid


@functools.partial(jax.jit, static_argnums=(0, 2))
def decode_flush(spec: CodeSpec, state: DecoderState,
                 traceback_len: int = 0):
    """Terminate the packet: flush the undecoded window from state 0's
    register, dropping the S pad steps (viterbiDecoder.c:194-231).

    Returns uint8 [W - 1 - S] symbols (oldest first).  When fewer than
    W - 1 steps were ever consumed, the LEADING (W - 1 - count) entries
    are register-init filler, not data — the stateful wrappers trim
    them (`max(0, W - 1 - count)`); raw callers must do the same."""
    W = traceback_len or spec.traceback_len
    return state.registers[0, spec.S:W - 1][::-1]


def _symbols_to_bits(spec: CodeSpec, symbols: np.ndarray) -> np.ndarray:
    bit_idx = np.arange(spec.k - 1, -1, -1)
    return ((symbols[:, None].astype(np.int32) >> bit_idx) & 1).astype(
        np.uint8).reshape(-1)


@dataclasses.dataclass
class StreamingEncoder:
    """Stateful chunked encoder (the convEnc seam, convEncode.c:46-130)."""
    spec: CodeSpec

    def __post_init__(self):
        self._state = jnp.asarray(self.spec.starting_state, jnp.int32)

    def encode(self, bits, last: bool = False) -> np.ndarray:
        segs, st = encode_bits(self.spec, jnp.asarray(bits, jnp.uint8),
                               terminate=last, initial_state=self._state)
        self._state = (jnp.asarray(self.spec.starting_state, jnp.int32)
                       if last else st)
        return np.asarray(segs)

    def reset(self):
        self._state = jnp.asarray(self.spec.starting_state, jnp.int32)


@dataclasses.dataclass
class StreamingDecoder:
    """Stateful chunked sliding-window decoder (decode delay =
    traceback_len), auto-resetting at `last` like the reference
    (viterbiDecoderButterflyk1.c:258).

    Caller contract (enforced): one packet per `last=True` cycle, and the
    chunk passed with `last=True` must END exactly at the packet's final
    (termination) segment — the flush drops the trailing S termination
    symbols from the undecoded window, which is only exact when those
    steps are the last ones consumed.  Feeding further segments after the
    termination without `last=True` would stream the termination symbols
    out as data; `decode` guards this by requiring every `last=True` call
    to consume at least one segment.

    With `soft=True`, chunks are quantized LLRs [T', n] instead of hard
    segments (ops/metrics.soft_step_metrics branch costs)."""
    spec: CodeSpec
    traceback_len: int = 0
    soft: bool = False

    def __post_init__(self):
        self.traceback_len = self.traceback_len or self.spec.traceback_len
        self._state = decoder_init(self.spec, self.traceback_len)
        self._bit_carry = np.zeros((0,), np.uint8)

    def decode(self, segments, last: bool = False) -> np.ndarray:
        """Feed a chunk; returns the newly decoded message bits."""
        if self.soft:
            segments = jnp.asarray(segments, jnp.int32)
        else:
            segments = jnp.asarray(segments, jnp.uint8)
        if last and segments.shape[0] == 0:
            raise ValueError(
                "StreamingDecoder: the last=True chunk must contain the "
                "packet's final segments (see class docstring); got an "
                "empty chunk, so the termination steps were already "
                "streamed and the flush accounting would be wrong.")
        chunk_fn = decode_chunk_soft if self.soft else decode_chunk
        self._state, symbols, valid = chunk_fn(
            self.spec, self._state, segments, self.traceback_len)
        out = np.asarray(symbols)[np.asarray(valid)]
        if last:
            # The termination symbols are the last S steps consumed, so
            # they sit inside the final W-1 window; decode_flush excludes
            # them and the streamed portion above never reaches them.
            # Short packets (count < W - 1): the window's oldest entries
            # are register-init filler, trimmed by consumed-step count so
            # exactly count - S message symbols come out in total.
            flush = np.asarray(decode_flush(self.spec, self._state,
                                            self.traceback_len))
            garbage = max(0, self.traceback_len - 1
                          - int(self._state.count))
            out = np.concatenate([out, flush[garbage:]])
            self.reset()
        return _symbols_to_bits(self.spec, out)

    def decode_bytes(self, segments, last: bool = False) -> np.ndarray:
        """Feed a chunk; returns newly completed decoded BYTES (MSb-first
        fill, viterbiDecoderButterflyk1.c:245-249).  Partial bytes carry
        across chunks — the decode-side twin of convEncoderState_t's
        remainingUncoded seam (convEncode.h:36-37), which is where the
        8 % k != 0 spillover lives.  At `last`, a trailing partial byte
        is flushed zero-padded."""
        from .bits import pack_bits_np
        bits = np.concatenate([self._bit_carry,
                               self.decode(segments, last)])
        if last:
            pad = (-bits.size) % 8
            bits = np.pad(bits, (0, pad))
            self._bit_carry = np.zeros((0,), np.uint8)
            return pack_bits_np(bits)
        n_full = bits.size // 8 * 8
        self._bit_carry = bits[n_full:]
        return pack_bits_np(bits[:n_full])

    def reset(self):
        self._state = decoder_init(self.spec, self.traceback_len)
        self._bit_carry = np.zeros((0,), np.uint8)


def _registers_to_planes(registers):
    """uint8 [B, NS, W] symbol registers (newest at col 0) -> two int32
    [NS, B] bit planes (bit j = symbol j steps old; `hi` continues at 32)
    for the streaming Pallas kernel."""
    B, NS, W = registers.shape
    r = jnp.asarray(registers, jnp.int32)
    j = jnp.arange(W)
    lo = jnp.sum(jnp.where(j < 32, r << jnp.minimum(j, 31), 0), axis=-1)
    hi = jnp.sum(jnp.where(j >= 32, r << jnp.maximum(j - 32, 0), 0), axis=-1)
    return lo.T, hi.T


def _planes_to_registers(lo, hi, W):
    """Inverse of `_registers_to_planes`."""
    j = jnp.arange(W)
    lo_b = (lo.T[:, :, None] >> jnp.minimum(j, 31)) & 1     # [B, NS, W]
    hi_b = (hi.T[:, :, None] >> jnp.maximum(j - 32, 0)) & 1
    return jnp.where(j < 32, lo_b, hi_b).astype(jnp.uint8)


@dataclasses.dataclass
class StreamingDecoderBatch:
    """Batched stateful streaming decoder at kernel speed.

    The production streaming seam: B independent channels decoded with
    sliding-window emission (decode delay = traceback_len), bit-exact to
    per-channel `StreamingDecoder`/`viterbi_decode_stream`.  Chunk
    prefixes that are multiples of the kernel chunk (48 steps) run
    through the fused register-exchange Pallas kernel
    (kernels.stream_decode_batch); ragged tails fall back to the scan
    path on the same carried state, so ANY chunking decodes identically.

    Same caller contract as StreamingDecoder: one packet per last=True
    cycle, whose final chunk ends at the packet's last segment.

    With `soft=True`, chunks are quantized LLRs [B, T', n] instead of
    hard segments [B, T']; the kernel path rides
    kernels.stream_decode_batch_soft (MXU soft edge metrics in the same
    register-exchange kernel).
    """
    spec: CodeSpec
    batch: int
    traceback_len: int = 0
    use_kernel: bool | None = None
    interpret: bool = False
    soft: bool = False

    def __post_init__(self):
        self.traceback_len = self.traceback_len or self.spec.traceback_len
        if self.use_kernel is None:
            # The register-exchange kernel needs the butterfly layout
            # (poly symmetry); non-symmetric k=1 codes fall back to the
            # scan path, which handles them.
            self.use_kernel = (self.spec.num_states >= 64
                               and self.spec.k == 1
                               and self.spec.has_poly_symmetry
                               and self.traceback_len <= 64)
        if self.use_kernel and self.traceback_len > 64:
            raise ValueError("kernel streaming supports traceback_len <= 64")
        self.reset()

    def reset(self):
        W = self.traceback_len
        NS = self.spec.num_states
        m = jnp.full((NS,), init_metric_value(self.spec), jnp.int32)
        m = m.at[self.spec.starting_state].set(0)
        self._metrics = jnp.broadcast_to(m[None], (self.batch, NS))
        self._registers = jnp.zeros((self.batch, NS, W), jnp.uint8)
        self._count = 0
        self._bit_carry = np.zeros((self.batch, 0), np.uint8)

    def _decode_kernel(self, segments):
        """Aligned-prefix decode through the Pallas kernel."""
        from ..kernels.acs_pallas import (
            stream_decode_batch, stream_decode_batch_soft, B_TILE, PACK)
        B, T = segments.shape[:2]
        W = self.traceback_len
        Bp = -(-B // B_TILE) * B_TILE
        lo, hi = _registers_to_planes(self._registers)
        st = jnp.stack([self._metrics.T, lo, hi])
        if Bp != B:
            st = jnp.pad(st, ((0, 0), (0, 0), (0, Bp - B)))
            pad_b = [(0, Bp - B)] + [(0, 0)] * (segments.ndim - 1)
            segments = jnp.pad(segments, pad_b)
        if self.soft:
            packed, st = stream_decode_batch_soft(
                self.spec, segments, st, W, self.interpret)
        else:
            packed, st = stream_decode_batch(self.spec, segments, st, W,
                                             self.interpret)
        j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, PACK, 1)
        sym = ((packed[:, None, :] >> j) & 1).reshape(T, Bp)[:, :B].T
        self._metrics = st[0, :, :B].T
        self._registers = _planes_to_registers(st[1, :, :B],
                                               st[2, :, :B], W)
        return sym                                   # (B, T) uint8

    def _decode_scan(self, segments):
        """Ragged-tail decode via the per-channel scan path."""
        W = self.traceback_len
        chunk_fn = decode_chunk_soft if self.soft else decode_chunk
        state = DecoderState(self._metrics, self._registers,
                             jnp.full((self.batch,), self._count,
                                      jnp.int32))
        new_state, symbols, _ = jax.vmap(
            lambda m, r, c, s: chunk_fn(
                self.spec, DecoderState(m, r, c), s, W),
            in_axes=(0, 0, 0, 0), out_axes=(0, 0, 0))(
            state.metrics, state.registers, state.count,
            jnp.asarray(segments))
        self._metrics = new_state.metrics
        self._registers = new_state.registers
        return symbols                               # (B, T) uint8

    def decode(self, segments, last: bool = False) -> np.ndarray:
        """Feed a chunk of [B, T'] segments; returns the newly decoded
        message bits [B, bits]."""
        from ..kernels.acs_pallas import CHUNK_F
        if self.soft:
            segments = jnp.asarray(segments, jnp.int8)
            if segments.ndim != 3 or segments.shape[-1] != self.spec.n:
                raise ValueError(
                    f"soft chunks are [B, T', n={self.spec.n}] LLRs; got "
                    f"{segments.shape}")
        else:
            segments = jnp.asarray(segments, jnp.uint8)
        B, T = segments.shape[:2]
        if B != self.batch:
            raise ValueError(f"batch {B} != {self.batch}")
        if last and T == 0:
            raise ValueError(
                "the last=True chunk must contain the packet's final "
                "segments (see StreamingDecoder docstring)")
        if T == 0:
            # empty non-last chunk: nothing to decode (the scalar class
            # accepts this, so the batch class must too)
            return np.zeros((self.batch, 0), np.uint8)
        Tk = (T // CHUNK_F) * CHUNK_F if self.use_kernel else 0
        parts = []
        if Tk:
            parts.append(self._decode_kernel(segments[:, :Tk]))
        if T > Tk:
            parts.append(self._decode_scan(segments[:, Tk:]))
        sym = np.concatenate([np.asarray(p) for p in parts], axis=1)
        W = self.traceback_len
        idx = self._count + np.arange(T)
        self._count += T
        out = sym[:, idx >= (W - 1)]
        if last:
            # see StreamingDecoder.decode: trim register-init filler for
            # short packets (count < W - 1)
            flush = np.asarray(self._registers[:, 0, self.spec.S:W - 1])
            garbage = max(0, (W - 1) - self._count)
            out = np.concatenate([out, flush[:, ::-1][:, garbage:]],
                                 axis=1)
            self.reset()
        return _symbols_to_bits_batch(self.spec, out)


    def decode_bytes(self, segments, last: bool = False) -> np.ndarray:
        """Batched byte-granular streaming decode with partial-byte carry
        (see StreamingDecoder.decode_bytes).  Returns uint8 [B, bytes]."""
        from .bits import pack_bits_np
        bits = np.concatenate([self._bit_carry,
                               self.decode(segments, last)], axis=1)
        if last:
            pad = (-bits.shape[1]) % 8
            bits = np.pad(bits, ((0, 0), (0, pad)))
            self._bit_carry = np.zeros((self.batch, 0), np.uint8)
            return pack_bits_np(bits)
        n_full = bits.shape[1] // 8 * 8
        self._bit_carry = bits[:, n_full:]
        return pack_bits_np(bits[:, :n_full])


def _symbols_to_bits_batch(spec: CodeSpec, symbols: np.ndarray) -> np.ndarray:
    bit_idx = np.arange(spec.k - 1, -1, -1)
    bits = (symbols[:, :, None].astype(np.int32) >> bit_idx) & 1
    return bits.astype(np.uint8).reshape(symbols.shape[0], -1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8, 9))
def _bsd_step(spec: CodeSpec, chunk, m, pending, keep_g: int,
              last_info, bout: int, mode: str, qmax: int,
              interpret: bool):
    """One whole `BlockStreamingDecoderBatch.decode` call as a single
    jitted program: SWAR pack + forward over `chunk` (already padded;
    time length a CHUNK_F multiple, possibly 0) seeded with carried
    packed metrics `m` (None = stream start), decision append, masked
    traceback, bit emission.  `mode` picks the kernel family ("hard" /
    "soft8" / "soft16"); `last_info` is None for interior calls or the
    static (live_rel, n_final) pair for the flush.  Returns
    (bits [bout, e] uint8, m', pending') — all device-resident; shapes
    are static per call signature, so steady-state serving reuses one
    trace."""
    from ..kernels import acs_swar
    wide = mode == "soft16"
    if chunk.shape[1]:
        if mode == "hard":
            packed = acs_swar._pack_channels(chunk)
            fwd = functools.partial(acs_swar.acs_forward_batch_swar,
                                    spec, packed, interpret)
        elif mode == "soft8":
            packed = acs_swar._pack_qllrs8(chunk, qmax)
            fwd = functools.partial(acs_swar.acs_forward_batch_swar_soft8,
                                    spec, packed, qmax, interpret)
        else:
            packed = acs_swar._pack_qllrs(chunk)
            fwd = functools.partial(acs_swar.acs_forward_batch_swar_soft,
                                    spec, packed, interpret)
        if m is None:
            decs, m = fwd(init_chunk=0)
        else:
            decs, m = fwd(init_chunk=-1, init_metrics=m)
        pending = (decs if pending is None
                   else jnp.concatenate([pending, decs]))
    Bp = pending.shape[2] * (2 if wide else 4)

    def rows_to_bits(rows, n_steps: int):
        j = jnp.arange(8, dtype=jnp.uint8).reshape(1, 8, 1)
        bits = ((rows[:, None, :] >> j) & 1).reshape(-1, rows.shape[1])
        return bits[:n_steps].T

    unpack_m = acs_swar.unpack_fields16 if wide else acs_swar.unpack_fields
    pack_m = acs_swar.pack_fields16 if wide else acs_swar.pack_fields
    unpack_o = acs_swar._unpack_out16 if wide else acs_swar._unpack_out

    if last_info is None:
        tg = pending.shape[0]
        emit_g = tg - keep_g
        if emit_g <= 0:
            return jnp.zeros((bout, 0), jnp.uint8), m, pending
        fm = unpack_m(m, Bp)
        s_iota = jnp.arange(spec.num_states, dtype=jnp.int32)[:, None]
        h0 = pack_m(
            (s_iota == jnp.argmin(fm, axis=0)[None, :]).astype(jnp.int32))
        gmask = jnp.full((tg, 1), 0xFF, jnp.int32)
        out32 = acs_swar.traceback_batch_swar_masked(
            spec, pending, gmask, h0, interpret, wide)
        rows = unpack_o(out32, Bp)
        return rows_to_bits(rows, emit_g * 8)[:bout], m, pending[emit_g:]

    live_rel, n_final = last_info
    out32 = acs_swar.traceback_batch_swar(spec, pending, live_rel,
                                          interpret, wide)
    rows = unpack_o(out32, Bp)
    return rows_to_bits(rows, n_final)[:bout], m, pending


class BlockStreamingDecoderBatch:
    """Chunked decode at BLOCK-kernel speed: exact carried-metric
    forward continuity across calls (beyond-reference; the reference's
    butterfly decoder requires the whole packet before `last=true`,
    viterbiDecoderButterflyk1.c:200-260, and its streaming generic
    decoder pays the per-step sliding-window emit).

    Feed `[B, t]` segment chunks of ANY sizes; every call runs the SWAR
    forward over the newly completed 48-step chunks seeded with the
    PREVIOUS call's packed final metrics (`init_metrics` — exact
    continuation, not a warm-up approximation) and emits all decoded
    bits older than the `lookahead` window via a masked traceback
    started at argmin(current metrics).  The final `last=True` call
    replicates the one-shot terminated traceback (state-0 start, pad
    masking), so the concatenated emissions equal
    `kernels.viterbi_decode_batch` on the whole stream wherever
    survivor paths merge within `lookahead` (the truncation argument of
    viterbiDecoder.c:53-74; the tests assert bit-exactness at 3%
    corruption).

    Emission cadence: interior emissions are 48-step aligned and lag by
    `lookahead..lookahead+47` steps plus any sub-chunk remainder; each
    interior traceback re-walks the kept lookahead groups (~lookahead/t
    overhead per call).  Compare `StreamingDecoderBatch`: per-STEP
    emission at fixed delay W (~4.25 Gbit/s device) — this class trades
    burst latency for block-kernel throughput (~10 Gbit/s hard).

    The whole per-call step is ONE jitted program (`_bsd_step`);
    inputs, outputs, and carried state stay on device.  Keep chunk
    sizes fixed in steady state so one trace serves every call.

    SWAR-eligible codes only (k=1 poly-symmetric, NS >= 64, n <= 4);
    other codes use `StreamingDecoderBatch`.
    """

    def __init__(self, spec: CodeSpec, batch: int,
                 lookahead: int | None = None, interpret: bool = False,
                 soft: bool = False, qmax: int | None = None):
        from ..kernels import acs_swar
        from ..kernels.acs_pallas import CHUNK_F
        if soft:
            if qmax is None:
                from .metrics import DEFAULT_QMAX
                qmax = DEFAULT_QMAX
            if acs_swar.swar8_soft_supported(spec, qmax):
                self._mode = "soft8"
            elif acs_swar.swar_layout_supported(spec):
                self._mode = "soft16"
            else:
                raise ValueError(
                    "soft BlockStreamingDecoderBatch requires a SWAR-"
                    "layout code; use StreamingDecoderBatch instead")
        else:
            if not acs_swar.swar_supported(spec):
                raise ValueError(
                    "BlockStreamingDecoderBatch requires a SWAR-eligible "
                    "code (k=1 poly-symmetric, NS >= 64, n <= 4); use "
                    "StreamingDecoderBatch instead")
            self._mode = "hard"
        self.spec = spec
        self.batch = batch
        self.interpret = interpret
        self._qmax = int(qmax) if qmax is not None else 0
        self._tile = (acs_swar.SWAR_TILE16 if self._mode == "soft16"
                      else acs_swar.SWAR_TILE)
        la = spec.traceback_len if lookahead is None else int(lookahead)
        if la <= spec.S:
            # Same invariant the per-step streaming path enforces
            # (W > S): with no kept lookahead the termination steps
            # would stream out as message bits and the final flush has
            # nothing left to decode.
            raise ValueError(f"lookahead must exceed S={spec.S} "
                             f"(5K = {spec.traceback_len} is the "
                             f"standard choice); got {la}")
        self._keep = -(-la // CHUNK_F)    # kept lookahead, whole chunks
        self._chunk = CHUNK_F
        self.reset()

    def reset(self):
        self._buf = None         # device-resident sub-chunk remainder
        self._m = None           # packed carried metrics [NS, Bp4]
        self._pending = None     # packed decisions [TG, NS, Bp4]
        self._in_steps = 0       # total segments consumed
        self._emitted = 0        # total steps emitted

    def decode(self, segments, last: bool = False):
        """Consume a [B, t] chunk (hard) or [B, t, n] int8 qllr chunk
        (soft), t >= 0; returns device-resident uint8 [B, e] decoded
        bits (e varies per call).  `last=True` flushes: total emissions
        then cover all (total segments - S) message positions, and the
        decoder resets for the next stream.

        The aligned steady-state path (t % 48 == 0, no buffered
        remainder) runs as exactly ONE jitted dispatch per call —
        every eager host-side slice was measured at ~150 us through
        the dispatch tunnel, dominating the device time."""
        from ..kernels.acs_pallas import _pad_to
        dt = jnp.int8 if self._mode != "hard" else jnp.uint8
        segments = jnp.asarray(segments, dt)
        if segments.shape[0] != self.batch:
            raise ValueError(f"batch {segments.shape[0]} != {self.batch}")
        B = self.batch
        self._in_steps += segments.shape[1]
        if self._buf is None and segments.shape[1] % self._chunk == 0 \
                and (segments.shape[1] or last):
            proc = segments                      # fast path: no slicing
        else:
            buf = (segments if self._buf is None
                   else jnp.concatenate([self._buf, segments], axis=1))
            if last:
                rem = (-buf.shape[1]) % self._chunk
                if rem:
                    pad = [(0, 0), (0, rem)] + [(0, 0)] * (buf.ndim - 2)
                    buf = jnp.pad(buf, pad)
                proc, self._buf = buf, None
            else:
                k = buf.shape[1] // self._chunk
                proc = buf[:, :k * self._chunk]
                self._buf = (buf[:, k * self._chunk:]
                             if k * self._chunk < buf.shape[1] else None)
        if not last and proc.shape[1] == 0:
            return jnp.zeros((B, 0), jnp.uint8)
        if last and proc.shape[1] == 0 and self._pending is None:
            self.reset()
            return jnp.zeros((B, 0), jnp.uint8)
        if B % self._tile:
            proc = _pad_to(proc, self._tile, 0)
        last_info = None
        if last:
            live_rel = self._in_steps - self._emitted
            n_final = max((self._in_steps - self.spec.S) - self._emitted, 0)
            last_info = (live_rel, n_final)
        bits, self._m, self._pending = _bsd_step(
            self.spec, proc, self._m, self._pending,
            self._keep * (self._chunk // 8), last_info, B,
            self._mode, self._qmax, self.interpret)
        if last:
            self.reset()
        else:
            self._emitted += bits.shape[1]
        return bits
