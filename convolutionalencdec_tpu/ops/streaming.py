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
    W = traceback_len or spec.traceback_len
    NS = spec.num_states
    E = spec.num_edges_per_state
    prev = jnp.asarray(prev_state_table(spec))
    u_of_dst = jnp.arange(NS, dtype=jnp.int32) & (E - 1)
    bm_idx = u_of_dst[None, :] * NS + prev
    bm_all = hard_step_metrics(spec, segments)

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

    Returns uint8 [W - 1 - S] symbols (oldest first)."""
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
    to consume at least one segment."""
    spec: CodeSpec
    traceback_len: int = 0

    def __post_init__(self):
        self.traceback_len = self.traceback_len or self.spec.traceback_len
        self._state = decoder_init(self.spec, self.traceback_len)

    def decode(self, segments, last: bool = False) -> np.ndarray:
        """Feed a chunk; returns the newly decoded message bits."""
        segments = jnp.asarray(segments, jnp.uint8)
        if last and segments.shape[0] == 0:
            raise ValueError(
                "StreamingDecoder: the last=True chunk must contain the "
                "packet's final segments (see class docstring); got an "
                "empty chunk, so the termination steps were already "
                "streamed and the flush accounting would be wrong.")
        self._state, symbols, valid = decode_chunk(
            self.spec, self._state, segments, self.traceback_len)
        out = np.asarray(symbols)[np.asarray(valid)]
        if last:
            # The termination symbols are the last S steps consumed, so
            # they sit inside the final W-1 window; decode_flush excludes
            # them and the streamed portion above never reaches them.
            flush = np.asarray(decode_flush(self.spec, self._state,
                                            self.traceback_len))
            out = np.concatenate([out, flush])
            self.reset()
        return _symbols_to_bits(self.spec, out)

    def reset(self):
        self._state = decoder_init(self.spec, self.traceback_len)
