"""Tail-biting convolutional codes (beyond-reference extension).

The reference terminates every packet by flushing S all-zero steps
(convEncode.c:101-122), spending k*S trellis steps of pure overhead and
anchoring both ends of the survivor path at state 0.  Tail-biting —
the convention of LTE PBCH/PDCCH and IEEE 802.16 — removes that
overhead: the encoder *starts* in the state formed by the message's
last k*S bits, so it necessarily *ends* in the same state and the
trellis path is circular.  Rate is exactly k/n with no termination
loss, which matters for short packets.

Decoders here:

* `viterbi_decode_tailbiting` — the practical circular wrap decode:
  one Viterbi forward pass over the circularly extended sequence
  ``[last wl steps ++ packet ++ first wr steps]`` from uniform initial
  metrics, traceback from argmin(final metrics), keep the middle.
  This is the same truncation argument the reference writes out for
  finite traceback (viterbiDecoder.c:53-74) — survivor paths merge
  within ~5K steps — applied around the circle; it reuses the exact
  machinery of the time-block sharded decoder (parallel/sharding.py).
  Near-ML: it can disagree with the ML decoder only when survivors
  fail to merge within the wrap, i.e. at/beyond the code's correction
  limit.

* `viterbi_decode_tailbiting_exact` — the ML oracle: one constrained
  Viterbi per start state s (init 0 at s, forceNot elsewhere), scored
  by final_metrics[s], best circular path wins.  O(num_states) forward
  passes — a vmapped test reference, not a production path.

The kernel-speed batched twin is
`kernels.tailbiting.viterbi_decode_batch_tailbiting`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CodeSpec
from .encode import encode_bits
from .metrics import soft_step_metrics
from .viterbi import (hard_step_metrics, traceback_terminated,
                      viterbi_forward, viterbi_forward_butterfly)


def tail_state(spec: CodeSpec, bits) -> jnp.ndarray:
    """Tail-biting initial (== final) state: the message's last k*S bits,
    newest at bit 0 (the delay-register convention, convEncode.c:93)."""
    kS = spec.k * spec.S
    tail = jnp.asarray(bits, jnp.int32)[..., -kS:]
    w = (1 << jnp.arange(kS - 1, -1, -1, dtype=jnp.int32))
    return jnp.sum(tail * w, axis=-1)


def default_wrap(spec: CodeSpec) -> int:
    """Default circular wrap length in trellis steps: comfortably past the
    ~5K survivor-merge rule (viterbiDecoder.c:53-74)."""
    return 6 * spec.K          # always > S = K - 1


@functools.partial(jax.jit, static_argnums=(0,))
def encode_tailbiting(spec: CodeSpec, bits):
    """Tail-biting encode: no termination flush; the initial state is the
    message tail, so the encoder's final state equals it (circular path).

    Args:
      bits: 0/1 uint8 [..., L]; L must be a multiple of k and >= k*S.
    Returns:
      uint8 [..., L/k] coded segments (rate exactly k/n).
    """
    bits = jnp.asarray(bits, jnp.uint8)
    L = bits.shape[-1]
    if L % spec.k:
        raise ValueError(f"bit count {L} not a multiple of k={spec.k}")
    if L < spec.k * spec.S:
        raise ValueError(
            f"tail-biting needs at least k*S={spec.k * spec.S} message bits "
            f"to define the wrap state; got {L}")
    seg, _ = encode_bits(spec, bits, terminate=False,
                         initial_state=tail_state(spec, bits))
    return seg


def _normalize_wrap(spec: CodeSpec, wrap) -> tuple[int, int]:
    if wrap is None:
        w = default_wrap(spec)
        return w, w
    if isinstance(wrap, int):
        return wrap, wrap
    wl, wr = wrap
    return int(wl), int(wr)


def circular_extend(x, wl: int, wr: int, axis: int = -1):
    """[..., T, ...] -> the circular extension with `wl` wrapped steps
    before and `wr` after (mod-indexing when a wrap exceeds T)."""
    T = x.shape[axis]
    if 0 <= wl <= T and 0 <= wr <= T:
        left = jax.lax.slice_in_dim(x, T - wl, T, axis=axis)
        right = jax.lax.slice_in_dim(x, 0, wr, axis=axis)
        return jnp.concatenate([left, x, right], axis=axis)
    idx = np.arange(-wl, T + wr) % T
    return jnp.take(x, jnp.asarray(idx), axis=axis)


@functools.partial(jax.jit, static_argnums=(0, 2))
def viterbi_decode_tailbiting(spec: CodeSpec, segments, wrap=None):
    """Circular wrap decode of one tail-biting packet (hard decision).

    Args:
      segments: uint8 [T] hard n-bit segments (T = L/k — no termination).
      wrap: wrap length in trellis steps — an int (both sides) or an
        (wl, wr) tuple; default `default_wrap(spec)`.
    Returns:
      uint8 [T * k] decoded message bits.
    """
    segments = jnp.asarray(segments, jnp.uint8)
    T = segments.shape[-1]
    wl, wr = _normalize_wrap(spec, wrap)
    ext = circular_extend(segments, wl, wr)
    uniform = jnp.zeros((spec.num_states,), jnp.int32)
    if spec.k == 1 and spec.has_poly_symmetry:
        decisions, fm = viterbi_forward_butterfly(spec, ext,
                                                  initial_metrics=uniform)
    else:
        bm = hard_step_metrics(spec, ext)
        decisions, fm = viterbi_forward(spec, bm, initial_metrics=uniform)
    start = jnp.argmin(fm).astype(jnp.int32)     # ties -> lowest state
    bits = traceback_terminated(spec, decisions, num_pad=0,
                                start_state=start)
    return jax.lax.slice_in_dim(bits, wl * spec.k, (wl + T) * spec.k)


@functools.partial(jax.jit, static_argnums=(0, 2))
def viterbi_decode_tailbiting_soft(spec: CodeSpec, qllrs, wrap=None):
    """Circular wrap decode from quantized LLRs (ops/metrics.py).

    Args:
      qllrs: int [T, n] quantized LLRs (zero = erasure, so depunctured
        streams ride through unchanged).
    Returns:
      uint8 [T * k] decoded message bits.
    """
    qllrs = jnp.asarray(qllrs, jnp.int32)
    T = qllrs.shape[-2]
    wl, wr = _normalize_wrap(spec, wrap)
    ext = circular_extend(qllrs, wl, wr, axis=-2)
    bm = soft_step_metrics(spec, ext)
    uniform = jnp.zeros((spec.num_states,), jnp.int32)
    decisions, fm = viterbi_forward(spec, bm, initial_metrics=uniform)
    start = jnp.argmin(fm).astype(jnp.int32)
    bits = traceback_terminated(spec, decisions, num_pad=0,
                                start_state=start)
    return jax.lax.slice_in_dim(bits, wl * spec.k, (wl + T) * spec.k)


def _list_from_forward(spec: CodeSpec, decisions, fm, list_size: int,
                       wl: int, T: int):
    """Shared list epilogue: the `list_size` best end states by
    (metric, state) lexicographic order — the same tie convention as
    argmin (ties -> lowest state) — each traced back independently.

    List decodes use a LEFT-only circular extension: with observations
    continuing past the message end, tracebacks from different end
    states would merge inside the right wrap and every candidate would
    decode an identical message window (measured: zero list diversity).
    Ending the trellis at the message end keeps the candidates distinct
    over the last ~5K message bits — exactly the region an outer CRC
    adjudicates.
    Returns (bits [list_size, T*k], metrics [list_size])."""
    NS = spec.num_states
    key = fm * NS + jnp.arange(NS, dtype=fm.dtype)
    order = jnp.sort(key)[:list_size]
    states = (order % NS).astype(jnp.int32)

    def one(s):
        bits = traceback_terminated(spec, decisions, num_pad=0,
                                    start_state=s)
        return jax.lax.slice_in_dim(bits, wl * spec.k, (wl + T) * spec.k)

    cand = jax.vmap(one)(states)
    return cand, fm[states]


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_tailbiting_list(spec: CodeSpec, segments,
                                   list_size: int = 4, wrap=None):
    """List wrap decode (hard decision): the `list_size` best candidate
    circular paths of one tail-biting packet, one per trellis end-state
    in (final metric, state) order.  Candidate 0 is the argmin decode;
    an outer CRC picks the winner (see `ops.crc` and the kernel-speed
    batched twin `kernels.viterbi_decode_batch_tailbiting_crc`).

    Args:
      wrap: LEFT wrap (warm-up) length in trellis steps (int; default
        `default_wrap`).  The trellis deliberately ends at the message
        end — a right wrap would merge all candidates (see
        `_list_from_forward`).
    Returns:
      (uint8 [list_size, T*k] candidate message bits,
       int32 [list_size] candidate final metrics, ascending).
    """
    if not 1 <= list_size <= spec.num_states:
        raise ValueError(f"list_size {list_size} must be in "
                         f"[1, num_states={spec.num_states}] — there is "
                         f"one candidate per trellis end state")
    segments = jnp.asarray(segments, jnp.uint8)
    T = segments.shape[-1]
    wl = default_wrap(spec) if wrap is None else int(wrap)
    ext = circular_extend(segments, wl, 0)
    uniform = jnp.zeros((spec.num_states,), jnp.int32)
    if spec.k == 1 and spec.has_poly_symmetry:
        decisions, fm = viterbi_forward_butterfly(spec, ext,
                                                  initial_metrics=uniform)
    else:
        bm = hard_step_metrics(spec, ext)
        decisions, fm = viterbi_forward(spec, bm, initial_metrics=uniform)
    return _list_from_forward(spec, decisions, fm, list_size, wl, T)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_tailbiting_list_soft(spec: CodeSpec, qllrs,
                                        list_size: int = 4, wrap=None):
    """Soft-decision twin of `viterbi_decode_tailbiting_list` (quantized
    LLRs in, `list_size` candidates out; `wrap` is the LEFT wrap)."""
    if not 1 <= list_size <= spec.num_states:
        raise ValueError(f"list_size {list_size} must be in "
                         f"[1, num_states={spec.num_states}]")
    qllrs = jnp.asarray(qllrs, jnp.int32)
    T = qllrs.shape[-2]
    wl = default_wrap(spec) if wrap is None else int(wrap)
    ext = circular_extend(qllrs, wl, 0, axis=-2)
    bm = soft_step_metrics(spec, ext)
    uniform = jnp.zeros((spec.num_states,), jnp.int32)
    decisions, fm = viterbi_forward(spec, bm, initial_metrics=uniform)
    return _list_from_forward(spec, decisions, fm, list_size, wl, T)


@functools.partial(jax.jit, static_argnums=(0,))
def viterbi_decode_tailbiting_exact(spec: CodeSpec, segments):
    """ML tail-biting decode (test oracle): the best circular path over
    all num_states constrained (start == end) Viterbi passes."""
    segments = jnp.asarray(segments, jnp.uint8)
    T = segments.shape[-1]
    if T * spec.n >= (1 << 20):
        # the exclusion constant must dominate any real path metric, or
        # an unconstrained big-seeded path could undercut a true
        # circular one and the "exact ML" guarantee silently breaks
        raise ValueError(
            f"packet too long for the exact oracle: T*n = {T * spec.n} "
            f">= 2^20 exclusion scale (use the wrap decoder)")
    bm = hard_step_metrics(spec, segments)
    NS = spec.num_states
    big = jnp.int32(1) << 20        # > any real path metric (n per step)

    def one(s):
        init = jnp.full((NS,), big, jnp.int32).at[s].set(0)
        dec, fm = viterbi_forward(spec, bm, initial_metrics=init)
        return dec, fm[s]

    decs, scores = jax.vmap(one)(jnp.arange(NS, dtype=jnp.int32))
    best = jnp.argmin(scores).astype(jnp.int32)   # ties -> lowest state
    return traceback_terminated(spec, decs[best], num_pad=0,
                                start_state=best)
