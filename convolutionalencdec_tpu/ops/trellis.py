"""Trellis derivation.

The decoder's trellis tables are derived *from the encoder*, exactly as the
reference does (viterbiInit runs convEncOneInput over every (state, input)
pair, viterbiDecoder.c:32-50; the butterfly table likewise,
viterbiDecoderButterflyk1.c:20-29), so encoder and decoder can never
disagree.  Tables are tiny (<= 2^k * 2^(k*S) bytes) and are computed once per
CodeSpec on the host with vectorized NumPy bit math, then baked into jitted
decoders as constants.

State/edge index conventions (identical to viterbiDecoderHard,
viterbiDecoder.c:95-125):
  * a trellis step from src state s with input u lands in
    dst = ((s << k) | u) & (num_states - 1);
  * therefore the input bits of every edge entering dst are u = dst % 2^k
    ("edgeOut", viterbiDecoder.c:99);
  * the 2^k candidate sources of dst are src = dst//2^k + e * 2^((S-1)k)
    for decision index e — e is the k oldest (shifted-out) bits of src
    (viterbiDecoder.c:104).
"""

from __future__ import annotations

import functools

import numpy as np

from ..params import CodeSpec


def _parity_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    x ^= x >> 32
    x ^= x >> 16
    x ^= x >> 8
    x ^= x >> 4
    x ^= x >> 2
    x ^= x >> 1
    return (x & 1).astype(np.uint8)


@functools.lru_cache(maxsize=None)
def edge_coded_bits(spec: CodeSpec) -> np.ndarray:
    """Coded segment for every (input u, src state s).

    Returns uint8 [2^k, num_states]; entry [u, s] is the n-bit segment the
    encoder emits when input u is shifted into state s.  Twin of
    state->edgeCodedBits (viterbiDecoder.c:41-48).
    """
    u = np.arange(spec.num_edges_per_state, dtype=np.int64)[:, None]
    s = np.arange(spec.num_states, dtype=np.int64)[None, :]
    delay = ((s << spec.k) | u) & ((1 << spec.delay_width) - 1)
    seg = np.zeros(delay.shape, dtype=np.uint8)
    for j, grev in enumerate(spec.g_reversed):
        seg |= _parity_np(delay & grev) << j
    return seg


@functools.lru_cache(maxsize=None)
def butterfly_coded_bits(spec: CodeSpec) -> np.ndarray:
    """Coded segment of the input-0 edge of each butterfly's first node.

    Returns uint8 [num_states // 2]; entry [b] is the segment for the edge
    (src=b, u=0) -> dst=2b.  With poly symmetry the other three butterfly
    edges are this segment or its bitwise complement
    (viterbiDecoderButterflyk1.c:20-29,103-115).
    """
    spec.validate_for_butterfly()
    return edge_coded_bits(spec)[0, : spec.num_states // 2].copy()


@functools.lru_cache(maxsize=None)
def next_state_table(spec: CodeSpec) -> np.ndarray:
    """dst state for every (input u, src state s): int32 [2^k, num_states]."""
    u = np.arange(spec.num_edges_per_state, dtype=np.int64)[:, None]
    s = np.arange(spec.num_states, dtype=np.int64)[None, :]
    return (((s << spec.k) | u) & (spec.num_states - 1)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def prev_state_table(spec: CodeSpec) -> np.ndarray:
    """src state for every (decision e, dst state d): int32 [2^k, num_states].

    src = d // 2^k + e * 2^((S-1)*k)  (viterbiDecoder.c:104).
    """
    e = np.arange(spec.num_edges_per_state, dtype=np.int64)[:, None]
    d = np.arange(spec.num_states, dtype=np.int64)[None, :]
    return ((d >> spec.k) + (e << ((spec.S - 1) * spec.k))).astype(np.int32)
