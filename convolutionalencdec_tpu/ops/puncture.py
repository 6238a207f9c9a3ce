"""Puncturing / depuncturing.

Not present in the reference (its code is always rate k/n), but demanded by
BASELINE.json beyond-reference scope (SURVEY.md §7 step 6): higher rates are
obtained by deleting coded bits by a periodic pattern at the transmitter and
re-inserting *erasures* (zero LLRs) at the receiver, so the same mother-code
Viterbi decoder serves rates 2/3, 3/4, ... unchanged.

A pattern is a (n, period) 0/1 matrix in the standard convention: column p,
row j says whether coded bit j of trellis step (t mod period == p) is
transmitted.  Erasures contribute zero branch cost to either hypothesis,
which is exactly the soft path's q == 0 (ops/metrics.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CodeSpec

# Standard puncturing patterns for rate-1/2 mother codes (n = 2),
# e.g. the DVB / IEEE 802.11 family.
PUNCTURE_2_3 = ((1, 1), (1, 0))            # rate 2/3
PUNCTURE_3_4 = ((1, 1, 0), (1, 0, 1))      # rate 3/4
PUNCTURE_5_6 = ((1, 1, 0, 1, 0), (1, 0, 1, 0, 1))  # rate 5/6


def _pattern_array(pattern) -> np.ndarray:
    pat = np.asarray(pattern, dtype=np.uint8)
    if pat.ndim != 2:
        raise ValueError("pattern must be (n, period)")
    return pat


def check_pattern_rows(spec: CodeSpec, pattern) -> None:
    """A pattern's row count must equal the code's n: a mismatched
    pattern would build a keep-mask over the wrong stream width and
    silently select bits from the wrong (step, generator) pairs."""
    pat = _pattern_array(pattern)
    if pat.shape[0] != spec.n:
        raise ValueError(
            f"puncture pattern has {pat.shape[0]} rows but the code "
            f"emits n={spec.n} bits per step")


def punctured_rate(spec: CodeSpec, pattern) -> float:
    """Effective code rate after puncturing."""
    check_pattern_rows(spec, pattern)
    pat = _pattern_array(pattern)
    return (spec.k * pat.shape[1]) / int(pat.sum())


def puncture_mask(pattern, T: int) -> np.ndarray:
    """Boolean keep-mask over the coded bit-stream of T segments.

    Bit order matches ops/channel.segments_to_bits: step-major, generator j
    at position j within each step.
    """
    pat = _pattern_array(pattern)
    n, period = pat.shape
    reps = -(-T // period)
    full = np.tile(pat.T, (reps, 1)).reshape(-1)[: T * n]  # [T*n]
    return full.astype(bool)


@functools.partial(jax.jit, static_argnums=(1, 2))
def puncture_bits(coded_bits, pattern, T: int):
    """Delete punctured positions from a coded bit-stream.

    Args:
      coded_bits: [..., T*n] coded bits (or LLRs) in transmission order.
    Returns:
      [..., kept] the surviving positions, in order.
    """
    mask = puncture_mask(pattern, T)
    idx = jnp.asarray(np.nonzero(mask)[0])
    return jnp.take(jnp.asarray(coded_bits), idx, axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def depuncture_llrs(llrs, pattern, T: int):
    """Re-insert zero-LLR erasures at punctured positions.

    Args:
      llrs: [..., kept] received LLRs for the transmitted bits, in order.
    Returns:
      [..., T*n] full-length LLR stream with 0 at punctured positions.
    """
    mask = puncture_mask(pattern, T)
    llrs = jnp.asarray(llrs)
    n_total = mask.size
    positions = jnp.asarray(np.nonzero(mask)[0])
    out = jnp.zeros(llrs.shape[:-1] + (n_total,), llrs.dtype)
    return out.at[..., positions].set(llrs)
