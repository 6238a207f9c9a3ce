"""Channel models and modulation.

The reference's only channel is an IID coded-bit flipper used by the BER
harness (corruptCodedArray, berTestK7/berTestK7.c:29-43), standing in for
BPSK over AWGN at a matched uncoded BER (berTestK7.c:95-103).  This module
provides that BSC plus a real AWGN/BPSK path with soft outputs (LLRs), which
the MATLAB oracles simulate (scripts/matlab/viterbiBEREstimate.m:65-99) and
BASELINE.json config 3 requires.

Channel corruption is the reference's notion of fault injection (SURVEY.md
§5) — a product feature, modeled here as pure functions of a jax PRNG key so
sweeps parallelize across SNR points and packets.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CodeSpec


def bsc(key, segment_bits, p):
    """Binary symmetric channel: flip each bit IID with probability p.

    Twin of corruptCodedArray (berTestK7.c:29-43), which draws one uniform
    per coded bit and flips when below the uncoded BER.
    """
    flips = jax.random.uniform(key, segment_bits.shape) < p
    return segment_bits ^ flips.astype(segment_bits.dtype)


def bsc_segments(key, segments, n: int, p):
    """BSC applied to packed n-bit segments (each uint8 entry holds n coded
    bits, the reference's codedSegments layout)."""
    segments = jnp.asarray(segments, jnp.uint8)
    flips = jax.random.uniform(key, segments.shape + (n,)) < p
    # sum with an explicit uint8 accumulator: jnp.sum would promote to
    # uint32 and the XOR would widen the whole result off the packed
    # codedSegments contract
    mask = jnp.sum(
        flips.astype(jnp.uint8) << jnp.arange(n, dtype=jnp.uint8), axis=-1,
        dtype=jnp.uint8)
    return segments ^ mask


def uncoded_ber_bpsk(snr_db: float, oversample: int = 4) -> float:
    """Uncoded BPSK bit error rate at a given SNR with oversampling.

    Reproduces the berTestK7 operating points (berTestK7.c:95-96,103): the
    harness converts SNR to EbN0 = SNR + 10*log10(oversample) and uses
    Q(sqrt(2*EbN0_lin)).
    """
    ebn0_db = snr_db + 10.0 * math.log10(oversample)
    ebn0 = 10.0 ** (ebn0_db / 10.0)
    return 0.5 * math.erfc(math.sqrt(ebn0))


def bpsk_modulate(bits):
    """Map bit b -> symbol (1 - 2b): 0 -> +1, 1 -> -1."""
    return 1.0 - 2.0 * jnp.asarray(bits, jnp.float32)


def awgn(key, symbols, ebn0_db: float, rate: float, bits_per_symbol: int = 1):
    """Add white Gaussian noise at the given Eb/N0 for a code of the given
    rate.  Es/N0 = Eb/N0 * rate * bits_per_symbol; noise var = N0/2 per real
    dimension with Es = 1."""
    esn0 = 10.0 ** (ebn0_db / 10.0) * rate * bits_per_symbol
    sigma = jnp.sqrt(1.0 / (2.0 * esn0))
    noise = jax.random.normal(key, symbols.shape) * sigma
    return symbols + noise


def bpsk_llr(received, ebn0_db: float, rate: float):
    """Exact channel LLRs for BPSK over AWGN: L = 4*Es/N0 * y (positive
    favors bit 0).  Input shape [..., n_coded_bits]."""
    esn0 = 10.0 ** (ebn0_db / 10.0) * rate
    return 4.0 * esn0 * received


def hard_decision(llr):
    """LLR -> hard bit (negative LLR means bit 1)."""
    return (llr < 0).astype(jnp.uint8)


def segments_to_bits(segments, n: int):
    """Unpack n-bit segments into a coded bit-stream.

    Transmission order within a segment: generator 0's bit first — the
    reference's segment packs generator j at bit j (convEncode.c:155-159) and
    the BER harness flips bits j=0..n-1 in that order (berTestK7.c:33-40).
    """
    segments = jnp.asarray(segments, jnp.uint8)
    j = jnp.arange(n, dtype=jnp.uint8)
    bits = (segments[..., None] >> j) & 1
    return bits.reshape(*segments.shape[:-1], segments.shape[-1] * n)


def bits_to_segments(bits, n: int):
    """Pack a coded bit-stream back into n-bit segments (inverse of
    segments_to_bits)."""
    bits = jnp.asarray(bits, jnp.uint8)
    grouped = bits.reshape(*bits.shape[:-1], bits.shape[-1] // n, n)
    j = jnp.arange(n, dtype=jnp.uint8)
    return jnp.sum(grouped << j, axis=-1).astype(jnp.uint8)
