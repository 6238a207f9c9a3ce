"""Throughput harnesses — speedEncode/speedDecode equivalents.

Methodology mirrors the reference benches (speedEncode.c:37-103,
speedDecode.c:41-116): pre-generate a warm working set, run the operation
in a steady-state loop, report Mbit/s of uncoded-side bits.  On TPU the
working set is a resident batch of channels, the device dispatch queue
plays the role of the pinned worker thread, and `block_until_ready`
replaces the compiler barriers around the timers.

Run as a module for the endless-loop behavior of the originals:
    python -m convolutionalencdec_tpu.harness.speed [encode|decode]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CodeSpec, NASA_K7
from ..ops.encode import encode_bits
from ..ops.viterbi import viterbi_decode
from ..utils.telemetry import ThroughputMeter, describe


def _decoder(spec: CodeSpec, batch: int):
    if (jax.default_backend() == "tpu" and spec.k == 1
            and spec.has_poly_symmetry):
        from ..kernels import viterbi_decode_batch
        return functools.partial(viterbi_decode_batch, spec)
    return jax.jit(jax.vmap(functools.partial(viterbi_decode, spec)))


def bench_encode(spec: CodeSpec = NASA_K7, *, batch: int = 1024,
                 packet_bits: int = 8192, seconds: float = 3.0,
                 verbose: bool = False) -> float:
    """Steady-state encoder throughput in Mbit/s (uncoded bits consumed,
    the reference's metric, speedEncode.c:91-92)."""
    rng = np.random.default_rng(16)   # 16 packets round-robin in the ref
    bits = jax.device_put(jnp.asarray(
        rng.integers(0, 2, (batch, packet_bits), dtype=np.uint8)))
    enc = jax.jit(lambda b: encode_bits(spec, b, True)[0])
    enc(bits).block_until_ready()     # compile
    meter = ThroughputMeter()
    deadline = time.perf_counter() + seconds
    while time.perf_counter() < deadline:
        out = enc(bits)
        out.block_until_ready()
        line = meter.tick(batch * packet_bits)
        if verbose and line:
            print(f"encode: {line}", flush=True)
    return meter.average_mbps


def bench_decode(spec: CodeSpec = NASA_K7, *, batch: int = 1024,
                 packet_bits: int = 2048, seconds: float = 5.0,
                 flip_p: float = 0.03, verbose: bool = False) -> float:
    """Steady-state decoder throughput in Mbit/s (decoded bits,
    speedDecode.c:103-104)."""
    rng = np.random.default_rng(16)
    msgs = rng.integers(0, 2, (batch, packet_bits), dtype=np.uint8)
    coded = np.asarray(encode_bits(spec, msgs)[0]).copy()
    flip = rng.random(coded.shape) < flip_p
    coded ^= (flip * rng.integers(1, 1 << spec.n, coded.shape)).astype(
        np.uint8)
    coded_dev = jax.device_put(jnp.asarray(coded))
    decode = _decoder(spec, batch)
    decode(coded_dev).block_until_ready()  # compile
    meter = ThroughputMeter()
    deadline = time.perf_counter() + seconds
    while time.perf_counter() < deadline:
        out = decode(coded_dev)
        out.block_until_ready()
        line = meter.tick(batch * packet_bits)
        if verbose and line:
            print(f"decode: {line}", flush=True)
    return meter.average_mbps


def bench_decode_ragged(spec: CodeSpec = NASA_K7, *, batch: int = 1024,
                        lengths=(2048,), seconds: float = 5.0,
                        flip_p: float = 0.03,
                        verbose: bool = False) -> float:
    """Steady-state RAGGED-batch decode throughput in Mbit/s of decoded
    message bits (sum of per-channel lengths per call).

    Channel b gets message length `lengths[b % len(lengths)]`.  With a
    single entry this isolates the ragged machinery's overhead against
    `bench_decode` (same work, per-channel masks live); with mixed
    lengths it measures real mixed-traffic service rate, where the
    shorter channels' padding to Tmax is the dominant cost — the number
    an operator comparing against one-packet-per-call serving
    (the reference's only mode) actually cares about.
    """
    rng = np.random.default_rng(16)
    lens = np.asarray([lengths[i % len(lengths)] for i in range(batch)])
    T = lens + spec.S
    Tmax = int(T.max())
    segs = rng.integers(0, 1 << spec.n, (batch, Tmax), dtype=np.uint8)
    for L in sorted(set(int(x) for x in lens)):
        idx = np.nonzero(lens == L)[0]
        msgs = rng.integers(0, 2, (len(idx), L), dtype=np.uint8)
        coded = np.asarray(encode_bits(spec, msgs)[0]).copy()
        flip = rng.random(coded.shape) < flip_p
        coded ^= (flip * rng.integers(1, 1 << spec.n, coded.shape)
                  ).astype(np.uint8)
        segs[idx, : L + spec.S] = coded
    segs_dev = jax.device_put(jnp.asarray(segs))
    lens_dev = jax.device_put(jnp.asarray(T, jnp.int32))
    if jax.default_backend() == "tpu":
        from ..kernels import viterbi_decode_batch_bytes_ragged
        decode = functools.partial(viterbi_decode_batch_bytes_ragged, spec)
    else:
        from ..ops.viterbi import viterbi_decode_ragged
        decode = jax.jit(functools.partial(viterbi_decode_ragged, spec))
    decode(segs_dev, lens_dev).block_until_ready()   # compile
    bits_per_call = int(lens.sum())
    meter = ThroughputMeter()
    deadline = time.perf_counter() + seconds
    # Queue several calls per timing tick so per-dispatch overhead
    # overlaps device compute (bench.py's steady-serving methodology;
    # the reference's inner 16-packet loop plays the same role,
    # speedDecode.c:78-103).
    q = 8
    while time.perf_counter() < deadline:
        for _ in range(q):
            out = decode(segs_dev, lens_dev)
        out.block_until_ready()
        line = meter.tick(bits_per_call * q)
        if verbose and line:
            print(f"ragged decode: {line}", flush=True)
    return meter.average_mbps


def main(argv):
    which = argv[1] if len(argv) > 1 else "decode"
    print(describe(NASA_K7))
    if which == "encode":
        print(f"encoder: {bench_encode(verbose=True):.2f} Mbit/s avg")
    elif which == "ragged":
        print(f"ragged (uniform 2048): "
              f"{bench_decode_ragged(verbose=True):.2f} Mbit/s avg")
        print(f"ragged (mixed 2048/1024/512/1536): "
              f"{bench_decode_ragged(lengths=(2048, 1024, 512, 1536), verbose=True):.2f}"
              f" Mbit/s avg")
    else:
        print(f"decoder: {bench_decode(verbose=True):.2f} Mbit/s avg")


if __name__ == "__main__":
    main(sys.argv)
