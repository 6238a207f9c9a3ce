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


def main(argv):
    which = argv[1] if len(argv) > 1 else "decode"
    print(describe(NASA_K7))
    if which == "encode":
        print(f"encoder: {bench_encode(verbose=True):.2f} Mbit/s avg")
    else:
        print(f"decoder: {bench_decode(verbose=True):.2f} Mbit/s avg")


if __name__ == "__main__":
    main(sys.argv)
