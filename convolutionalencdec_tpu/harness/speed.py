"""Throughput harnesses — speedEncode/speedDecode equivalents.

Methodology mirrors the reference benches (speedEncode.c:37-103,
speedDecode.c:41-116): pre-generate a warm working set, run the operation
in a steady-state loop, report Mbit/s of uncoded-side bits.  On TPU the
working set is a resident batch of channels, the device dispatch queue
plays the role of the pinned worker thread, and `block_until_ready`
replaces the compiler barriers around the timers.

Measurement integrity (round 5): every loop queues `q` calls per timing
tick and makes EVERY call a unique (buffer, rotation) execution — the
dispatch tunnel dedupes identical executions (docs/ROOFLINE.md §6), and
the original block-per-call same-buffer loops measured cache hits: the
round-1 encoder "196.9 Gbit/s" implied 42 µs/call through a ~2.7 ms
dispatch, the dedup signature.  Corrected numbers in RESULTS.md.

Run as a module for the endless-loop behavior of the originals:
    python -m convolutionalencdec_tpu.harness.speed [encode|decode|ragged]
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

#: Distinct pre-staged buffers per bench (the reference round-robins 16
#: packets, speedDecode.c:55-60); rotations multiply the unique pool.
NBUF = 8


def _decoder(spec: CodeSpec):
    from ..kernels import tpu_kernels_default
    if tpu_kernels_default(spec):
        from ..kernels import viterbi_decode_batch
        return functools.partial(viterbi_decode_batch, spec)
    return jax.jit(jax.vmap(functools.partial(viterbi_decode, spec)))


def _ring(arr: np.ndarray):
    """NBUF device-resident row-rotations of a host working set."""
    return [jax.device_put(jnp.asarray(np.roll(arr, r, axis=0)))
            for r in range(NBUF)]


def _steady_loop(call, bufs, rolls, bits_per_call: int, seconds: float,
                 verbose: bool, label: str, q: int = 256) -> float:
    """Deep-queue steady state: q calls per blocking tick (the fixed
    ~2.7 ms dispatch latency only amortizes over long uninterrupted
    queues: q=8 measured 612 Mbit/s where q=512 measured 6.9 Gbit/s
    for the identical kernel call), every call a unique (buffer, rotation)
    pair, total calls capped at the unique pool so the tunnel can
    never serve a deduped repeat."""
    meter = ThroughputMeter()
    deadline = time.perf_counter() + seconds
    pool = NBUF * len(rolls)
    q = max(1, min(q, pool))       # small configs: shrink the window
    i = 0
    while time.perf_counter() < deadline and i + q <= pool:
        for _ in range(q):
            out = call(bufs[i % NBUF], rolls[(i // NBUF) % len(rolls)])
            i += 1
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        line = meter.tick(bits_per_call * q)
        if verbose and line:
            print(f"{label}: {line}", flush=True)
    return meter.average_mbps


def bench_encode(spec: CodeSpec = NASA_K7, *, batch: int = 1024,
                 packet_bits: int = 8192, seconds: float = 3.0,
                 verbose: bool = False) -> float:
    """Steady-state encoder throughput in Mbit/s (uncoded bits consumed,
    the reference's metric, speedEncode.c:91-92)."""
    rng = np.random.default_rng(16)   # 16 packets round-robin in the ref
    bits = rng.integers(0, 2, (batch, packet_bits), dtype=np.uint8)
    bufs = _ring(bits)
    rolls = [jax.device_put(jnp.int32(r)) for r in range(batch)]
    enc = jax.jit(lambda b, r: encode_bits(
        spec, jnp.roll(b, r, axis=0), True)[0])
    enc(bufs[0], rolls[0]).block_until_ready()     # compile
    return _steady_loop(enc, bufs, rolls, batch * packet_bits, seconds,
                        verbose, "encode")


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
    bufs = _ring(coded)
    rolls = [jax.device_put(jnp.int32(r)) for r in range(batch)]
    base = _decoder(spec)
    decode = jax.jit(lambda c, r: base(jnp.roll(c, r, axis=0)))
    decode(bufs[0], rolls[0]).block_until_ready()  # compile
    return _steady_loop(decode, bufs, rolls, batch * packet_bits,
                        seconds, verbose, "decode")


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
    lens_dev = jax.device_put(jnp.asarray(T, jnp.int32))
    if jax.default_backend() == "tpu":
        from ..kernels import viterbi_decode_batch_bytes_ragged
        base = functools.partial(viterbi_decode_batch_bytes_ragged, spec)
    else:
        from ..ops.viterbi import viterbi_decode_ragged
        base = jax.jit(functools.partial(viterbi_decode_ragged, spec))
    # Rotation must keep (segments, lengths) PAIRED, so roll BOTH by
    # the same traced amount inside the jit; the NBUF ring carries
    # independent extra noise draws (host rolls would desync lens).
    decode = jax.jit(lambda s, r: base(jnp.roll(s, r, axis=0),
                                       jnp.roll(lens_dev, r, axis=0)))
    bufs = []
    for v in range(NBUF):
        extra = (rng.random(segs.shape) < (0.0 if v == 0 else 0.005))
        varied = segs ^ (extra * rng.integers(
            1, 1 << spec.n, segs.shape)).astype(np.uint8)
        bufs.append(jax.device_put(jnp.asarray(varied)))
    rolls = [jax.device_put(jnp.int32(r)) for r in range(batch)]
    decode(bufs[0], rolls[0]).block_until_ready()   # compile
    return _steady_loop(decode, bufs, rolls, int(lens.sum()), seconds,
                        verbose, "ragged decode")


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
