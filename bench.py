"""Headline throughput bench — speedDecode's TPU equivalent.

Methodology mirrors the reference's speed harness (speedDecode.c:41-116):
pre-encode a warm working set, run the decoder in steady state, report
Mbit/s of decoded (uncoded-side) bits.  On TPU the working set is a batch
of independent channels resident in HBM and the decoder is the Pallas
butterfly kernel; the baseline to beat is the reference's measured
~23.5 Mbit/s single-core decode rate (BASELINE.md).

Measurement integrity: the dispatch tunnel DEDUPES identical executions
(docs/ROOFLINE.md §6), so every timed call carries a distinct int32 TAG
that is echoed through the jitted function's output — any correct cache
must key on it, making every execution unique by argument content at
zero compute cost (measured: 0.419 ms/call tagged == 0.419 untagged;
a jnp.roll uniquifier cost 3%).  The monotonic (buffer, tag) pair index
runs across ALL windows (escalation + best-of-3) and is capped at the
pool size, so no window can ever re-execute a pair.

Prints ONE JSON line:
  {"metric": "decode_throughput", "value": N, "unit": "Mbit/s",
   "vs_baseline": N / 23.5}
`--turbo` runs the turbo serving bench instead (second metric line).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import convolutionalencdec_tpu as fec  # noqa: E402

BASELINE_MBPS = 23.5  # reference speedDecode on 1 vCPU (BASELINE.md)

# The reference has no turbo codec; the single-core baseline for the
# --turbo row is the repo's own independent C++ direct-form decoder
# (native/turbo_oracle.cpp): measured 1.03 ms/block = 1.0 Mbit/s for
# 6-iteration max-log decode at L=1024 on this box (g++ -O2).
TURBO_BASELINE_MBPS = 1.0

NBUF = 8


def _first(out):
    return jax.tree_util.tree_leaves(out)[0]


def _bestof_pairs(call, pool: int, window_target: float):
    """Escalating best-of-3 deep-queue wall timing over a MONOTONIC
    unique-pair index: window w times calls [start, start+iters) with
    start advancing across escalation and best-of windows alike, capped
    at `pool` unique pairs.  Returns (best_dt_seconds, iters)."""
    iters = 2
    used = 0
    while True:
        t0 = time.perf_counter()
        for i in range(used, used + iters):
            out = call(i)
        _first(out).block_until_ready()
        dt = time.perf_counter() - t0
        used += iters
        # escalate while the window is shallow AND the next window plus
        # its two best-of repeats still fit in the unique pool
        if dt > window_target or used + 12 * iters > pool:
            break
        iters *= 4
    for _ in range(2):
        if used + iters > pool:
            break
        t0 = time.perf_counter()
        for i in range(used, used + iters):
            out = call(i)
        _first(out).block_until_ready()
        used += iters
        dt = min(dt, time.perf_counter() - t0)
    return dt, iters


def turbo_main():
    """Steady-state turbo serving bench (the deep-queue unique-execution
    methodology applied to the production receive chain, closing the
    wall-vs-device gap CURVES_EARLYTERM_r04 showed at 37-49%).

    Serving point: B=2048 blocks x L=1024 (CRC24B payloads), rate-1/2
    at 2.0 dB, `lte_turbo_decode_early` (CRC-gated while_loop) with
    serving outputs only (packed message bytes + ok + iters; the
    [B, L] int32 lapp stays on device).  Prints ONE JSON line:
    {"metric": "turbo_decode_throughput", ...} in decoded message
    Mbit/s of wall time.
    """
    from convolutionalencdec_tpu.ops import lte
    from convolutionalencdec_tpu.ops.bits import pack_bits
    from convolutionalencdec_tpu.ops.channel import (awgn, bpsk_llr,
                                                     bpsk_modulate)
    from convolutionalencdec_tpu.ops.crc import CRC24B, crc_append
    from convolutionalencdec_tpu.ops.metrics import quantize_llrs

    B, L = 2048, 1024
    E = 2 * (L + 4)
    EBN0 = 2.0
    rate = L / E
    kmsg, kch = jax.random.split(jax.random.PRNGKey(9865))
    payload = jax.random.bernoulli(kmsg, 0.5, (B, L - 24)).astype(jnp.uint8)
    msgs = np.asarray(crc_append(CRC24B, payload))
    tx = lte.lte_turbo_encode_batch(jnp.asarray(msgs), E)

    def make_q(k):
        rx = awgn(k, bpsk_modulate(tx), EBN0, rate)
        return quantize_llrs(bpsk_llr(rx, EBN0, rate),
                             qmax=31).astype(jnp.int32)

    bufs = [jax.device_put(make_q(k)) for k in jax.random.split(kch, NBUF)]
    tags = [jax.device_put(jnp.int32(t)) for t in range(B)]
    pool = NBUF * len(tags)

    @jax.jit
    def serve(q, tag):
        bits, _, ok, iters = lte.lte_turbo_decode_early(q, L)
        return pack_bits(bits), ok, iters, tag + 1   # tag echo: see top

    by, ok, iters, _ = serve(bufs[0], tags[0])
    by.block_until_ready()
    got = np.unpackbits(np.asarray(by), axis=1)[:, :L]
    ok_np = np.asarray(ok)
    wrong = (got != msgs).any(1)
    assert not (ok_np & wrong).any(), "false accept in bench"
    assert ok_np.mean() > 0.99, f"accept rate {ok_np.mean()} at 2 dB"

    dt, iters_n = _bestof_pairs(
        lambda i: serve(bufs[i % NBUF], tags[(i // NBUF) % len(tags)]),
        pool, window_target=3.0)

    if "--profile" in sys.argv:
        trace_dir = "/tmp/fec_turbo_trace"
        jax.profiler.start_trace(trace_dir)
        for i in range(8):
            out = serve(bufs[i % NBUF], tags[i])
        out[0].block_until_ready()
        jax.profiler.stop_trace()
        print(f"profiler trace written to {trace_dir}", file=sys.stderr)

    mbps = B * L * iters_n / dt / 1e6
    print(f"early-term at {EBN0} dB: iters={int(iters)} "
          f"accept={ok_np.mean():.3f} "
          f"wall {dt / iters_n * 1e3:.2f} ms/call over {iters_n} calls",
          file=sys.stderr)
    print(json.dumps({
        "metric": "turbo_decode_throughput",
        "value": round(mbps, 2),
        "unit": "Mbit/s",
        "vs_baseline": round(mbps / TURBO_BASELINE_MBPS, 2),
    }))


def main():
    spec = fec.NASA_K7
    on_tpu = jax.default_backend() == "tpu"
    # Working set: B channels x L-bit packets (the reference uses 16 x
    # 2048-bit packets, speedDecode.c:55-60; the TPU build's unit of work
    # is a batch of channels).
    B = 2048 if on_tpu else 128
    L = 2048
    rng = np.random.default_rng(9865)
    msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
    coded = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
    flip = rng.random(coded.shape) < 0.03
    coded ^= (flip * rng.integers(1, 4, coded.shape)).astype(np.uint8)
    # NBUF distinct buffers (row-rotations) x B echoed tags = the
    # unique-execution pool (see module docstring); same bytes decoded
    # per call either way.
    coded_dev = jax.device_put(jnp.asarray(coded))
    bufs = [coded_dev] + [
        jax.device_put(jnp.asarray(np.roll(coded, r + 1, axis=0)))
        for r in range(NBUF - 1)]
    # 3B tags: deep enough for ~3.4 s windows (8192 calls) plus their
    # two best-of repeats without ever reusing a (buffer, tag) pair —
    # window RAMP (queue refill after each sync) costs ~2% at 1 s
    # windows, amortized away at full depth.
    tags = [jax.device_put(jnp.int32(t)) for t in range(3 * B)]
    pool = NBUF * len(tags)

    if on_tpu:
        # Decode to PACKED BYTES — the reference's speedDecode times
        # viterbiDecoderHard's packed-byte emit (speedDecode.c:78-116,
        # viterbiDecoder.c:152-189), and on the SWAR path the byte
        # format is also the fastest (MSb-first in-kernel emit).
        from convolutionalencdec_tpu.kernels import (
            viterbi_decode_batch_bytes)
        base = lambda c: viterbi_decode_batch_bytes(spec, c)  # noqa: E731
    else:
        base = jax.jit(jax.vmap(lambda c: fec.viterbi_decode(spec, c)))

    decode = jax.jit(lambda c, tag: (base(c), tag + 1))

    # Warm-up / compile (first TPU compile ~20-40 s).
    out, _ = decode(coded_dev, tags[0])
    out.block_until_ready()
    # At 3% segment corruption a small residual BER survives (correctly);
    # a broken decoder is off by orders of magnitude.
    got = np.asarray(out)
    if on_tpu:
        got = np.unpackbits(got, axis=1)[:, :L]
    ber = float((got != msgs).mean())
    assert ber < 2e-3, f"decode BER {ber} implausibly high in bench"

    # Steady state: deep dispatch queue so per-call overhead overlaps
    # device compute (the realistic continuous-serving regime).
    dt, iters = _bestof_pairs(
        lambda i: decode(bufs[i % NBUF], tags[(i // NBUF) % len(tags)]),
        pool, window_target=3.0)

    if "--profile" in sys.argv:
        # jax.profiler trace of the steady-state loop + analytic HBM
        # traffic counters (SURVEY §5 telemetry; docs/design.md table).
        from convolutionalencdec_tpu.utils import traffic_report
        trace_dir = "/tmp/fec_trace"
        jax.profiler.start_trace(trace_dir)
        for i in range(8):
            out = decode(bufs[i % NBUF], tags[i])
        _first(out).block_until_ready()
        jax.profiler.stop_trace()
        print(traffic_report(spec, B, L + spec.S), file=sys.stderr)
        print(f"profiler trace written to {trace_dir} "
              f"(view: tensorboard --logdir {trace_dir})", file=sys.stderr)

    mbps = (B * L * iters) / dt / 1e6
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(mbps, 2),
        "unit": "Mbit/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 2),
    }))


if __name__ == "__main__":
    if "--turbo" in sys.argv:
        turbo_main()
    else:
        main()
