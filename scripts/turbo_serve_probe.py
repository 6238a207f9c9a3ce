"""Diagnose the turbo serving wall-vs-device gap (VERDICT r4 next #1).

CURVES_EARLYTERM_r04 showed 195-258 Mbit/s WALL against ~500 Mbit/s
profiler device truth for the same chain.  This probe isolates where
the factor ~2 goes, variant by variant, at the serving shape
(B=2048 x L=1024, rate-1/2, 2.0 dB):

  v1  early chain as-is (returns bits + lapp + ok + iters)
  v2  early chain, SERVING outputs only (packed bytes + ok + iters —
      drops the [B, L] int32 lapp, ~8.4 MB/call of output)
  v3  fixed 6-iter chain as-is (bits + lapp)
  v4  fixed 6-iter chain, packed bytes only

For each: profiler device us/call (8 calls) and deep-queue wall
(escalating until a >2 s window, every call a unique
(buffer, rotation) pair so the tunnel cannot dedupe).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from convolutionalencdec_tpu.harness.curve import awgn  # noqa: E402
from convolutionalencdec_tpu.ops import lte  # noqa: E402
from convolutionalencdec_tpu.ops.channel import bpsk_llr, bpsk_modulate  # noqa: E402
from convolutionalencdec_tpu.ops.crc import CRC24B, crc_append  # noqa: E402
from convolutionalencdec_tpu.ops.metrics import quantize_llrs  # noqa: E402

B, L = 2048, 1024
E = 2 * (L + 4)
EBN0 = 2.0

rng = np.random.default_rng(29)
key = jax.random.PRNGKey(31)
kmsg, kch = jax.random.split(key)
payload = jax.random.bernoulli(kmsg, 0.5, (B, L - 24)).astype(jnp.uint8)
msgs = np.asarray(crc_append(CRC24B, payload))
tx = lte.lte_turbo_encode_batch(jnp.asarray(msgs), E)
rate = L / E


def make_q(k):
    rx = awgn(k, bpsk_modulate(tx), EBN0, rate)
    return quantize_llrs(bpsk_llr(rx, EBN0, rate), qmax=31).astype(jnp.int32)


NBUF = 8
bufs = [jax.device_put(make_q(k)) for k in jax.random.split(kch, NBUF)]
#: rotation scalars: deep wall windows cycle (buffer, rotation) pairs so
#: every execution is unique — a bare 8-buffer ring dedupes past 8 calls
#: (the bench.py --turbo finding this probe predates).
rolls = [jax.device_put(jnp.int32(r)) for r in range(B)]

from convolutionalencdec_tpu.ops.bits import pack_bits as _pack  # noqa: E402


@jax.jit
def v1(q, r):
    return lte.lte_turbo_decode_early(jnp.roll(q, r, axis=0), L)


@jax.jit
def v2(q, r):
    bits, _, ok, iters = lte.lte_turbo_decode_early(
        jnp.roll(q, r, axis=0), L)
    return _pack(bits), ok, iters


@jax.jit
def v3(q, r):
    return lte.lte_turbo_decode(jnp.roll(q, r, axis=0), L, n_iters=6,
                                use_kernel=True)


@jax.jit
def v4(q, r):
    bits, _ = lte.lte_turbo_decode(jnp.roll(q, r, axis=0), L, n_iters=6,
                                   use_kernel=True)
    return _pack(bits)


def first_leaf(o):
    return jax.tree_util.tree_leaves(o)[0]


variants = {"v1_early_full": v1, "v2_early_packed": v2,
            "v3_fixed_full": v3, "v4_fixed_packed": v4}

for name, f in variants.items():
    first_leaf(f(bufs[0], rolls[0])).block_until_ready()   # compile

# sanity: v2 decodes correctly (roll 0 = the un-rotated batch)
pk, ok, it = v2(bufs[0], rolls[0])
bits_ref = np.unpackbits(np.asarray(pk), axis=1)[:, :L]
print(f"sanity: accept={np.asarray(ok).mean():.3f} iters={int(it)} "
      f"bler={(bits_ref != msgs).any(1).mean():.4f}", flush=True)

# profiler device truth
import collections
import glob
import gzip
import json
import shutil

shutil.rmtree("/tmp/turbo_serve_prof", ignore_errors=True)
jax.profiler.start_trace("/tmp/turbo_serve_prof")
for name, f in variants.items():
    for i in range(8):
        out = f(bufs[i % NBUF], rolls[i])
    first_leaf(out).block_until_ready()
jax.profiler.stop_trace()
tf = sorted(glob.glob("/tmp/turbo_serve_prof/**/*.trace.json.gz",
                      recursive=True))[-1]
ev = json.load(gzip.open(tf))["traceEvents"]
dur = collections.Counter()
cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e and e.get("name", "").startswith("jit_"):
        k = e["name"].split("(")[0]
        dur[k] += e["dur"]
        cnt[k] += 1
print("--- device truth (us/call) ---")
for k, v in dur.most_common(12):
    print(f"  {k}: {v / max(cnt[k], 1):.0f} us/call x{cnt[k]}")

# deep-queue wall per variant
print("--- wall (deep queue, unique ring) ---")
for name, f in variants.items():
    iters = 8
    while True:
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(bufs[i % NBUF], rolls[(i // NBUF) % B])
        first_leaf(out).block_until_ready()
        dt = time.perf_counter() - t0
        if dt > 2.0 or iters * 2 > NBUF * B:
            break
        iters *= 2
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(bufs[i % NBUF], rolls[(i // NBUF) % B])
        first_leaf(out).block_until_ready()
        dt = min(dt, time.perf_counter() - t0)
    mbps = B * L * iters / dt / 1e6
    print(f"  {name}: {dt / iters * 1e3:.2f} ms/call  {mbps:.0f} Mbit/s "
          f"({iters} calls)", flush=True)
