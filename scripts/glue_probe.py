"""Profiler A/B of XLA glue variants for the SWAR decode path (real TPU).

Variant A: current viterbi_decode_batch (shift-pack + field unpack +
full-size bit-unpack epilogue).
Variant B: transpose+bitcast pack (channel 4c+f at lane c field f),
bitcast unpack, transpose-packed-bytes-first epilogue.

Wall-clock on tiny ops is dispatch-limited through the axon tunnel, so
this sums device-lane events from a jax.profiler trace instead.
"""
import sys, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from convolutionalencdec_tpu.params import NASA_K7
import convolutionalencdec_tpu.kernels.acs_pallas as K
from convolutionalencdec_tpu.kernels.acs_swar import (
    acs_forward_batch_swar, traceback_batch_swar)
from convolutionalencdec_tpu.kernels.acs_pallas import PACK

spec = NASA_K7
B, T = 2048, 2054
Tp = 2064
rng = np.random.default_rng(0)
seg = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))
L = T - spec.S


@jax.jit
def decode_cur(segments):
    return K.viterbi_decode_batch(spec, segments)


@jax.jit
def decode_new(segments):
    seg_p = jnp.pad(segments, ((0, 0), (0, Tp - T)))
    packed32 = jax.lax.bitcast_convert_type(
        seg_p.T.reshape(Tp, B // 4, 4), jnp.int32)
    decs, _ = acs_forward_batch_swar(spec, packed32)
    out32 = traceback_batch_swar(spec, decs, T)
    TG = out32.shape[0]
    packed = jax.lax.bitcast_convert_type(
        out32.reshape(TG, B // 4), jnp.uint8).reshape(TG, B)
    pt = packed.T                              # (B, TG) u8
    j = jnp.arange(PACK, dtype=jnp.uint8).reshape(1, 1, PACK)
    bits = (pt[:, :, None] >> j) & 1
    return bits.reshape(B, -1)[:, :L]


a = decode_cur(seg)
b = decode_new(seg)
print("equal:", bool(jnp.array_equal(a, b)))

jax.profiler.start_trace("/tmp/glue_prof")
for _ in range(8):
    a = decode_cur(seg)
_ = np.asarray(a)
for _ in range(8):
    b = decode_new(seg)
_ = np.asarray(b)
jax.profiler.stop_trace()

files = glob.glob("/tmp/glue_prof/**/*.trace.json.gz", recursive=True)
for f in files:
    ev = json.load(gzip.open(f))["traceEvents"]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")[:70]
            dur[name] += e["dur"]
            cnt[name] += 1
    print("== top ops by total us ==")
    for k, v in dur.most_common(30):
        print(f"  {v:>10d} us  x{cnt[k]:<4d} {k}")
