"""Profile single-pass vs two-pass fused block decode on the real TPU.

jit-wrapped (trace once, dispatch many) — eager pallas_call retraces per
call and floods the profiler buffer with host events.
"""
import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K

spec = fec.NASA_K7
B, L = 2048, 2048
rng = np.random.default_rng(9865)
msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
coded = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
flip = rng.random(coded.shape) < 0.03
coded ^= (flip * rng.integers(1, 4, coded.shape)).astype(np.uint8)
dev = jax.device_put(jnp.asarray(coded))

T = coded.shape[1]
seg_p = K._pad_to(K._pad_to(dev, K.B_TILE, 0), K.CHUNK_F, 1)


@jax.jit
def two_pass(s):
    decs, _ = K.acs_forward_batch_fused(spec, s, False)
    return K.traceback_batch_fused(spec, decs, T, False)


@jax.jit
def one_pass(s):
    return K._block_decode_1p(spec, s, T, False, False)


print("compiling 2p...", flush=True)
o2 = jax.block_until_ready(two_pass(seg_p))
print("compiling 1p...", flush=True)
o1 = jax.block_until_ready(one_pass(seg_p))
assert np.array_equal(np.asarray(o1), np.asarray(o2)), "1p != 2p!"
print("bit-exact on TPU", flush=True)

for name, fn in [("2p", two_pass), ("1p", one_pass)]:
    t0 = time.perf_counter()
    for _ in range(100):
        a = fn(seg_p)
    jax.block_until_ready(a)
    dt = (time.perf_counter() - t0) / 100
    bits = B * L
    print(f"wall {name}: {dt*1e6:.0f} us/call  {bits/dt/1e9:.2f} Gbit/s", flush=True)

jax.profiler.start_trace("/tmp/prof_1p2")
for _ in range(16):
    a = two_pass(seg_p)
jax.block_until_ready(a)
for _ in range(16):
    b = one_pass(seg_p)
jax.block_until_ready(b)
jax.profiler.stop_trace()

f = sorted(glob.glob("/tmp/prof_1p2/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
dur = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e and not e.get("name", "$").startswith("$"):
        nm = e["name"]
        dur[nm] += e["dur"]; cnt[nm] += 1
for k_, v in dur.most_common(15):
    print(f"  {v/max(cnt[k_],1):8.0f} us/call x{cnt[k_]:<4d} {k_[:70]}", flush=True)
