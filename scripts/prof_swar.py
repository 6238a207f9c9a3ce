"""Profile SWAR vs int32 fused decode on the real TPU (jit-wrapped)."""
import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K
import convolutionalencdec_tpu.kernels.acs_swar as SW

spec = fec.NASA_K7
B, L = 2048, 2048
rng = np.random.default_rng(9865)
msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
coded = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
flip = rng.random(coded.shape) < 0.03
coded ^= (flip * rng.integers(1, 4, coded.shape)).astype(np.uint8)
dev = jax.device_put(jnp.asarray(coded))
T = coded.shape[1]
seg_p = K._pad_to(K._pad_to(dev, SW.SWAR_TILE, 0), K.CHUNK_F, 1)
seg_p256 = K._pad_to(K._pad_to(dev, K.B_TILE, 0), K.CHUNK_F, 1)


@jax.jit
def swar(s):
    return SW.swar_decode_packed(spec, s, T, False)


@jax.jit
def old_1p(s):
    return K._block_decode_1p(spec, s, T, False, False)


print("compiling swar...", flush=True)
o1 = jax.block_until_ready(swar(seg_p))
print("compiling 1p...", flush=True)
o2 = jax.block_until_ready(old_1p(seg_p256))
assert np.array_equal(np.asarray(o1), np.asarray(o2)), "swar != 1p!"
print("bit-exact on TPU", flush=True)

for name, fn, arg in [("swar", swar, seg_p), ("1p", old_1p, seg_p256)]:
    t0 = time.perf_counter()
    for _ in range(100):
        a = fn(arg)
    jax.block_until_ready(a)
    dt = (time.perf_counter() - t0) / 100
    print(f"wall {name}: {dt*1e6:.0f} us/call  {B*L/dt/1e9:.2f} Gbit/s",
          flush=True)

jax.profiler.start_trace("/tmp/prof_swar")
for _ in range(16):
    a = swar(seg_p)
jax.block_until_ready(a)
jax.profiler.stop_trace()

f = sorted(glob.glob("/tmp/prof_swar/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
pnames = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pnames[e["pid"]] = e["args"].get("name", "?")
dur = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if (e.get("ph") == "X" and "dur" in e
            and "TPU" in pnames.get(e.get("pid"), "")):
        dur[e["name"]] += e["dur"]; cnt[e["name"]] += 1
for k_, v in dur.most_common(12):
    print(f"  {v/max(cnt[k_],1):8.0f} us/call x{cnt[k_]:<4d} {k_[:60]}",
          flush=True)
