import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K

if len(sys.argv) > 1:
    K.B_TILE = int(sys.argv[1])
print("B_TILE =", K.B_TILE, flush=True)
spec = fec.NASA_K7
B, L = 2048, 2048
rng = np.random.default_rng(9865)
msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
coded = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
flip = rng.random(coded.shape) < 0.03
coded ^= (flip * rng.integers(1, 4, coded.shape)).astype(np.uint8)
dev = jax.device_put(jnp.asarray(coded))
out = jax.block_until_ready(K.viterbi_decode_batch(spec, dev))
assert (np.asarray(out) != msgs).mean() < 2e-3
jax.profiler.start_trace("/tmp/bt_prof")
for _ in range(8):
    out = K.viterbi_decode_batch(spec, dev)
jax.block_until_ready(out)
jax.profiler.stop_trace()
f = sorted(glob.glob("/tmp/bt_prof/**/*.trace.json.gz", recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
dur = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        n = e.get("name", "")
        if n.startswith(("jit_", "acs_", "traceback_")):
            dur[n.split("(")[0]] += e["dur"]; cnt[n.split("(")[0]] += 1
for k_, v in dur.most_common(8):
    print(f"  {k_}: {v/max(cnt[k_],1):.0f} us/call x{cnt[k_]}", flush=True)
