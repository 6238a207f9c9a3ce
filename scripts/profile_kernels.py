import sys, time, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K

spec = fec.NASA_K7
B, T = 2048, 2016
rng = np.random.default_rng(1)
coded = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))
st0 = K.stream_state_init(spec, B)

dec = lambda c: K.viterbi_decode_batch(spec, c)
stream = lambda c, s: K.stream_decode_batch(spec, c, s, 32)
o1 = dec(coded); _ = np.asarray(o1)
o2, s2 = stream(coded, st0); _ = np.asarray(o2)

jax.profiler.start_trace("/tmp/fec_prof")
for _ in range(4):
    o1 = dec(coded)
_ = np.asarray(o1)
s = st0
for _ in range(4):
    o2, s = stream(coded, s)
_ = np.asarray(o2)
jax.profiler.stop_trace()
print("trace done", flush=True)

files = glob.glob("/tmp/fec_prof/**/*.trace.json.gz", recursive=True)
print(files)
for f in files:
    ev = json.load(gzip.open(f))["traceEvents"]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")[:60]
            dur[name] += e["dur"]
            cnt[name] += 1
    print("== top ops by total us ==")
    for k, v in dur.most_common(25):
        print(f"  {v:>10d} us  x{cnt[k]:<4d} {k}")
