"""Device-truth profile of the streaming kernel under one ablation mode.

Usage: python scripts/stream_prof_ablate.py [full|no_emit|no_re]
Prints total device us of the stream kernel per call (16-call trace).
"""
import sys, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 35
K.STREAM_ABLATE = mode if mode != "full" else None
spec = fec.NASA_K7
B, T = 2048, 2016
rng = np.random.default_rng(1)
coded = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))
st0 = K.stream_state_init(spec, B)
fn = lambda c, s: K.stream_decode_batch(spec, c, s, W)
out, st = fn(coded, st0)
_ = np.asarray(out)

jax.profiler.start_trace("/tmp/stream_prof_%s_w%d" % (mode, W))
s = st0
for _ in range(16):
    out, s = fn(coded, s)
_ = np.asarray(out); _ = np.asarray(s)
jax.profiler.stop_trace()

files = glob.glob(f"/tmp/stream_prof_{mode}_w{W}/**/*.trace.json.gz",
                  recursive=True)
dur = collections.Counter()
cnt = collections.Counter()
for f in files:
    ev = json.load(gzip.open(f))["traceEvents"]
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")[:48]
            dur[name] += e["dur"]
            cnt[name] += 1
print(f"== {mode} W={W}: top ops by total us (16 calls) ==", flush=True)
for k, v in dur.most_common(12):
    print(f"  {v:>10.0f} us  x{cnt[k]:<4d} {k}", flush=True)
