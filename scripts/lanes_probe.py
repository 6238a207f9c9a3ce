"""Probe SWAR forward/traceback throughput vs tile width (LANES).

Widening the tile from 128 lanes (1 vreg) to 256/512 gives the Mosaic
scheduler independent vreg-ops per ACS step — the per-tile dependency
chain is the suspected gap between 27 measured and ~19 predicted
cycles/step.  Usage: LANES=256 python scripts/lanes_probe.py
"""
import sys, os, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

import convolutionalencdec_tpu.kernels.acs_swar as S

L = int(os.environ.get("LANES", "128"))
S.LANES = L
S.SWAR_TILE = 4 * L
S.SWAR_TILE16 = 2 * L

from convolutionalencdec_tpu.params import NASA_K7

spec = NASA_K7
B, T = 2048, 2064
rng = np.random.default_rng(0)
seg = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))

seg_packed = S._pack_channels(seg)
print("packed shape", seg_packed.shape, "LANES", L)

fwd = jax.jit(lambda s: S.acs_forward_batch_swar(spec, s)[0])
decs = jax.block_until_ready(fwd(seg_packed))
tb = jax.jit(lambda d: S.traceback_batch_swar(spec, d, T - 10))
out = jax.block_until_ready(tb(decs))

# correctness vs reference unpack path: compare against LANES=128 result
# computed by the committed module semantics (same channel mapping only
# when L==128), so just check self-consistency via the public decode.
jax.profiler.start_trace("/tmp/lanes_prof")
o = None
for _ in range(8):
    d = fwd(seg_packed)
    o = tb(d)
_ = np.asarray(o)
jax.profiler.stop_trace()

files = glob.glob("/tmp/lanes_prof/**/*.trace.json.gz", recursive=True)
for fl in files:
    ev = json.load(gzip.open(fl))["traceEvents"]
    dur = collections.Counter(); cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if "swar" in name:
                key = name.split("(")[0]
                dur[key] += e["dur"]; cnt[key] += 1
    for k in sorted(dur):
        print(f"  {dur[k]/cnt[k]:8.1f} us/call x{cnt[k]:<4d} {k}")
