"""Probe K=9 (NS=256) SWAR kernel timings vs tile width and chunk size.

ROADMAP item 7: fwd 1062 us at NS=256 vs 217 at NS=64 — 4.9x for 4x
the states.  Candidate causes: VMEM pressure (decision accumulators
are 4x taller per tile) and the 32-row stage-2 interleave.  This probe
measures forward + traceback with LANES in {128, 256} and CHUNK_F in
{24, 48} to separate the VMEM-pressure hypothesis from the relayout
one.  Usage: LANES=128 CHUNK=24 python scripts/k9_probe.py
"""
import sys, os, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

import convolutionalencdec_tpu.kernels.acs_swar as S

C = int(os.environ.get("CHUNK", "48"))
S.CHUNK_F = C
S.GPC = C // 8

L = int(os.environ.get("LANES", "256"))
S.LANES = L
S.SWAR_TILE = 4 * L
S.SWAR_TILE16 = 2 * L
# tile_lanes() would otherwise pin NS>=256 to one-vreg tiles; the probe
# must control the kernel tile width to A/B the two baselines.
S.TILE_LANES_OVERRIDE = L

from convolutionalencdec_tpu.params import K9_561_753

spec = K9_561_753
B = 2048
T = int(os.environ.get("T", "2064" if C == 48 else "2040"))  # T % CHUNK_F == 0
rng = np.random.default_rng(0)
seg = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))

seg_packed = S._pack_channels(seg)
print("packed shape", seg_packed.shape, "LANES", L, "CHUNK_F", C)

fwd = jax.jit(lambda s: S.acs_forward_batch_swar(spec, s)[0])
decs = jax.block_until_ready(fwd(seg_packed))
tb = jax.jit(lambda d: S.traceback_batch_swar(spec, d, T - 10))
out = jax.block_until_ready(tb(decs))

trace_dir = "/tmp/k9_prof_L%d_C%d" % (L, C)
import shutil
shutil.rmtree(trace_dir, ignore_errors=True)
jax.profiler.start_trace(trace_dir)
o = None
for _ in range(8):
    d = fwd(seg_packed)
    o = tb(d)
_ = np.asarray(o)
jax.profiler.stop_trace()

files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
for fl in files:
    ev = json.load(gzip.open(fl))["traceEvents"]
    dur = collections.Counter(); cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")[:60]
            dur[name] += e["dur"]
            cnt[name] += 1
    print("== top ops by total us ==")
    for nm, v in dur.most_common(12):
        print("  %10d us  x%-4d %s" % (v, cnt[nm], nm))
