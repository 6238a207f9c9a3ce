"""Measure VPU primitive-op THROUGHPUT on the real chip.

Each synthetic kernel runs NCH independent chains (ILP) of a
data-dependent primitive on (8, 256) int32 values (2 vregs each), with
the input varying per program id (Mosaic hoists grid-invariant bodies).
Chains are data-dependent (no constant folding) and independent of each
other (throughput, not latency).  Per-op cost = time / (OPS*NCH*G).
"""
import sys, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 64, 256          # input block: 8 chain seeds of (8, 256)
NCH = 8
OPS = 96                # per-chain length
G = 64


def make(op):
    def kernel(x_ref, o_ref):
        vs = [x_ref[8 * i:8 * (i + 1), :] for i in range(NCH)]
        for i in range(OPS):
            vs = [op(v, i) for v in vs]
        acc = vs[0]
        for v in vs[1:]:
            acc = acc + v
        o_ref[:] = jnp.concatenate([acc] * NCH, axis=0)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((R, C), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, C), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * R, C), jnp.int32),
        )(x)
    return run


PRIMS = {
    # every op depends on the previous chain value AND is not foldable
    "add": lambda v, i: v + (v >> 31) + (i | 1) if False else v + ((v >> 1) | 1),
    "mul": lambda v, i: v * ((v & 7) | 1),
    "shr_v": lambda v, i: (v >> 1) + (i & 1),
    "and_add": lambda v, i: (v & 0x7FFF7FFF) + (i | 1),
    "cmp_where": lambda v, i: jnp.where(v > (i | 1), v - 1, v + 1),
    "minimum": lambda v, i: jnp.minimum(v * 1, v + (i | 1)),
    "swar_sel": lambda v, i: v + ((v >> 15) & 0x10001) * ((v & 0xFF) - i),
}

x = jnp.asarray(np.random.default_rng(0).integers(
    1, 1 << 20, (G * R, C), dtype=np.int32))

fns = {k: make(op) for k, op in PRIMS.items()}
for k, f in fns.items():
    jax.block_until_ready(f(x))
print("compiled", flush=True)

jax.profiler.start_trace("/tmp/roofline_prof2")
for k, f in fns.items():
    for _ in range(8):
        o = f(x)
    jax.block_until_ready(o)
jax.profiler.stop_trace()

f = sorted(glob.glob("/tmp/roofline_prof2/**/*.trace.json.gz",
                     recursive=True))[-1]
ev = json.load(gzip.open(f))["traceEvents"]
pnames = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pnames[e["pid"]] = e["args"].get("name", "?")
rows = collections.defaultdict(lambda: [0, 0, 1e30])
for e in ev:
    if (e.get("ph") == "X" and "dur" in e
            and "TPU" in pnames.get(e.get("pid"), "")
            and e["name"].startswith(("kernel", "jit_run"))):
        r = rows[e["name"]]
        r[0] += e["dur"]; r[1] += 1; r[2] = min(r[2], e["ts"])
dev = sorted(((v[2], k, v[0] / v[1]) for k, v in rows.items()
              if v[1] >= 8 and k.startswith("kernel")), key=lambda t: t[0])
VREGS = 2   # (8, 256) per chain value
print(f"{OPS} ops x {NCH} chains x grid {G}; chain value = {VREGS} vregs")
for (ts, k, us), prim in zip(dev, list(PRIMS)):
    cyc = us * 940 / (OPS * NCH * G)
    print(f"  {prim:10s}: {us:6.0f} us  {cyc:5.2f} cyc/op "
          f"({cyc/VREGS:.2f} cyc/vreg)", flush=True)
