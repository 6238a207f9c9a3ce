"""Packed-dtype VPU throughput probe for the turbo fast-mode pricing:
int32 vs int16 vs int8 dependent add/min chains in a Pallas kernel.

Methodology per docs/ROOFLINE.md §6: unique input per timed call
(tunnel dedup), device truth from the profiler trace (sum of ph=="X"
jit_* events / calls).
"""
import sys, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 192
GRID = 64
ROWS = 64
CALLS = 8


def make(dtype):
    def kernel(x_ref, y_ref, o_ref):
        a = x_ref[:]
        c = y_ref[:]
        b = a
        for i in range(STEPS):
            b = jnp.minimum(b + a, c - b)
        o_ref[:] = b

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((ROWS, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((ROWS, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            grid=(GRID,),
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, 256), dtype),
        )(x, y)
    return run


key = jax.random.PRNGKey(0)
base = jax.random.randint(key, (GRID * ROWS, 256), -50, 50, jnp.int32)
results = {}
for dtype in (jnp.int32, jnp.int16, jnp.int8, jnp.bfloat16):
    name = np.dtype(dtype).name
    try:
        run = make(dtype)
        xs = [(base + i).astype(dtype) for i in range(CALLS)]
        y = (base[::-1] + 3).astype(dtype)
        out = jax.block_until_ready(run(xs[0], y))  # compile
        jax.profiler.start_trace(f"/tmp/i16prob_{name}")
        outs = [run(x, y) for x in xs]
        for o in outs:
            o.block_until_ready()
        jax.profiler.stop_trace()
        tot_us = 0
        n = 0
        for f in glob.glob(f"/tmp/i16prob_{name}/**/*.trace.json.gz",
                           recursive=True):
            ev = json.load(gzip.open(f))["traceEvents"]
            for e in ev:
                if (e.get("ph") == "X" and "dur" in e
                        and e.get("name", "").startswith("jit_run")):
                    tot_us += e["dur"]
                    n += 1
        us = tot_us / max(n, 1)
        ops = GRID * STEPS * 3 * ROWS * 256
        results[name] = (us, ops / (us * 1e-6) / 1e9, n)
        print(f"{name:9s} {us:8.1f} us/call (n={n})  "
              f"{ops/(us*1e-6)/1e9:8.1f} Gelem-ops/s", flush=True)
    except Exception as ex:
        print(f"{name:9s} FAILED: {type(ex).__name__}: {ex}", flush=True)

if "int32" in results and "int16" in results:
    print(f"int16 speedup vs int32: "
          f"{results['int32'][0]/results['int16'][0]:.2f}x")
if "int32" in results and "int8" in results:
    print(f"int8  speedup vs int32: "
          f"{results['int32'][0]/results['int8'][0]:.2f}x")
