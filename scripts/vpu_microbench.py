"""VPU dtype throughput probe: unrolled dependent add/min chains,
distinct input block per grid program (defeats invariant hoisting)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 192
GRID = 64
ROWS = 64

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
for dtype in (jnp.int32, jnp.float32, jnp.bfloat16):
    x = base.astype(dtype)
    y = (base[::-1] + 3).astype(dtype)
    run = make(dtype)
    out = jax.block_until_ready(run(x, y))
    t0 = time.perf_counter()
    for _ in range(16):
        out = run(x, y)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 16
    ops = GRID * STEPS * 3 * ROWS * 256
    print(f"{np.dtype(dtype).name:9s} {dt*1e3:7.3f} ms  {ops/dt/1e9:8.1f} Gops/s", flush=True)
