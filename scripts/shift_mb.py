import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS, GRID, ROWS = 128, 32, 64

def make(kind):
    def kernel(x_ref, y_ref, o_ref):
        a = x_ref[:]
        c = y_ref[:]
        b = a
        for i in range(STEPS):
            if kind == "shift":
                b = ((b << 1) | ((c >> 31) & 1)) + a
            elif kind == "arith":
                carry = jnp.where(c < 0, 1, 0)
                b = (b + b + carry) + a
            else:
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
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, 256), jnp.int32),
        )(x, y)
    return run

key = jax.random.PRNGKey(0)
x = jax.random.randint(key, (GRID * ROWS, 256), -50, 50, jnp.int32)
y = x[::-1] + 3
for kind in ("base", "arith", "shift"):
    run = make(kind)
    out = run(x, y); v = np.asarray(out)  # force host pull
    t0 = time.perf_counter()
    for _ in range(16):
        out = run(x, y)
    v = np.asarray(out)
    dt = (time.perf_counter() - t0) / 16
    print(f"{kind:6s} {dt*1e3:8.3f} ms", flush=True)
