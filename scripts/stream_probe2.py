import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
from convolutionalencdec_tpu.kernels.acs_pallas import (
    stream_decode_batch, stream_state_init)

spec = fec.NASA_K7
B, T = 2048, 2016
W = spec.traceback_len
rng = np.random.default_rng(1)
coded = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))
st0 = stream_state_init(spec, B)
fn = lambda c, s: stream_decode_batch(spec, c, s, W)
out, st = fn(coded, st0)
jax.block_until_ready((out, st))

# single-call wall time, output pulled to host
for _ in range(3):
    t0 = time.perf_counter()
    out, st = fn(coded, st0)
    o = np.asarray(out); _ = np.asarray(st)
    print(f"single call + host pull: {(time.perf_counter()-t0)*1e3:.2f} ms", flush=True)

# chained loop, accumulate checksum to defeat any elision
t0 = time.perf_counter()
s = st0
acc = jnp.zeros((), jnp.int32)
for _ in range(32):
    out, s = fn(coded, s)
    acc = acc + jnp.sum(out.astype(jnp.int32))
acc_v = int(acc)
dt = (time.perf_counter() - t0) / 32
print(f"chained x32 with checksum: {dt*1e3:.2f} ms/call = {B*T/dt/1e6:.0f} Mbit/s (acc={acc_v})", flush=True)
