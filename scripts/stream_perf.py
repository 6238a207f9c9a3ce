import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K

spec = fec.NASA_K7
B, T = 2048, 2016
rng = np.random.default_rng(1)
coded = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))
st0 = K.stream_state_init(spec, B)
for W in (35, 32):
    fn = lambda c, s: K.stream_decode_batch(spec, c, s, W)
    out, st = fn(coded, st0)
    _ = np.asarray(out)
    best = float("inf")
    for _ in range(3):
        s = st0
        t0 = time.perf_counter()
        for _ in range(16):
            out, s = fn(coded, s)
        _ = np.asarray(out); _ = np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / 16)
    print(f"W={W}: {best*1e3:.2f} ms/call = {B*T/best/1e6:.0f} Mbit/s", flush=True)
