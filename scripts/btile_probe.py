"""B_TILE=512 experiment + jax.profiler trace of the decode path."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
import convolutionalencdec_tpu.kernels.acs_pallas as K

if len(sys.argv) > 1:
    K.B_TILE = int(sys.argv[1])
print("B_TILE =", K.B_TILE, flush=True)

spec = fec.NASA_K7
B, L = 2048, 2048
rng = np.random.default_rng(9865)
msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
coded = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
flip = rng.random(coded.shape) < 0.03
coded ^= (flip * rng.integers(1, 4, coded.shape)).astype(np.uint8)
dev = jax.device_put(jnp.asarray(coded))

decode = lambda c: K.viterbi_decode_batch(spec, c)
out = jax.block_until_ready(decode(dev))
assert (np.asarray(out) != msgs).mean() < 2e-3

best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(64):
        out = decode(dev)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / 64)
print(f"e2e {best*1e3:.2f} ms = {B*L/best/1e6:.0f} Mbit/s", flush=True)

if "--profile" in sys.argv:
    jax.profiler.start_trace("/tmp/jax_trace")
    for _ in range(8):
        out = decode(dev)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace written to /tmp/jax_trace", flush=True)
