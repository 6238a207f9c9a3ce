"""TPU throughput of the streaming register-exchange kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
from convolutionalencdec_tpu.kernels.acs_pallas import (
    stream_decode_batch, stream_state_init)

spec = fec.NASA_K7
B, T = 2048, 2016      # T % 48 == 0
W = spec.traceback_len
rng = np.random.default_rng(1)
coded = jnp.asarray(rng.integers(0, 4, (B, T), dtype=np.uint8))
st0 = stream_state_init(spec, B)

fn = lambda c, s: stream_decode_batch(spec, c, s, W)
out, st = fn(coded, st0)
jax.block_until_ready((out, st))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    s = st0
    for _ in range(64):
        out, s = fn(coded, s)
    jax.block_until_ready((out, s))
    best = min(best, (time.perf_counter() - t0) / 64)
print(f"stream kernel: {best*1e3:.2f} ms/chunk = {B*T/best/1e6:.0f} Mbit/s", flush=True)

# also: verify bit-exactness vs scan stream on TPU for one batch
from convolutionalencdec_tpu.ops.streaming import StreamingDecoderBatch
from convolutionalencdec_tpu.ops.viterbi import viterbi_decode_stream
msgs = rng.integers(0, 2, (4, 250), dtype=np.uint8)
c2 = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
flip = rng.random(c2.shape) < 0.02
c2 ^= (flip * rng.integers(1, 4, c2.shape)).astype(np.uint8)
dec = StreamingDecoderBatch(spec, batch=4, use_kernel=True)
got = np.concatenate([dec.decode(c2[:, :96]), dec.decode(c2[:, 96:], last=True)], axis=1)
want = np.stack([np.asarray(viterbi_decode_stream(spec, c2[b])) for b in range(4)])
assert (got == want).all(), "TPU stream mismatch"
print("TPU streaming bit-exact vs scan", flush=True)
