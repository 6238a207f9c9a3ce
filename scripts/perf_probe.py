"""Round-2 perf probe: per-kernel timings for hard/soft K=7 and K=9."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import convolutionalencdec_tpu as fec
from convolutionalencdec_tpu.params import K9_561_753
from convolutionalencdec_tpu.kernels.acs_pallas import (
    acs_forward_batch_fused, traceback_batch_fused,
    acs_forward_batch_fused_soft, viterbi_decode_batch,
    viterbi_decode_batch_soft, _pad_to, B_TILE, CHUNK_F)
from convolutionalencdec_tpu.ops.channel import (
    awgn, bpsk_llr, bpsk_modulate)
from convolutionalencdec_tpu.ops.bits import unpack_bits
from convolutionalencdec_tpu.ops.metrics import quantize_llrs

def timeit(fn, *args, iters=64, reps=3):
    out = fn(*args); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

B, L = 2048, 2048
rng = np.random.default_rng(9865)

for name, spec in [("K7", fec.NASA_K7), ("K9", K9_561_753)]:
    msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
    coded = np.asarray(fec.encode_bits(spec, msgs)[0]).copy()
    flip = rng.random(coded.shape) < 0.03
    coded ^= (flip * rng.integers(1, 4, coded.shape)).astype(np.uint8)
    T = coded.shape[1]
    seg_p = jax.device_put(_pad_to(jnp.asarray(coded), CHUNK_F, 1))
    t_fwd = timeit(lambda s: acs_forward_batch_fused(spec, s)[0], seg_p)
    decs = jax.block_until_ready(acs_forward_batch_fused(spec, seg_p)[0])
    t_tb = timeit(lambda d: traceback_batch_fused(spec, d, T), decs)
    t_all = timeit(lambda s: viterbi_decode_batch(spec, s), jnp.asarray(coded))
    mbps = B * L / t_all / 1e6
    print(f"{name}: fwd {t_fwd*1e3:.2f} ms  tb {t_tb*1e3:.2f} ms  "
          f"e2e {t_all*1e3:.2f} ms = {mbps:.0f} Mbit/s", flush=True)

# soft K7
spec = fec.NASA_K7
msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
coded = np.asarray(fec.encode_bits(spec, msgs)[0])
cbits = ((coded[..., None].astype(np.int32) >> np.arange(spec.n - 1, -1, -1)) & 1).reshape(B, -1)
sym = bpsk_modulate(cbits)
rx = awgn(jax.random.PRNGKey(0), sym, 2.0, spec.rate)
q = quantize_llrs(bpsk_llr(rx, 2.0, spec.rate)).reshape(B, -1, spec.n)
T = coded.shape[1]
q_dev = jax.device_put(q.astype(jnp.int8))
q_p = _pad_to(q_dev, CHUNK_F, 1)
t_fwd = timeit(lambda s: acs_forward_batch_fused_soft(spec, s)[0], q_p)
t_all = timeit(lambda s: viterbi_decode_batch_soft(spec, s), q_dev)
print(f"K7 soft: fwd {t_fwd*1e3:.2f} ms  e2e {t_all*1e3:.2f} ms = {B*L/t_all/1e6:.0f} Mbit/s", flush=True)
