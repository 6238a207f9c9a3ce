"""Early-termination serving profile: effective throughput of
`lte_turbo_decode_early` vs Eb/N0.

For each operating point: encode B CRC24B-carrying blocks, add AWGN,
decode with the CRC-gated while_loop, and record iterations used,
accept rate, false accepts, and wall Mbit/s (message bits decoded
per second of steady-state wall clock, deep queue of unique-input
calls — docs/ROOFLINE.md §6 cautions; the tunnel's ~2.7 ms/call
dispatch still taxes the wall number, device truth is the profiler
row).  Writes CURVES_EARLYTERM_r04.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from convolutionalencdec_tpu.harness.curve import awgn  # noqa: E402
from convolutionalencdec_tpu.ops import lte
from convolutionalencdec_tpu.ops.channel import bpsk_llr, bpsk_modulate
from convolutionalencdec_tpu.ops.crc import CRC24B, crc_append
from convolutionalencdec_tpu.ops.metrics import quantize_llrs

B, L = 2048, 1024
E = 2 * (L + 4)          # rate ~1/2, the sweep row's operating shape
MAX_ITERS = 8
POINTS = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]

rng = np.random.default_rng(23)
results = []
for ebn0 in POINTS:
    rate = L / E
    key = jax.random.PRNGKey(int(ebn0 * 1000) + 7)
    kmsg, kch1, kch2 = jax.random.split(key, 3)
    payload = jax.random.bernoulli(kmsg, 0.5, (B, L - 24)).astype(jnp.uint8)
    msgs = np.asarray(crc_append(CRC24B, payload))
    tx = lte.lte_turbo_encode_batch(jnp.asarray(msgs), E)

    def make_q(kch):
        rx = awgn(kch, bpsk_modulate(tx), ebn0, rate)
        return quantize_llrs(bpsk_llr(rx, ebn0, rate),
                             qmax=31).astype(jnp.int32)

    q_warm = jax.device_put(make_q(kch1))
    bits, _, ok, iters = lte.lte_turbo_decode_early(
        q_warm, L, max_iters=MAX_ITERS)
    jax.block_until_ready(bits)

    # Throughput: bench.py's deep-queue steady state over UNIQUE noise
    # draws (dedup caution) — single-call walls through the tunnel are
    # dispatch/sync-dominated and misleading.
    draws = [jax.device_put(make_q(k))
             for k in jax.random.split(kch2, 8)]
    outs = [lte.lte_turbo_decode_early(q, L, max_iters=MAX_ITERS)
            for q in draws]
    jax.block_until_ready(outs[-1][0])          # warm every trace path
    t0 = time.perf_counter()
    PASSES = 4
    for _ in range(PASSES):
        outs = [lte.lte_turbo_decode_early(q, L, max_iters=MAX_ITERS)
                for q in draws]
    for o in outs:
        o[0].block_until_ready()
    dt = time.perf_counter() - t0
    calls = PASSES * len(draws)

    bits, _, ok, iters = outs[0]
    ok_np = np.asarray(ok)
    wrong = (np.asarray(bits) != msgs).any(1)
    point = {
        "ebn0_db": ebn0,
        "iters_used": int(iters),
        "max_iters": MAX_ITERS,
        "accept_rate": float(ok_np.mean()),
        "false_accepts": int((ok_np & wrong).sum()),
        "bler": float(wrong.mean()),
        "wall_mbit_s": round(B * L * calls / dt / 1e6, 1),
        "blocks": B,
    }
    results.append(point)
    print(json.dumps(point), flush=True)

with open("/root/repo/CURVES_EARLYTERM_r04.json", "w") as f:
    json.dump(results, f, indent=1)
print("wrote CURVES_EARLYTERM_r04.json")
