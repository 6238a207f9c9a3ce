"""Early-termination serving profile: effective throughput of
`lte_turbo_decode_early` vs Eb/N0.

For each operating point: encode B CRC24B-carrying blocks, add AWGN,
decode with the CRC-gated while_loop, and record iterations used,
accept rate, false accepts, and wall Mbit/s.

Methodology (round 5 — this is what closed the r4 wall-vs-device gap):
the r4 profile timed a fixed 32-call window, which is dominated by the
dispatch ramp; the wall column read 195-258 Mbit/s against ~520 Mbit/s
device truth.  This version uses the bench.py discipline — escalate
the call count until the timed window exceeds 2 s, best of 3 windows,
and make every call a UNIQUE (buffer, rotation) pair so the tunnel
cannot dedupe (docs/ROOFLINE.md §6).  Wall now tracks device truth
(bench.py --turbo cross-check: 591 Mbit/s wall at 2 dB).

Writes CURVES_EARLYTERM_r05.json.
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

def _serve(q, r):
    # rotation makes every (buffer, r) execution unique; serving
    # outputs only (bits + flags) — lapp stays on device.
    bits, _, ok, iters = lte.lte_turbo_decode_early(
        jnp.roll(q, r, axis=0), L, max_iters=MAX_ITERS)
    return bits, ok, iters


serve = jax.jit(_serve)      # one trace shared by every Eb/N0 point
NBUF = 8
rolls = [jax.device_put(jnp.int32(r)) for r in range(B)]

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

    draws = [jax.device_put(make_q(k))
             for k in jax.random.split(kch2, NBUF)]

    q_warm = draws[0]
    bits, ok, iters = serve(q_warm, rolls[0])
    bits.block_until_ready()

    calls = 2
    while True:
        t0 = time.perf_counter()
        for i in range(calls):
            out = serve(draws[i % NBUF], rolls[(i // NBUF) % B])
        out[0].block_until_ready()
        dt = time.perf_counter() - t0
        # stay inside the unique (buffer, rotation) pool — repeats
        # would be deduped by the tunnel and inflate the wall column
        if dt > 2.0 or calls * 4 > NBUF * B:
            break
        calls *= 4
    assert calls <= NBUF * B
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(calls):
            out = serve(draws[i % NBUF], rolls[(i // NBUF) % B])
        out[0].block_until_ready()
        dt = min(dt, time.perf_counter() - t0)

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
        "calls_timed": calls,
        "blocks": B,
    }
    results.append(point)
    print(json.dumps(point), flush=True)

with open("/root/repo/CURVES_EARLYTERM_r05.json", "w") as f:
    json.dump(results, f, indent=1)
print("wrote CURVES_EARLYTERM_r05.json")
