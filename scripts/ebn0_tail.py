"""Anchor the conv-code Eb/N0 curve to 10 dB (VERDICT r4 next #5,
BASELINE config 3's full range).

Measured points stop at 6 dB because brute-force sampling goes
prohibitive (hard BER < 4e-5, soft < 3e-7).  The reference anchors the
tail analytically (berCurveCoded.m distspec/bercoding);
harness/bounds.py is that method re-derived from the trellis.  This
script does both halves of the seam:

  1. GIANT-BATCH measured points where 10 Gbit/s-class kernels make
     sampling cheap after all: hard at 7 and 8 dB (1e9 / 1.2e10 bits),
     quantized-soft at 7 dB (3e10 bits) — each a fresh-noise jitted
     batch per call (unique executions by construction).
  2. Analytic union-bound rows 0-10 dB (hard + unquantized-soft).

Writes CURVES_EBN0_TAIL_r05.json; RESULTS.md carries the merged
0-10 dB table with measured and analytic columns labeled.
"""
import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import convolutionalencdec_tpu as fec  # noqa: E402
from convolutionalencdec_tpu.harness.bounds import bound_curve  # noqa: E402
from convolutionalencdec_tpu.ops.channel import (  # noqa: E402
    awgn, bits_to_segments, bpsk_llr, bpsk_modulate, hard_decision,
    segments_to_bits)
from convolutionalencdec_tpu.ops.encode import encode_bits  # noqa: E402
from convolutionalencdec_tpu.ops.metrics import quantize_llrs  # noqa: E402

SPEC = fec.NASA_K7
B, L = 2048, 2048
BITS_PER_CALL = B * L


@functools.partial(jax.jit, static_argnums=(1,))
def _tail_batch(key, soft: bool, ebn0_db):
    from convolutionalencdec_tpu.kernels import (
        viterbi_decode_batch, viterbi_decode_batch_soft)
    kmsg, kchan = jax.random.split(key)
    msgs = jax.random.bernoulli(kmsg, 0.5, (B, L)).astype(jnp.uint8)
    coded, _ = encode_bits(SPEC, msgs)
    cbits = segments_to_bits(coded, SPEC.n)
    rx = awgn(kchan, bpsk_modulate(cbits), ebn0_db, SPEC.rate)
    llr = bpsk_llr(rx, ebn0_db, SPEC.rate)
    if soft:
        q = quantize_llrs(llr).reshape(B, -1, SPEC.n).astype(jnp.int8)
        bits = viterbi_decode_batch_soft(SPEC, q)
    else:
        segs = bits_to_segments(hard_decision(llr), SPEC.n)
        bits = viterbi_decode_batch(SPEC, segs)
    return jnp.sum(bits != msgs)


def measure(ebn0, soft, target_bits, seed):
    calls = -(-target_bits // BITS_PER_CALL)
    key = jax.random.PRNGKey(seed)
    errs = []
    for i in range(calls):
        errs.append(_tail_batch(jax.random.fold_in(key, i), soft, ebn0))
    total_err = int(sum(int(e) for e in errs))
    total = calls * BITS_PER_CALL
    return {
        "ebn0_db": ebn0,
        "decision": "soft3bit" if soft else "hard",
        "bits": total,
        "bit_errors": total_err,
        "ber": total_err / total,
        "rel_sigma": (total_err ** -0.5) if total_err else None,
    }


def main():
    points = [
        (7.0, False, int(1.0e9), 71),
        (8.0, False, int(1.2e10), 72),
        (7.0, True, int(3.0e10), 73),
    ]
    measured = []
    for ebn0, soft, bits, seed in points:
        pt = measure(ebn0, soft, bits, seed)
        measured.append(pt)
        print(json.dumps(pt), flush=True)
    bounds = bound_curve(SPEC, [float(x) for x in range(11)])
    out = {"measured_tail": measured, "analytic_bounds": bounds}
    with open("/root/repo/CURVES_EBN0_TAIL_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote CURVES_EBN0_TAIL_r05.json")


if __name__ == "__main__":
    main()
