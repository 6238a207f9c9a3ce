"""Eb/N0 BER-curve runner — hard and soft decision over real AWGN/BPSK.

The reference's berCurveCoded.m plots analytic hard/soft expectations
(berCurveCoded.m:46-51); this runner *measures* both paths end-to-end
(encode -> BPSK -> AWGN -> LLR -> [quantize|slice] -> decode) on device,
demonstrating the ~2 dB soft-decision gain.  Emits one JSON line per
point so results can be collected by scripts.

    python -m convolutionalencdec_tpu.harness.curve
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..params import CodeSpec, NASA_K7
from ..ops.channel import (
    awgn, bpsk_llr, bpsk_modulate, bits_to_segments, hard_decision,
    segments_to_bits,
)
from ..ops.encode import encode_bits
from ..ops.metrics import quantize_llrs
from ..ops.viterbi import viterbi_decode


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _curve_batch(spec: CodeSpec, key, n_packets: int, packet_bits: int,
                 ebn0_db):
    """One batch: returns (hard_errors, soft_errors, total_bits)."""
    kmsg, kchan = jax.random.split(key)
    msgs = jax.random.bernoulli(
        kmsg, 0.5, (n_packets, packet_bits)).astype(jnp.uint8)
    coded, _ = encode_bits(spec, msgs)
    cbits = segments_to_bits(coded, spec.n)
    rx = awgn(kchan, bpsk_modulate(cbits), ebn0_db, spec.rate)
    llr = bpsk_llr(rx, ebn0_db, spec.rate)
    hard_segs = bits_to_segments(hard_decision(llr), spec.n)
    q = quantize_llrs(llr).reshape(n_packets, -1, spec.n)

    hard_bits = jax.vmap(lambda s: viterbi_decode(spec, s))(hard_segs)
    from ..ops.metrics import viterbi_decode_soft
    soft_bits = jax.vmap(lambda qq: viterbi_decode_soft(spec, qq))(q)
    hard_err = jnp.sum(hard_bits != msgs)
    soft_err = jnp.sum(soft_bits != msgs)
    return hard_err, soft_err, msgs.size


def run_curve(spec: CodeSpec = NASA_K7, ebn0_points=None, *,
              n_packets: int = 2000, packet_bits: int = 2048,
              batch: int = 500, seed: int = 1, use_kernels: bool | None = None,
              verbose: bool = True):
    """Measure hard + soft coded BER across Eb/N0 points.

    Returns a list of dicts (one per point).  On TPU with a butterfly-
    eligible code the Pallas kernels are used for both paths.
    """
    if ebn0_points is None:
        ebn0_points = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    if use_kernels is None:
        use_kernels = (jax.default_backend() == "tpu" and spec.k == 1
                       and spec.has_poly_symmetry)
    results = []
    for ebn0 in ebn0_points:
        key = jax.random.PRNGKey(seed)
        h_err = s_err = total = 0
        done = 0
        while done < n_packets:
            nb = min(batch, n_packets - done)
            key, sub = jax.random.split(key)
            if use_kernels:
                he, se, tot = _curve_batch_kernels(
                    spec, sub, nb, packet_bits, ebn0)
            else:
                he, se, tot = _curve_batch(spec, sub, nb, packet_bits, ebn0)
            h_err += int(he)
            s_err += int(se)
            total += int(tot)
            done += nb
        point = {
            "ebn0_db": ebn0,
            "hard_ber": h_err / total,
            "soft_ber": s_err / total,
            "bits": total,
        }
        results.append(point)
        if verbose:
            print(json.dumps(point), flush=True)
    return results


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _curve_batch_kernels(spec: CodeSpec, key, n_packets: int,
                         packet_bits: int, ebn0_db):
    """Batch through the Pallas kernels (TPU fast path)."""
    from ..kernels import viterbi_decode_batch, viterbi_decode_batch_soft
    kmsg, kchan = jax.random.split(key)
    msgs = jax.random.bernoulli(
        kmsg, 0.5, (n_packets, packet_bits)).astype(jnp.uint8)
    coded, _ = encode_bits(spec, msgs)
    cbits = segments_to_bits(coded, spec.n)
    rx = awgn(kchan, bpsk_modulate(cbits), ebn0_db, spec.rate)
    llr = bpsk_llr(rx, ebn0_db, spec.rate)
    hard_segs = bits_to_segments(hard_decision(llr), spec.n)
    q = quantize_llrs(llr).reshape(n_packets, -1, spec.n).astype(jnp.int8)
    hard_bits = viterbi_decode_batch(spec, hard_segs)
    soft_bits = viterbi_decode_batch_soft(spec, q)
    return (jnp.sum(hard_bits != msgs), jnp.sum(soft_bits != msgs),
            msgs.size)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 7))
def _tbcc_bler_batch(spec: CodeSpec, crc, key, n_packets: int,
                     payload_bits: int, list_size: int, ebn0_db,
                     interpret: bool = False):
    """One TBCC batch: (plain_blkerr, list_blkerr, false_accepts, n)."""
    from ..kernels import (viterbi_decode_batch_tailbiting_crc_soft,
                           viterbi_decode_batch_tailbiting_soft)
    from ..ops.crc import crc_append
    from ..ops.tailbiting import encode_tailbiting
    kmsg, kchan = jax.random.split(key)
    payload = jax.random.bernoulli(
        kmsg, 0.5, (n_packets, payload_bits)).astype(jnp.uint8)
    msgs = crc_append(crc, payload)
    coded = encode_tailbiting(spec, msgs)
    cbits = segments_to_bits(coded, spec.n)
    rx = awgn(kchan, bpsk_modulate(cbits), ebn0_db, spec.rate)
    llr = bpsk_llr(rx, ebn0_db, spec.rate)
    q = quantize_llrs(llr).reshape(n_packets, -1, spec.n).astype(jnp.int8)
    plain = viterbi_decode_batch_tailbiting_soft(spec, q, None, interpret)
    out, ok, _ = viterbi_decode_batch_tailbiting_crc_soft(
        spec, crc, q, list_size, None, interpret)
    plain_blk = jnp.any(plain != msgs, axis=1)
    list_blk = jnp.any(out != msgs, axis=1)
    false_acc = ok & list_blk      # CRC passed but the block is wrong
    return (jnp.sum(plain_blk), jnp.sum(list_blk), jnp.sum(false_acc),
            n_packets)


def run_bler_curve_tbcc(spec: CodeSpec = None, crc=None, ebn0_points=None,
                        *, n_packets: int = 4096, payload_bits: int = 104,
                        list_size: int = 8, batch: int = 1024,
                        seed: int = 7, interpret: bool = False,
                        verbose: bool = True):
    """Measured BLOCK-error curve for the CRC-aided tail-biting list
    decoder vs the plain soft wrap decode (the quality evidence behind
    kernels.viterbi_decode_batch_tailbiting_crc_soft) — short LTE-
    control-channel-style blocks over AWGN/BPSK.  Also reports the CRC
    false-accept rate (passing candidates that are wrong blocks).

    Returns a list of dicts, one per Eb/N0 point.
    """
    from ..params import LTE_TBCC_K7
    from ..ops.crc import CRC16_CCITT
    spec = spec or LTE_TBCC_K7
    crc = crc or CRC16_CCITT
    if ebn0_points is None:
        ebn0_points = [0.0, 1.0, 2.0, 3.0]
    results = []
    for ebn0 in ebn0_points:
        key = jax.random.PRNGKey(seed)
        pb = lb = fa = total = 0
        done = 0
        while done < n_packets:
            nb = min(batch, n_packets - done)
            key, sub = jax.random.split(key)
            p, l_, f, n_ = _tbcc_bler_batch(spec, crc, sub, nb,
                                            payload_bits, list_size,
                                            ebn0, interpret)
            pb += int(p); lb += int(l_); fa += int(f); total += int(n_)
            done += nb
        point = {
            "ebn0_db": ebn0,
            "plain_bler": pb / total,
            "crc_list_bler": lb / total,
            "false_accept": fa / total,
            "blocks": total,
        }
        results.append(point)
        if verbose:
            print(json.dumps(point), flush=True)
    return results


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--tbcc":
        run_bler_curve_tbcc(
            ebn0_points=[float(a) for a in sys.argv[2:]] or None)
    else:
        pts = [float(a) for a in sys.argv[1:]] or None
        run_curve(ebn0_points=pts)
