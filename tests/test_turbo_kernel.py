"""Turbo Pallas kernels (kernels/turbo_pallas.py) vs the scan decoders:
bit-exact constituent MAP LLRs and bit-exact full iterative decode,
interpreted on CPU (the real-TPU twin runs in scripts/tpu_sweep.py)."""

import jax
import numpy as np
import pytest

from convolutionalencdec_tpu.ops import lte
from convolutionalencdec_tpu.ops.turbo import (
    RscSpec, rsc_maxlogmap, turbo_decode_batch, turbo_encode_batch)
from convolutionalencdec_tpu.kernels.turbo_pallas import (
    rsc_maxlogmap_batch_kernel, turbo_decode_batch_kernel,
    turbo_kernel_supported)

RSC = RscSpec()


def _rand_llrs(rng, B, L, S, mag=31):
    return (rng.integers(-mag, mag + 1, (B, L)).astype(np.int32),
            rng.integers(-mag, mag + 1, (B, L)).astype(np.int32),
            rng.integers(-mag, mag + 1, (B, L)).astype(np.int32),
            rng.integers(-mag, mag + 1, (B, S)).astype(np.int32),
            rng.integers(-mag, mag + 1, (B, S)).astype(np.int32))


# Lengths chosen to sweep the kernel's layout seams: L mod S (the
# sublane-rotation phase of the beta boundary) takes all three values,
# and L relative to the 24-step chunk covers exact fit (24, 48),
# sub-chunk (6), pad-to-chunk (37, 40, 47, 100), and multi-chunk with
# every pad residue (61, 104, 136).
@pytest.mark.parametrize("L", [6, 24, 37, 40, 47, 48, 61, 100, 104, 136])
def test_rsc_map_kernel_bitexact_vs_scan(L):
    rng = np.random.default_rng(L)
    B = 5
    l_sys, l_par, l_apr, l_st, l_pt = _rand_llrs(rng, B, L, RSC.S)
    want = jax.vmap(lambda a, b, c, d, e: rsc_maxlogmap(
        RSC, a, b, c, d, e))(l_sys, l_par, l_apr, l_st, l_pt)
    got = rsc_maxlogmap_batch_kernel(RSC, l_sys, l_par, l_apr,
                                     l_st, l_pt, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rsc_map_kernel_large_apriori_magnitudes():
    # iterated extrinsics grow well past the channel scale
    rng = np.random.default_rng(99)
    B, L = 3, 52
    l_sys, l_par, l_apr, l_st, l_pt = _rand_llrs(rng, B, L, RSC.S)
    l_apr = rng.integers(-4000, 4001, (B, L)).astype(np.int32)
    want = jax.vmap(lambda a, b, c, d, e: rsc_maxlogmap(
        RSC, a, b, c, d, e))(l_sys, l_par, l_apr, l_st, l_pt)
    got = rsc_maxlogmap_batch_kernel(RSC, l_sys, l_par, l_apr,
                                     l_st, l_pt, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rsc_map_kernel_at_clamp_contract():
    """Pin the BIG_T exclusion headroom at the documented contract
    boundary: a-priori at the full +/- LA_CLAMP exchange bound (the
    largest magnitude `_make_one_iter` can ever feed the kernel) plus
    generous channel LLRs must stay bit-exact vs the scan — the
    worst-case-magnitude case behind the kernels' BIG_T margin proof."""
    from convolutionalencdec_tpu.ops.turbo import LA_CLAMP
    rng = np.random.default_rng(2024)
    B, L = 3, 104
    l_sys = rng.integers(-8192, 8193, (B, L)).astype(np.int32)
    l_par = rng.integers(-8192, 8193, (B, L)).astype(np.int32)
    l_apr = rng.integers(-LA_CLAMP, LA_CLAMP + 1, (B, L)).astype(np.int32)
    l_apr[:, ::7] = LA_CLAMP            # exact bound, alternating sign
    l_apr[:, 3::7] = -LA_CLAMP
    l_st = rng.integers(-8192, 8193, (B, RSC.S)).astype(np.int32)
    l_pt = rng.integers(-8192, 8193, (B, RSC.S)).astype(np.int32)
    want = jax.vmap(lambda a, b, c, d, e: rsc_maxlogmap(
        RSC, a, b, c, d, e))(l_sys, l_par, l_apr, l_st, l_pt)
    got = rsc_maxlogmap_batch_kernel(RSC, l_sys, l_par, l_apr,
                                     l_st, l_pt, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_turbo_decode_kernel_bitexact_vs_scan():
    rng = np.random.default_rng(7)
    B, L = 4, 40
    pi = lte.lte_qpp(L)
    bits = rng.integers(0, 2, (B, L), dtype=np.uint8)
    enc = {k: np.asarray(v)
           for k, v in turbo_encode_batch(RSC, bits, pi).items()}

    def llr(b01):
        x = (1 - 2 * b01.astype(np.int32)) * 4
        flip = rng.random(b01.shape) < 0.06
        return np.where(flip, -x, x).astype(np.int32)

    args = [llr(enc["sys"]), llr(enc["par1"]), llr(enc["par2"]),
            llr(enc["sys_tail1"]), llr(enc["par_tail1"]),
            llr(enc["sys_tail2"]), llr(enc["par_tail2"])]
    wb, wl = turbo_decode_batch(RSC, *args, perm=pi, n_iters=3)
    gb, gl = turbo_decode_batch_kernel(RSC, *args,
                                       perm=tuple(int(p) for p in pi),
                                       n_iters=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(wb))
    assert (np.asarray(gb) == bits).all()   # clean-ish channel decodes


def test_turbo_kernel_supported_gate():
    assert turbo_kernel_supported(RSC)
    assert not turbo_kernel_supported(RscSpec(K=5, g_fb=0o23, g_fw=0o35))
    with pytest.raises(ValueError):
        rsc_maxlogmap_batch_kernel(
            RscSpec(K=5, g_fb=0o23, g_fw=0o35),
            np.zeros((1, 8), np.int32), np.zeros((1, 8), np.int32),
            np.zeros((1, 8), np.int32), np.zeros((1, 4), np.int32),
            np.zeros((1, 4), np.int32), True)


def test_early_termination_crc():
    """CRC-gated early exit: clean batch stops after one iteration with
    every block latched correct; noisy batch never false-accepts."""
    from convolutionalencdec_tpu.ops.crc import CRC24B, crc_append
    rng = np.random.default_rng(41)
    B, L = 8, 40
    payload = rng.integers(0, 2, (B, L - 24), dtype=np.uint8)
    msgs = np.asarray(crc_append(CRC24B, payload))
    E = 3 * (L + 4)
    tx = np.asarray(lte.lte_turbo_encode_batch(msgs, E))
    q = ((1 - 2 * tx.astype(np.int32)) * 8).astype(np.int32)
    bits, _, ok, iters = lte.lte_turbo_decode_early(q, L, interpret=True)
    assert int(iters) == 1
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(bits), msgs)
    # heavy noise: whatever passes must be RIGHT (no false accepts),
    # and passed blocks' outputs are latched (match the message).
    flip = rng.random(q.shape) < 0.12
    qn = np.where(flip, -q, q)
    bits, _, ok, iters = lte.lte_turbo_decode_early(qn, L, max_iters=4,
                                                    interpret=True)
    ok = np.asarray(ok)
    bad = (np.asarray(bits) != msgs).any(1)
    assert not (ok & bad).any()
    assert 1 <= int(iters) <= 4


def test_early_termination_1d_promotion():
    """A 1-D llrs input promotes to a batch of one (mirroring
    lte_turbo_decode) instead of failing inside the batch-only kernel."""
    from convolutionalencdec_tpu.ops.crc import CRC24B, crc_append
    rng = np.random.default_rng(43)
    L = 40
    payload = rng.integers(0, 2, L - 24, dtype=np.uint8)
    msg = np.asarray(crc_append(CRC24B, payload))
    E = 3 * (L + 4)
    tx = np.asarray(lte.lte_turbo_encode_batch(msg[None], E))[0]
    q = ((1 - 2 * tx.astype(np.int32)) * 8).astype(np.int32)
    bits, lapp, ok, iters = lte.lte_turbo_decode_early(q, L,
                                                       interpret=True)
    assert bits.shape == (L,) and lapp.shape == (L,) and ok.shape == ()
    assert bool(ok) and int(iters) == 1
    np.testing.assert_array_equal(np.asarray(bits), msg)
    bb, ll, bok, _ = lte.lte_turbo_decode_early(q[None], L,
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(bb)[0], np.asarray(bits))
    np.testing.assert_array_equal(np.asarray(ll)[0], np.asarray(lapp))
    assert bool(np.asarray(bok)[0]) == bool(ok)
