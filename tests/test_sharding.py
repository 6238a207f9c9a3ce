"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from convolutionalencdec_tpu import NASA_K7, encode_bits, viterbi_decode
from convolutionalencdec_tpu.parallel import (
    decode_sharded, encode_sharded, make_mesh,
)


def _noisy(rng, spec, B, L, p):
    msgs = rng.integers(0, 2, (B, L), dtype=np.uint8)
    coded = np.asarray(encode_bits(spec, msgs)[0]).copy()
    flip = rng.random(coded.shape) < p
    coded ^= (flip * rng.integers(1, 4, coded.shape)).astype(np.uint8)
    return msgs, coded


@pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4), (1, 8)],
                         ids=["ch8", "ch2tb4", "tb8"])
def test_sharded_decode_bit_exact(mesh_shape):
    """Sharded output must be bit-identical to the single-stream decoder
    (SURVEY.md §7 step 7's validation gate)."""
    spec = NASA_K7
    rng = np.random.default_rng(11)
    B, L = 8, 2042                     # T = 2048, divisible by every ntb
    msgs, coded = _noisy(rng, spec, B, L, 0.02)
    mesh = make_mesh(*mesh_shape)
    out = np.asarray(decode_sharded(spec, coded, mesh))[:, :L]
    ref = np.asarray(jax.vmap(lambda c: viterbi_decode(spec, c))(coded))
    np.testing.assert_array_equal(out, ref)
    # At 2% coded-bit flips a few residual errors beyond the correction
    # limit are expected — but both decoders must make the SAME ones.
    assert (out != msgs).mean() < 1e-3


def test_sharded_encode_matches_unsharded():
    spec = NASA_K7
    rng = np.random.default_rng(13)
    msgs = rng.integers(0, 2, (16, 512), dtype=np.uint8)
    mesh = make_mesh(2, 4)
    got = np.asarray(encode_sharded(spec, msgs, mesh))
    want = np.asarray(encode_bits(spec, msgs)[0])
    np.testing.assert_array_equal(got, want)


def test_sharded_decode_rejects_unshardable():
    spec = NASA_K7
    mesh = make_mesh(2, 4)
    coded = np.zeros((8, 1023), np.uint8)   # 1023 % 4 != 0
    with pytest.raises(ValueError):
        decode_sharded(spec, coded, mesh)


def test_channel_sharded_kernel_decode():
    """Pallas-kernel decode sharded over all 8 devices (channel axis) is
    bit-identical to the unsharded kernel decode."""
    from convolutionalencdec_tpu.parallel import decode_sharded_batch
    from convolutionalencdec_tpu.kernels import viterbi_decode_batch
    spec = NASA_K7
    rng = np.random.default_rng(31)
    msgs, coded = _noisy(rng, spec, 8, 122, 0.03)
    mesh = make_mesh(8, 1)
    got = np.asarray(decode_sharded_batch(spec, coded, mesh,
                                          interpret=True))
    want = np.asarray(viterbi_decode_batch(spec, coded, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)],
                         ids=["ch2tb4", "tb8"])
def test_time_sharded_kernel_decode(mesh_shape):
    """Kernel-backed time-block decode (overlap-save through the fused
    Pallas kernels) is bit-identical to the unsharded kernel decoder —
    the multi-chip long-stream story at kernel speed."""
    from convolutionalencdec_tpu.parallel import decode_sharded_kernel
    from convolutionalencdec_tpu.kernels import viterbi_decode_batch
    spec = NASA_K7
    rng = np.random.default_rng(47)
    B, L = 4, 1146                     # T = 1152; Tl = 288/144 >= W
    msgs, coded = _noisy(rng, spec, B, L, 0.02)
    mesh = make_mesh(*mesh_shape)
    got = np.asarray(decode_sharded_kernel(spec, coded, mesh,
                                           interpret=True))[:, :L]
    want = np.asarray(viterbi_decode_batch(spec, coded, interpret=True))
    np.testing.assert_array_equal(got, want)
    assert (got != msgs).mean() < 1e-3


def test_time_sharded_kernel_rejects_misaligned():
    from convolutionalencdec_tpu.parallel import decode_sharded_kernel
    spec = NASA_K7
    mesh = make_mesh(1, 8)
    coded = np.zeros((4, 1024), np.uint8)   # 1024/8 = 128, not % 48
    with pytest.raises(ValueError):
        decode_sharded_kernel(spec, coded, mesh)
