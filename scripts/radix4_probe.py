"""Radix-4 MAP probe (VERDICT r4 next #2): is the turbo kernel's
radix-2 formulation really the floor?

Paper budget first (counted per TWO trellis steps, per (8, TB_TILE)
vreg pair, against kernels/turbo_pallas.py `_fwd_chunk`):

  radix-2 (current):  2 x [bm_self 3 + bm_other 3 + add 1 +
                           swap+add 2 + min 1]          = 20 ops
  radix-4 (fused):    4 path-class bms (4 mul + 3 add each,
                      label columns don't coincide so terms
                      can't be shared)                  = 28
                      + 3 swaps + 4 adds + 3 mins       =  38 ops

The classical radix-4 win — halving per-step permutation-network and
renorm overhead — does not apply here: the XOR-partner layout already
makes the permutation ONE sublane swap (1 op), and renorm is amortized
to ~0.5 op/step.  What remains is that radix-4 FOREGOES the
computation reuse of the intermediate min (4 paths collapse to 2
before second-step costs are added), so it must do ~1.9x the vector
work per decoded bit.  Since ROOFLINE §7 shows the kernel AT the
dual-issue issue-rate ceiling, op count IS wall time, and radix-4
should measure ~1.5-1.9x SLOWER.  This probe verifies that prediction
on the chip (the int16_probe.py discipline: measure the dead end,
then close it).

The radix-4 recursion is exact — (min, +) distributes, so deferring
the intermediate min and renorming at the same 8-step boundaries
reproduces the radix-2 alpha BIT-EXACTLY; the probe asserts that
before timing.
"""
import collections
import glob
import gzip
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from convolutionalencdec_tpu.ops.turbo import RscSpec, _parity_bits  # noqa: E402
from convolutionalencdec_tpu.kernels.turbo_pallas import (  # noqa: E402
    BIG_T, PACK_T, TB_TILE, _stages_in_kernel, _swap, _fwd_chunk)

RSC = RscSpec()
S, NS = RSC.S, RSC.num_states
Tc = 24                       # lcm(pair cycle 6, renorm 8) = 24


def _label_cols(xor: int):
    """Stage label columns evaluated at position q ^ xor, as in
    _stages_in_kernel but with the iota shifted — per stage k returns
    (us, zs, uo, zo) at the shifted position."""
    fb = RSC.g_fb & (NS - 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (NS, 1), 0) ^ xor

    def ror(x, k):
        return ((x >> k) | (x << (S - k))) & (NS - 1) if k % S else x

    def u_of(s, w):
        return w ^ _parity_bits(s, fb)

    def z_of(s, w):
        return _parity_bits((w << S) | s, RSC.g_fw)

    out = []
    for k in range(S):
        X = 1 << k
        w = (q >> k) & 1
        s_s, s_o = ror(q, k), ror(q ^ X, k)
        out.append((u_of(s_s, w), z_of(s_s, w),
                    u_of(s_o, w), z_of(s_o, w)))
    return out


def _radix4_kernel(lu_ref, lp_ref, out_ref, m_ref):
    lab0 = _label_cols(0)                      # labels at q
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _():
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, TB_TILE), 0)
        m_ref[:] = jnp.where(s_idx == 0, 0, BIG_T).astype(jnp.int32)

    lu = lu_ref[:].astype(jnp.int32)
    lp = lp_ref[:].astype(jnp.int32)
    alpha = m_ref[:]
    for t in range(0, Tc, 2):
        k1, k2 = t % S, (t + 1) % S
        X1, X2 = 1 << k1, 1 << k2
        labX2 = _label_cols(X2)
        us1, zs1, uo1, zo1 = lab0[k1]
        us2, zs2, uo2, zo2 = lab0[k2]
        us1x, zs1x, uo1x, zo1x = labX2[k1]
        lu1, lp1 = lu[t:t + 1, :], lp[t:t + 1, :]
        lu2, lp2 = lu[t + 1:t + 2, :], lp[t + 1:t + 2, :]
        # 4 path classes: (step-1 edge) -> (step-2 edge) into final q
        bm00 = us1 * lu1 + zs1 * lp1 + us2 * lu2 + zs2 * lp2
        bm01 = uo1 * lu1 + zo1 * lp1 + us2 * lu2 + zs2 * lp2
        bm10 = us1x * lu1 + zs1x * lp1 + uo2 * lu2 + zo2 * lp2
        bm11 = uo1x * lu1 + zo1x * lp1 + uo2 * lu2 + zo2 * lp2
        a01 = _swap(alpha, k1, NS)
        a10 = _swap(alpha, k2, NS)
        a11 = _swap(a01, k2, NS)               # q ^ X1 ^ X2
        alpha = jnp.minimum(
            jnp.minimum(alpha + bm00, a01 + bm01),
            jnp.minimum(a10 + bm10, a11 + bm11))
        if (t + 1) % PACK_T == PACK_T - 1:
            alpha = alpha - jnp.min(alpha, axis=0, keepdims=True)
    m_ref[:] = alpha
    out_ref[:] = alpha


def _radix2_kernel(lu_ref, lp_ref, out_ref, m_ref):
    stages = _stages_in_kernel(RSC)
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _():
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, TB_TILE), 0)
        m_ref[:] = jnp.where(s_idx == 0, 0, BIG_T).astype(jnp.int32)

    m, _, _, _ = _fwd_chunk(RSC, stages, lu_ref[:].astype(jnp.int32),
                            lp_ref[:].astype(jnp.int32), m_ref[:],
                            collect=False)
    m_ref[:] = m
    out_ref[:] = m


def run(kernel, lu_t, lp_t, nb, nt):
    return pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((Tc, TB_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Tc, TB_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NS, TB_TILE), lambda b, t: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NS, lu_t.shape[1]), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, TB_TILE), jnp.int32)],
    )(lu_t, lp_t)


def main():
    B, L = 2048, 1008            # 42 chunks
    rng = np.random.default_rng(5)
    lu = rng.integers(-4000, 4001, (L, B)).astype(np.int32)
    lp = rng.integers(-62, 63, (L, B)).astype(np.int32)
    lu_d, lp_d = jax.device_put(jnp.asarray(lu)), jax.device_put(jnp.asarray(lp))
    nb, nt = B // TB_TILE, L // Tc

    @jax.jit
    def radix2_fwd(a, b):
        return run(_radix2_kernel, a, b, nb, nt)

    @jax.jit
    def radix4_fwd(a, b):
        return run(_radix4_kernel, a, b, nb, nt)

    r2, r4 = radix2_fwd, radix4_fwd
    o2 = r2(lu_d, lp_d)
    o4 = r4(lu_d, lp_d)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o4))
    print("radix-4 final alpha BIT-EXACT vs radix-2", flush=True)

    # unique-ish inputs per call: roll device-side via distinct buffers
    bufs = [(lu_d, lp_d)] + [
        (jax.device_put(jnp.asarray(np.roll(lu, r + 1, axis=1))),
         jax.device_put(jnp.asarray(np.roll(lp, r + 1, axis=1))))
        for r in range(7)]

    shutil.rmtree("/tmp/radix4_prof", ignore_errors=True)
    jax.profiler.start_trace("/tmp/radix4_prof")
    for name, f in (("r2", r2), ("r4", r4)):
        for i in range(16):
            out = f(*bufs[i % 8])
        out.block_until_ready()
    jax.profiler.stop_trace()
    tf = sorted(glob.glob("/tmp/radix4_prof/**/*.trace.json.gz",
                          recursive=True))[-1]
    ev = json.load(gzip.open(tf))["traceEvents"]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            n = e.get("name", "")
            if n.startswith("jit_"):
                k = n.split("(")[0]
                dur[k] += e["dur"]
                cnt[k] += 1
    for k, v in dur.most_common(6):
        per = v / max(cnt[k], 1)
        steps = B * L
        print(f"  {k}: {per:.0f} us/call x{cnt[k]} "
              f"({steps / per:.0f} Msteps/s)")


if __name__ == "__main__":
    main()
