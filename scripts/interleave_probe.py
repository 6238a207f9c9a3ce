"""Dual-issue interleaved half-batch probe for the SWAR forward
(VERDICT r4 next #3): does handing the scheduler two textually
interleaved INDEPENDENT half-batches close the ~15% forward
scheduling slop (docs/ROOFLINE.md §4: ~25 vs ~21 predicted
cycles/step/vreg), the way two independent 256-lane tiles bought the
turbo kernel its 1.9x dual-issue (§7)?

Null hypothesis (why this probably measures flat): the turbo kernel's
tiles are (8, 128) int32 = ONE vreg per op, so without a second
independent tile the VPU's second issue slot starves.  The Viterbi
SWAR forward at NS=64 operates on (32..64, 256) tiles — every jnp op
is already 8-16 independent vreg-ops, and the ACS dependency chain
(~5 ops deep) is interleaved 8-16 ways by the scheduler as it stands.
The slop, if the null holds, lives in decision-accumulator stores,
renorm reductions, and loop glue — not in issue starvation.

Probe: a copy of `_fwd_chunk_body_swar` processing TWO independent
128-lane halves with per-step textually alternating ops (separate
metric states, separate decision accumulators), measured against the
production 256-lane kernel on identical inputs; decisions and final
metrics must be bit-identical (same math, different schedule).
"""
import collections
import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import convolutionalencdec_tpu as fec  # noqa: E402
from convolutionalencdec_tpu.kernels.acs_swar import (  # noqa: E402
    CHUNK_F, GPC, PACK, UNIT, _acs_swar, _branch_masks, _swar_min,
    acs_forward_batch_swar, init_metric_value, _pack_channels)

SPEC = fec.NASA_K7
NS = SPEC.num_states
HALF, Q4, Q8 = NS // 2, NS // 4, NS // 8
N = SPEC.n
HL = 128                      # lanes per interleaved half


def _fwd_chunk_interleaved(G, seg, mA, mB, dec_store):
    """Two independent half-batches, ops alternated per step.
    Mirrors _fwd_chunk_body_swar (hard path, sparse renorm) exactly,
    instantiated twice at HL lanes."""

    def renorm(mm):
        mn = mm[:Q8]
        for b_ in range(1, 8):
            mn = _swar_min(mn, mm[b_ * Q8:(b_ + 1) * Q8])
        while mn.shape[0] > 1:
            h_ = mn.shape[0] // 2
            mn = _swar_min(mn[:h_], mn[h_:])
        return mm - mn

    st1 = [None, None]
    st2 = [None, None]
    m = [mA, mB]
    for g in range(GPC):
        acc = [[jnp.zeros((Q8, HL), jnp.int32) for _ in range(8)]
               for _ in range(2)]

        def add_acc(h, rows, start, acc=acc):
            for b_ in range(rows.shape[0] // Q8):
                idx = start // Q8 + b_
                acc[h][idx] = acc[h][idx] + rows[b_ * Q8:(b_ + 1) * Q8]

        for j in range(PACK):
            t_row = g * PACK + j
            stage = t_row % 3
            ems = []
            for h in range(2):
                row = seg[h][t_row:t_row + 1, :]
                planes = [(row >> b) & UNIT for b in range(N)]
                em = planes[0] ^ G[stage][0]
                for b in range(1, N):
                    em = em + (planes[b] ^ G[stage][b])
                ems.append((em, (N * UNIT) - em))
            if stage == 0:
                for h in range(2):
                    em, emc = ems[h]
                    ev, od, de, do = _acs_swar(m[h][:HALF], m[h][HALF:],
                                               em, emc, j)
                    st1[h] = (ev, od)
                    add_acc(h, de, 0)
                    add_acc(h, do, HALF)
            elif stage == 1:
                for h in range(2):
                    em, emc = ems[h]
                    ev, od = st1[h]
                    e1, o1, d1e, d1o = _acs_swar(ev[:Q4], ev[Q4:],
                                                 em[:Q4], emc[:Q4], j)
                    e2, o2, d2e, d2o = _acs_swar(od[:Q4], od[Q4:],
                                                 em[Q4:], emc[Q4:], j)
                    st2[h] = (e1, o1, e2, o2)
                    add_acc(h, d1e, 0)
                    add_acc(h, d1o, Q4)
                    add_acc(h, d2e, 2 * Q4)
                    add_acc(h, d2o, 3 * Q4)
            else:
                for h in range(2):
                    em, emc = ems[h]
                    outs = []
                    for c in range(4):
                        blk = st2[h][c]
                        e, o, de, do = _acs_swar(
                            blk[:Q8], blk[Q8:],
                            em[c * Q8:(c + 1) * Q8],
                            emc[c * Q8:(c + 1) * Q8], j)
                        outs += [e, o]
                        add_acc(h, de, 2 * c * Q8)
                        add_acc(h, do, (2 * c + 1) * Q8)
                    m[h] = jnp.stack(outs, axis=0).transpose(1, 0, 2) \
                        .reshape(NS, HL)
        if (g * PACK + PACK - 1) % 3 == 2:
            m = [renorm(m[0]), renorm(m[1])]
        dec_store(g, acc)
    return m


def _interleaved_kernel():
    init_hi = init_metric_value(SPEC)

    def kernel(g_ref, seg_ref, dec_ref, fm_ref, m_ref):
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, 2 * HL), 0)
            m_ref[:] = jnp.where(s_idx == SPEC.starting_state,
                                 0, init_hi * UNIT).astype(jnp.int32)

        G = [[g_ref[stage * N + b] for b in range(N)]
             for stage in range(3)]
        seg = seg_ref[:]

        def dec_store(g, acc):
            for b_ in range(8):
                dec_ref[g, b_ * Q8:(b_ + 1) * Q8, :HL] = acc[0][b_]
                dec_ref[g, b_ * Q8:(b_ + 1) * Q8, HL:] = acc[1][b_]

        mA, mB = _fwd_chunk_interleaved(
            G, (seg[:, :HL], seg[:, HL:]),
            m_ref[:, :HL], m_ref[:, HL:], dec_store)
        m_ref[:, :HL] = mA
        m_ref[:, HL:] = mB
        fm_ref[:, :HL] = mA
        fm_ref[:, HL:] = mB

    return kernel


@jax.jit
def fwd_interleaved(seg_packed):
    T, B4 = seg_packed.shape
    nt, nb = T // CHUNK_F, B4 // (2 * HL)
    G = jnp.asarray(_branch_masks(SPEC))
    return pl.pallas_call(
        _interleaved_kernel(),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec(G.shape, lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK_F, 2 * HL), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((GPC, NS, 2 * HL),
                                lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, 2 * HL), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nt * GPC, NS, B4), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B4), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, 2 * HL), jnp.int32)],
    )(G, seg_packed)


@jax.jit
def fwd_baseline(seg_packed):
    return acs_forward_batch_swar(SPEC, seg_packed)


def main():
    B, L = 2048, 2048
    T = L + SPEC.S                    # 2054 -> pad to CHUNK_F
    Tp = -(-T // CHUNK_F) * CHUNK_F
    rng = np.random.default_rng(11)
    segs = rng.integers(0, 4, (B, Tp), np.uint8)
    packed = jax.device_put(_pack_channels(jnp.asarray(segs)))
    print("packed", packed.shape, flush=True)

    d0, f0 = fwd_baseline(packed)
    d1, f1 = fwd_interleaved(packed)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    print("interleaved fwd BIT-IDENTICAL to production fwd", flush=True)

    bufs = [packed] + [
        jax.device_put(_pack_channels(jnp.asarray(np.roll(segs, r + 1,
                                                          axis=0))))
        for r in range(7)]
    shutil.rmtree("/tmp/ilv_prof", ignore_errors=True)
    jax.profiler.start_trace("/tmp/ilv_prof")
    for f in (fwd_baseline, fwd_interleaved):
        for i in range(16):
            out = f(bufs[i % 8])
        out[0].block_until_ready()
    jax.profiler.stop_trace()
    tf = sorted(glob.glob("/tmp/ilv_prof/**/*.trace.json.gz",
                          recursive=True))[-1]
    ev = json.load(gzip.open(tf))["traceEvents"]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                e.get("name", "").startswith("jit_fwd"):
            k = e["name"].split("(")[0]
            dur[k] += e["dur"]
            cnt[k] += 1
    for k, v in dur.most_common(4):
        print(f"  {k}: {v / max(cnt[k], 1):.0f} us/call x{cnt[k]}")


if __name__ == "__main__":
    main()
