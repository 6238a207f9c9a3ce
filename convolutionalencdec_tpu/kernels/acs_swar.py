"""SWAR butterfly Viterbi kernels: 4 channels per int32 lane.

The int32-only TPU vector ALU (Mosaic rejects i8/i16 math) caps the
plain formulation at ~1 channel per lane.  These kernels pack FOUR
channels into one int32 lane as 8-bit fields and do the whole
add-compare-select with full-rate field-parallel arithmetic:

- adds/subs act per field as long as no field crosses 255 (renorm keeps
  path metrics < ~116, viterbiDecoderButterflyk1.c:159-183 is the same
  argument for the reference's uint8 metrics);
- the compare uses the guard-bit trick: t = a0 + 0x7F - a1 per field
  sets bit 7 iff a0 > a1 (exactly the scan decoder's `a0 > a1` with
  ties keeping the low source);
- the select is a bitwise mux ev = a0 ^ ((a0 ^ a1) & (ge * 0xFF)) —
  measured full-rate on the VPU, unlike cmp+select pairs which run at
  half rate (scripts/roofline.py);
- edge metrics are pure bitwise: em = sum_b (P_b ^ G_b) where P_b is
  the packed received bit-plane and G_b a per-row 0/unit mask of the
  branch bit (the Hamming XOR of viterbiDecoder.c:277-281, field-
  parallel).

Layout mirrors the fused 3-stage kernels in acs_pallas.py (states on
sublanes, the sA/sB/sC stage relabeling with one 8x8 sublane transpose
per 3 steps), but a tile is 512 channels in 128 lanes.  Decisions keep
the reference's 1-bit-per-state-per-step packing
(viterbiDecoder.h:139-145): one byte field per channel per 8-step
group, bit j = step j's survivor choice.

Restricted to k=1 poly-symmetric NUM_STATES >= 64, n <= 4 codes (the
headline NASA K=7 class, rate-1/3 TBCC, and K=9), hard + soft (16-bit
or bounded 8-bit LLR fields); other configurations use acs_pallas.
Hard rate-1/2 renorms every 24 steps; n >= 3 exceeds that cadence's
127 guard bound and renorms after every stage-2 step instead
(_dense_renorm_ok).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import CodeSpec
from .acs_pallas import (CHUNK_F, PACK, _em_weight_matrix, _group_masks,
                         init_metric_value)

UNIT = 0x01010101          # one LSB per byte field
B127 = 0x7F7F7F7F          # guard-bit bias: +127 per field
UNIT16 = 0x00010001        # one LSB per 16-bit field (soft path)
B16 = 0x7FFF7FFF           # guard-bit bias: +32767 per 16-bit field
# Two vregs of lanes per tile: the per-step ACS chain on one vreg
# leaves the VPU's issue slots underfed; a 256-lane tile gives the
# Mosaic scheduler two independent vreg-ops per instruction (measured:
# fwd 238 -> 217 us, tb 120 -> 111 us at B=2048; 512 lanes regresses).
LANES = 256
SWAR_TILE = 4 * LANES      # channels per kernel tile (hard, 8-bit fields)
SWAR_TILE16 = 2 * LANES    # channels per kernel tile (soft, 16-bit fields)
GPC = CHUNK_F // PACK


TILE_LANES_OVERRIDE = None  # probe knob: force a tile width (scripts/k9_probe.py)


def tile_lanes(spec: CodeSpec) -> int:
    """Per-spec kernel tile width in lanes.

    Two-vreg (256-lane) tiles feed the VPU's dual issue slots at NS=64
    (fwd 238 -> 217 us).  At NS >= 256 the per-tile live set quadruples
    (metrics NS x tile_lanes plus 8 decision-accumulator blocks of
    (NS/8, tile_lanes)) and the two-vreg win inverts — one-vreg tiles
    measured faster on v5e for K=9: fwd 1089 -> 933 us, tb 490 -> 446
    us (scripts/k9_probe.py).  Only the grid/tile width changes; the
    packed channel mapping stays the module-constant LANES, so packs
    and kernels of different widths compose.  Set TILE_LANES_OVERRIDE
    (module global, probes only) to force a width for A/B timing."""
    if TILE_LANES_OVERRIDE is not None:
        return TILE_LANES_OVERRIDE
    return 128 if spec.num_states >= 256 else LANES


def swar_layout_supported(spec: CodeSpec) -> bool:
    """Whether the SWAR kernels' LAYOUT applies: k=1 poly-symmetric
    butterfly trellis on the fused 3-stage schedule (NS >= 64) with
    n <= 4 bit-plane edge metrics.  Field-width bounds are separate:
    the hard and soft-8 paths add 8-bit metric constraints below, the
    soft-16 path has none (16-bit fields bound any int8-LLR metric
    spread by orders of magnitude)."""
    return (spec.k == 1 and spec.num_states >= 64 and spec.n <= 4
            and spec.has_poly_symmetry)


def _sparse_renorm_ok(spec: CodeSpec) -> bool:
    """Whether HARD metrics stay under the 127 guard-bit bound with the
    cheap 24-step renorm cadence: worst case init_hi + 24 steps of
    growth (+ the edge metric) between renorms.  Rate-1/2 codes pass;
    n >= 3 needs the dense cadence below."""
    return init_metric_value(spec) + 25 * spec.n <= 127


def _dense_renorm_ok(spec: CodeSpec) -> bool:
    """Whether HARD metrics fit 8-bit fields with a renorm after EVERY
    stage-2 step (3-step cadence, the soft-8 kernel's schedule):

        max(init_hi, S*n) + 3*n <= 127

    — steady-state spread is at most S*n (every state reachable from
    the minimum-metric survivor within S steps at <= n per edge, the
    truncation geometry of viterbiDecoder.c:53-74); warm-up fields are
    bounded by init_hi + growth.  Admits every practical n <= 4 code,
    at ~10 extra vector ops per 3 steps."""
    growth = 3 * spec.n
    spread = max(init_metric_value(spec), spec.S * spec.n)
    return spread + growth <= 127


def swar_supported(spec: CodeSpec) -> bool:
    """HARD decode in 8-bit fields (4 channels/lane): the layout plus a
    renorm cadence whose guard-bit bound holds (the forward kernel
    picks the cheaper cadence automatically)."""
    return (swar_layout_supported(spec)
            and (_sparse_renorm_ok(spec) or _dense_renorm_ok(spec)))


def swar8_soft_supported(spec: CodeSpec, qmax: int) -> bool:
    """Whether SOFT decode fits 8-bit metric fields (4 channels/lane)
    EXACTLY.  With a renorm after every stage-2 step (3-step cadence),
    fields are bounded by

        max(init_hi, S*n*qmax) + 3*n*qmax <= 127

    — the steady-state path-metric spread is at most S*n*qmax because
    every state is reachable from the minimum-metric state's survivor
    within S steps (each edge costs <= n*qmax), the same truncation
    geometry as viterbiDecoder.c:53-74; warm-up fields are bounded by
    init_hi + growth instead.  NASA K=7 at the default qmax=7 gives
    max(64, 84) + 42 = 126: exact with one unit to spare."""
    growth = 3 * spec.n * qmax
    spread = max(init_metric_value(spec), spec.S * spec.n * qmax)
    return (swar_layout_supported(spec) and qmax <= 31
            and spread + growth <= 127)


def _branch_masks(spec: CodeSpec, full_word: bool = False) -> np.ndarray:
    """(3*n, HALF, 1) int32: row stage*n + b is 0 where the stage row's
    branch bit b is 0, else UNIT (hard: P_b ^ G_b = p XOR g per field)
    or -1 (soft: full-word bitwise-mux select mask — both fields of a
    lane take the same per-row branch bit).  Derived from the same MXU
    weight matrix the int32 kernels use — em_row = const +
    sum coef_b * p_b with coef_b = +/-1 and g_b = (coef_b == -1)."""
    W = np.asarray(_em_weight_matrix(spec), np.int32)  # (3*HALF, n+1)
    HALF = spec.num_states // 2
    one = -1 if full_word else UNIT
    rows = []
    for stage in range(3):
        blk = W[stage * HALF:(stage + 1) * HALF]
        for b in range(spec.n):
            g = (blk[:, 1 + b:2 + b] < 0).astype(np.int64)
            rows.append((g * one).astype(np.int32))
    return np.stack(rows, axis=0)


def _acs_swar(first, second, em, emc, j, unit=UNIT, bias=B127, sh=7,
              selmul=0xFF):
    """Field-parallel butterfly ACS: two destinations per source pair.

    Exactly viterbi_forward_butterfly's compare (ties keep the low
    source); decisions returned as bit-j contributions per field."""
    a0 = first + em
    a1 = second + emc
    ge = ((a0 + bias - a1) >> sh) & unit      # a0 > a1 per field
    ev = a0 ^ ((a0 ^ a1) & (ge * selmul))
    b0 = first + emc
    b1 = second + em
    go = ((b0 + bias - b1) >> sh) & unit
    od = b0 ^ ((b0 ^ b1) & (go * selmul))
    return ev, od, ge << j, go << j


def _swar_min(a, b, unit=UNIT, bias=B127, sh=7, selmul=0xFF):
    """Per-field minimum of non-negative fields under the guard bound."""
    ge = ((a + bias - b) >> sh) & unit
    return a ^ ((a ^ b) & (ge * selmul))


def _fwd_chunk_body_swar(spec: CodeSpec, g_ref, seg_ref, m, dec_store,
                         dense_renorm: bool = False):
    """One CHUNK_F-step SWAR forward pass (hard decision).

    `g_ref`: (3*n, HALF, 1) int32 branch-bit masks (_branch_masks).
    `m` is the packed (NS, L) natural-order metric value at chunk
    start; `dec_store(g, acc8)` receives the group's 8 packed decision
    blocks ((Q8, L) int32, one byte field per channel; L = tile_lanes(spec)).
    Structure is
    _fwd_chunk_body's fused 3-stage pipeline, field-parallel.

    `dense_renorm` renorms after EVERY stage-2 step instead of every
    24 steps — required when `_sparse_renorm_ok` fails (n >= 3 codes);
    see `_dense_renorm_ok` for the bound.
    """
    NS = spec.num_states
    HALF, Q4, Q8 = NS // 2, NS // 4, NS // 8
    LANES = tile_lanes(spec)
    n = spec.n
    seg = seg_ref[:]                          # (CHUNK_F, L) int32 packed
    G = [[g_ref[stage * n + b] for b in range(n)] for stage in range(3)]

    def renorm(mm):
        # Per-channel scalar min across states, subtracted from all:
        # compare-invariant (viterbiDecoderButterflyk1.c:159-183's
        # argument), keeps every field non-negative with min 0.
        mn = mm[:Q8]
        for b_ in range(1, 8):
            mn = _swar_min(mn, mm[b_ * Q8:(b_ + 1) * Q8])
        while mn.shape[0] > 1:
            h_ = mn.shape[0] // 2
            mn = _swar_min(mn[:h_], mn[h_:])
        return mm - mn                        # broadcast (1, L)

    mA = mB = None
    for g in range(GPC):
        acc = [jnp.zeros((Q8, LANES), jnp.int32) for _ in range(8)]

        def add_acc(rows, start, acc=acc):
            for b_ in range(rows.shape[0] // Q8):
                idx = start // Q8 + b_
                acc[idx] = acc[idx] + rows[b_ * Q8:(b_ + 1) * Q8]

        for j in range(PACK):
            t_row = g * PACK + j
            stage = t_row % 3
            row = seg[t_row:t_row + 1, :]     # (1, L)
            planes = [(row >> b) & UNIT for b in range(n)]
            em = planes[0] ^ G[stage][0]
            for b in range(1, n):
                em = em + (planes[b] ^ G[stage][b])
            emc = (n * UNIT) - em
            if stage == 0:
                ev, od, de, do = _acs_swar(m[:HALF], m[HALF:],
                                           em, emc, j)
                mA = (ev, od)
                add_acc(de, 0)
                add_acc(do, HALF)
            elif stage == 1:
                ev, od = mA
                e1, o1, d1e, d1o = _acs_swar(ev[:Q4], ev[Q4:],
                                             em[:Q4], emc[:Q4], j)
                e2, o2, d2e, d2o = _acs_swar(od[:Q4], od[Q4:],
                                             em[Q4:], emc[Q4:], j)
                mB = (e1, o1, e2, o2)
                add_acc(d1e, 0)
                add_acc(d1o, Q4)
                add_acc(d2e, 2 * Q4)
                add_acc(d2o, 3 * Q4)
            else:
                outs = []
                for c in range(4):
                    blk = mB[c]
                    e, o, de, do = _acs_swar(blk[:Q8], blk[Q8:],
                                             em[c * Q8:(c + 1) * Q8],
                                             emc[c * Q8:(c + 1) * Q8], j)
                    outs += [e, o]
                    add_acc(de, 2 * c * Q8)
                    add_acc(do, (2 * c + 1) * Q8)
                m = jnp.stack(outs, axis=0).transpose(1, 0, 2) \
                       .reshape(NS, LANES)
                if dense_renorm:
                    m = renorm(m)
        # Sparse cadence: renorm on groups that end on a stage-2 step
        # (every 24 steps) — worst-case fields stay <= ~116 < 127, the
        # guard-bit compare's validity bound (_sparse_renorm_ok).
        if not dense_renorm and (g * PACK + PACK - 1) % 3 == 2:
            m = renorm(m)
        dec_store(g, acc)
    return m


def _fwd_chunk_body_swar_soft(spec: CodeSpec, g_ref, cost_ref, m,
                              dec_store):
    """One CHUNK_F-step SWAR-16 soft forward pass (2 channels/lane).

    `g_ref`: (3*n, HALF, 1) int32 branch masks, 0 or -1 (full-word —
    both 16-bit fields of a lane take the same per-row branch bit).
    `cost_ref`: (n, CHUNK_F, L) int32 (L = tile_lanes(spec)) — plane b
    carries the BIASED
    quantized LLR q_b + 128 of two channels per lane as 16-bit fields
    (packing raw LLRs keeps the XLA prologue to one cheap pass; the
    relu costs are recovered field-parallel here).  Same edge-metric
    semantics as _fwd_soft_kernel: cost-if-1 = relu(+q), cost-if-0 =
    relu(-q), zero LLRs (depunctured erasures) contribute no cost, and
    the poly-symmetry complement is emc = Q - em with Q = sum_b |q_b|
    (viterbiDecoder.h:33-39 generalized).
    """
    NS = spec.num_states
    HALF, Q4, Q8 = NS // 2, NS // 4, NS // 8
    LANES = tile_lanes(spec)
    n = spec.n
    qplanes = cost_ref[:]                     # (n, CHUNK_F, L)
    C128 = UNIT16 << 7                        # +128 per field
    BQ = 0x7F7F7F7F                           # (32767 - 128) per field
    G = [[g_ref[stage * n + b] for b in range(n)] for stage in range(3)]
    acs = functools.partial(_acs_swar, unit=UNIT16, bias=B16, sh=15,
                            selmul=0xFFFF)

    mA = mB = None
    for g in range(GPC):
        acc = [jnp.zeros((Q8, LANES), jnp.int32) for _ in range(8)]

        def add_acc(rows, start, acc=acc):
            for b_ in range(rows.shape[0] // Q8):
                idx = start // Q8 + b_
                acc[idx] = acc[idx] + rows[b_ * Q8:(b_ + 1) * Q8]

        for j in range(PACK):
            t_row = g * PACK + j
            stage = t_row % 3
            em = Q = None
            for b in range(n):
                qrow = qplanes[b, t_row:t_row + 1, :]   # biased q + 128
                ge = ((qrow + BQ) >> 15) & UNIT16       # 1 iff q >= 0
                gm = ge * 0xFFFF
                ng = gm ^ -1
                c1 = (qrow & gm) - (ge << 7)            # relu(+q)
                c0 = (C128 & ng) - (qrow & ng)          # relu(-q)
                e_b = c0 ^ ((c0 ^ c1) & G[stage][b])
                em = e_b if em is None else em + e_b
                q_b = c0 + c1                           # |q|
                Q = q_b if Q is None else Q + q_b
            emc = Q - em
            if stage == 0:
                ev, od, de, do = acs(m[:HALF], m[HALF:], em, emc, j)
                mA = (ev, od)
                add_acc(de, 0)
                add_acc(do, HALF)
            elif stage == 1:
                ev, od = mA
                e1, o1, d1e, d1o = acs(ev[:Q4], ev[Q4:],
                                       em[:Q4], emc[:Q4], j)
                e2, o2, d2e, d2o = acs(od[:Q4], od[Q4:],
                                       em[Q4:], emc[Q4:], j)
                mB = (e1, o1, e2, o2)
                add_acc(d1e, 0)
                add_acc(d1o, Q4)
                add_acc(d2e, 2 * Q4)
                add_acc(d2o, 3 * Q4)
            else:
                outs = []
                for c in range(4):
                    blk = mB[c]
                    e, o, de, do = acs(blk[:Q8], blk[Q8:],
                                       em[c * Q8:(c + 1) * Q8],
                                       emc[c * Q8:(c + 1) * Q8], j)
                    outs += [e, o]
                    add_acc(de, 2 * c * Q8)
                    add_acc(do, (2 * c + 1) * Q8)
                m = jnp.stack(outs, axis=0).transpose(1, 0, 2) \
                       .reshape(NS, LANES)
        # 16-bit fields have huge headroom (growth <= 24*n*qmax per
        # cadence), but renorm anyway to keep the guard bound trivial.
        if (g * PACK + PACK - 1) % 3 == 2:
            mn = m[:Q8]
            for b_ in range(1, 8):
                mn = _swar_min(mn, m[b_ * Q8:(b_ + 1) * Q8],
                               UNIT16, B16, 15, 0xFFFF)
            while mn.shape[0] > 1:
                h_ = mn.shape[0] // 2
                mn = _swar_min(mn[:h_], mn[h_:], UNIT16, B16, 15, 0xFFFF)
            m = m - mn
        dec_store(g, acc)
    return m


def _fwd_chunk_body_swar_soft8(spec: CodeSpec, qmax: int, g_ref, cost_ref,
                               m, dec_store):
    """One CHUNK_F-step SWAR-8 soft forward pass: FOUR channels/lane.

    `cost_ref`: (n, CHUNK_F, L) int32 (L = tile_lanes(spec)) — plane b
    carries the biased
    quantized LLR q_b + qmax of four channels per lane as 8-bit fields
    (inputs clipped to [-qmax, qmax] by the pack).  Exactness: see
    `swar8_soft_supported` — the renorm runs after EVERY stage-2 step
    (3-step cadence), which bounds every field at
    max(init_hi, S*n*qmax) + 3*n*qmax <= 127, so the guard-bit compare
    is exact and the decode is bit-identical to the int32 soft scan.
    Same edge-metric semantics as the SWAR-16 kernel (relu costs
    recovered in-kernel, zero LLRs are free erasures, emc = Q - em)."""
    NS = spec.num_states
    HALF, Q4, Q8 = NS // 2, NS // 4, NS // 8
    LANES = tile_lanes(spec)
    n = spec.n
    qplanes = cost_ref[:]                     # (n, CHUNK_F, L)
    CQ = qmax * UNIT                          # +qmax bias per field
    BQ = (128 - qmax) * UNIT                  # guard-bit probe offset
    G = [[g_ref[stage * n + b] for b in range(n)] for stage in range(3)]

    mA = mB = None
    for g in range(GPC):
        acc = [jnp.zeros((Q8, LANES), jnp.int32) for _ in range(8)]

        def add_acc(rows, start, acc=acc):
            for b_ in range(rows.shape[0] // Q8):
                idx = start // Q8 + b_
                acc[idx] = acc[idx] + rows[b_ * Q8:(b_ + 1) * Q8]

        for j in range(PACK):
            t_row = g * PACK + j
            stage = t_row % 3
            em = Q = None
            for b in range(n):
                qrow = qplanes[b, t_row:t_row + 1, :]   # biased q + qmax
                ge = ((qrow + BQ) >> 7) & UNIT          # 1 iff q >= 0
                gm = ge * 0xFF
                ng = gm ^ -1
                c1 = (qrow & gm) - (ge * qmax)          # relu(+q)
                c0 = (CQ & ng) - (qrow & ng)            # relu(-q)
                e_b = c0 ^ ((c0 ^ c1) & G[stage][b])
                em = e_b if em is None else em + e_b
                q_b = c0 + c1                           # |q|
                Q = q_b if Q is None else Q + q_b
            emc = Q - em
            if stage == 0:
                ev, od, de, do = _acs_swar(m[:HALF], m[HALF:], em, emc, j)
                mA = (ev, od)
                add_acc(de, 0)
                add_acc(do, HALF)
            elif stage == 1:
                ev, od = mA
                e1, o1, d1e, d1o = _acs_swar(ev[:Q4], ev[Q4:],
                                             em[:Q4], emc[:Q4], j)
                e2, o2, d2e, d2o = _acs_swar(od[:Q4], od[Q4:],
                                             em[Q4:], emc[Q4:], j)
                mB = (e1, o1, e2, o2)
                add_acc(d1e, 0)
                add_acc(d1o, Q4)
                add_acc(d2e, 2 * Q4)
                add_acc(d2o, 3 * Q4)
            else:
                outs = []
                for c in range(4):
                    blk = mB[c]
                    e, o, de, do = _acs_swar(blk[:Q8], blk[Q8:],
                                             em[c * Q8:(c + 1) * Q8],
                                             emc[c * Q8:(c + 1) * Q8], j)
                    outs += [e, o]
                    add_acc(de, 2 * c * Q8)
                    add_acc(do, (2 * c + 1) * Q8)
                m = jnp.stack(outs, axis=0).transpose(1, 0, 2) \
                       .reshape(NS, LANES)
                # Renorm after EVERY stage-2 step — the 3-step cadence
                # the 8-bit exactness bound requires.
                mn = m[:Q8]
                for b_ in range(1, 8):
                    mn = _swar_min(mn, m[b_ * Q8:(b_ + 1) * Q8])
                while mn.shape[0] > 1:
                    h_ = mn.shape[0] // 2
                    mn = _swar_min(mn[:h_], mn[h_:])
                m = m - mn
        dec_store(g, acc)
    return m


def _tb_chunk_body_swar(spec: CodeSpec, hb, get_dec, emit, unit=UNIT,
                        selmul=0xFF, msb_first=False):
    """One CHUNK_F-step SWAR backward traceback.

    `hb`: 8 (Q8, L) packed one-hot blocks (fields 0/1), natural order
    at chunk entry.  Mirrors _tb_chunk_body's select network with
    field-parallel bitwise merges; per-group deferred bit emission.
    `msb_first` packs step g*8+j at bit 7-j instead of j — the output
    field is then directly a reference-convention decoded BYTE
    (viterbiDecoder.c:152-189 MSb-first fill), at zero kernel cost."""
    NS = spec.num_states
    Q8 = NS // 8
    LANES = tile_lanes(spec)
    for g in range(GPC - 1, -1, -1):
        dec32 = get_dec(g)
        db = [dec32[b_ * Q8:(b_ + 1) * Q8] for b_ in range(8)]
        oacc = [jnp.zeros((Q8, LANES), jnp.int32) for _ in range(4)]
        for j in range(PACK - 1, -1, -1):
            stage = (g * PACK + j) % 3
            wf = 1 << (PACK - 1 - j) if msb_first else 1 << j
            gm = [((d_ >> j) & unit) * selmul for d_ in db]

            def merge(i0, i1, hb=None, gm=gm):
                h0, h1 = hb[i0], hb[i1]
                hi = (h0 & gm[i0]) + (h1 & gm[i1])
                lo = (h0 + h1) - hi
                return lo, hi

            if stage == 2:
                h_full = jnp.concatenate(hb, axis=0)
                hsc = h_full.reshape(Q8, 8, LANES).transpose(1, 0, 2)
                hb = [hsc[b_] for b_ in range(8)]
                for k_, b_ in enumerate((1, 3, 5, 7)):
                    oacc[k_] = oacc[k_] + hb[b_] * wf
                nb = []
                for c in range(4):
                    lo, hi = merge(2 * c, 2 * c + 1, hb)
                    nb += [lo, hi]
                hb = nb
            elif stage == 1:
                for k_, b_ in enumerate((2, 3, 6, 7)):
                    oacc[k_] = oacc[k_] + hb[b_] * wf
                nb = [None] * 8
                for bi, base in enumerate((0, 4)):
                    lo_a, hi_a = merge(base, base + 2, hb)
                    lo_b, hi_b = merge(base + 1, base + 3, hb)
                    nb[4 * bi:4 * bi + 4] = [lo_a, lo_b, hi_a, hi_b]
                hb = nb
            else:
                for k_, b_ in enumerate((4, 5, 6, 7)):
                    oacc[k_] = oacc[k_] + hb[b_] * wf
                los, his = [], []
                for b_ in range(4):
                    lo, hi = merge(b_, b_ + 4, hb)
                    los.append(lo)
                    his.append(hi)
                hb = los + his
        out_acc = jnp.sum(oacc[0] + oacc[1] + oacc[2] + oacc[3],
                          axis=0, keepdims=True)
        emit(g, out_acc)
    return hb


def _tb_chunk_body_swar_multi(spec: CodeSpec, hbs, get_dec, emit,
                              unit=UNIT, selmul=0xFF, msb_first=False):
    """Multi-walk twin of `_tb_chunk_body_swar`: `NW` independent
    one-hot walks (`hbs`: list of NW 8-block lists) traverse the SAME
    decision chunk in one pass.  The decision load and the per-step
    select masks `gm` are computed ONCE and shared by every walk — the
    list decoder's NW tracebacks otherwise re-read the whole decision
    matrix from HBM NW times and re-derive gm NW times.  Per-walk
    select-network cost is unchanged.  `emit(g, accs)` receives one
    packed output row per walk."""
    NS = spec.num_states
    Q8 = NS // 8
    LANES = tile_lanes(spec)
    NW = len(hbs)
    for g in range(GPC - 1, -1, -1):
        dec32 = get_dec(g)
        db = [dec32[b_ * Q8:(b_ + 1) * Q8] for b_ in range(8)]
        oaccs = [[jnp.zeros((Q8, LANES), jnp.int32) for _ in range(4)]
                 for _ in range(NW)]
        for j in range(PACK - 1, -1, -1):
            stage = (g * PACK + j) % 3
            wf = 1 << (PACK - 1 - j) if msb_first else 1 << j
            gm = [((d_ >> j) & unit) * selmul for d_ in db]

            def merge(i0, i1, hb, gm=gm):
                h0, h1 = hb[i0], hb[i1]
                hi = (h0 & gm[i0]) + (h1 & gm[i1])
                lo = (h0 + h1) - hi
                return lo, hi

            for w in range(NW):
                hb, oacc = hbs[w], oaccs[w]
                if stage == 2:
                    h_full = jnp.concatenate(hb, axis=0)
                    hsc = h_full.reshape(Q8, 8, LANES).transpose(1, 0, 2)
                    hb = [hsc[b_] for b_ in range(8)]
                    for k_, b_ in enumerate((1, 3, 5, 7)):
                        oacc[k_] = oacc[k_] + hb[b_] * wf
                    nb = []
                    for c in range(4):
                        lo, hi = merge(2 * c, 2 * c + 1, hb)
                        nb += [lo, hi]
                    hbs[w] = nb
                elif stage == 1:
                    for k_, b_ in enumerate((2, 3, 6, 7)):
                        oacc[k_] = oacc[k_] + hb[b_] * wf
                    nb = [None] * 8
                    for bi, base in enumerate((0, 4)):
                        lo_a, hi_a = merge(base, base + 2, hb)
                        lo_b, hi_b = merge(base + 1, base + 3, hb)
                        nb[4 * bi:4 * bi + 4] = [lo_a, lo_b, hi_a, hi_b]
                    hbs[w] = nb
                else:
                    for k_, b_ in enumerate((4, 5, 6, 7)):
                        oacc[k_] = oacc[k_] + hb[b_] * wf
                    los, his = [], []
                    for b_ in range(4):
                        lo, hi = merge(b_, b_ + 4, hb)
                        los.append(lo)
                        his.append(hi)
                    hbs[w] = los + his
        emit(g, [jnp.sum(oa[0] + oa[1] + oa[2] + oa[3], axis=0,
                         keepdims=True) for oa in oaccs])
    return hbs


def _tb_kernel_swar_multi(spec: CodeSpec, NW: int, unit=UNIT,
                          selmul=0xFF, msb_first=False):
    NS = spec.num_states
    Q8 = NS // 8
    LANES = tile_lanes(spec)

    def kernel(gmask_ref, hinit_ref, dec_ref, out_ref, h_ref):
        # hinit_ref: (NW*NS, B4) — NW stacked packed one-hot walk
        # starts; h_ref carries all NW walks between chunks.
        i = pl.program_id(1)
        nt_total = pl.num_programs(1)
        gbase = (nt_total - 1 - i) * GPC

        @pl.when(i == 0)
        def _():
            h_ref[:] = hinit_ref[:]

        h = h_ref[:]
        hbs = [[h[w * NS + b_ * Q8:w * NS + (b_ + 1) * Q8]
                for b_ in range(8)] for w in range(NW)]

        def get_dec(g):
            gm = gmask_ref[gbase + g, 0]
            return dec_ref[g] & (gm * unit)

        def emit(g, accs):
            for w in range(NW):
                out_ref[g, w, :] = accs[w].reshape(LANES)

        hbs = _tb_chunk_body_swar_multi(spec, hbs, get_dec, emit, unit,
                                        selmul, msb_first)
        for w in range(NW):
            for b_ in range(8):
                h_ref[w * NS + b_ * Q8:w * NS + (b_ + 1) * Q8] = hbs[w][b_]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def traceback_batch_swar_masked_multi(spec: CodeSpec, decs, gmask,
                                      h_inits, interpret: bool = False,
                                      wide: bool = False,
                                      msb_first: bool = False):
    """Multi-walk masked traceback: NW independent walk starts per
    channel traverse the decision matrix in ONE kernel launch (the
    list decoder's per-candidate tracebacks; see
    kernels/tailbiting.py).  Decisions are DMA'd once for all walks.

    Args:
      decs: [TG, NS, B4] int32 packed decisions.
      gmask: int32 [TG, 1] per-group byte masks (0xFF live).
      h_inits: [NW, NS, B4] int32 packed one-hot walk starts.
    Returns packed decoded bits [TG, NW, B4] int32.
    """
    NS = spec.num_states
    NW = h_inits.shape[0]
    TG, _, B4 = decs.shape
    LANES = tile_lanes(spec)
    nt = TG // GPC
    nb = B4 // LANES
    gmask = jnp.asarray(gmask, jnp.int32).reshape(TG, 1)
    h0 = jnp.asarray(h_inits, jnp.int32).reshape(NW * NS, B4)
    return pl.pallas_call(
        _tb_kernel_swar_multi(spec, NW, *((UNIT16, 0xFFFF) if wide
                                          else (UNIT, 0xFF)), msb_first),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NW * NS, LANES), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPC, NS, LANES),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPC, NW, LANES),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, NW, B4), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NW * NS, LANES), jnp.int32)],
        interpret=interpret,
    )(gmask, h0, decs)


def _fwd_kernel_swar(spec: CodeSpec, with_minit: bool = False):
    NS = spec.num_states
    Q8 = NS // 8
    LANES = tile_lanes(spec)
    init_hi = init_metric_value(spec)   # swar_supported bounds it
    dense = not _sparse_renorm_ok(spec)  # n >= 3: renorm every 3 steps

    def kernel(*refs):
        # ic_ref: (1, 1) int32 SMEM — chunk at which the standard initial
        # metrics apply (0 = whole packet; W/CHUNK_F for the first block
        # of a time-sharded stream; -1 keeps the uniform start for
        # interior blocks — viterbiDecoder.c:53-74's truncation argument).
        # with_minit: a (NS, B4) packed metric input seeds the walk at
        # chunk 0 instead — the carried-metric seam of the block-speed
        # streaming decoder (kernels/blockstream.py); fields arrive
        # renormalized (min 0) so they re-enter the 8-bit bound.
        # fm_ref: (NS, B4) packed final metrics (valid after last chunk).
        if with_minit:
            ic_ref, minit_ref, g_ref, seg_ref, dec_ref, fm_ref, m_ref = refs
        else:
            ic_ref, g_ref, seg_ref, dec_ref, fm_ref, m_ref = refs
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            if with_minit:
                m_ref[:] = minit_ref[:]
            else:
                m_ref[:] = jnp.zeros((NS, LANES), jnp.int32)

        @pl.when(t_chunk == ic_ref[0, 0])
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, LANES), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi * UNIT).astype(jnp.int32)

        def dec_store(g, acc):
            for b_ in range(8):
                dec_ref[g, b_ * Q8:(b_ + 1) * Q8, :] = acc[b_]

        m = _fwd_chunk_body_swar(spec, g_ref, seg_ref, m_ref[:],
                                 dec_store, dense_renorm=dense)
        m_ref[:] = m
        fm_ref[:] = m

    return kernel


def _tb_kernel_swar(spec: CodeSpec, unit=UNIT, selmul=0xFF,
                    msb_first=False, with_hinit=False,
                    per_channel=False):
    NS = spec.num_states
    Q8 = NS // 8
    LANES = tile_lanes(spec)

    def kernel(*refs):
        # with_hinit: hinit_ref is a (NS, B4) packed one-hot walk start
        # (unit fields) — one-hot(argmin(final metrics)) for time-sharded
        # blocks; without it the walk starts at the terminal state 0
        # (viterbiDecoderButterflyk1.c:212).
        # per_channel: gmask is a VMEM (GPC, 1, LANES) block of PACKED
        # per-channel byte masks (ragged batch decode) instead of one
        # SMEM byte per group.
        if with_hinit:
            gmask_ref, hinit_ref, dec_ref, out_ref, h_ref = refs
        else:
            gmask_ref, dec_ref, out_ref, h_ref = refs
        i = pl.program_id(1)
        nt_total = pl.num_programs(1)
        gbase = (nt_total - 1 - i) * GPC

        @pl.when(i == 0)
        def _():
            if with_hinit:
                h_ref[:] = hinit_ref[:]
            else:
                s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, LANES), 0)
                h_ref[:] = jnp.where(s_idx == 0, unit, 0) \
                              .astype(jnp.int32)

        h = h_ref[:]
        hb = [h[b_ * Q8:(b_ + 1) * Q8] for b_ in range(8)]

        if per_channel:
            def get_dec(g):
                return dec_ref[g] & gmask_ref[g]   # (NS,L) & (1,L) bcast
        else:
            def get_dec(g):
                gm = gmask_ref[gbase + g, 0]
                return dec_ref[g] & (gm * unit)

        def emit(g, out_acc):
            out_ref[g, 0, :] = out_acc.reshape(LANES)

        hb = _tb_chunk_body_swar(spec, hb, get_dec, emit, unit, selmul,
                                 msb_first)
        for b_ in range(8):
            h_ref[b_ * Q8:(b_ + 1) * Q8] = hb[b_]

    return kernel


def _pack_channels(segments):
    """[B, T] uint8 -> [T, B//4] int32, channel c = tile*4L + f*L + l
    at lane (tile*L + l) byte field f (L = LANES).

    The widen-shift-or route measures 62 us at B=2048, T=2064 on v5e;
    a bitcast + SWAR-byte-transpose alternative (no widened
    intermediate) measured 2x WORSE — XLA lowers uint8 bitcast
    shuffles through relayout copies on TPU."""
    B, T = segments.shape
    s32 = segments.reshape(B // SWAR_TILE, 4, LANES, T).astype(jnp.int32)
    packed = (s32[:, 0] | (s32[:, 1] << 8)
              | (s32[:, 2] << 16) | (s32[:, 3] << 24))
    return packed.transpose(2, 0, 1).reshape(T, (B // SWAR_TILE) * LANES)


def _unpack_out(out32, B):
    """[TG, 1, B//4] int32 -> [TG, B] uint8 packed decoded bits."""
    TG = out32.shape[0]
    o = out32.reshape(TG, B // SWAR_TILE, LANES)
    fields = [(o >> (8 * f)) & 0xFF for f in range(4)]
    o = jnp.stack(fields, axis=2)             # (TG, tiles, 4, 128)
    return o.reshape(TG, B).astype(jnp.uint8)


def _check_swar_shapes(T: int, B4: int, lanes: int = LANES):
    """The SWAR grids tile T by CHUNK_F and lanes by the per-spec tile
    width `lanes` (= tile_lanes(spec), NOT necessarily the module
    constant LANES); anything under-aligned would leave grid remainders
    unprocessed (silently returning unwritten output), so reject it —
    the wrappers in acs_pallas pad before packing."""
    if T % CHUNK_F or B4 % lanes:
        raise ValueError(f"padded shapes required: T={T} % {CHUNK_F} or "
                         f"packed lanes B4={B4} % {lanes} nonzero")


@functools.partial(jax.jit, static_argnums=(0, 2))
def acs_forward_batch_swar(spec: CodeSpec, seg_packed,
                           interpret: bool = False, init_chunk=0,
                           init_metrics=None):
    """seg_packed: [T, B4] int32 (T % CHUNK_F == 0, B4 % LANES == 0).
    `init_chunk` (may be traced) is the chunk at which the standard
    initial metrics apply; -1 keeps a uniform start (time-sharded
    interior blocks).  `init_metrics` ([NS, B4] int32 PACKED,
    renormalized fields) seeds chunk 0 with carried metrics instead —
    the exact-continuation seam for chunked block-stream decode (pass
    init_chunk=-1 with it).  Returns (packed decisions [T//PACK, NS,
    B4] int32, packed final metrics [NS, B4] int32)."""
    NS = spec.num_states
    T, B4 = seg_packed.shape
    LANES = tile_lanes(spec)
    _check_swar_shapes(T, B4, LANES)
    nt = T // CHUNK_F
    nb = B4 // LANES
    G = jnp.asarray(_branch_masks(spec))
    ic = jnp.asarray(init_chunk, jnp.int32).reshape(1, 1)
    with_minit = init_metrics is not None
    in_specs = [pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)]
    args = [ic]
    if with_minit:
        in_specs.append(pl.BlockSpec((NS, LANES), lambda b, t: (0, b),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(init_metrics, jnp.int32))
    in_specs += [pl.BlockSpec(G.shape, lambda b, t: (0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((CHUNK_F, LANES), lambda b, t: (t, b),
                              memory_space=pltpu.VMEM)]
    args += [G, seg_packed]
    return pl.pallas_call(
        _fwd_kernel_swar(spec, with_minit),
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((GPC, NS, LANES), lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, LANES), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nt * GPC, NS, B4), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B4), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, LANES), jnp.int32)],
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def traceback_batch_swar(spec: CodeSpec, decs, t_actual: int,
                         interpret: bool = False, wide: bool = False,
                         msb_first: bool = False):
    """decs: [TG, NS, B4] int32 packed decisions.  Returns packed
    decoded bits [TG, 1, B4] int32 (one 8- or 16-bit field per
    channel; with `msb_first` each field is a reference-convention
    decoded byte, step g*8+j at bit 7-j)."""
    NS = spec.num_states
    TG, _, B4 = decs.shape
    LANES = tile_lanes(spec)
    _check_swar_shapes(TG * PACK, B4, LANES)
    nt = TG // GPC
    nb = B4 // LANES
    gmask = jnp.asarray(_group_masks(TG, int(t_actual)))
    return pl.pallas_call(
        _tb_kernel_swar(spec, *((UNIT16, 0xFFFF) if wide
                                else (UNIT, 0xFF)), msb_first),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GPC, NS, LANES),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPC, 1, LANES),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, 1, B4), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, LANES), jnp.int32)],
        interpret=interpret,
    )(gmask, decs)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def traceback_batch_swar_masked(spec: CodeSpec, decs, gmask, h_init,
                                interpret: bool = False,
                                wide: bool = False,
                                msb_first: bool = False):
    """SWAR twin of acs_pallas.traceback_batch_fused_masked: traced
    per-group decision masks + packed one-hot walk start, for the
    time-sharded decoder (parallel/sharding.py).

    Args:
      decs: [TG, NS, B4] int32 packed decisions.
      gmask: int32 [TG, 1] per-group byte masks (0xFF live, 0 beyond;
        masked steps have decision 0, which teleports any state to the
        terminal state 0 within S steps — shift-register states).
      h_init: [NS, B4] int32 packed one-hot start (unit fields).
    Returns packed decoded bits [TG, 1, B4] int32.
    """
    NS = spec.num_states
    TG, _, B4 = decs.shape
    LANES = tile_lanes(spec)
    nt = TG // GPC
    nb = B4 // LANES
    gmask = jnp.asarray(gmask, jnp.int32).reshape(TG, 1)
    return pl.pallas_call(
        _tb_kernel_swar(spec, *((UNIT16, 0xFFFF) if wide
                                else (UNIT, 0xFF)), msb_first,
                        with_hinit=True),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NS, LANES), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPC, NS, LANES),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPC, 1, LANES),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, 1, B4), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, LANES), jnp.int32)],
        interpret=interpret,
    )(gmask, jnp.asarray(h_init, jnp.int32), decs)


def _ragged_group_masks(seg_lengths, TG: int):
    """Per-channel per-8-step-group byte masks: [B] int32 (traced ok) ->
    [TG, B] int32; bit j of group g's byte = 1 iff step g*8+j < t_b.
    The ragged twin of acs_pallas._group_masks."""
    g0 = jnp.arange(TG, dtype=jnp.int32)[:, None] * PACK
    live = jnp.clip(jnp.asarray(seg_lengths, jnp.int32)[None, :] - g0,
                    0, PACK)
    return (1 << live) - 1


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def traceback_batch_swar_ragged(spec: CodeSpec, decs, gmask_packed,
                                interpret: bool = False,
                                wide: bool = False,
                                msb_first: bool = False):
    """Ragged-batch SWAR traceback: the per-group decision mask is a
    PER-CHANNEL packed byte (VMEM plane) instead of one SMEM scalar, so a
    single kernel call decodes a batch of mixed-length packets (decision 0
    teleports the walk to the terminal state 0 across each channel's
    masked tail — same argument as the time-sharded masks).

    Args:
      decs: [TG, NS, B4] int32 packed decisions.
      gmask_packed: [TG, 1, B4] int32 — pack_fields of
        _ragged_group_masks (byte masks in the SWAR channel mapping).
    Returns packed decoded bits [TG, 1, B4] int32.
    """
    NS = spec.num_states
    TG, _, B4 = decs.shape
    LANES = tile_lanes(spec)
    nt = TG // GPC
    nb = B4 // LANES
    return pl.pallas_call(
        _tb_kernel_swar(spec, *((UNIT16, 0xFFFF) if wide
                                else (UNIT, 0xFF)), msb_first,
                        per_channel=True),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((GPC, 1, LANES),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GPC, NS, LANES),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GPC, 1, LANES),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, 1, B4), jnp.int32),
        scratch_shapes=[pltpu.VMEM((NS, LANES), jnp.int32)],
        interpret=interpret,
    )(gmask_packed, decs)


def pack_fields(x):
    """[R, B] int32 -> [R, B//4] int32 with the SWAR channel mapping
    (channel tile*4L + f*L + l at lane tile*L + l byte field f) —
    _pack_channels without the time transpose, for per-state arrays
    (one-hot starts, metrics)."""
    R, B = x.shape
    xr = jnp.asarray(x, jnp.int32).reshape(R, B // SWAR_TILE, 4, LANES)
    return (xr[:, :, 0] | (xr[:, :, 1] << 8)
            | (xr[:, :, 2] << 16) | (xr[:, :, 3] << 24)) \
        .reshape(R, B // 4)


def pack_fields16(x):
    """[R, B] int32 -> [R, B//2] int32 with the SWAR-16 channel mapping
    (channel tile*2L + f*L + l at lane tile*L + l, 16-bit field f) —
    pack_fields' twin for the wide (soft-16) kernels."""
    R, B = x.shape
    xr = jnp.asarray(x, jnp.int32).reshape(R, B // SWAR_TILE16, 2, LANES)
    return (xr[:, :, 0] | (xr[:, :, 1] << 16)).reshape(R, B // 2)


def unpack_fields(p, B):
    """[R, B//4] int32 -> [R, B] int32 (inverse of pack_fields for
    non-negative byte fields, e.g. renormalized path metrics)."""
    R = p.shape[0]
    pr = p.reshape(R, B // SWAR_TILE, LANES)
    fields = [(pr >> (8 * f)) & 0xFF for f in range(4)]
    return jnp.stack(fields, axis=2).reshape(R, B)


def unpack_fields16(p, B):
    """[R, B//2] int32 -> [R, B] int32 (inverse of pack_fields16 for
    non-negative 16-bit fields, e.g. soft renormalized path metrics)."""
    R = p.shape[0]
    pr = p.reshape(R, B // SWAR_TILE16, LANES)
    fields = [(pr >> (16 * f)) & 0xFFFF for f in range(2)]
    return jnp.stack(fields, axis=2).reshape(R, B)


def swar_decode_packed(spec: CodeSpec, segments, t_actual: int,
                       interpret: bool = False):
    """[B, T] uint8 segments (pre-padded to SWAR_TILE x CHUNK_F) ->
    packed decoded bits [T//PACK, B] uint8."""
    B, T = segments.shape
    seg_packed = _pack_channels(segments)
    decs, _ = acs_forward_batch_swar(spec, seg_packed, interpret)
    out32 = traceback_batch_swar(spec, decs, t_actual, interpret)
    return _unpack_out(out32, B)


def _bytes_epilogue(out32, B: int, L: int, wide: bool = False):
    """Trim an msb_first traceback's packed byte rows to [B, ceil(L/8)]
    decoded bytes (zero-masked trailing byte) — the shared tail of every
    byte-output fast path."""
    unpack = _unpack_out16 if wide else _unpack_out
    nbytes = (L + 7) // 8
    packed = unpack(out32, B)[:nbytes]         # (nbytes, B) u8
    rem = L % 8
    if rem:
        mask = jnp.full((nbytes, 1), 0xFF, jnp.uint8)
        mask = mask.at[-1, 0].set((0xFF << (8 - rem)) & 0xFF)
        packed = packed & mask
    return packed.T                            # (B, nbytes)


def swar_decode_bytes(spec: CodeSpec, segments, t_actual: int, L: int,
                      interpret: bool = False):
    """[B, T] uint8 segments (pre-padded) -> [B, ceil(L/8)] uint8
    decoded bytes, MSb-first fill with a zero-padded trailing byte —
    the reference's packed output format (viterbiDecoder.c:152-189).

    The traceback emits reference-convention bytes directly
    (msb_first), so the epilogue is a trim + trailing-byte mask + one
    small transpose — ~8x less HBM traffic than unpack-to-bits."""
    B, T = segments.shape
    seg_packed = _pack_channels(segments)
    decs, _ = acs_forward_batch_swar(spec, seg_packed, interpret)
    out32 = traceback_batch_swar(spec, decs, t_actual, interpret,
                                 msb_first=True)
    return _bytes_epilogue(out32, B, L)


def swar_decode_bytes_soft8(spec: CodeSpec, qllrs, t_actual: int, L: int,
                            qmax: int, interpret: bool = False):
    """Soft-decision byte decode via the SWAR-8 kernels: [B, T, n] int8
    quantized LLRs (pre-padded) -> [B, ceil(L/8)] uint8 decoded bytes
    (MSb-first fill, viterbiDecoder.c:152-189 semantics)."""
    B, T, _ = qllrs.shape
    cost_packed = _pack_qllrs8(qllrs, qmax)
    decs, _ = acs_forward_batch_swar_soft8(spec, cost_packed, qmax,
                                        interpret)
    out32 = traceback_batch_swar(spec, decs, t_actual, interpret,
                                 msb_first=True)
    return _bytes_epilogue(out32, B, L)


def swar_decode_bytes_soft(spec: CodeSpec, qllrs, t_actual: int, L: int,
                           interpret: bool = False):
    """Soft-decision byte decode via the SWAR-16 kernels (any int8
    LLRs): [B, T, n] int8 -> [B, ceil(L/8)] uint8 decoded bytes."""
    B, T, _ = qllrs.shape
    cost_packed = _pack_qllrs(qllrs)
    decs, _ = acs_forward_batch_swar_soft(spec, cost_packed, interpret)
    out32 = traceback_batch_swar(spec, decs, t_actual, interpret,
                                 wide=True, msb_first=True)
    return _bytes_epilogue(out32, B, L, wide=True)


def _ragged_gmask_packed(seg_lengths, TG: int, B: int, wide: bool = False):
    """Build the [TG, 1, B//(4 or 2)] packed per-channel group-mask plane
    for `traceback_batch_swar_ragged` from [B] segment counts."""
    gm = _ragged_group_masks(seg_lengths, TG)          # (TG, B)
    packed = (pack_fields16 if wide else pack_fields)(gm)
    return packed.reshape(TG, 1, -1)


def _bytes_epilogue_ragged(out32, B: int, msg_bits, wide: bool = False):
    """Per-channel trim of an msb_first ragged traceback: mask decoded
    byte rows so only each channel's first `msg_bits[b]` bits survive
    (the per-channel twin of _bytes_epilogue's trailing-byte mask).
    Returns [B, TG] uint8 decoded bytes, rows zero-padded past
    ceil(msg_bits[b] / 8)."""
    unpack = _unpack_out16 if wide else _unpack_out
    packed = unpack(out32, B)                          # (TG, B) u8
    bit0 = jnp.arange(packed.shape[0], dtype=jnp.int32)[:, None] * 8
    live = jnp.clip(jnp.asarray(msg_bits, jnp.int32)[None, :] - bit0,
                    0, 8)
    mask = ((0x100 - (1 << (8 - live))) & 0xFF).astype(jnp.uint8)
    return (packed & mask).T                           # (B, TG)


def swar_decode_ragged(spec: CodeSpec, segments, seg_lengths,
                       interpret: bool = False):
    """Ragged-batch hard decode: [B, T] uint8 segments (pre-padded to
    SWAR_TILE x CHUNK_F) + [B] valid segment counts -> packed decoded
    bits [T//PACK, B] uint8 (decision bits at steps >= t_b zeroed; the
    caller masks message bits past t_b - S)."""
    B, T = segments.shape
    seg_packed = _pack_channels(segments)
    decs, _ = acs_forward_batch_swar(spec, seg_packed, interpret)
    gm_p = _ragged_gmask_packed(seg_lengths, decs.shape[0], B)
    out32 = traceback_batch_swar_ragged(spec, decs, gm_p, interpret)
    return _unpack_out(out32, B)


def swar_decode_bytes_ragged(spec: CodeSpec, segments, seg_lengths,
                             interpret: bool = False):
    """Ragged-batch hard decode to packed bytes: [B, T] uint8 segments
    (pre-padded) + [B] valid segment counts -> [B, T//PACK] uint8
    decoded bytes (MSb-first fill, per-channel zero padding past
    ceil((t_b - S)/8) — viterbiDecoder.c:152-189 semantics per row)."""
    B, T = segments.shape
    seg_packed = _pack_channels(segments)
    decs, _ = acs_forward_batch_swar(spec, seg_packed, interpret)
    gm_p = _ragged_gmask_packed(seg_lengths, decs.shape[0], B)
    out32 = traceback_batch_swar_ragged(spec, decs, gm_p, interpret,
                                        msb_first=True)
    msg_bits = jnp.asarray(seg_lengths, jnp.int32) - spec.S
    return _bytes_epilogue_ragged(out32, B, msg_bits)


def swar_decode_bytes_ragged_soft8(spec: CodeSpec, qllrs, seg_lengths,
                                   qmax: int, interpret: bool = False):
    """Soft (SWAR-8) ragged byte decode: [B, T, n] int8 quantized LLRs
    (pre-padded) + [B] valid segment counts -> [B, T//PACK] uint8."""
    B, T, _ = qllrs.shape
    cost_packed = _pack_qllrs8(qllrs, qmax)
    decs, _ = acs_forward_batch_swar_soft8(spec, cost_packed, qmax,
                                        interpret)
    gm_p = _ragged_gmask_packed(seg_lengths, decs.shape[0], B)
    out32 = traceback_batch_swar_ragged(spec, decs, gm_p, interpret,
                                        msb_first=True)
    msg_bits = jnp.asarray(seg_lengths, jnp.int32) - spec.S
    return _bytes_epilogue_ragged(out32, B, msg_bits)


def swar_decode_bytes_ragged_soft(spec: CodeSpec, qllrs, seg_lengths,
                                  interpret: bool = False):
    """Soft (SWAR-16, any int8 LLRs) ragged byte decode."""
    B, T, _ = qllrs.shape
    cost_packed = _pack_qllrs(qllrs)
    decs, _ = acs_forward_batch_swar_soft(spec, cost_packed, interpret)
    gm_p = _ragged_gmask_packed(seg_lengths, decs.shape[0], B, wide=True)
    out32 = traceback_batch_swar_ragged(spec, decs, gm_p, interpret,
                                        wide=True, msb_first=True)
    msg_bits = jnp.asarray(seg_lengths, jnp.int32) - spec.S
    return _bytes_epilogue_ragged(out32, B, msg_bits, wide=True)


def _fwd_kernel_swar_soft(spec: CodeSpec, with_minit: bool = False):
    NS = spec.num_states
    Q8 = NS // 8
    LANES = tile_lanes(spec)
    init_hi = init_metric_value(spec)

    def kernel(*refs):
        # ic_ref / fm_ref: same contract as the hard _fwd_kernel_swar —
        # init_chunk = -1 keeps a uniform (all-zero) start for
        # tail-biting wrap decode and time-sharded interior blocks;
        # fm_ref holds the packed final metrics after the last chunk.
        # with_minit: packed carried metrics seed chunk 0 instead
        # (block-stream exact continuation, kernels/acs_swar hard twin).
        if with_minit:
            ic_ref, minit_ref, g_ref, cost_ref, dec_ref, fm_ref, m_ref = refs
        else:
            ic_ref, g_ref, cost_ref, dec_ref, fm_ref, m_ref = refs
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            if with_minit:
                m_ref[:] = minit_ref[:]
            else:
                m_ref[:] = jnp.zeros((NS, LANES), jnp.int32)

        @pl.when(t_chunk == ic_ref[0, 0])
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, LANES), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi * UNIT16).astype(jnp.int32)

        def dec_store(g, acc):
            for b_ in range(8):
                dec_ref[g, b_ * Q8:(b_ + 1) * Q8, :] = acc[b_]

        m = _fwd_chunk_body_swar_soft(spec, g_ref, cost_ref,
                                      m_ref[:], dec_store)
        m_ref[:] = m
        fm_ref[:] = m

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2))
def acs_forward_batch_swar_soft(spec: CodeSpec, cost_packed,
                                interpret: bool = False, init_chunk=0,
                                init_metrics=None):
    """cost_packed: [n, T, B2] int32 packed biased LLRs (see
    _fwd_chunk_body_swar_soft).  `init_chunk` (may be traced) is the
    chunk at which the standard initial metrics apply; -1 keeps a
    uniform all-zero start (tail-biting wrap / interior time blocks).
    Returns (packed decisions [T//PACK, NS, B2] int32, packed final
    metrics [NS, B2] int32)."""
    NS = spec.num_states
    n2, T, B2 = cost_packed.shape
    LANES = tile_lanes(spec)
    _check_swar_shapes(T, B2, LANES)
    nt = T // CHUNK_F
    nb = B2 // LANES
    G = jnp.asarray(_branch_masks(spec, full_word=True))
    ic = jnp.asarray(init_chunk, jnp.int32).reshape(1, 1)
    with_minit = init_metrics is not None
    in_specs = [pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)]
    args = [ic]
    if with_minit:
        in_specs.append(pl.BlockSpec((NS, LANES), lambda b, t: (0, b),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(init_metrics, jnp.int32))
    in_specs += [pl.BlockSpec(G.shape, lambda b, t: (0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((n2, CHUNK_F, LANES),
                              lambda b, t: (0, t, b),
                              memory_space=pltpu.VMEM)]
    args += [G, cost_packed]
    return pl.pallas_call(
        _fwd_kernel_swar_soft(spec, with_minit),
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((GPC, NS, LANES), lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, LANES), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nt * GPC, NS, B2), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B2), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, LANES), jnp.int32)],
        interpret=interpret,
    )(*args)


def _pack_qllrs(qllrs):
    """[B, T, n] int8 quantized LLRs -> [n, T, B//2] int32 packed
    biased LLRs (q + 128, one 16-bit field per channel): channel
    c = tile*2L + f*L + l at lane (tile*L + l) field f (L = LANES)."""
    B, T, n = qllrs.shape
    qb = jnp.asarray(qllrs, jnp.int32) + 128
    planes = jnp.moveaxis(qb, -1, 0)          # (n, B, T)
    planes = planes.reshape(n, B // SWAR_TILE16, 2, LANES, T)
    packed = planes[:, :, 0] | (planes[:, :, 1] << 16)
    return packed.transpose(0, 3, 1, 2).reshape(
        n, T, (B // SWAR_TILE16) * LANES)


def _unpack_out16(out32, B):
    """[TG, 1, B//2] int32 -> [TG, B] uint8 packed decoded bits."""
    TG = out32.shape[0]
    o = out32.reshape(TG, B // SWAR_TILE16, LANES)
    fields = [(o >> (16 * f)) & 0xFF for f in range(2)]
    o = jnp.stack(fields, axis=2)             # (TG, tiles, 2, 128)
    return o.reshape(TG, B).astype(jnp.uint8)


def swar_decode_packed_soft(spec: CodeSpec, qllrs, t_actual: int,
                            interpret: bool = False):
    """[B, T, n] int8 quantized LLRs (pre-padded to SWAR_TILE16 x
    CHUNK_F) -> packed decoded bits [T//PACK, B] uint8."""
    B, T, _ = qllrs.shape
    cost_packed = _pack_qllrs(qllrs)
    decs, _ = acs_forward_batch_swar_soft(spec, cost_packed, interpret)
    out32 = traceback_batch_swar(spec, decs, t_actual, interpret,
                                 wide=True)
    return _unpack_out16(out32, B)


def _fwd_kernel_swar_soft8(spec: CodeSpec, qmax: int, with_minit: bool = False):
    NS = spec.num_states
    Q8 = NS // 8
    LANES = tile_lanes(spec)
    init_hi = init_metric_value(spec)

    def kernel(*refs):
        # ic_ref / fm_ref: same contract as the hard _fwd_kernel_swar.
        # with_minit: packed carried metrics seed chunk 0 instead.
        if with_minit:
            ic_ref, minit_ref, g_ref, cost_ref, dec_ref, fm_ref, m_ref = refs
        else:
            ic_ref, g_ref, cost_ref, dec_ref, fm_ref, m_ref = refs
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            if with_minit:
                m_ref[:] = minit_ref[:]
            else:
                m_ref[:] = jnp.zeros((NS, LANES), jnp.int32)

        @pl.when(t_chunk == ic_ref[0, 0])
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS, LANES), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, init_hi * UNIT).astype(jnp.int32)

        def dec_store(g, acc):
            for b_ in range(8):
                dec_ref[g, b_ * Q8:(b_ + 1) * Q8, :] = acc[b_]

        m = _fwd_chunk_body_swar_soft8(spec, qmax, g_ref, cost_ref,
                                       m_ref[:], dec_store)
        m_ref[:] = m
        fm_ref[:] = m

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def acs_forward_batch_swar_soft8(spec: CodeSpec, cost_packed,
                                 qmax: int, interpret: bool = False,
                                 init_chunk=0, init_metrics=None):
    """cost_packed: [n, T, B4] int32 packed biased LLRs, 8-bit fields
    (see _fwd_chunk_body_swar_soft8).  `init_chunk` / `init_metrics` as
    in acs_forward_batch_swar_soft.  Returns (packed decisions
    [T//PACK, NS, B4] int32, packed final metrics [NS, B4] int32)."""
    NS = spec.num_states
    n2, T, B4 = cost_packed.shape
    LANES = tile_lanes(spec)
    _check_swar_shapes(T, B4, LANES)
    nt = T // CHUNK_F
    nb = B4 // LANES
    G = jnp.asarray(_branch_masks(spec, full_word=True))
    ic = jnp.asarray(init_chunk, jnp.int32).reshape(1, 1)
    with_minit = init_metrics is not None
    in_specs = [pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.SMEM)]
    args = [ic]
    if with_minit:
        in_specs.append(pl.BlockSpec((NS, LANES), lambda b, t: (0, b),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(init_metrics, jnp.int32))
    in_specs += [pl.BlockSpec(G.shape, lambda b, t: (0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((n2, CHUNK_F, LANES),
                              lambda b, t: (0, t, b),
                              memory_space=pltpu.VMEM)]
    args += [G, cost_packed]
    return pl.pallas_call(
        _fwd_kernel_swar_soft8(spec, qmax, with_minit),
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((GPC, NS, LANES), lambda b, t: (t, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS, LANES), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nt * GPC, NS, B4), jnp.int32),
                   jax.ShapeDtypeStruct((NS, B4), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS, LANES), jnp.int32)],
        interpret=interpret,
    )(*args)


def _pack_qllrs8(qllrs, qmax: int):
    """[B, T, n] int8 quantized LLRs -> [n, T, B//4] int32 packed
    biased LLRs (clip to [-qmax, qmax], bias +qmax; one 8-bit field per
    channel, same channel mapping as _pack_channels)."""
    B, T, n = qllrs.shape
    qb = jnp.clip(jnp.asarray(qllrs, jnp.int32), -qmax, qmax) + qmax
    planes = jnp.moveaxis(qb, -1, 0)          # (n, B, T)
    planes = planes.reshape(n, B // SWAR_TILE, 4, LANES, T)
    packed = (planes[:, :, 0] | (planes[:, :, 1] << 8)
              | (planes[:, :, 2] << 16) | (planes[:, :, 3] << 24))
    return packed.transpose(0, 3, 1, 2).reshape(
        n, T, (B // SWAR_TILE) * LANES)


def swar_decode_packed_soft8(spec: CodeSpec, qllrs, t_actual: int,
                             qmax: int, interpret: bool = False):
    """[B, T, n] int8 quantized LLRs (pre-padded to SWAR_TILE x
    CHUNK_F) -> packed decoded bits [T//PACK, B] uint8, via the 8-bit
    four-channels-per-lane soft kernels (`swar8_soft_supported` must
    hold for the given qmax)."""
    B, T, _ = qllrs.shape
    cost_packed = _pack_qllrs8(qllrs, qmax)
    decs, _ = acs_forward_batch_swar_soft8(spec, cost_packed, qmax,
                                        interpret)
    out32 = traceback_batch_swar(spec, decs, t_actual, interpret)
    return _unpack_out(out32, B)
