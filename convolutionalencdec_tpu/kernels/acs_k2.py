"""Fused binary-stage Pallas kernels for k=2 (rate-2/n) codes, NS=64.

The generic-k kernel (acs_pallas._fwd_kernel_generic) pays a full
(u,s)->natural row interleave every trellis step — measured at ~70% of
its runtime — because base-4 digit rotation does not factor into cheap
sublane moves.  These kernels remove it by decomposing each 4-way ACS
into TWO butterfly-style binary halving stages via the intermediate
state y = ((x << 1) | u1) & 63 (reference trellis math:
src = d/2^k + e*2^((S-1)k), viterbiDecoder.c:104):

- alpha (inner min over x5): for each u0, a butterfly-geometry ACS
  t_{u0}(y) = min(m[xlo] + em(xlo,u), m[xhi] + em(xhi,u)) over the
  source pair {xlo, xlo+32}, emitting the packed KEY t*2 + alpha_bit;
- beta (outer min over x4): a pure pairwise min over the keys of the
  y-pair {y, y+32}, yielding dst d = 2y + u0.

Comparing keys makes the nested min's tie order exactly the scan
decoder's argmin over e = (x5, x4) (lowest e wins: lexicographic
metric, then x5 of the inner winner, then x4 by prefer-low-pair).

The halving stages ride a 3-step layout cycle (natural -> s1 -> s2 ->
natural) in which every merge pairs rows at stride >= 8 and the only
materializing relayouts are three 8x8 sublane transposes per 3 steps —
the same stage-layout economics as the k=1 butterfly kernels, at 1.5
halving stages per decoded bit instead of 1 (no poly symmetry assumed).

Decisions are 3 bit-planes per step, packed 8 steps per byte like the
butterfly kernels (viterbiDecoder.h:139-145's economy generalized):
x4 in the step's output (d) layout, and the alpha bit of each u0 in
the alpha output (y-piece) layout, so the traceback consumes every
plane in the space where it was produced.

Restricted to k == 2, num_states == 64 codes; other configurations use
the generic kernel (acs_pallas.viterbi_decode_batch_generic).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import CodeSpec
from .acs_pallas import (B_TILE, CDT, CHUNK_F, PACK, _group_masks, _pad_to,
                         init_metric_value)

NS_K2 = 64
HALF = NS_K2 // 2    # 32
Q4 = NS_K2 // 4      # 16
Q8 = NS_K2 // 8      # 8
GPC = CHUNK_F // PACK


def k2_supported(spec: CodeSpec) -> bool:
    return spec.k == 2 and spec.num_states == NS_K2


def _piece_specs():
    """Alpha-stage piece geometry per phase.

    Returns [phase][piece] = (xlo int64[rows], u1, name) where xlo are
    the low (x5=0) source STATES in slot order; xhi = xlo + 32.  The
    order is the single source of truth for both the MXU weight-row
    layout (_em_weights_k2) and the kernels' EM slicing.
    """
    phases = []
    # Phase 0: input natural (row = x).  Pairs (p, p+32); pieces ev/od.
    p = np.arange(HALF, dtype=np.int64)
    phases.append([(p, 0, "ev"), (p, 1, "od")])
    # Phase 1: input s1 (row c*16 + q <-> x = 4q + c).  Pairs (q, q+8)
    # within 16-blocks; pieces (c, u1) with 8 slots each.
    q = np.arange(Q8, dtype=np.int64)
    ph1 = []
    for c in range(4):
        for u1 in range(2):
            ph1.append((4 * q + c, u1, f"c{c}u{u1}"))
    phases.append(ph1)
    # Phase 2: input s2 (row par*32 + r <-> x = 2r + par).  Pairs
    # (r, r+16) within halves; pieces (par, u1) with 16 slots each.
    r = np.arange(Q4, dtype=np.int64)
    ph2 = []
    for par in range(2):
        for u1 in range(2):
            ph2.append((2 * r + par, u1, f"p{par}u{u1}"))
    phases.append(ph2)
    return phases


def _em_weights_k2(spec: CodeSpec) -> np.ndarray:
    """[768, n+1] int8 MXU edge-metric weights.

    Row order: for phase (3) / u0 (2) / piece (in _piece_specs order) /
    lo-then-hi source block.  em = #set(cb) + sum_j (1-2*cb_j) * r_j
    with cb = code(src, u = u1*2 + u0) — the same linearization as
    acs_pallas._em_weight_matrix, per explicit edge (no symmetry).

    Rows are PRE-SCALED by 2, with +1 on the hi (x5=1) rows: metrics
    are carried scaled by 2, so the alpha key t*2 + alpha_bit is just
    jnp.minimum(m2[lo] + W_lo, m2[hi] + W_hi) — a lexicographic min
    whose LSB is the decision, with the exact prefer-lo tie order."""
    from ..ops.encode import encode_one_input
    n = spec.n
    rows = []
    for phase in _piece_specs():
        for u0 in range(2):
            for xlo, u1, _ in phase:
                for hi, xs in enumerate((xlo, xlo + HALF)):
                    for x in xs:
                        seg, _ = encode_one_input(spec, int(x),
                                                  u1 * 2 + u0)
                        planes = [(seg >> j) & 1 for j in range(n)]
                        rows.append([2 * sum(planes) + hi]
                                    + [2 * (1 - 2 * pb) for pb in planes])
    W = np.asarray(rows, np.int64)
    assert W.shape == (3 * 2 * 2 * NS_K2, n + 1)
    return W.astype(np.int8)


def _acs_key(lo_m, hi_m, em_lo, em_hi):
    """Inner (alpha) ACS: metrics carried scaled by 2 and the weights
    carry em*2 (+1 on hi rows), so the packed key t*2 + alpha_bit is a
    single lexicographic minimum (tie keeps the low source = x5=0,
    which carries key LSB 0)."""
    return jnp.minimum(lo_m + em_lo, hi_m + em_hi)


def _bsel(klo, khi, j):
    """Outer (beta) pure-min over keys: returns (scaled metric,
    x4-bit<<j, x5-bit<<j) — x5 is the winning branch's alpha bit (key
    LSB); the returned metric keeps the x2 scale with the tie bit
    cleared."""
    gt = klo > khi
    kwin = jnp.where(gt, khi, klo)
    w = jnp.asarray(1 << j, CDT)
    z = jnp.asarray(0, CDT)
    x4 = jnp.where(gt, w, z)
    x5 = (kwin & 1) << j
    return kwin & ~1, x4, x5


def _sublane_transpose(pieces):
    """[8 x (8, B)] w-ordered pieces -> (64, B), row 8q + w."""
    return jnp.stack(pieces, axis=0).transpose(1, 0, 2) \
        .reshape(NS_K2, pieces[0].shape[-1])


def _inv_sublane_transpose(arr):
    """(64, B) row 8q + w -> [8 x (8, B)] w-ordered pieces."""
    B = arr.shape[-1]
    qw = arr.reshape(Q8, 8, B).transpose(1, 0, 2)
    return [qw[w] for w in range(8)]


def _fwd_step_k2(phase, m, em_at, acc_x4, acc_a, j):
    """One k=2 trellis step: alpha keys + beta select.

    m: (64, B) metrics in the phase's input layout.  em_at(u0, piece,
    lohi) -> (rows, B) edge metrics.  acc_x4/acc_a: decision
    accumulators (lists of row-block updates via closure).  Returns the
    new metrics (64, B) in the next phase's input layout.
    """
    if phase == 0:
        # alpha: pairs (p, p+32); pieces ev (y=2p) / od (y=2p+1).
        keys = []
        for u0 in range(2):
            kev = _acs_key(m[:HALF], m[HALF:],
                           em_at(u0, 0, 0), em_at(u0, 0, 1))
            kod = _acs_key(m[:HALF], m[HALF:],
                           em_at(u0, 1, 0), em_at(u0, 1, 1))
            keys.append((kev, kod))
            acc_a(u0, 0, (kev & 1) << j)        # sA rows [0:32) = ev
            acc_a(u0, HALF, (kod & 1) << j)     # sA rows [32:) = od
        # beta: within each 32-row piece, pairs (p, p+16).
        # s1 assembly: block c=0 (u0=0, ev), 1 (u0=1, ev), 2 (u0=0,
        # od), 3 (u0=1, od) -> row c*16 + p <-> d = 4p + c.
        blocks = [None] * 4
        for u0 in range(2):
            kev, kod = keys[u0]
            for pi, kp in enumerate((kev, kod)):
                mp, x4, x5 = _bsel(kp[:Q4], kp[Q4:], j)
                c = 2 * pi + u0
                blocks[c] = mp
                acc_x4(c * Q4, x4)
        return jnp.concatenate(blocks, axis=0)
    if phase == 1:
        # alpha: input s1; pairs (q, q+8) within 16-blocks; pieces
        # (c, u1): y = 8q + (2c + u1) -> w = 2c + u1.
        tr = [[None] * 8, [None] * 8]           # per u0: w-ordered
        for u0 in range(2):
            for pc in range(8):
                c, u1 = divmod(pc, 2)
                blk = m[c * Q4:(c + 1) * Q4]
                kp = _acs_key(blk[:Q8], blk[Q8:],
                              em_at(u0, pc, 0), em_at(u0, pc, 1))
                w = 2 * c + u1
                tr[u0][w] = kp
                acc_a(u0, w * Q8, (kp & 1) << j)
        # Mid-step transpose to natural y, then beta over halves.
        # s2 assembly: row u0*32 + p <-> d = 2p + u0.
        halves = []
        for u0 in range(2):
            ky = _sublane_transpose(tr[u0])
            mp, x4, x5 = _bsel(ky[:HALF], ky[HALF:], j)
            halves.append(mp)
            acc_x4(u0 * HALF, x4)
        return jnp.concatenate(halves, axis=0)
    # Phase 2: input s2; alpha pairs (r, r+16) within halves; pieces
    # (par, u1): y = 4r + cy with cy = 2par + u1.
    kcy = [[None] * 4, [None] * 4]
    for u0 in range(2):
        for pc in range(4):
            par, u1 = divmod(pc, 2)
            hm = m[par * HALF:(par + 1) * HALF]
            kp = _acs_key(hm[:Q4], hm[Q4:],
                          em_at(u0, pc, 0), em_at(u0, pc, 1))
            cy = 2 * par + u1
            kcy[u0][cy] = kp
            acc_a(u0, cy * Q4, (kp & 1) << j)
    # beta: pairs (r, r+8) within each 16-row cy-piece; outputs
    # 8-row blocks w' = 2cy + u0 (d = 8q + w'), stored in sC order
    # then transposed to natural d.
    wblocks = [None] * 8
    for u0 in range(2):
        for cy in range(4):
            kp = kcy[u0][cy]
            mp, x4, x5 = _bsel(kp[:Q8], kp[Q8:], j)
            wp = 2 * cy + u0
            wblocks[wp] = mp
            acc_x4(wp * Q8, x4)
    return _sublane_transpose(wblocks)


def _fwd_kernel_k2(spec: CodeSpec, nt: int):
    n = spec.n
    init_hi = init_metric_value(spec)

    def kernel(ic_ref, w_ref, seg_ref, dec_ref, fm_ref, m_ref):
        # ic_ref: (1,1) int32 SMEM — chunk at which standard initial
        #   metrics apply (0 whole-packet; -1 uniform, time-sharded
        #   interior blocks, viterbiDecoder.c:53-74).
        # w_ref: (768, n+1) int8 MXU weights (_em_weights_k2 order).
        # seg_ref: (CHUNK_F, B) uint8 received segments.
        # dec_ref: (GPC, 3, NS, B) uint8 packed decisions — plane 0 =
        #   x4 (output-layout rows), planes 1/2 = alpha bit of u0=0/1
        #   (y-piece rows); bit j = step g*8+j.
        # fm_ref: (NS, B) int32 final metrics (natural order).
        # m_ref: (NS, B) int32 scratch; natural at chunk boundaries.
        t_chunk = pl.program_id(1)

        @pl.when(t_chunk == 0)
        def _():
            m_ref[:] = jnp.zeros((NS_K2, B_TILE), CDT)

        @pl.when(t_chunk == ic_ref[0, 0])
        def _():
            # Metrics are carried scaled by 2 (see _em_weights_k2).
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS_K2, B_TILE), 0)
            m_ref[:] = jnp.where(s_idx == spec.starting_state,
                                 0, 2 * init_hi).astype(CDT)

        seg_all = seg_ref[:].astype(jnp.int32)
        r_planes = [(seg_all >> bit) & 1 for bit in range(n)]
        ones_row = jnp.ones((1, B_TILE), jnp.int32)
        specs = _piece_specs()
        # EM row offset bookkeeping mirroring _em_weights_k2's order
        # (offsets RELATIVE to the phase's 256-row block — the kernel
        # computes one per-step dot of exactly that block; a per-group
        # all-phase dot materializes 3x the data, measured at ~77% of
        # the kernel).
        off = {}
        for ph in range(3):
            cur = 0
            for u0 in range(2):
                for pi, (xlo, _, _) in enumerate(specs[ph]):
                    off[(ph, u0, pi)] = cur
                    cur += 2 * len(xlo)

        m = m_ref[:]
        for g in range(GPC):
            acc = [jnp.zeros((Q8, B_TILE), CDT) for _ in range(3 * 8)]

            def add(plane, start, rows, acc=acc):
                nblk = rows.shape[0] // Q8
                for b_ in range(nblk):
                    idx = plane * 8 + start // Q8 + b_
                    acc[idx] = acc[idx] + rows[b_ * Q8:(b_ + 1) * Q8]

            for j in range(PACK):
                t_row = g * PACK + j
                phase = t_row % 3
                Rj = jnp.concatenate(
                    [ones_row] + [r_planes[bit][t_row:t_row + 1]
                                  for bit in range(n)],
                    axis=0).astype(jnp.int8)
                EM = jax.lax.dot_general(
                    w_ref[phase * 256:(phase + 1) * 256], Rj,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)   # (256, B)

                def em_at(u0, pi, lohi, ph=phase):
                    rows = len(specs[ph][pi][0])
                    r0 = off[(ph, u0, pi)] + lohi * rows
                    return EM[r0:r0 + rows, :]

                m = _fwd_step_k2(
                    phase, m, em_at,
                    lambda start, rows, add=add: add(0, start, rows),
                    lambda u0, start, rows, add=add:
                        add(1 + u0, start, rows),
                    j)
                if phase == 2:
                    mn = jnp.min(m, axis=0, keepdims=True)
                    m = m - mn
            for pl_ in range(3):
                for b_ in range(8):
                    dec_ref[g, pl_, b_ * Q8:(b_ + 1) * Q8, :] = \
                        acc[pl_ * 8 + b_].astype(jnp.uint8)
        m_ref[:] = m
        fm_ref[:] = m >> 1      # back to unscaled path metrics

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def acs_forward_batch_k2(spec: CodeSpec, segments,
                         interpret: bool = False, init_chunk: int = 0):
    """k=2 fused forward.  segments uint8 [B, T] (T % CHUNK_F == 0,
    B % B_TILE == 0).  Returns (decisions uint8 [T//PACK, 3, NS, B],
    final metrics int32 [NS, B] natural order)."""
    if not k2_supported(spec):
        raise ValueError("acs_forward_batch_k2 requires k=2, 64 states")
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    if T % CHUNK_F or B % B_TILE:
        raise ValueError(f"padded shapes required: T={T} %{CHUNK_F}, "
                         f"B={B} %{B_TILE}")
    seg_t = segments.T
    nt = T // CHUNK_F
    nb = B // B_TILE
    W = jnp.asarray(_em_weights_k2(spec))
    ic = np.asarray([[init_chunk]], np.int32)
    return pl.pallas_call(
        _fwd_kernel_k2(spec, nt),
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(W.shape, lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK_F, B_TILE), lambda b, t: (t, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((GPC, 3, NS_K2, B_TILE),
                                lambda b, t: (t, 0, 0, b),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((NS_K2, B_TILE), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nt * GPC, 3, NS_K2, B),
                                        jnp.uint8),
                   jax.ShapeDtypeStruct((NS_K2, B), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((NS_K2, B_TILE), CDT)],
        interpret=interpret,
    )(jnp.asarray(ic), W, seg_t)


def _tb_step_k2(phase, h, x4p, a0p, a1p, j):
    """One backward k=2 step: h (list form per phase) -> previous h,
    plus this step's emitted 2-bit symbol mass (rows to sum).

    h arrives in the step's OUTPUT layout; x4p/a0p/a1p are the step's
    decision planes ((NS, B) int32, bit j live).  Returns (h_prev,
    sym_rows) where sym_rows is a (Q8, B) partial of sum h[d]*(d&3).
    """
    one = jnp.asarray(1, CDT)

    def bit(plane, r0, rows):
        return (plane[r0:r0 + rows] >> j) & one

    if phase == 0:
        # h in s1 (block c*16+p <-> d = 4p + c); u = d & 3 = c.
        sym = None
        for c in range(4):
            if c == 0:
                continue
            blk = h[c * Q4:(c + 1) * Q4] * c
            s = blk[:Q8] + blk[Q8:]
            sym = s if sym is None else sym + s
        # beta-inverse: d = 4p+c -> y = 2p + (c>>1) + 32*x4, kept per
        # u0 = c&1 in sA piece space (ev rows y=2p, od rows y=2p+1).
        # Each (u0, piece) receives mass from exactly one c-block.
        hy = [[None, None], [None, None]]       # [u0][ev/od] (32, B)
        for c in range(4):
            hd = h[c * Q4:(c + 1) * Q4]
            x4 = bit(x4p, c * Q4, Q4)
            u0, piece = c & 1, c >> 1
            nx4 = x4 ^ one
            hy[u0][piece] = jnp.concatenate(
                [hd & nx4, hd & x4], axis=0)
        # alpha-inverse: sA piece slot p -> x = p or p + 32.
        ap = (a0p, a1p)
        lo_acc = hi_acc = None
        for u0 in range(2):
            for piece in range(2):              # ev rows [0:32), od [32:)
                hp = hy[u0][piece]
                ab = bit(ap[u0], piece * HALF, HALF)
                lo = hp & (ab ^ one)
                hi = hp & ab
                lo_acc = lo if lo_acc is None else lo_acc + lo
                hi_acc = hi if hi_acc is None else hi_acc + hi
        return jnp.concatenate([lo_acc, hi_acc], axis=0), sym
    if phase == 1:
        # h in s2 (row u0*32 + p <-> d = 2p + u0); u = 2*(p&1) + u0.
        B = h.shape[-1]
        pr = jax.lax.broadcasted_iota(CDT, (HALF, B), 0) & 1
        sym = None
        for u0 in range(2):
            hd = h[u0 * HALF:(u0 + 1) * HALF]
            w = hd * (2 * pr + u0)
            s = None
            for b_ in range(HALF // Q8):
                blk = w[b_ * Q8:(b_ + 1) * Q8]
                s = blk if s is None else s + blk
            sym = s if sym is None else sym + s
        # beta-inverse: d = 2p+u0 -> y = p + 32*x4 (natural y per u0),
        # then inverse transpose into (w, q) piece space.
        ap = (a0p, a1p)
        cblocks = [None] * 4                    # s1 c-blocks (16, B)
        for u0 in range(2):
            hd = h[u0 * HALF:(u0 + 1) * HALF]
            x4 = bit(x4p, u0 * HALF, HALF)
            hy = jnp.concatenate([hd & (x4 ^ one), hd & x4], axis=0)
            pieces = _inv_sublane_transpose(hy)
            # alpha-inverse: piece w = 2c+u1 slot q -> s1 rows
            # c*16 + q (x5=0) or c*16 + q + 8.
            for w in range(8):
                c = w >> 1
                ab = bit(ap[u0], w * Q8, Q8)
                upd = jnp.concatenate(
                    [pieces[w] & (ab ^ one), pieces[w] & ab], axis=0)
                cblocks[c] = upd if cblocks[c] is None \
                    else cblocks[c] + upd
        return jnp.concatenate(cblocks, axis=0), sym
    # Phase 2: h arrives natural d (post final transpose); u = d & 3.
    B = h.shape[-1]
    d3 = jax.lax.broadcasted_iota(CDT, (NS_K2, B), 0) & 3
    w = h * d3
    sym = None
    for b_ in range(8):
        blk = w[b_ * Q8:(b_ + 1) * Q8]
        sym = blk if sym is None else sym + blk
    # Inverse final transpose into sC pieces (w', q), d = 8q + w'.
    pieces = _inv_sublane_transpose(h)
    # beta-inverse: d = 8q+w' -> y = 4q + (w'>>1) + 32*x4; per
    # u0 = w'&1, cy = w'>>1 pieces (16 rows: r = q + 8*x4).
    hcy = [[None] * 4 for _ in range(2)]
    for wp in range(8):
        hd = pieces[wp]
        x4 = bit(x4p, wp * Q8, Q8)
        u0, cy = wp & 1, wp >> 1
        hcy[u0][cy] = jnp.concatenate([hd & (x4 ^ one), hd & x4],
                                      axis=0)
    # alpha-inverse: cy piece slot r -> s2 rows par*32 + r (x5=0) or
    # par*32 + r + 16, with cy = 2par + u1.
    ap = (a0p, a1p)
    halves = [None, None]
    for u0 in range(2):
        for cy in range(4):
            par, u1 = cy >> 1, cy & 1
            ab = bit(ap[u0], cy * Q4, Q4)
            hp = hcy[u0][cy]
            upd = jnp.concatenate([hp & (ab ^ one), hp & ab], axis=0)
            halves[par] = upd if halves[par] is None \
                else halves[par] + upd
    return jnp.concatenate(halves, axis=0), sym


def _tb_kernel_k2(spec: CodeSpec, nt: int):
    def kernel(gmask_ref, dec_ref, out_ref, h_ref):
        # gmask_ref: (TG, 1) int32 SMEM per-group byte masks (0xFF
        #   live, 0 beyond t_actual; masked steps have decision 0 and
        #   the walk rests at state 0 — d>>2 keeps 0 a fixed point).
        # dec_ref: (GPC, 3, NS, B) uint8 packed decisions.
        # out_ref: (CHUNK_F, 1, B) uint8 emitted 2-bit symbols.
        # h_ref: (NS, B) int32 one-hot walk; natural order at chunk
        #   boundaries (chunks start on phase 0).
        i = pl.program_id(1)
        nt_total = pl.num_programs(1)
        gbase = (nt_total - 1 - i) * GPC

        @pl.when(i == 0)
        def _():
            s_idx = jax.lax.broadcasted_iota(jnp.int32, (NS_K2, B_TILE), 0)
            h_ref[:] = jnp.where(s_idx == 0, 1, 0).astype(CDT)

        h = h_ref[:]
        for g in range(GPC - 1, -1, -1):
            gm = gmask_ref[gbase + g, 0]
            planes = [dec_ref[g, p].astype(jnp.int32) & gm
                      for p in range(3)]
            syms = []
            for j in range(PACK - 1, -1, -1):
                phase = (g * PACK + j) % 3
                h, sym = _tb_step_k2(phase, h, planes[0], planes[1],
                                     planes[2], j)
                syms.append(sym)
            ws = jnp.stack(syms[::-1], axis=0)          # (8, Q8, B)
            srow = jnp.sum(ws, axis=1)                  # (8, B)
            out_ref[g * PACK:(g + 1) * PACK, 0, :] = \
                srow.astype(jnp.uint8)
        h_ref[:] = h

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def traceback_batch_k2(spec: CodeSpec, decisions, t_actual: int,
                       interpret: bool = False):
    """k=2 fused traceback over [TG, 3, NS, B] packed decisions.
    Returns uint8 [T, B] 2-bit symbols (state-0 walk start; pad steps
    beyond t_actual are masked)."""
    decisions = jnp.asarray(decisions, jnp.uint8)
    TG, three, NS_, B = decisions.shape
    assert three == 3 and NS_ == NS_K2
    T = TG * PACK
    nt = TG // GPC
    nb = B // B_TILE
    if not 0 < t_actual <= T:
        raise ValueError(f"t_actual={t_actual} outside (0, {T}]")
    gmask = jnp.asarray(_group_masks(TG, int(t_actual)))
    out = pl.pallas_call(
        _tb_kernel_k2(spec, nt),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GPC, 3, NS_K2, B_TILE),
                         lambda b, t, n_t=nt: (n_t - 1 - t, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK_F, 1, B_TILE),
                               lambda b, t, n_t=nt: (n_t - 1 - t, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, B), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((NS_K2, B_TILE), CDT)],
        interpret=interpret,
    )(gmask, decisions)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def viterbi_decode_batch_k2(spec: CodeSpec, segments,
                            message_bits: int | None = None,
                            interpret: bool = False):
    """Batched block decode for k=2, 64-state codes through the fused
    binary-stage kernels; bit-identical to `jax.vmap(viterbi_decode)`.
    Returns uint8 [B, (T - S) * 2] bits (symbols expanded MSb-first)."""
    segments = jnp.asarray(segments, jnp.uint8)
    B, T = segments.shape
    L = message_bits if message_bits is not None else (T - spec.S) * 2
    seg_p = _pad_to(_pad_to(segments, B_TILE, 0), CHUNK_F, 1)
    decs, _ = acs_forward_batch_k2(spec, seg_p, interpret)
    syms = traceback_batch_k2(spec, decs, T, interpret)    # (Tp, Bp)
    bits = jnp.stack([(syms >> 1) & 1, syms & 1], axis=1) \
        .astype(jnp.uint8)
    bits = bits.reshape(-1, syms.shape[-1])                # (Tp*2, Bp)
    return bits[:L, :B].T
