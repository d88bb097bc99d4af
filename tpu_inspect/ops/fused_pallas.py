"""Fused per-unit Pallas stage chains (morphology -> hole fill -> CC stats).

Two pipeline stages are chains of plane-to-plane transforms whose
intermediates have no other consumers:

- segmentation tail (segmentation.py:91-99 + alignment centroid,
  indexing_ui.py:2235-2248): threshold mask -> close+open -> hole fill ->
  largest-component centroid sums;
- defect ROI prep (indexing_ui.py:1495-1512): seg mask -> (2n+1)^2 erode ->
  largest 8-connected component.

Running them as separate kernels (morph chain, flood, CC label, CC stats)
pays a [U, H, W] HBM round trip plus XLA packing glue between every pair.
Here the whole chain runs per unit in VMEM: one input DMA, one output DMA,
one stats row. All pieces are the proven per-plane bodies of the split
kernels (ops.morph_pallas._apply_stage, ops.flood_pallas._local_fixpoint,
ops.cc_pallas._label_fixpoint/_largest_stats) — bit-exactness is inherited.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_inspect.ops.cc_pallas import (
    _BIG,
    _label_fixpoint,
    _largest_stats,
    _prefix_min,
    _prefix_sum,
    _shift2d,
)
from tpu_inspect.ops.flood_pallas import _local_fixpoint
from tpu_inspect.ops.morph_pallas import _apply_stage


def _tail_body(
    x_ref,
    thr_ref,
    mask_out,
    stats_out,
    buf,
    sem_out,
    *,
    u: int,
    h: int,
    w: int,
    k_pow: int,
    stages,
    fill: bool,
    out_largest: bool,
    plan: str,
):
    hp, wp = buf.shape

    def unit_body(ui, carry):
        raw = x_ref[pl.ds(ui, 1), :, :].reshape(h, w).astype(jnp.int32)
        if thr_ref is not None:
            # fused THRESH_BINARY_INV: input is the blurred gray plane and
            # thr the per-unit Otsu threshold (segmentation.py:81-82) — the
            # mask plane never materializes in HBM
            t = thr_ref[ui]
            v = jnp.where(raw <= t, jnp.int32(255), jnp.int32(0))
        else:
            # binarize (any >0 is fg) to the 0/255 domain the morphology
            # min/max chain assumes (indexing_ui.py:1489 binarizes first)
            v = jnp.where(raw > 0, jnp.int32(255), jnp.int32(0))
        for op, runs in stages:
            red = jnp.minimum if op == "erode" else jnp.maximum
            fl = np.int32(255) if op == "erode" else np.int32(0)
            v = _apply_stage(v, op, runs, red, fl)
        m = v > 0
        if fill:
            yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            border = (yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1)
            dom = ~m
            ext = _local_fixpoint(dom, border & dom, conn8=False) > 0
            m = m | ~ext  # fg + enclosed holes (segmentation.py:27-72)

        lab = _label_fixpoint(m, h, w, k_pow, plan)
        bmi, best_area, sx, sy = _largest_stats(lab, w)

        # row/col extent of the selected component (lanes 4-7): the defect
        # path's median kernel only processes ROI rows and a narrowed ROI
        # column window; emitting the bounds here saves the XLA any/argmax
        # reduction passes (empty -> (h, 0) / (w, 0), the neutrals of the
        # median kernel's group union)
        yy_l = jax.lax.broadcasted_iota(jnp.int32, bmi.shape, 0)
        xx_l = jax.lax.broadcasted_iota(jnp.int32, bmi.shape, 1)
        row_lo = jnp.where(bmi > 0, yy_l, jnp.int32(h)).min()
        row_hi = jnp.where(bmi > 0, yy_l + 1, jnp.int32(0)).max()
        col_lo = jnp.where(bmi > 0, xx_l, jnp.int32(w)).min()
        col_hi = jnp.where(bmi > 0, xx_l + 1, jnp.int32(0)).max()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        z = jnp.zeros((1, 8, 128), jnp.int32)
        has_i = jnp.where(best_area > 0, jnp.int32(1), jnp.int32(0))
        row = (
            jnp.where(lane == 0, best_area, z)
            + jnp.where(lane == 1, sx, z)
            + jnp.where(lane == 2, sy, z)
            + jnp.where(lane == 3, has_i, z)
            + jnp.where(lane == 4, row_lo, z)
            + jnp.where(lane == 5, row_hi, z)
            + jnp.where(lane == 6, col_lo, z)
            + jnp.where(lane == 7, col_hi, z)
        )
        stats_out[pl.ds(ui, 1), :, :] = row

        out = bmi * 255 if out_largest else m.astype(jnp.int32) * 255
        if hp > h:
            out = jnp.concatenate(
                [out, jnp.zeros((hp - h, w), jnp.int32)], axis=0
            )
        if wp > w:
            out = jnp.concatenate(
                [out, jnp.zeros((hp, wp - w), jnp.int32)], axis=1
            )
        buf[:, :] = out.astype(jnp.uint8)
        cp = pltpu.make_async_copy(buf, mask_out.at[ui], sem_out)
        cp.start()
        cp.wait()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


def _tail_kernel(x_ref, mask_out, stats_out, buf, sem_out, **static):
    _tail_body(x_ref, None, mask_out, stats_out, buf, sem_out, **static)


def _tail_thr_kernel(x_ref, thr_ref, mask_out, stats_out, buf, sem_out, **st):
    _tail_body(x_ref, thr_ref, mask_out, stats_out, buf, sem_out, **st)


@functools.partial(
    jax.jit, static_argnames=("stages", "fill", "out_largest", "plan")
)
def seg_tail_pallas(
    mask: jnp.ndarray,
    stages=(),
    fill: bool = False,
    out_largest: bool = False,
    plan: str = "crc",
    thr: jnp.ndarray | None = None,
):
    """mask [U,H,W] uint8 (any >0 = fg) -> (out_mask [U,H,W] uint8 0/255,
    area [U] i32, sx [U] i32, sy [U] i32, has_fg [U] bool,
    row_lo [U] i32, row_hi [U] i32, col_lo [U] i32, col_hi [U] i32 — the
    selected component's row/col extents, (h, 0) / (w, 0) when empty).

    Applies the static morphology ``stages`` (see ops.morph_pallas), then
    optional border-flood hole filling, then largest-8-connected-component
    stats, all per unit in VMEM. ``out_mask`` is the processed plane, or the
    largest component itself with ``out_largest`` (the defect-ROI form).
    With ``thr`` ([U] int32), the input is instead the blurred gray plane
    and the fg mask is the in-kernel THRESH_BINARY_INV ``x <= thr``.
    """
    u, h, w = mask.shape
    hw = h * w
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    assert (max(h, w) + 1) * (1 << k_pow) < 2**31, "unit too large for i32 keys"
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    static = dict(
        u=u,
        h=h,
        w=w,
        k_pow=k_pow,
        stages=stages,
        fill=bool(fill),
        out_largest=bool(out_largest),
        plan=plan,
    )
    out_shape = (
        jax.ShapeDtypeStruct((u, hp, wp), jnp.uint8),
        jax.ShapeDtypeStruct((u, 8, 128), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    scratch = [pltpu.VMEM((hp, wp), jnp.uint8), pltpu.SemaphoreType.DMA]
    if thr is None:
        out, stats = pl.pallas_call(
            functools.partial(_tail_kernel, **static),
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )(mask)
    else:
        out, stats = pl.pallas_call(
            functools.partial(_tail_thr_kernel, **static),
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )(mask, thr.astype(jnp.int32))
    return (
        out[:, :h, :w],
        stats[:, 0, 0],
        stats[:, 0, 1],
        stats[:, 0, 2],
        stats[:, 0, 3] > 0,
        stats[:, 0, 4],
        stats[:, 0, 5],
        stats[:, 0, 6],
        stats[:, 0, 7],
    )


def tail_fits(shape) -> bool:
    """Gate: whole-batch uint8 input + ~8 per-unit int32 planes in VMEM,
    int32-safe coordinate sums."""
    from tpu_inspect.ops.common import fused_disabled

    if fused_disabled():
        return False
    u, h, w = shape
    hw = h * w
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    return (
        on_tpu
        and (max(h, w) + 1) * (1 << k_pow) < 2**31
        and max(h, w) * h * w < 2**31
        and u * h * w + 9 * hp * wp * 4 < 12 * 2**20
    )


# ---------------------------------------------------------------------------
# Paired (2-unit lane-stacked) tail: two units share one plane side by side
# ---------------------------------------------------------------------------

# Lanes between the two units of a stacked pair. Must be >= the widest
# horizontal morphology reach (6 for the defect-ROI 13x13 erode) so each
# unit's out-of-image border semantics stay exact; 8 also lands the
# production 316-wide units on exactly 640 = 5x128 lanes (2x384 separate).
_PAIR_GAP = 8


def _extract_lane(vec, lane_iota, lane: int):
    """Scalar at ``vec[0, lane]`` via masked max (direct scalar extraction
    from vectors is fragile in Mosaic). Values may be any int32."""
    return jnp.where(lane_iota == lane, vec, -_BIG).max()


def _lane_tree_sums(plane_i32, ws: int, w: int, b0: int, lane_iota1):
    """Per-unit totals of a [H, ws] int32 plane whose columns split into
    unit A (lanes [0, w)) and unit B (lanes [b0, b0+w)).

    One exact f32 column sum (callers bound |column sums| < 2^24) and one
    int32 lane prefix tree; A's total is the prefix at lane w-1, B's the
    grand total minus the prefix at lane b0-1 (gap lanes are all zero)."""
    col = plane_i32.astype(jnp.float32).sum(axis=0, keepdims=True)
    v = col.astype(jnp.int32)  # [1, ws]
    s = 1
    pref = v
    while s < ws:
        shifted = jnp.concatenate(
            [jnp.zeros((1, s), jnp.int32), pref[:, : ws - s]], axis=1
        )
        pref = pref + shifted
        s *= 2
    tot_a = _extract_lane(pref, lane_iota1, w - 1)
    tot_all = _extract_lane(pref, lane_iota1, ws - 1)
    tot_b = tot_all - _extract_lane(pref, lane_iota1, b0 - 1)
    return tot_a, tot_b


def _largest_stats_paired(lab, w: int, b0: int):
    """Largest-component stats for BOTH units of a stacked pair in lockstep.

    ``lab``: [h, ws] int32 min-index labels (stacked linear indices, _BIG on
    background; gap lanes are background by construction). Root enumeration
    runs jointly — each while iteration advances one root PER UNIT with
    shared full-plane compares — so the trip count is max(roots A, roots B)
    instead of their sum, and every plane op serves two units. Per-unit
    areas/sums come out of lane-split prefix trees (_lane_tree_sums);
    cv2's 2x2 block-raster tie-break uses LOCAL coordinates per unit.

    Returns (bmi [h, ws] int32 member plane of both winners, and per-unit
    (area, sx, sy, row_lo, row_hi, col_lo, col_hi) int32 scalars as a dict
    {"a": (...), "b": (...)}).
    """
    h, ws = lab.shape
    bw2 = (w + 1) // 2
    fgm = lab < _BIG
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, ws), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, ws), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, ws), 1)
    in_b = xx >= b0
    in_a = xx < w
    xxl = jnp.where(in_b, xx - b0, xx)
    lin = yy * ws + xx
    root_all = jnp.where(fgm & (lab == lin), lin, _BIG)
    rootf_a = jnp.where(in_a, root_all, _BIG)
    rootf_b = jnp.where(in_b, root_all, _BIG)
    br = ((yy >> 1) * bw2 + (xxl >> 1)) * 4 + (yy & 1) * 2 + (xxl & 1)

    def next_a(r):
        return jnp.where(rootf_a > r, rootf_a, _BIG).min()

    def next_b(r):
        return jnp.where(rootf_b > r, rootf_b, _BIG).min()

    # early exit per side: once the best area STRICTLY exceeds that unit's
    # unseen fg total, no remaining component can beat OR tie it (a tie
    # would need area == remaining exactly, excluded by the strict
    # compare), so later-root tie-break wins cannot arise. The loop stops
    # when BOTH units are decided — mold masks are one dominant blob plus
    # noise specks, so this typically ends right after each blob.
    total_a, total_b = _lane_tree_sums(fgm.astype(jnp.int32), ws, w, b0, lane1)

    def cond(c):
        na, nb, best, seen_a, seen_b = c
        _ra, aa, _ta, _rb, ab, _tb = best
        live_a = (na < _BIG) & (aa <= total_a - seen_a)
        live_b = (nb < _BIG) & (ab <= total_b - seen_b)
        return live_a | live_b

    def body(c):
        na, nb, best, seen_a, seen_b = c
        ra, aa, ta, rb, ab, tb = best
        tgt = jnp.where(in_b, nb, na)
        member = fgm & (lab == tgt)
        mi = member.astype(jnp.int32)
        # 0/1 plane: column sums <= h, f32-exact
        area_a, area_b = _lane_tree_sums(mi, ws, w, b0, lane1)
        tie = jnp.where(member, br, _BIG)
        tie_a = jnp.where(in_a, tie, _BIG).min()
        tie_b = jnp.where(in_b, tie, _BIG).min()
        va = na < _BIG
        vb = nb < _BIG
        bet_a = va & ((area_a > aa) | ((area_a == aa) & (tie_a < ta)))
        bet_b = vb & ((area_b > ab) | ((area_b == ab) & (tie_b < tb)))
        best = (
            jnp.where(bet_a, na, ra),
            jnp.where(bet_a, area_a, aa),
            jnp.where(bet_a, tie_a, ta),
            jnp.where(bet_b, nb, rb),
            jnp.where(bet_b, area_b, ab),
            jnp.where(bet_b, tie_b, tb),
        )
        seen_a = seen_a + jnp.where(va, area_a, jnp.int32(0))
        seen_b = seen_b + jnp.where(vb, area_b, jnp.int32(0))
        return next_a(na), next_b(nb), best, seen_a, seen_b

    z = jnp.int32(0)
    init_best = (_BIG, z, _BIG, _BIG, z, _BIG)
    _, _, best, _, _ = jax.lax.while_loop(
        cond,
        body,
        (next_a(jnp.int32(-1)), next_b(jnp.int32(-1)), init_best, z, z),
    )
    root_a, area_a, _, root_b, area_b, _ = best
    tgt = jnp.where(in_b, root_b, root_a)
    bm = fgm & (lab == tgt)
    bmi = bm.astype(jnp.int32)
    # coordinate sums: per-column |sum| <= h * max(h, w) (callers gate
    # max(h, w) * h < 2^24 via the int32-key shape bound)
    sx_a, sx_b = _lane_tree_sums(bmi * xxl, ws, w, b0, lane1)
    sy_a, sy_b = _lane_tree_sums(bmi * yy, ws, w, b0, lane1)

    h_i = jnp.int32(h)
    w_i = jnp.int32(w)
    rl = jnp.where(bm, yy, h_i)
    rh = jnp.where(bm, yy + 1, z)
    cl = jnp.where(bm, xxl, w_i)
    ch = jnp.where(bm, xxl + 1, z)

    def split_min(p, empty):
        return (
            jnp.where(in_a, p, empty).min(),
            jnp.where(in_b, p, empty).min(),
        )

    def split_max(p, empty):
        return (
            jnp.where(in_a, p, empty).max(),
            jnp.where(in_b, p, empty).max(),
        )

    rl_a, rl_b = split_min(rl, h_i)
    rh_a, rh_b = split_max(rh, z)
    cl_a, cl_b = split_min(cl, w_i)
    ch_a, ch_b = split_max(ch, z)
    return bmi, {
        "a": (area_a, sx_a, sy_a, rl_a, rh_a, cl_a, ch_a),
        "b": (area_b, sx_b, sy_b, rl_b, rh_b, cl_b, ch_b),
    }


def _blocked_largest_paired(m, h: int, ws: int, w: int, b0: int, plan: str):
    """Label fixpoint + largest-component stats on the 2x2 BLOCK grid.

    BBDT equivalence: for 8-connectivity, all fg pixels inside a 2x2 block
    are mutually adjacent, so pixel components == components of the block
    graph whose edges are derived from the blocks' sub-cell patterns. The
    min-label fixpoint and the root-enumeration loop then run on the
    [h/2, ws/2] block plane — 1/4 the vector volume of the pixel-level
    sweeps that dominate the tail kernels (tools/tail_split.py: the
    fixpoint+stats base is ~1.45 of the ~1.9 ms seg-tail wall).

    Exactness: block sub-cell planes come from 0/1 bf16 MXU contractions
    (Mosaic has no strided slicing), f32-accumulated — exact; run keys use
    the same bias trick as the pixel sweeps (valid for any non-decreasing
    per-direction run numbering); areas sum per-block popcounts (<= 4);
    cv2's 2x2-block-raster tie-break is NATIVE here: its block grid IS
    this grid, so the component tie value is min over member blocks of
    block_rank*4 + first-present-subcell rank. The winner's pixel plane is
    recovered by expanding the member-block mask through two more 0/1
    matmuls and ANDing with the pixel mask; sx/sy/extents then reduce at
    pixel level exactly as before.

    Requires w even (odd w would misalign unit B's lane offset b0 = w +
    _PAIR_GAP with the block grid); callers gate and fall back to the
    pixel path. Returns (bmi [h, ws] int32, stats dict) exactly like
    (_label_fixpoint + _largest_stats_paired).
    """
    assert w % 2 == 0 and ws % 2 == 0 and b0 % 2 == 0
    hb = (h + 1) // 2
    wsb = ws // 2
    b0b = b0 // 2
    wab = w // 2  # blocks per unit
    bw2 = (w + 1) // 2  # cv2 block-raster row width (== wab for even w)
    kb_pow = max(2, int(np.ceil(np.log2(hb * wsb + 2))))
    assert (max(hb, wsb) + 1) * (1 << kb_pow) < 2**31
    Kb = jnp.int32(1 << kb_pow)
    bf = jnp.bfloat16

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    mf = m.astype(bf)
    ih = jax.lax.broadcasted_iota(jnp.int32, (hb, h), 0)
    jh = jax.lax.broadcasted_iota(jnp.int32, (hb, h), 1)
    R0 = (jh == 2 * ih).astype(bf)
    R1 = (jh == 2 * ih + 1).astype(bf)
    iw = jax.lax.broadcasted_iota(jnp.int32, (ws, wsb), 0)
    jw = jax.lax.broadcasted_iota(jnp.int32, (ws, wsb), 1)
    C0 = (iw == 2 * jw).astype(bf)
    C1 = (iw == 2 * jw + 1).astype(bf)
    T0 = mm(R0, mf).astype(bf)  # pixel rows 2i
    T1 = mm(R1, mf).astype(bf)  # pixel rows 2i+1 (empty past h)
    zf = jnp.float32(0.0)
    zi = jnp.int32(0)
    # sub-cell and adjacency planes live as 0/1 INT32: Mosaic crashes
    # relayouting shifted i1 vectors at this plane size (the "(8,128) ->
    # (32,128) replicated" class), so bools are materialized only as
    # unshifted compare masks at their point of use
    m00 = (mm(T0, C0) > zf).astype(jnp.int32)
    m01 = (mm(T0, C1) > zf).astype(jnp.int32)
    m10 = (mm(T1, C0) > zf).astype(jnp.int32)
    m11 = (mm(T1, C1) > zf).astype(jnp.int32)
    fg_i = m00 | m01 | m10 | m11
    fg_b = fg_i > zi
    cnt = m00 + m01 + m10 + m11

    # block adjacency from sub-cell patterns (every cross-boundary pixel
    # pair between these cells is 8-adjacent)
    right = m01 | m11
    left = m00 | m10
    bot = m10 | m11
    top = m00 | m01
    conn_e = right & _shift2d(left, 0, 1, zi)
    conn_s = bot & _shift2d(top, 1, 0, zi)
    conn_se = m11 & _shift2d(m00, 1, 1, zi)
    conn_sw = m10 & _shift2d(m01, 1, -1, zi)

    yyb = jax.lax.broadcasted_iota(jnp.int32, (hb, wsb), 0)
    xxb = jax.lax.broadcasted_iota(jnp.int32, (hb, wsb), 1)
    init = jnp.where(fg_b, yyb * wsb + xxb, _BIG)

    one = jnp.int32(1)
    brk_w = one - (fg_i & _shift2d(conn_e, 0, -1, zi))
    brk_e = one - (fg_i & conn_e)
    brk_n = one - (fg_i & _shift2d(conn_s, -1, 0, zi))
    brk_s = one - (fg_i & conn_s)
    row_fwd = _prefix_sum(brk_w, 1, False) * Kb
    row_bwd = _prefix_sum(brk_e, 1, True) * Kb
    col_fwd = _prefix_sum(brk_n, 0, False) * Kb
    col_bwd = _prefix_sum(brk_s, 0, True) * Kb

    def seg_sweep(lab, axis, kf, kb_):
        v = jnp.where(fg_b, lab, Kb - 1)
        f = _prefix_min(v - kf, axis, False) + kf
        b = _prefix_min(v - kb_, axis, True) + kb_
        return jnp.where(fg_b, jnp.minimum(lab, jnp.minimum(f, b)), lab)

    cw = _shift2d(conn_e, 0, -1, zi)
    cn = _shift2d(conn_s, -1, 0, zi)
    cnw = _shift2d(conn_se, -1, -1, zi)
    cne = _shift2d(conn_sw, -1, 1, zi)

    def min8(lab):
        def nb(cmask, dy, dx):
            return jnp.where(cmask > zi, _shift2d(lab, dy, dx, _BIG), _BIG)

        out = jnp.minimum(lab, nb(conn_e, 0, 1))
        out = jnp.minimum(out, nb(cw, 0, -1))
        out = jnp.minimum(out, nb(conn_s, 1, 0))
        out = jnp.minimum(out, nb(cn, -1, 0))
        out = jnp.minimum(out, nb(conn_se, 1, 1))
        out = jnp.minimum(out, nb(cnw, -1, -1))
        out = jnp.minimum(out, nb(conn_sw, 1, -1))
        out = jnp.minimum(out, nb(cne, -1, 1))
        return jnp.where(fg_b, out, _BIG)

    def fix_cond(lab):
        return (min8(lab) != lab).astype(jnp.int32).max() > 0

    def fix_body(lab):
        new = min8(lab)
        for ax in plan:
            if ax == "r":
                new = seg_sweep(new, 1, row_fwd, row_bwd)
            else:
                new = seg_sweep(new, 0, col_fwd, col_bwd)
        return new

    lab = jax.lax.while_loop(fix_cond, fix_body, fix_body(init))

    # ---- largest-component enumeration on the block plane ----
    in_b_blk = xxb >= b0b
    in_a_blk = xxb < wab
    xxbl = jnp.where(in_b_blk, xxb - b0b, xxb)
    lane1b = jax.lax.broadcasted_iota(jnp.int32, (1, wsb), 1)
    lin_b = yyb * wsb + xxb
    root_all = jnp.where(fg_b & (lab == lin_b), lin_b, _BIG)
    rootf_a = jnp.where(in_a_blk, root_all, _BIG)
    rootf_b = jnp.where(in_b_blk, root_all, _BIG)
    intra = jnp.where(
        m00 > zi,
        jnp.int32(0),
        jnp.where(
            m01 > zi,
            jnp.int32(1),
            jnp.where(m10 > zi, jnp.int32(2), jnp.int32(3)),
        ),
    )
    br = (yyb * bw2 + xxbl) * 4 + intra

    def next_a(r):
        return jnp.where(rootf_a > r, rootf_a, _BIG).min()

    def next_b(r):
        return jnp.where(rootf_b > r, rootf_b, _BIG).min()

    total_a, total_b = _lane_tree_sums(
        jnp.where(fg_b, cnt, jnp.int32(0)), wsb, wab, b0b, lane1b
    )

    def cond(c):
        na, nb_, best, seen_a, seen_b = c
        _ra, aa, _ta, _rb, ab, _tb = best
        live_a = (na < _BIG) & (aa <= total_a - seen_a)
        live_b = (nb_ < _BIG) & (ab <= total_b - seen_b)
        return live_a | live_b

    def body(c):
        na, nb_, best, seen_a, seen_b = c
        ra, aa, ta, rb, ab, tb = best
        tgt = jnp.where(in_b_blk, nb_, na)
        member = fg_b & (lab == tgt)
        mi = jnp.where(member, cnt, jnp.int32(0))
        area_a, area_b = _lane_tree_sums(mi, wsb, wab, b0b, lane1b)
        tie = jnp.where(member, br, _BIG)
        tie_a = jnp.where(in_a_blk, tie, _BIG).min()
        tie_b = jnp.where(in_b_blk, tie, _BIG).min()
        va = na < _BIG
        vb = nb_ < _BIG
        bet_a = va & ((area_a > aa) | ((area_a == aa) & (tie_a < ta)))
        bet_b = vb & ((area_b > ab) | ((area_b == ab) & (tie_b < tb)))
        best = (
            jnp.where(bet_a, na, ra),
            jnp.where(bet_a, area_a, aa),
            jnp.where(bet_a, tie_a, ta),
            jnp.where(bet_b, nb_, rb),
            jnp.where(bet_b, area_b, ab),
            jnp.where(bet_b, tie_b, tb),
        )
        seen_a = seen_a + jnp.where(va, area_a, jnp.int32(0))
        seen_b = seen_b + jnp.where(vb, area_b, jnp.int32(0))
        return next_a(na), next_b(nb_), best, seen_a, seen_b

    z = jnp.int32(0)
    init_best = (_BIG, z, _BIG, _BIG, z, _BIG)
    _, _, best, _, _ = jax.lax.while_loop(
        cond,
        body,
        (next_a(jnp.int32(-1)), next_b(jnp.int32(-1)), init_best, z, z),
    )
    root_a, area_a, _, root_b, area_b, _ = best

    # expand the winning block mask back to pixels (two 0/1 matmuls) and
    # finish the pixel-level stats exactly as the pixel path does
    tgt = jnp.where(in_b_blk, root_b, root_a)
    member_blk = fg_b & (lab == tgt)
    yhp = jax.lax.broadcasted_iota(jnp.int32, (h, hb), 0)
    ihp = jax.lax.broadcasted_iota(jnp.int32, (h, hb), 1)
    # >> 1, not // 2: floor_divide's scalar constant traces as weak int64
    # under the global x64 flag and Mosaic's int64->int32 scalar convert
    # lowering recurses forever
    ER = (ihp == (yhp >> 1)).astype(bf)
    jwp = jax.lax.broadcasted_iota(jnp.int32, (wsb, ws), 0)
    xwp = jax.lax.broadcasted_iota(jnp.int32, (wsb, ws), 1)
    EC = (jwp == (xwp >> 1)).astype(bf)
    mx = mm(mm(ER, member_blk.astype(bf)).astype(bf), EC) > zf
    bm = m & mx
    bmi = bm.astype(jnp.int32)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, ws), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, ws), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, ws), 1)
    in_b = xx >= b0
    in_a = xx < w
    xxl = jnp.where(in_b, xx - b0, xx)
    sx_a, sx_b = _lane_tree_sums(bmi * xxl, ws, w, b0, lane1)
    sy_a, sy_b = _lane_tree_sums(bmi * yy, ws, w, b0, lane1)
    h_i = jnp.int32(h)
    w_i = jnp.int32(w)
    rl = jnp.where(bm, yy, h_i)
    rh = jnp.where(bm, yy + 1, z)
    cl = jnp.where(bm, xxl, w_i)
    ch = jnp.where(bm, xxl + 1, z)

    def split_min(p, empty):
        return (
            jnp.where(in_a, p, empty).min(),
            jnp.where(in_b, p, empty).min(),
        )

    def split_max(p, empty):
        return (
            jnp.where(in_a, p, empty).max(),
            jnp.where(in_b, p, empty).max(),
        )

    rl_a, rl_b = split_min(rl, h_i)
    rh_a, rh_b = split_max(rh, z)
    cl_a, cl_b = split_min(cl, w_i)
    ch_a, ch_b = split_max(ch, z)
    return bmi, {
        "a": (area_a, sx_a, sy_a, rl_a, rh_a, cl_a, ch_a),
        "b": (area_b, sx_b, sy_b, rl_b, rh_b, cl_b, ch_b),
    }


def _paired_morph(v, stages, gap_zone):
    """Apply morphology ``stages`` to the stacked i32 plane (gap preset to
    each stage's neutral so units see out-of-image border semantics)."""
    for op, runs in stages:
        red = jnp.minimum if op == "erode" else jnp.maximum
        fl = np.int32(255) if op == "erode" else np.int32(0)
        v = jnp.where(gap_zone, jnp.int32(fl), v)
        v = _apply_stage(v, op, runs, red, fl)
    if stages:
        v = jnp.where(gap_zone, jnp.int32(0), v)
    return v


def _paired_fill(m, h, ws, lane):
    """Border-seeded hole fill on the stacked plane (the all-background gap
    reaches the top border, so each unit's inner-edge background is
    border-seeded exactly as its own column border would be)."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, ws), 0)
    border = (yy == 0) | (yy == h - 1) | (lane == 0) | (lane == ws - 1)
    dom = ~m
    ext = _local_fixpoint(dom, border & dom, conn8=False) > 0
    return m | ~ext


def _paired_largest(m, h, ws, w, b0, k_pow, plan):
    if w % 2 == 0:
        # 2x2-block BBDT labeling: 1/4 the sweep volume (see
        # _blocked_largest_paired); odd widths keep the pixel path
        return _blocked_largest_paired(m, h, ws, w, b0, plan)
    lab = _label_fixpoint(m, h, ws, k_pow, plan)
    return _largest_stats_paired(lab, w, b0)


def _paired_stats_row(st):
    """Pack both units' stats into one [1, 8, 128] lane row (A lanes 0-7,
    B lanes 8-15)."""
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    z = jnp.zeros((1, 8, 128), jnp.int32)
    row = z
    for base, key in ((0, "a"), (8, "b")):
        area, sx, sy, rl, rh, cl, ch = st[key]
        has_i = jnp.where(area > 0, jnp.int32(1), jnp.int32(0))
        for off, val in (
            (0, area), (1, sx), (2, sy), (3, has_i),
            (4, rl), (5, rh), (6, cl), (7, ch),
        ):
            row = row + jnp.where(lane16 == base + off, val, z)
    return row


def _paired_emit(plane_i32, buf, out_hbm, pi, sem, h, ws):
    """Zero-pad an i32 0/255 plane into ``buf`` and DMA it out."""
    hp, wsp = buf.shape
    out = plane_i32
    if hp > h:
        out = jnp.concatenate(
            [out, jnp.zeros((hp - h, ws), jnp.int32)], axis=0
        )
    if wsp > ws:
        out = jnp.concatenate(
            [out, jnp.zeros((hp, wsp - ws), jnp.int32)], axis=1
        )
    buf[:, :] = out.astype(jnp.uint8)
    cp = pltpu.make_async_copy(buf, out_hbm.at[pi], sem)
    cp.start()
    cp.wait()


def _tail_paired_body(
    x_hbm,
    thr_ref,
    mask_out,
    stats_out,
    in_buf,
    buf,
    sem_in,
    sem_out,
    *,
    p: int,
    h: int,
    w: int,
    ws: int,
    k_pow: int,
    stages,
    fill: bool,
    out_largest: bool,
    plan: str,
):
    b0 = w + _PAIR_GAP
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, ws), 1)
    gap_zone = (lane >= w) & (lane < b0)

    def pair_body(pi, carry):
        cp_in = pltpu.make_async_copy(x_hbm.at[pi], in_buf, sem_in)
        cp_in.start()
        cp_in.wait()
        raw = in_buf[0:h, 0:ws].astype(jnp.int32)
        if thr_ref is not None:
            # fused THRESH_BINARY_INV with per-unit thresholds laid out
            # along the lane split; gap lanes get -1 so they stay background
            # for any threshold (raw >= 0 > -1)
            t0 = thr_ref[pi, 0]
            t1 = thr_ref[pi, 1]
            tvec = jnp.where(
                lane < w, t0, jnp.where(lane >= b0, t1, jnp.int32(-1))
            )
            v = jnp.where(raw <= tvec, jnp.int32(255), jnp.int32(0))
        else:
            v = jnp.where(raw > 0, jnp.int32(255), jnp.int32(0))
        v = _paired_morph(v, stages, gap_zone)
        m = v > 0
        if fill:
            m = _paired_fill(m, h, ws, lane)

        bmi, st = _paired_largest(m, h, ws, w, b0, k_pow, plan)
        stats_out[pl.ds(pi, 1), :, :] = _paired_stats_row(st)
        out = bmi * 255 if out_largest else m.astype(jnp.int32) * 255
        _paired_emit(out, buf, mask_out, pi, sem_out, h, ws)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(p), pair_body, jnp.int32(0))


def _seg_roi_paired_body(
    x_hbm,
    thr_ref,
    zone_ref,
    mask_out,
    stats_out,
    roi_out,
    stats2_out,
    in_buf,
    buf,
    buf2,
    sem_in,
    sem_out,
    sem_out2,
    *,
    p: int,
    h: int,
    w: int,
    ws: int,
    k_pow: int,
    stages,
    roi_stages,
    plan: str,
    use_zone: bool,
):
    """Chained segmentation tail + exclusion AND + defect-ROI tail: one
    input DMA serves BOTH stages, the exclusion zone applies in VMEM, and
    the seg->roi intermediate never round-trips HBM (the split form pays a
    [U, H, W] write + re-stack + read between the two kernels plus a
    whole-batch XLA masking pass for the zone).

    ``zone_ref``: the stacked [hp, wsp] uint8 exclusion plane, shared by
    every unit (reference-image semantics: dx = dy = 0 for all units, so
    the rasterized zone is unit-invariant — engine.py). The seg stats are
    computed BEFORE the zone is applied (alignment anchors are
    pre-exclusion, indexing_ui.py:2282-2289); the emitted seg mask and the
    roi chain see the post-zone plane (indexing_ui.py:2291-2338, :1495).
    """
    b0 = w + _PAIR_GAP
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, ws), 1)
    gap_zone = (lane >= w) & (lane < b0)

    def pair_body(pi, carry):
        cp_in = pltpu.make_async_copy(x_hbm.at[pi], in_buf, sem_in)
        cp_in.start()
        cp_in.wait()
        raw = in_buf[0:h, 0:ws].astype(jnp.int32)
        t0 = thr_ref[pi, 0]
        t1 = thr_ref[pi, 1]
        tvec = jnp.where(
            lane < w, t0, jnp.where(lane >= b0, t1, jnp.int32(-1))
        )
        v = jnp.where(raw <= tvec, jnp.int32(255), jnp.int32(0))
        v = _paired_morph(v, stages, gap_zone)
        m = _paired_fill(v > 0, h, ws, lane)

        # seg stats from the PRE-exclusion plane (alignment anchors)
        _bmi, st = _paired_largest(m, h, ws, w, b0, k_pow, plan)
        stats_out[pl.ds(pi, 1), :, :] = _paired_stats_row(st)

        if use_zone:
            # cast before comparing: u8 vector compares crash this
            # environment's Mosaic (the i8-compare rejection class)
            m = m & (zone_ref[0:h, 0:ws].astype(jnp.int32) == 0)
        _paired_emit(m.astype(jnp.int32) * 255, buf, mask_out, pi, sem_out,
                     h, ws)

        # defect-ROI chain on the post-exclusion mask (binarize is a no-op:
        # m is already boolean)
        v2 = _paired_morph(
            jnp.where(m, jnp.int32(255), jnp.int32(0)), roi_stages, gap_zone
        )
        bmi2, st2 = _paired_largest(v2 > 0, h, ws, w, b0, k_pow, plan)
        stats2_out[pl.ds(pi, 1), :, :] = _paired_stats_row(st2)
        _paired_emit(bmi2 * 255, buf2, roi_out, pi, sem_out2, h, ws)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(p), pair_body, jnp.int32(0))


def _tail_paired_kernel(x_hbm, mask_out, stats_out, in_buf, buf, s1, s2, **st):
    _tail_paired_body(
        x_hbm, None, mask_out, stats_out, in_buf, buf, s1, s2, **st
    )


def _tail_paired_thr_kernel(
    x_hbm, thr_ref, mask_out, stats_out, in_buf, buf, s1, s2, **st
):
    _tail_paired_body(
        x_hbm, thr_ref, mask_out, stats_out, in_buf, buf, s1, s2, **st
    )


@functools.partial(
    jax.jit, static_argnames=("stages", "fill", "out_largest", "plan")
)
def seg_tail_paired_pallas(
    mask: jnp.ndarray,
    stages=(),
    fill: bool = False,
    out_largest: bool = False,
    plan: str = "crc",
    thr: jnp.ndarray | None = None,
):
    """seg_tail_pallas with two units lane-stacked per plane (same contract,
    bit-identical results, ~17% fewer vector ops: 316-wide units pad to 384
    lanes alone but 2x316 + an 8-lane gap is exactly 640 = 5 vregs).

    The per-pair input is DMA'd from HBM (the stacked fixpoint temporaries
    are 5/3 the per-unit size, so the whole-batch-resident input of the
    unpaired kernel would push past the scoped-VMEM budget)."""
    u, h, w = mask.shape
    b0 = w + _PAIR_GAP
    ws = 2 * w + _PAIR_GAP
    p = (u + 1) // 2
    hw = h * ws
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    assert (max(h, ws) + 1) * (1 << k_pow) < 2**31, "pair too large for i32"
    hp = -(-h // 8) * 8
    wsp = -(-ws // 128) * 128
    pad_u = 2 * p - u
    xs = mask
    if pad_u:
        xs = jnp.concatenate(
            [xs, jnp.zeros((pad_u, h, w), xs.dtype)], axis=0
        )
    gap = jnp.zeros((p, h, _PAIR_GAP), xs.dtype)
    stacked = jnp.concatenate([xs[0::2], gap, xs[1::2]], axis=2)
    if wsp > ws:
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((p, h, wsp - ws), xs.dtype)], axis=2
        )
    if hp > h:
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((p, hp - h, wsp), xs.dtype)], axis=1
        )
    static = dict(
        p=p, h=h, w=w, ws=ws, k_pow=k_pow,
        stages=stages, fill=bool(fill), out_largest=bool(out_largest),
        plan=plan,
    )
    out_shape = (
        jax.ShapeDtypeStruct((p, hp, wsp), jnp.uint8),
        jax.ShapeDtypeStruct((p, 8, 128), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((hp, wsp), jnp.uint8),
        pltpu.VMEM((hp, wsp), jnp.uint8),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    if thr is None:
        out, stats = pl.pallas_call(
            functools.partial(_tail_paired_kernel, **static),
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )(stacked)
    else:
        tp = thr.astype(jnp.int32)
        if pad_u:
            tp = jnp.concatenate([tp, jnp.full((pad_u,), -1, jnp.int32)])
        thr2 = jnp.stack([tp[0::2], tp[1::2]], axis=1)  # [p, 2]
        out, stats = pl.pallas_call(
            functools.partial(_tail_paired_thr_kernel, **static),
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )(stacked, thr2)
    mask_u = jnp.stack(
        [out[:, :h, :w], out[:, :h, b0 : b0 + w]], axis=1
    ).reshape(2 * p, h, w)[:u]
    st = jnp.stack(
        [stats[:, 0, 0:8], stats[:, 0, 8:16]], axis=1
    ).reshape(2 * p, 8)[:u]
    return (
        mask_u,
        st[:, 0],
        st[:, 1],
        st[:, 2],
        st[:, 3] > 0,
        st[:, 4],
        st[:, 5],
        st[:, 6],
        st[:, 7],
    )


def _seg_roi_paired_kernel(
    x_hbm, thr_ref, zone_ref, mask_out, stats_out, roi_out, stats2_out,
    in_buf, buf, buf2, s1, s2, s3, **st,
):
    _seg_roi_paired_body(
        x_hbm, thr_ref, zone_ref, mask_out, stats_out, roi_out, stats2_out,
        in_buf, buf, buf2, s1, s2, s3, **st,
    )


@functools.partial(
    jax.jit, static_argnames=("stages", "roi_stages", "plan", "use_zone")
)
def seg_roi_tail_paired_pallas(
    mask: jnp.ndarray,
    stages,
    roi_stages,
    thr: jnp.ndarray,
    zone: jnp.ndarray | None = None,
    plan: str = "crc",
    use_zone: bool = True,
):
    """Chained seg tail + shared exclusion zone + defect-ROI tail, paired.

    ``mask``: the blurred gray planes [U, H, W]; ``thr``: per-unit Otsu
    thresholds; ``zone``: shared [H, W] exclusion plane (reference-image
    case, any >0 excluded) or None. Returns
    (seg_mask [U,H,W] u8 post-zone, area, sx, sy, has_fg,
     roi_mask [U,H,W] u8, roi_area, roi_has_fg,
     row_lo, row_hi, col_lo, col_hi) — the seg stats are pre-exclusion
    (alignment anchors); the roi side matches _defect_roi_full on the
    post-exclusion masks. See _seg_roi_paired_body for what the chaining
    saves vs two kernels."""
    u, h, w = mask.shape
    b0 = w + _PAIR_GAP
    ws = 2 * w + _PAIR_GAP
    p = (u + 1) // 2
    hw = h * ws
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    assert (max(h, ws) + 1) * (1 << k_pow) < 2**31, "pair too large for i32"
    hp = -(-h // 8) * 8
    wsp = -(-ws // 128) * 128
    pad_u = 2 * p - u
    xs = mask
    if pad_u:
        xs = jnp.concatenate(
            [xs, jnp.zeros((pad_u, h, w), xs.dtype)], axis=0
        )
    gap = jnp.zeros((p, h, _PAIR_GAP), xs.dtype)
    stacked = jnp.concatenate([xs[0::2], gap, xs[1::2]], axis=2)
    if wsp > ws:
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((p, h, wsp - ws), xs.dtype)], axis=2
        )
    if hp > h:
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((p, hp - h, wsp), xs.dtype)], axis=1
        )
    tp = thr.astype(jnp.int32)
    if pad_u:
        tp = jnp.concatenate([tp, jnp.full((pad_u,), -1, jnp.int32)])
    thr2 = jnp.stack([tp[0::2], tp[1::2]], axis=1)  # [p, 2]
    if zone is None or not use_zone:
        zs = jnp.zeros((hp, wsp), jnp.uint8)
        use_zone = False
    else:
        z8 = zone.astype(jnp.uint8)
        zs = jnp.concatenate(
            [z8, jnp.zeros((h, _PAIR_GAP), jnp.uint8), z8], axis=1
        )
        zs = jnp.pad(zs, ((0, hp - h), (0, wsp - ws)))
    static = dict(
        p=p, h=h, w=w, ws=ws, k_pow=k_pow,
        stages=stages, roi_stages=roi_stages, plan=plan,
        use_zone=bool(use_zone),
    )
    out_shape = (
        jax.ShapeDtypeStruct((p, hp, wsp), jnp.uint8),
        jax.ShapeDtypeStruct((p, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((p, hp, wsp), jnp.uint8),
        jax.ShapeDtypeStruct((p, 8, 128), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((hp, wsp), jnp.uint8),
        pltpu.VMEM((hp, wsp), jnp.uint8),
        pltpu.VMEM((hp, wsp), jnp.uint8),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]
    out, stats, roi, stats2 = pl.pallas_call(
        functools.partial(_seg_roi_paired_kernel, **static),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )(stacked, thr2, zs)

    def unstack_plane(o):
        return jnp.stack(
            [o[:, :h, :w], o[:, :h, b0 : b0 + w]], axis=1
        ).reshape(2 * p, h, w)[:u]

    def unstack_stats(s):
        return jnp.stack(
            [s[:, 0, 0:8], s[:, 0, 8:16]], axis=1
        ).reshape(2 * p, 8)[:u]

    st = unstack_stats(stats)
    st2 = unstack_stats(stats2)
    return (
        unstack_plane(out),
        st[:, 0],
        st[:, 1],
        st[:, 2],
        st[:, 3] > 0,
        unstack_plane(roi),
        st2[:, 0],
        st2[:, 3] > 0,
        st2[:, 4],
        st2[:, 5],
        st2[:, 6],
        st2[:, 7],
    )


def seg_roi_paired_fits(shape, stages, roi_stages) -> bool:
    """Gate for the chained kernel: both stage chains' reaches must stay
    within the inter-unit gap, everything else as tail_paired_fits (the
    extra uint8 buffer and zone plane are noise next to the int32 fixpoint
    temporaries the bound budgets for)."""
    return tail_paired_fits(shape, stages) and tail_paired_fits(
        shape, roi_stages
    )


def _stages_reach(stages) -> int:
    """Max horizontal reach (lanes) any single stage reads past a pixel.

    A stage's reads span [lo, hi] per SE row-run; the gap between the two
    stacked units is reset to the stage's neutral before each stage, so the
    pairing is exact iff every stage's reach is <= _PAIR_GAP (a wider reach
    would read across the gap into the other unit's pixels)."""
    reach = 0
    for _op, runs in stages:
        for _dy, lo, hi in runs:
            reach = max(reach, -int(lo), int(hi))
    return reach


def tail_paired_fits(shape, stages=()) -> bool:
    """Gate for seg_tail_paired_pallas: TPU, int32-safe keys/sums on the
    stacked plane, fixpoint temporaries within scoped VMEM (the input is
    DMA'd per pair, so only ~11 stacked int32 planes count), and every
    morphology stage's horizontal reach within the inter-unit gap
    (erode_px >= 9 or morph_kernel >= 10 exceed _PAIR_GAP=8 and must take
    the unpaired kernel)."""
    from tpu_inspect.ops.common import fused_disabled

    if fused_disabled():
        return False
    u, h, w = shape
    if u < 2:
        return False
    if _stages_reach(stages) > _PAIR_GAP:
        return False
    ws = 2 * w + _PAIR_GAP
    hw = h * ws
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    wsp = -(-ws // 128) * 128
    hp = -(-h // 8) * 8
    return (
        on_tpu
        and (max(h, ws) + 1) * (1 << k_pow) < 2**31
        and max(h, ws) * h * ws < 2**31
        and 11 * hp * wsp * 4 + 2 * hp * wsp < 14 * 2**20
    )


def seg_tail_auto(
    mask: jnp.ndarray,
    stages=(),
    fill: bool = False,
    out_largest: bool = False,
    plan: str = "crc",
    thr: jnp.ndarray | None = None,
):
    """seg_tail_pallas, routed through the paired (2-unit lane-stacked)
    kernel when its gate holds. Same contract and bit-identical results."""
    if tail_paired_fits(mask.shape, stages):
        return seg_tail_paired_pallas(
            mask, stages=stages, fill=fill, out_largest=out_largest,
            plan=plan, thr=thr,
        )
    return seg_tail_pallas(
        mask, stages=stages, fill=fill, out_largest=out_largest,
        plan=plan, thr=thr,
    )
