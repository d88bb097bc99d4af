"""Fused-kernel parity in Pallas interpret mode (runs on the CPU backend).

The fused stage kernels (ops/fused_pallas.py, ops/blob_pallas.py fused
path, ops/cc_pallas.py fused label+stats, ops/median_pallas.py) normally
only execute on a real TPU; here they run under ``pallas_call(...,
interpret=True)`` and are checked bit-exact against the XLA formulations /
the OpenCV oracle, so the standing CPU suite guards their semantics.
Mosaic-specific lowering is still only exercised by tests/test_tpu_kernels.py.
"""

import importlib
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ORIG_PALLAS_CALL = pl.pallas_call


def _interpreted(*args, **kwargs):
    kwargs.setdefault("interpret", True)
    return _ORIG_PALLAS_CALL(*args, **kwargs)


@pytest.fixture()
def interp():
    """Reload the kernel modules with pallas_call forced to interpret."""
    with mock.patch.object(pl, "pallas_call", _interpreted):
        import tpu_inspect.ops.blob_pallas as bp
        import tpu_inspect.ops.cc_pallas as ccp
        import tpu_inspect.ops.fused_pallas as fp
        import tpu_inspect.ops.median_pallas as mp

        mods = [ccp, fp, bp, mp]
        for m in mods:
            importlib.reload(m)
        yield dict(bp=bp, ccp=ccp, fp=fp, mp=mp)
    for m in mods:
        importlib.reload(m)


def test_fused_label_stats_interpret(interp):
    import cv2

    ccp = interp["ccp"]
    rng = np.random.RandomState(0)
    fg = rng.rand(5, 40, 44) > 0.55
    fg[0] = False
    mask, area, sx, sy, has = map(
        np.asarray, ccp.largest_component_stats_pallas(jnp.asarray(fg))
    )
    for i in range(5):
        n, lab, stats, _ = cv2.connectedComponentsWithStats(
            fg[i].astype(np.uint8), connectivity=8
        )
        if n <= 1:
            assert not bool(has[i])
            continue
        best = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        np.testing.assert_array_equal(mask[i], lab == best)
        ys, xs = np.nonzero(lab == best)
        assert area[i] == len(xs) and sx[i] == xs.sum() and sy[i] == ys.sum()


def test_seg_tail_interpret(interp):
    from tpu_inspect import oracle
    from tpu_inspect.config import SegmentationParams
    from tpu_inspect.ops.gaussian import gaussian_blur_u8
    from tpu_inspect.ops import threshold
    from tpu_inspect.ops.morph_pallas import _close_open_stages

    fp = interp["fp"]
    rng = np.random.RandomState(9)
    crops = rng.randint(0, 256, (4, 50, 60), dtype=np.uint8)
    seg = SegmentationParams().validated()
    x = gaussian_blur_u8(jnp.asarray(crops), 3)
    thr = threshold.otsu_threshold(x)
    out, *_ = fp.seg_tail_pallas(
        x, stages=_close_open_stages(3), fill=True, thr=thr
    )
    ref = np.stack([oracle.segment_unit(c, seg) for c in crops])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_roi_tail_interpret(interp):
    import cv2

    from tpu_inspect.synthetic import random_blob_mask

    fp = interp["fp"]
    masks = np.stack(
        [random_blob_mask(40, 44, seed=s, n_blobs=3) for s in range(4)]
    )
    masks[3] = 0
    for n in (0, 2):
        stages = (
            (("erode", tuple((dy, -n, n) for dy in range(-n, n + 1))),)
            if n
            else ()
        )
        roi_u8, _, _, _, has, row_lo, row_hi, col_lo, col_hi = (
            fp.seg_tail_pallas(
                jnp.asarray(masks), stages=stages, fill=False,
                out_largest=True,
            )
        )
        roi_u8 = np.asarray(roi_u8)
        for i in range(4):
            sb = (masks[i] > 0).astype(np.uint8)
            er = cv2.erode(sb, None, iterations=n) if n > 0 else sb
            nl, lab = cv2.connectedComponents(er, connectivity=8)
            if nl <= 1:
                assert not bool(np.asarray(has)[i])
                assert int(np.asarray(row_lo)[i]) == 40
                assert int(np.asarray(row_hi)[i]) == 0
                assert int(np.asarray(col_lo)[i]) == 44
                assert int(np.asarray(col_hi)[i]) == 0
                continue
            areas = [(lab == j).sum() for j in range(1, nl)]
            best = 1 + int(np.argmax(areas))
            np.testing.assert_array_equal(roi_u8[i] > 0, lab == best)
            ys = np.nonzero((lab == best).any(axis=1))[0]
            assert int(np.asarray(row_lo)[i]) == ys.min()
            assert int(np.asarray(row_hi)[i]) == ys.max() + 1
            xs = np.nonzero((lab == best).any(axis=0))[0]
            assert int(np.asarray(col_lo)[i]) == xs.min()
            assert int(np.asarray(col_hi)[i]) == xs.max() + 1


def test_seg_tail_flood_verify_branches_interpret(interp):
    """The tail kernel's largest-component selection takes a flood-from-
    seed fast path when the seeded component holds a strict majority of
    the fg, and falls back to the exact label fixpoint otherwise. Drive
    both branches plus the exact-tie case (where cv2's BBDT first-
    appearance tie-break must decide) and check against the oracle
    largest-component selection."""
    import cv2

    from tpu_inspect.ops import cc as cc_ops

    fp = interp["fp"]
    h, w = 40, 44
    masks = np.zeros((4, h, w), np.uint8)
    # 0: one dominant blob + specks -> fast flood branch
    masks[0, 5:30, 5:30] = 255
    masks[0, 35:38, 35:40] = 255
    # 1: three similar blobs, largest < 50% of fg -> label fallback
    masks[1, 2:12, 2:14] = 255      # 120 px
    masks[1, 20:30, 2:13] = 255     # 110 px
    masks[1, 20:30, 20:31] = 255    # 110 px
    # 2: two EQUAL components -> tie, must match cv2 tie-break
    masks[2, 4:14, 4:14] = 255
    masks[2, 24:34, 24:34] = 255
    # 3: empty
    out, area, sx, sy, has, *_ = fp.seg_tail_pallas(
        jnp.asarray(masks), stages=(), fill=False, out_largest=True
    )
    out, area = np.asarray(out), np.asarray(area)
    for i in range(4):
        bm, a, ex, ey, hf = (
            np.asarray(v)[0]
            for v in cc_ops.largest_component_sums(
                jnp.asarray(masks[i : i + 1] > 0)
            )
        )
        assert bool(np.asarray(has)[i]) == bool(hf)
        np.testing.assert_array_equal(out[i] > 0, bm)
        assert area[i] == a
        assert np.asarray(sx)[i] == ex and np.asarray(sy)[i] == ey
        # cross-check the oracle against cv2 itself
        n, lab, stats, _ = cv2.connectedComponentsWithStats(
            masks[i], connectivity=8
        )
        if n > 1:
            areas = stats[1:, cv2.CC_STAT_AREA]
            best = 1 + int(np.argmax(areas))
            np.testing.assert_array_equal(out[i] > 0, lab == best)


def test_blob_filter_interpret(interp):
    from tpu_inspect.ops import contour, morphology

    bp = interp["bp"]
    rng = np.random.RandomState(4)
    h, w = 40, 44
    cand = (rng.rand(4, h, w) > 0.75).astype(np.uint8) * 255
    roi = np.zeros((4, h, w), bool)
    for i in range(4):
        roi[i, 4 : h - 4, 5 : w - 5] = True
        roi[i, 8:11, 8:12] = False
    roi[3] = False
    maxs = jnp.asarray(rng.randint(10, 2 * h * w, size=4), dtype=jnp.int32)
    for mn, pre_open in [(0, True), (6, False)]:
        out_f, area_f = bp.blob_filter_pallas(
            jnp.asarray(cand), maxs, min_x2=mn,
            roi=jnp.asarray(roi), pre_open=pre_open,
        )
        out_f, area_f = np.asarray(out_f), np.asarray(area_f)
        c = jnp.where(jnp.asarray(roi), jnp.asarray(cand), jnp.uint8(0))
        if pre_open:
            c = morphology.morph_open(c, morphology.ellipse_se(3))
        # traced min_area forces the XLA sort-based reference path
        out_x, _ = contour.filter_and_select(c > 0, jnp.int32(mn), maxs)
        np.testing.assert_array_equal(out_f > 0, np.asarray(out_x))
        assert (out_f[out_f > 0] == 255).all()
        np.testing.assert_array_equal(
            area_f, np.asarray(out_x).sum(axis=(1, 2))
        )


def test_median_residual_interpret(interp):
    import cv2

    mp = interp["mp"]
    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (5, 30, 40), dtype=np.uint8)
    for k, thr in [(9, 24), (21, 0), (3, 255)]:
        med = np.stack([cv2.medianBlur(im, k) for im in x])
        resid = np.abs(x.astype(np.int32) - med.astype(np.int32))
        ref = np.where(resid > thr, 255, 0).astype(np.uint8)
        for variant in ("base", "qdirect", "cdfx", "cdfx2"):
            out = np.asarray(
                mp.median_residual_mask_pallas(
                    jnp.asarray(x), k, thr, variant=variant
                )
            )
            np.testing.assert_array_equal(
                out, ref, err_msg=f"k={k} thr={thr} variant={variant}"
            )


def test_median_residual_tiled_interpret(interp):
    """Strip-tiled median-residual stitching (halos, edge replication,
    batch padding) bit-exact vs cv2 on a plane spanning multiple items.
    The item envelope is shrunk so interpret mode stays cheap; real-size
    planes are covered on hardware by tests/test_tpu_kernels.py."""
    import cv2

    mp = interp["mp"]
    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (2, 70, 81), dtype=np.uint8)
    k, thr = 9, 24
    with mock.patch.object(mp, "_ITEM_ENVELOPE", (40, 44)):
        out = np.asarray(
            mp.median_residual_mask_tiled(jnp.asarray(x), k, thr, batch=6)
        )
    med = np.stack([cv2.medianBlur(im, k) for im in x])
    resid = np.abs(x.astype(np.int32) - med.astype(np.int32))
    ref = np.where(resid > thr, 255, 0).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)

    # ROI-bounded variant (the whole-image defect path): every row inside
    # the per-unit row bounds whose item column range intersects the col
    # bounds must be bit-exact; rows/items outside are left unwritten
    bounds = [(10, 55, 5, 60), (25, 60, 50, 81)]
    with mock.patch.object(mp, "_ITEM_ENVELOPE", (40, 44)):
        outb = np.asarray(
            mp.median_residual_mask_tiled(
                jnp.asarray(x), k, thr, batch=6,
                row_lo=jnp.asarray([b[0] for b in bounds], jnp.int32),
                row_hi=jnp.asarray([b[1] for b in bounds], jnp.int32),
                col_lo=jnp.asarray([b[2] for b in bounds], jnp.int32),
                col_hi=jnp.asarray([b[3] for b in bounds], jnp.int32),
            )
        )
    col_t = 44 - (k - 1)
    for i, (rl, rh, cl, ch) in enumerate(bounds):
        for j in range(-(-x.shape[2] // col_t)):
            if cl < (j + 1) * col_t and ch > j * col_t:
                c0, c1 = j * col_t, min((j + 1) * col_t, x.shape[2])
                np.testing.assert_array_equal(
                    outb[i, rl:rh, c0:c1], ref[i, rl:rh, c0:c1],
                    err_msg=f"unit {i} item-col {j}",
                )


def test_flood_tiled_interpret():
    """Strip-tiled reachability flood (halo-exchanging sweeps) vs a host
    BFS, with the strip height shrunk so several strips + up/down sweep
    repetitions are exercised in interpret mode."""
    from collections import deque

    with mock.patch.object(pl, "pallas_call", _interpreted):
        import tpu_inspect.ops.flood_pallas as fl

        importlib.reload(fl)
        try:
            rng = np.random.RandomState(3)
            # a serpentine domain forces information to cross strips both
            # directions repeatedly
            h, w = 60, 33
            dom = np.ones((h, w), bool)
            for i, r in enumerate(range(5, h - 5, 6)):
                if i % 2 == 0:
                    dom[r, : w - 8] = False
                else:
                    dom[r, 8:] = False
            dom |= rng.rand(h, w) > 0.995
            seed = np.zeros((h, w), bool)
            seed[0, :] = dom[0, :]
            with mock.patch.object(fl, "_strip_height", lambda w: 16):
                got = np.asarray(
                    fl.propagate_pallas_tiled(
                        jnp.asarray(seed[None]), jnp.asarray(dom[None]),
                        conn8=False,
                    )
                )[0]
            # host BFS oracle (4-connected)
            ref = np.zeros((h, w), bool)
            q = deque(zip(*np.nonzero(seed)))
            ref[seed] = True
            while q:
                y, x = q.popleft()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and dom[ny, nx] and not ref[ny, nx]:
                        ref[ny, nx] = True
                        q.append((ny, nx))
            np.testing.assert_array_equal(got, ref)
        finally:
            importlib.reload(fl)


def test_canny_tiled_branch_interpret():
    """canny_u8 with hysteresis forced onto the strip-tiled flood branch
    (ops/canny.py _propagate8) must stay cv2-exact off-TPU too."""
    import cv2

    with mock.patch.object(pl, "pallas_call", _interpreted):
        import tpu_inspect.ops.flood_pallas as fl

        importlib.reload(fl)
        try:
            from tpu_inspect.ops.canny import canny_u8

            rng = np.random.RandomState(12)
            base = rng.randint(0, 60, (90, 70)).astype(np.uint8)
            base[20:60, 15:55] += 120
            base[70:85, 10:60] += rng.randint(0, 80, (15, 50)).astype(np.uint8)
            with mock.patch.object(fl, "flood_fits", lambda s: False), \
                 mock.patch.object(fl, "flood_fits_tiled", lambda s: True), \
                 mock.patch.object(fl, "_strip_height", lambda w: 16):
                for thr in (24, 80):
                    lo, hi = max(1, thr // 2), max(2, thr)
                    ours = np.asarray(
                        canny_u8(jnp.asarray(base[None]), lo, hi)
                    )[0]
                    ref = cv2.Canny(base, lo, hi)
                    np.testing.assert_array_equal(
                        ours, ref, err_msg=f"thr={thr}"
                    )
        finally:
            importlib.reload(fl)


def test_whole_image_defect_path_composed_interpret():
    """The whole-image defect chain END TO END with every tiled branch
    forced (strip-tiled flood everywhere, envelope-re-batched tiled
    median) in interpret mode, against the OpenCV oracle — the exact
    composition the TPU runs for BASELINE config 1's defect pass, modulo
    Mosaic lowering (tests/test_tpu_kernels.py) and CC tile-seeding
    (proven exactly equal in test_ops_defect_path.py)."""
    with mock.patch.object(pl, "pallas_call", _interpreted):
        import tpu_inspect.ops.flood_pallas as fl
        import tpu_inspect.ops.median_pallas as mp

        importlib.reload(fl)
        importlib.reload(mp)
        try:
            from tpu_inspect import oracle
            from tpu_inspect.config import DefectParams, GridParams
            from tpu_inspect.engine import _defect_device
            from tpu_inspect.synthetic import make_mold_image

            grid = GridParams(base_unit=(20, 18, 360, 310), units_x=1, units_y=1)
            image = make_mold_image(grid, (350, 400), seed=3, defect_rate=1.0)
            from tpu_inspect.config import SegmentationParams

            seg_mask = oracle.segment_unit(image, SegmentationParams())
            params = DefectParams(min_area=8, erode_px=3).validated()
            ref_masks, ref_areas, ref_verdicts = oracle.inspect_units(
                image[None], seg_mask[None], params
            )

            with mock.patch.object(fl, "flood_fits", lambda s: False), \
                 mock.patch.object(fl, "flood_fits_tiled", lambda s: True), \
                 mock.patch.object(fl, "_strip_height", lambda w: 64), \
                 mock.patch.object(mp, "median_fits", lambda s: False), \
                 mock.patch.object(mp, "median_fits_tiled", lambda s: True), \
                 mock.patch.object(mp, "_ITEM_ENVELOPE", (100, 110)):
                out, found, area, verdict = (
                    np.asarray(v)
                    for v in _defect_device(
                        jnp.asarray(image[None]),
                        jnp.asarray(seg_mask[None]),
                        params=params,
                    )
                )
            np.testing.assert_array_equal(area, ref_areas)
            np.testing.assert_array_equal(verdict, ref_verdicts)
            ref_mask0 = ref_masks[0]
            got_mask0 = out[0] if found[0] else None
            if ref_mask0 is None:
                assert got_mask0 is None or not got_mask0.any()
            else:
                np.testing.assert_array_equal(got_mask0, ref_mask0)
            assert area[0] > 0  # defect_rate=1.0 must detect something
        finally:
            importlib.reload(fl)
            importlib.reload(mp)


def test_seg_tail_paired_interpret(interp):
    """The 2-unit lane-stacked tail kernel must be bit-identical to the
    per-unit kernel for every variant: thresholded seg tail (morph + fill),
    roi tail (erode + largest), odd unit counts, and empty units — the gap
    columns must behave exactly like each unit's out-of-image border."""
    from tpu_inspect.ops import threshold
    from tpu_inspect.ops.gaussian import gaussian_blur_u8
    from tpu_inspect.ops.morph_pallas import _close_open_stages

    fp = interp["fp"]
    rng = np.random.RandomState(3)
    u, h, w = 5, 40, 44  # odd u: the pad unit must come back empty
    crops = rng.randint(0, 256, (u, h, w), dtype=np.uint8)
    x = gaussian_blur_u8(jnp.asarray(crops), 3)
    thr = threshold.otsu_threshold(x)

    # seg variant: threshold + close/open + hole fill + centroid stats
    ref = fp.seg_tail_pallas(
        x, stages=_close_open_stages(3), fill=True, thr=thr
    )
    got = fp.seg_tail_paired_pallas(
        x, stages=_close_open_stages(3), fill=True, thr=thr
    )
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    # roi variant: binarize + 5x5 erode + largest component + extents,
    # with fg touching the inner (stacked) edges and an empty unit
    masks = (crops > 100).astype(np.uint8) * 255
    masks[1] = 0
    masks[2, :, w - 1] = 255  # fg on the unit edge that faces the gap
    masks[3, :, 0] = 255
    n = 2
    stages = (("erode", tuple((dy, -n, n) for dy in range(-n, n + 1))),)
    ref = fp.seg_tail_pallas(
        jnp.asarray(masks), stages=stages, fill=False, out_largest=True
    )
    got = fp.seg_tail_paired_pallas(
        jnp.asarray(masks), stages=stages, fill=False, out_largest=True
    )
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    # ODD width: unit B's lane offset can't block-align, so the paired
    # kernel must route to the pixel-level labeling path — keep it covered
    # now that even widths take the 2x2-block BBDT path
    masks_odd = (crops[:, :, :43] > 100).astype(np.uint8) * 255
    masks_odd[2, :, 42] = 255
    ref = fp.seg_tail_pallas(
        jnp.asarray(masks_odd), stages=stages, fill=False, out_largest=True
    )
    got = fp.seg_tail_paired_pallas(
        jnp.asarray(masks_odd), stages=stages, fill=False, out_largest=True
    )
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_tail_paired_reach_gate(interp):
    """Stages whose horizontal reach exceeds the 8-lane inter-unit gap must
    NOT route to the paired kernel: each unit's erode/dilate window would
    read across the gap into the other unit's pixels (round-4 advisor,
    high). Valid configs hit this: erode_px (0-200) >= 9, morph_kernel
    (0-31) >= 10."""
    import types

    from tpu_inspect.ops.morph_pallas import _close_open_stages

    fp = interp["fp"]
    n = 10
    erode10 = (("erode", tuple((dy, -n, n) for dy in range(-n, n + 1))),)
    assert fp._stages_reach(erode10) == 10
    assert fp._stages_reach(_close_open_stages(21)) == 20  # minkowski 2*(k//2)
    assert fp._stages_reach(_close_open_stages(3)) <= fp._PAIR_GAP
    assert fp._stages_reach(()) == 0

    fake_tpu = lambda: [types.SimpleNamespace(platform="tpu")]
    with mock.patch.object(jax, "devices", fake_tpu):
        shape = (4, 40, 44)
        assert fp.tail_paired_fits(shape, _close_open_stages(3))
        assert not fp.tail_paired_fits(shape, erode10)
        assert not fp.tail_paired_fits(shape, _close_open_stages(10))

    # the leak the gate prevents, demonstrated: unit A all-fg, unit B empty,
    # one dilate with reach 10 > _PAIR_GAP — the paired kernel bleeds A's
    # foreground across the gap into B's inner-edge columns
    masks = np.zeros((2, 8, 16), np.uint8)
    masks[0] = 255
    leak_stage = (("dilate", ((0, -n, n),)),)
    ref = fp.seg_tail_pallas(jnp.asarray(masks), stages=leak_stage)
    got = fp.seg_tail_paired_pallas(jnp.asarray(masks), stages=leak_stage)
    assert np.asarray(ref[0])[1].max() == 0  # unit B stays empty, unpaired
    assert np.asarray(got[0])[1].max() > 0, (
        "expected the cross-gap leak this gate exists for; if the paired "
        "kernel now handles reach > _PAIR_GAP exactly, the gate (and this "
        "canary) can be relaxed"
    )


def test_blocked_paired_labeling_interpret(interp):
    """The 2x2-block BBDT path of the paired tail vs the pixel-path kernel
    on inputs crafted for its edge cases: components linked ONLY through
    diagonal pixel pairs across block corners, dense random noise (many
    components, area ties resolved by the 2x2-block-raster rank), odd
    heights (half blocks), and fg on the lane-gap edges."""
    fp = interp["fp"]
    rng = np.random.RandomState(11)

    cases = []
    # dense noise: tie-breaks + many roots
    cases.append((rng.rand(4, 21, 24) > 0.5, 1))
    # diagonal chains: stair patterns connect only via block corners
    stair = np.zeros((2, 20, 22), bool)
    for t in range(9):
        stair[0, 2 * t, 2 * t] = True
        stair[0, 2 * t + 1, 2 * t + 1] = True
        stair[1, 19 - 2 * t, 2 * t + 1] = True
        stair[1, 18 - 2 * t, 2 * t + 2] = True
    cases.append((stair, 2))
    # sparse specks at block parity corners + edge columns
    sp = rng.rand(3, 17, 26) > 0.9
    sp[:, :, 0] = True
    sp[:, :, 25] = True
    cases.append((sp, 3))

    for fg, seed in cases:
        masks = (fg * 255).astype(np.uint8)
        stages = ()
        ref = fp.seg_tail_pallas(
            jnp.asarray(masks), stages=stages, fill=False, out_largest=True
        )
        got = fp.seg_tail_paired_pallas(
            jnp.asarray(masks), stages=stages, fill=False, out_largest=True
        )
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(g), err_msg=f"case seed {seed} out {i}"
            )


def test_seg_roi_chained_interpret(interp):
    """The chained seg+zone+roi kernel must reproduce the split pipeline:
    seg_tail (thr + close/open + fill, PRE-exclusion stats) -> XLA zone
    AND -> roi_tail (erode + largest + extents), for with/without zone,
    erode_px 0 and >0, odd unit counts."""
    from tpu_inspect.ops import threshold
    from tpu_inspect.ops.gaussian import gaussian_blur_u8
    from tpu_inspect.ops.morph_pallas import _close_open_stages

    fp = interp["fp"]
    rng = np.random.RandomState(7)
    u, h, w = 5, 40, 44
    crops = rng.randint(0, 256, (u, h, w), dtype=np.uint8)
    x = gaussian_blur_u8(jnp.asarray(crops), 3)
    thr = threshold.otsu_threshold(x)
    stages = _close_open_stages(3)
    zone_np = np.zeros((h, w), np.uint8)
    zone_np[8:20, 10:30] = 1

    for n_ero, zone in [(2, zone_np), (0, zone_np), (2, None)]:
        roi_stages = (
            (("erode", tuple((dy, -n_ero, n_ero)
                             for dy in range(-n_ero, n_ero + 1))),)
            if n_ero else ()
        )
        # split reference: seg tail -> zone -> roi tail
        smask, sarea, ssx, ssy, shas, *_ = fp.seg_tail_pallas(
            x, stages=stages, fill=True, thr=thr
        )
        post = np.asarray(smask)
        if zone is not None:
            post = np.where(zone[None] > 0, 0, post).astype(np.uint8)
        rmask, rarea, _, _, rhas, rl, rh, cl, ch = fp.seg_tail_pallas(
            jnp.asarray(post), stages=roi_stages, fill=False,
            out_largest=True,
        )
        got = fp.seg_roi_tail_paired_pallas(
            x, stages, roi_stages, thr,
            zone=None if zone is None else jnp.asarray(zone),
            use_zone=zone is not None,
        )
        refs = (post, sarea, ssx, ssy, shas,
                rmask, rarea, rhas, rl, rh, cl, ch)
        for i, (r, g) in enumerate(zip(refs, got)):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(g),
                err_msg=f"erode={n_ero} zone={zone is not None} out {i}",
            )


def test_engine_chained_path_interpret(interp, monkeypatch):
    """The TPU_INSPECT_ENABLE_CHAIN engine plumbing end-to-end
    (_inspect_image_device -> _segment_roi_device -> _defect_from_roi):
    the chained path's full output tuple must equal the split path's on
    the same inputs, exclusions included (round-5 review finding: only
    the chained KERNEL had coverage, not the engine wiring around it)."""
    import jax

    from tpu_inspect import engine
    from tpu_inspect.config import DefectParams, SegmentationParams

    rng = np.random.RandomState(21)
    uh, uw = 40, 44
    image = rng.randint(0, 256, (100, 140), dtype=np.uint8)
    # origins are (x, y) top-left corners (imageio.gather_crops)
    origins = np.array(
        [[2, 2], [48, 2], [94, 2], [2, 50], [48, 50], [94, 50]],
        dtype=np.int32,
    )
    rects, circles = engine.pack_exclusions(
        [{"shape": "rect", "x": 5, "y": 6, "w": 10, "h": 8}]
    )
    seg = SegmentationParams(gaussian_blur=3, morph_kernel=3).validated()
    dp = DefectParams(median_k=5, erode_px=2, threshold=20,
                      min_area=3).validated()
    u = origins.shape[0]
    args = (
        jnp.asarray(image),
        jnp.asarray(origins),
        jnp.asarray(rects),
        jnp.asarray(circles),
        jnp.zeros((u, 2), jnp.float64),
        jnp.zeros((u,), bool),
    )
    kw = dict(seg=seg, defect=dp, is_reference=True, unit_hw=(uh, uw),
              with_defects=True)

    def flatten(out):
        leaves = []
        for v in jax.tree_util.tree_leaves(out):
            leaves.append(np.asarray(v))
        return leaves

    monkeypatch.setattr(engine, "_ENABLE_CHAIN", False)
    split = flatten(engine._inspect_image_device(*args, **kw))
    jax.clear_caches()
    monkeypatch.setattr(engine, "_ENABLE_CHAIN", True)
    monkeypatch.setattr(
        engine, "_seg_roi_chain_fits", lambda *_a, **_k: True
    )
    chained = flatten(engine._inspect_image_device(*args, **kw))
    assert len(split) == len(chained)
    for i, (a, b) in enumerate(zip(split, chained)):
        np.testing.assert_array_equal(a, b, err_msg=f"leaf {i}")


def test_defect_narrow_window_interpret(interp, monkeypatch):
    """engine._defect_narrow_window (median + blob filter riding one shared
    ROI column window, lax.cond narrow vs full fallback) on the CPU backend:
    gates forced open, window shrunk to 24 columns, Pallas in interpret
    mode. Covers the narrow branch (small ROI spans, including ROIs at the
    left/right image borders where the shared start clamps) and the runtime
    fallback (ROI union wider than the window), against the OpenCV oracle."""
    import cv2

    from tpu_inspect import engine, oracle
    from tpu_inspect.config import DefectParams

    mp_mod = interp["mp"]
    bp_mod = interp["bp"]
    monkeypatch.setattr(engine, "_MEDIAN_COL_WINDOW", 24)
    monkeypatch.setattr(mp_mod, "median_fits", lambda shape: True)
    monkeypatch.setattr(bp_mod, "blob_filter_fits", lambda shape: True)

    rng = np.random.RandomState(5)
    u, h, w = 4, 44, 60
    crops = rng.randint(0, 256, (u, h, w), dtype=np.uint8)
    params = DefectParams(median_k=5, erode_px=2).validated()

    cases = {
        "narrow-mid": [(18, 34), (20, 36), (22, 38), (18, 36)],
        "narrow-left-clamp": [(0, 14)] * 4,   # start clamps to 0
        "narrow-right-clamp": [(46, 60)] * 4,  # start clamps to w - W
        "fallback-wide": [(4, 56)] * 4,        # union exceeds the window
    }
    for name, spans in cases.items():
        masks = np.zeros((u, h, w), np.uint8)
        for i, (c0, c1) in enumerate(spans):
            masks[i, 6 : h - 6, c0:c1] = 255
        out, found, area, verdict = engine._defect_device(
            jnp.asarray(crops), jnp.asarray(masks), params=params
        )
        _, ref_areas, ref_verd = oracle.inspect_units(crops, masks, params)
        np.testing.assert_array_equal(np.asarray(area), ref_areas, err_msg=name)
        np.testing.assert_array_equal(np.asarray(verdict), ref_verd, err_msg=name)
        got = np.asarray(out)
        for i in range(u):
            ref = oracle.detect_defects(crops[i], masks[i], params)
            exp = ref if ref is not None else np.zeros((h, w), np.uint8)
            np.testing.assert_array_equal(
                got[i], exp, err_msg=f"{name} unit {i}"
            )

    # median_k=3 (r_h=1) right-margin boundary (round-4 advisor, medium):
    # fits_all must leave >= 1 real background column between the ROI's
    # right edge and the blob window's last column, else an ROI-edge
    # candidate survives the 3x3 pre-open only in the narrow path (the
    # out-of-window neighbor reads as the erode neutral 255, not the real
    # zero). With W=24/WB=23: ROI span 22 must take the runtime fallback;
    # span 21 rides the narrow window with exactly one margin column.
    params3 = DefectParams(median_k=3, erode_px=2).validated()
    for name, (c0, c1) in {
        "k3-span22-fallback": (6, 32),  # ROI span (c1-c0)-4 = 22
        "k3-span21-margin1": (6, 31),   # ROI span 21
    }.items():
        masks = np.zeros((u, h, w), np.uint8)
        masks[:, 6 : h - 6, c0:c1] = 255
        out, found, area, verdict = engine._defect_device(
            jnp.asarray(crops), jnp.asarray(masks), params=params3
        )
        _, ref_areas, ref_verd = oracle.inspect_units(crops, masks, params3)
        np.testing.assert_array_equal(np.asarray(area), ref_areas, err_msg=name)
        np.testing.assert_array_equal(np.asarray(verdict), ref_verd, err_msg=name)
        got = np.asarray(out)
        for i in range(u):
            ref = oracle.detect_defects(crops[i], masks[i], params3)
            exp = ref if ref is not None else np.zeros((h, w), np.uint8)
            np.testing.assert_array_equal(
                got[i], exp, err_msg=f"{name} unit {i}"
            )


def test_tiled_component_tables_interpret(interp):
    """Whole-image largest-component stats via the per-tile component-table
    kernel (sort-free fast path) AND its overflow fallback to the segment-
    sort path, both bit-identical to the generic XLA sort formulation.
    Tile envelope shrunk so several tiles + cross-tile fragments are
    exercised in interpret mode."""
    import tpu_inspect.ops.cc as cc_mod

    ccp = interp["ccp"]
    from tpu_inspect.synthetic import random_blob_mask

    masks = np.stack(
        [random_blob_mask(40, 44, seed=s, n_blobs=4) for s in (7, 8)]
    )
    masks[1, :, 20:22] = 0  # split fragments across tile columns
    fg = jnp.asarray(masks > 0)
    labels = cc_mod.label_components(fg)
    ref = [np.asarray(v) for v in cc_mod.largest_component_sums(fg)]

    out = cc_mod.largest_component_sums_tiled(
        fg, labels, tile_hw=(16, 20), use_tables=True
    )
    for r, g in zip(ref, out):
        np.testing.assert_array_equal(r, np.asarray(g))

    # force the overflow branch: a 2-component cap trips on any tile with
    # >2 fragments, routing the winner through the sort path at runtime
    with mock.patch.object(ccp, "_TABLE_K", 2):
        out2 = cc_mod.largest_component_sums_tiled(
            fg, labels, tile_hw=(16, 20), use_tables=True
        )
    for r, g in zip(ref, out2):
        np.testing.assert_array_equal(r, np.asarray(g))


def test_green_filter_tables_interpret(interp):
    """The Green's-filter per-tile (key, signed sum) tables + paint kernel
    (sort-free fast path) and the overflow fallback, vs the pure-XLA sort
    path on the same inputs."""
    import cv2

    import tpu_inspect.ops.cc as cc_mod
    from tpu_inspect.ops.contour import _green_filter_tiled, _vertex_attribution
    from tpu_inspect.ops.hole_fill import exterior_background

    ccp = interp["ccp"]
    rng = np.random.RandomState(12)
    h, w = 40, 44
    m = np.zeros((1, h, w), np.uint8)
    for _ in range(8):
        y, x = rng.randint(0, h - 10), rng.randint(0, w - 10)
        m[0, y : y + rng.randint(2, 9), x : x + rng.randint(2, 9)] = 255
    fg = jnp.asarray(m > 0)
    ext = exterior_background(fg)
    fill_labels = cc_mod.label_components(~ext, plan="rc")
    fg_labels = cc_mod.label_components(fg, plan="rc")
    top = fg & (fg_labels == fill_labels)
    attr, contrib = _vertex_attribution(top, ext, fill_labels)
    bias = 1 << int(np.ceil(np.log2(h + w + 4)))
    maxs = jnp.full((1,), 2**30, jnp.int32)

    ref_kv, ref_found = _green_filter_tiled(
        attr, contrib, h * w, bias, jnp.int32(8), maxs,
        tile_vhw=(16, 16), use_tables=False,
    )
    got_kv, got_found = _green_filter_tiled(
        attr, contrib, h * w, bias, jnp.int32(8), maxs,
        tile_vhw=(16, 16), use_tables=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_kv), np.asarray(got_kv))
    np.testing.assert_array_equal(np.asarray(ref_found), np.asarray(got_found))

    # overflow fallback: 2-key cap trips -> the cond takes the sort path
    with mock.patch.object(ccp, "_TABLE_K", 2):
        ovf_kv, ovf_found = _green_filter_tiled(
            attr, contrib, h * w, bias, jnp.int32(8), maxs,
            tile_vhw=(16, 16), use_tables=True,
        )
    np.testing.assert_array_equal(np.asarray(ref_kv), np.asarray(ovf_kv))
    np.testing.assert_array_equal(
        np.asarray(ref_found), np.asarray(ovf_found)
    )
