"""Pallas TPU kernel parity tests.

The default suite runs on the CPU backend where ops dispatch to their XLA
fallbacks; this module validates the Pallas kernels themselves and only
runs on a real TPU:

    TPU_INSPECT_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_kernels.py

(bench.py's parity gate also exercises all Pallas paths every run.)
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU backend"
)


def test_pallas_median_parity():
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.median_pallas import median_blur_u8_pallas

    imgs = np.random.RandomState(0).randint(0, 256, (3, 50, 57), dtype=np.uint8)
    for k in [3, 9, 21]:
        ref = np.stack([cv2.medianBlur(im, k) for im in imgs])
        ours = np.asarray(median_blur_u8_pallas(jnp.asarray(imgs), k))
        np.testing.assert_array_equal(ours, ref)


def test_pallas_labels_parity():
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.cc_pallas import label_components_pallas
    from tpu_inspect.synthetic import random_blob_mask

    masks = np.stack(
        [random_blob_mask(45, 53, seed=s, n_blobs=6) for s in range(4)]
    )
    labels = np.asarray(label_components_pallas(jnp.asarray(masks > 0)))
    for i, m in enumerate(masks):
        n, lab = cv2.connectedComponents((m > 0).astype(np.uint8), connectivity=8)
        for comp in range(1, n):
            ys, xs = np.where(lab == comp)
            root = int((ys * 53 + xs).min())
            assert (labels[i][lab == comp] == root).all()
    assert (labels[0][masks[0] == 0] == 2**30).all()


def test_pallas_flood_parity():
    import jax.numpy as jnp

    from tpu_inspect.oracle import fill_holes as oracle_fill
    from tpu_inspect.ops import hole_fill
    from tpu_inspect.synthetic import random_blob_mask

    masks = np.stack([random_blob_mask(45, 53, seed=s, n_blobs=5) for s in range(4)])
    for s in range(4):
        holes = random_blob_mask(45, 53, seed=500 + s, n_blobs=8, scale=0.07)
        masks[s][holes > 0] = 0
    ref = np.stack([oracle_fill(m) for m in masks])
    ours = np.asarray(hole_fill.fill_holes(jnp.asarray(masks)))
    np.testing.assert_array_equal(ours, ref)


def test_full_pipeline_tpu_parity():
    from tpu_inspect import engine, oracle
    from tpu_inspect.config import DefectParams, SegmentationParams
    from tpu_inspect.synthetic import crop_units, make_mold_image, sample_grid_params

    grid = sample_grid_params()
    img = make_mold_image(grid, (3000, 4096), seed=7, defect_rate=0.5)
    seg_res, insp = engine.inspect_image(
        img, grid, SegmentationParams(), DefectParams(),
        exclusions=[{"shape": "circle", "cx": 160, "cy": 160, "r": 30}],
    )
    crops = crop_units(img, grid)
    ref_masks, _, _ = oracle.segment_all_units(
        crops, SegmentationParams(),
        exclusions=[{"shape": "circle", "cx": 160, "cy": 160, "r": 30}],
    )
    _, ref_areas, ref_verd = oracle.inspect_units(crops, ref_masks, DefectParams())
    np.testing.assert_array_equal(seg_res.masks, ref_masks)
    np.testing.assert_array_equal(insp.areas, ref_areas)
    np.testing.assert_array_equal(insp.verdicts, ref_verd)


def test_pallas_component_stats_parity():
    """largest_component on TPU (root-enumeration kernel) vs cv2, including
    the block-raster area tie-break and exact integer centroid sums."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops import cc

    rng = np.random.RandomState(0)
    for h, w in [(40, 44), (8, 128), (30, 200)]:
        fg = rng.rand(6, h, w) > 0.55
        fg[0] = False
        fg[0, 3:7, 0:3] = True     # tie: block (1,0)
        fg[0, 2:8, 28:30] = True   # tie: block (1,14) — cv2 picks the first
        mask, area, sx, sy, has = cc.largest_component_sums(jnp.asarray(fg))
        mask, area, sx, sy = map(np.asarray, (mask, area, sx, sy))
        for i in range(6):
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


def test_pallas_fused_label_stats_parity():
    """Fused label+stats kernel vs the split label/stats kernels (and the
    fused path is what largest_component_sums dispatches to on TPU)."""
    import jax.numpy as jnp

    from tpu_inspect.ops.cc_pallas import (
        component_stats_pallas,
        fused_stats_fits,
        label_components_pallas,
        largest_component_stats_pallas,
    )
    from tpu_inspect.synthetic import random_blob_mask

    rng = np.random.RandomState(7)
    for h, w in [(40, 44), (8, 128), (315, 316)]:
        fg = np.stack(
            [random_blob_mask(h, w, seed=s) > 0 for s in range(4)]
            + [rng.rand(h, w) > 0.5 for _ in range(2)]
        )
        fg[0] = False  # empty unit
        assert fused_stats_fits(fg.shape)
        fused = largest_component_stats_pallas(jnp.asarray(fg))
        labels = label_components_pallas(jnp.asarray(fg))
        split = component_stats_pallas(labels, h=h, w=w)
        for a, b in zip(fused, split):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_seg_tail_parity():
    """Fused morph+holefill+stats tail kernel vs the split ops on TPU."""
    import jax.numpy as jnp

    from tpu_inspect.config import SegmentationParams
    from tpu_inspect.engine import _blur_threshold, _morph_k, raw_segment
    from tpu_inspect.ops import cc
    from tpu_inspect.ops.fused_pallas import seg_tail_pallas, tail_fits
    from tpu_inspect.ops.morph_pallas import _close_open_stages
    from tpu_inspect.synthetic import random_blob_mask

    rng = np.random.RandomState(5)
    crops = rng.randint(0, 256, (6, 120, 130), dtype=np.uint8)
    seg = SegmentationParams().validated()
    assert tail_fits(crops.shape)
    x = jnp.asarray(crops)
    mask0 = _blur_threshold(x, seg)
    out, area, sx, sy, has, *_ = seg_tail_pallas(
        mask0, stages=_close_open_stages(_morph_k(seg)), fill=True
    )
    ref_mask = raw_segment(x, seg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_mask))
    _, a2, sx2, sy2, h2 = cc.largest_component_sums(ref_mask > 0)
    np.testing.assert_array_equal(np.asarray(area), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(sx2))
    np.testing.assert_array_equal(np.asarray(sy), np.asarray(sy2))
    np.testing.assert_array_equal(np.asarray(has), np.asarray(h2))

    # ROI form: erode + largest component
    masks = np.stack(
        [random_blob_mask(120, 130, seed=s, n_blobs=3) for s in range(6)]
    )
    for n in (0, 1, 6):
        stages = (
            (("erode", tuple((dy, -n, n) for dy in range(-n, n + 1))),)
            if n
            else ()
        )
        roi_u8, _, _, _, hasf, row_lo, row_hi, col_lo, col_hi = (
            seg_tail_pallas(
                jnp.asarray(masks), stages=stages, fill=False,
                out_largest=True,
            )
        )
        from tpu_inspect.ops import morphology

        sb = jnp.asarray(masks)
        if n:
            sb = morphology.erode_rect3(sb, n)
        ref_roi, _, _, ref_has = cc.largest_component(sb > 0)
        np.testing.assert_array_equal(np.asarray(roi_u8) > 0, np.asarray(ref_roi))
        np.testing.assert_array_equal(np.asarray(hasf), np.asarray(ref_has))
        rr = np.asarray(ref_roi)
        for i in range(rr.shape[0]):
            ys = np.nonzero(rr[i].any(axis=1))[0]
            lo = ys.min() if len(ys) else rr.shape[1]
            hi = ys.max() + 1 if len(ys) else 0
            assert int(np.asarray(row_lo)[i]) == lo
            assert int(np.asarray(row_hi)[i]) == hi
            xs = np.nonzero(rr[i].any(axis=0))[0]
            clo = xs.min() if len(xs) else rr.shape[2]
            chi = xs.max() + 1 if len(xs) else 0
            assert int(np.asarray(col_lo)[i]) == clo
            assert int(np.asarray(col_hi)[i]) == chi


def test_pallas_blob_select_parity():
    """Blob filter kernel vs the XLA sort-based path (forced by passing a
    traced min_area) across min/max sweeps."""
    import jax.numpy as jnp

    from tpu_inspect.ops import contour

    rng = np.random.RandomState(3)
    for h, w in [(40, 44), (31, 127)]:
        fg = rng.rand(5, h, w) > 0.8
        for i in range(5):
            for _ in range(5):
                y, x = rng.randint(0, h - 6), rng.randint(0, w - 6)
                fg[i, y : y + 5, x : x + 5] = True
        maxs = jnp.asarray(rng.randint(10, 2 * h * w, size=5), dtype=jnp.int32)
        for mn in (0, 2, 40):
            out_p, found_p = contour.filter_and_select(jnp.asarray(fg), mn, maxs)
            out_x, found_x = contour.filter_and_select(
                jnp.asarray(fg), jnp.int32(mn), maxs
            )
            np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))
            np.testing.assert_array_equal(np.asarray(found_p), np.asarray(found_x))

        # fused ROI-AND + 3x3-open head (the defect-path form)
        from tpu_inspect.ops import morphology
        from tpu_inspect.ops.blob_pallas import blob_filter_pallas

        roi = np.zeros((5, h, w), bool)
        for i in range(5):
            roi[i, 3 : h - 3, 4 : w - 4] = True
            roi[i, 6:9, 6:10] = False
        roi[4] = False
        for mn, pre_open in [(0, True), (8, False)]:
            out_f, area_f = blob_filter_pallas(
                jnp.asarray(fg.astype(np.uint8) * 255),
                maxs,
                min_x2=mn,
                roi=jnp.asarray(roi),
                pre_open=pre_open,
            )
            c = jnp.where(jnp.asarray(roi), jnp.asarray(fg.astype(np.uint8) * 255), jnp.uint8(0))
            if pre_open:
                c = morphology.morph_open(c, morphology.ellipse_se(3))
            out_x, _ = contour.filter_and_select(c > 0, jnp.int32(mn), maxs)
            np.testing.assert_array_equal(np.asarray(out_f) > 0, np.asarray(out_x))
            np.testing.assert_array_equal(
                np.asarray(area_f), np.asarray(out_x).sum(axis=(1, 2))
            )


def test_pallas_median_residual_mask_parity():
    """Direct parity for the fused median-residual kernel incl. degenerate
    thresholds (VERDICT round-1 item 6)."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.median_pallas import median_residual_mask_pallas

    imgs = np.random.RandomState(1).randint(0, 256, (3, 50, 57), dtype=np.uint8)
    for k in (3, 21):
        for thr in (0, 1, 24, 254, 255):
            ref = []
            for im in imgs:
                bg = cv2.medianBlur(im, k)
                resid = cv2.absdiff(im, bg)
                _, m = cv2.threshold(resid, thr, 255, cv2.THRESH_BINARY)
                ref.append(m)
            ours = np.asarray(median_residual_mask_pallas(jnp.asarray(imgs), k, thr))
            np.testing.assert_array_equal(ours, np.stack(ref), err_msg=f"k={k} thr={thr}")


def test_pallas_propagate_conn4_conn8():
    """propagate_pallas vs the XLA sweep fixpoint for both connectivities
    (VERDICT round-1 item 6), incl. w=128 tile boundary and h<8."""
    import jax.numpy as jnp

    from tpu_inspect.ops.flood_pallas import propagate_pallas
    from tpu_inspect.ops.hole_fill import _axis_sweep

    def xla_reach(seed, dom, conn8):
        import jax

        def dilate(m):
            p = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
            win = (1, 3, 3)
            out = jax.lax.reduce_window(
                p, False, jax.lax.bitwise_or, win, (1, 1, 1), "VALID"
            )
            if not conn8:
                # plus-shaped: row/col sweeps below handle it; dilate with
                # 4-neighborhood only
                out = (
                    m
                    | jnp.pad(m, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
                    | jnp.pad(m, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
                    | jnp.pad(m, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
                    | jnp.pad(m, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
                )
            return out

        def cond(c):
            return c[1]

        def body(c):
            r, _ = c
            new = dilate(r) & dom
            new = _axis_sweep(new, dom, axis=2)
            new = _axis_sweep(new, dom, axis=1)
            return new, (new != r).any()

        import jax.lax as lax

        r, _ = jax.lax.while_loop(cond, body, (seed & dom, jnp.bool_(True)))
        return r

    rng = np.random.RandomState(9)
    for h, w in [(45, 53), (16, 128), (6, 140)]:
        dom = rng.rand(4, h, w) > 0.35
        seed = (rng.rand(4, h, w) > 0.97) & dom
        for conn8 in (False, True):
            ours = np.asarray(propagate_pallas(jnp.asarray(seed), jnp.asarray(dom), conn8))
            ref = np.asarray(xla_reach(jnp.asarray(seed), jnp.asarray(dom), conn8))
            np.testing.assert_array_equal(ours, ref, err_msg=f"{h}x{w} conn8={conn8}")


def test_pallas_flood_tiled_parity():
    """Strip-tiled flood (planes beyond VMEM) vs a host BFS oracle,
    including a snaking corridor that forces many inter-strip reversals."""
    from collections import deque

    import jax.numpy as jnp

    from tpu_inspect.ops.flood_pallas import propagate_pallas_tiled

    def bfs(seed, dom, conn8):
        h, w = seed.shape
        reach = seed & dom
        q = deque(zip(*np.nonzero(reach)))
        dirs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if conn8:
            dirs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        while q:
            y, x = q.popleft()
            for dy, dx in dirs:
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and dom[ny, nx] and not reach[ny, nx]:
                    reach[ny, nx] = True
                    q.append((ny, nx))
        return reach

    rng = np.random.RandomState(0)
    cases = []
    for u, h, w, p in [(2, 333, 1000, 0.5), (3, 100, 300, 0.35)]:
        fg = rng.rand(u, h, w) < p
        free = ~fg
        border = np.zeros((u, h, w), bool)
        border[:, 0, :] = border[:, -1, :] = True
        border[:, :, 0] = border[:, :, -1] = True
        cases.append((border & free, free))
    h, w = 600, 512
    dom = np.zeros((h, w), bool)
    for i, r in enumerate(range(0, h, 40)):
        dom[r, :] = True
        if i % 2 == 0:
            dom[r : min(r + 41, h), w - 1] = True
        else:
            dom[r : min(r + 41, h), 0] = True
    seed = np.zeros((h, w), bool)
    seed[0, 0] = dom[0, 0] = True
    cases.append((seed[None], dom[None]))
    for seed, dom in cases:
        for conn8 in (False, True):
            ours = np.asarray(
                propagate_pallas_tiled(jnp.asarray(seed), jnp.asarray(dom), conn8)
            )
            ref = np.stack([bfs(seed[i], dom[i], conn8) for i in range(len(seed))])
            np.testing.assert_array_equal(ours, ref)


def test_large_unit_segmentation_parity():
    """BASELINE config 1: one whole-image 4096x3000 crop through the
    segmentation chain (tiled flood path) vs the OpenCV oracle."""
    import jax
    import jax.numpy as jnp

    from tpu_inspect import oracle
    from tpu_inspect.config import SegmentationParams
    from tpu_inspect.engine import raw_segment
    from tpu_inspect.synthetic import make_mold_image, sample_grid_params

    grid = sample_grid_params()
    image = make_mold_image(grid, (3000, 4096), seed=0, defect_rate=0.3)
    seg = SegmentationParams().validated()
    got = np.asarray(
        jax.jit(lambda a: raw_segment(a, seg))(jnp.asarray(image)[None])
    )[0]
    ref = oracle.segment_unit(image, seg)
    np.testing.assert_array_equal(got, ref)


def test_pallas_morph_chain_parity():
    """close_open / open / erode_rect Pallas chains vs the XLA morphology
    ops (which are bit-exact vs cv2.morphologyEx / cv2.erode)."""
    import jax.numpy as jnp

    from tpu_inspect.ops import morphology as M
    from tpu_inspect.ops.morph_pallas import (
        close_open_pallas,
        erode_rect_pallas,
        open_pallas,
    )

    rng = np.random.RandomState(0)
    for (u, h, w) in [(3, 50, 57), (2, 31, 128), (1, 9, 300), (2, 315, 316)]:
        x = (rng.rand(u, h, w) < 0.45).astype(np.uint8) * 255
        x[0, : min(5, h), :] = 255  # border-touching blob
        xd = jnp.asarray(x)
        for k in (3, 5, 9, 15):
            se = M.ellipse_se(k)
            np.testing.assert_array_equal(
                np.asarray(close_open_pallas(xd, k)),
                np.asarray(M.morph_open(M.morph_close(xd, se), se)),
            )
            np.testing.assert_array_equal(
                np.asarray(open_pallas(xd, k)),
                np.asarray(M.morph_open(xd, se)),
            )
        for n in (1, 6, 20):
            np.testing.assert_array_equal(
                np.asarray(erode_rect_pallas(xd, n)),
                np.asarray(M.erode_rect3(xd, n)),
            )


def test_pallas_border_seed_flood_parity():
    """propagate_pallas(border_seed=True) == explicit border-seed flood."""
    import jax.numpy as jnp

    from tpu_inspect.ops.flood_pallas import propagate_pallas

    rng = np.random.RandomState(1)
    for (u, h, w) in [(3, 40, 53), (2, 315, 316)]:
        fg = rng.rand(u, h, w) < 0.55
        free = jnp.asarray(~fg)
        border = np.zeros((u, h, w), bool)
        border[:, 0, :] = border[:, h - 1, :] = True
        border[:, :, 0] = border[:, :, w - 1] = True
        seed = jnp.asarray(border) & free
        ref = np.asarray(propagate_pallas(seed, free, conn8=False))
        got = np.asarray(
            propagate_pallas(None, free, conn8=False, border_seed=True)
        )
        np.testing.assert_array_equal(got, ref)


def test_pallas_median_row_bounds():
    """Row-bounded median-residual: rows inside [lo, hi) match the full
    kernel (rows outside are unwritten by contract — the defect path masks
    them with the ROI)."""
    import jax.numpy as jnp

    from tpu_inspect.ops.median_pallas import median_residual_mask_pallas

    rng = np.random.RandomState(3)
    x = rng.randint(0, 256, (4, 60, 70), dtype=np.uint8)
    lo = jnp.asarray(np.array([5, 0, 20, 0], np.int32))
    hi = jnp.asarray(np.array([50, 60, 20, 0], np.int32))  # incl. empty
    full = np.asarray(median_residual_mask_pallas(jnp.asarray(x), 21, 24))
    got = np.asarray(
        median_residual_mask_pallas(jnp.asarray(x), 21, 24, row_lo=lo, row_hi=hi)
    )
    for i, (a, b) in enumerate(zip(np.asarray(lo), np.asarray(hi))):
        np.testing.assert_array_equal(got[i, a:b], full[i, a:b])


def test_pallas_median_large_k():
    """Regression: the packed dual rank query must hold cdf counts up to
    k*k (k=33 silently overflowed a 10-bit field); k > 45 is rejected."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.median_pallas import median_residual_mask_pallas

    rng = np.random.RandomState(5)
    x = rng.randint(0, 256, (2, 60, 70), dtype=np.uint8)
    for k in (33, 45):
        ref = np.stack(
            [
                (cv2.absdiff(im, cv2.medianBlur(im, k)) > 24).astype(np.uint8)
                * 255
                for im in x
            ]
        )
        got = np.asarray(median_residual_mask_pallas(jnp.asarray(x), k, 24))
        np.testing.assert_array_equal(got, ref)
    with pytest.raises(AssertionError):
        median_residual_mask_pallas(jnp.asarray(x), 47, 24)


def test_whole_image_defect_parity():
    """Defect pass on a crop too big for whole-batch VMEM residency: the
    strip-tiled median path (engine gate median_fits_tiled) vs the oracle."""
    import jax.numpy as jnp

    from tpu_inspect import oracle
    from tpu_inspect.config import DefectParams, SegmentationParams
    from tpu_inspect.engine import detect_defects_batch, raw_segment
    from tpu_inspect.synthetic import make_mold_image, sample_grid_params

    grid = sample_grid_params()
    image = np.asarray(make_mold_image(grid, (3000, 4096), seed=1,
                                       defect_rate=1.0))[:700, :4096]
    seg = SegmentationParams().validated()
    dfp = DefectParams().validated()
    seg_mask = np.asarray(
        raw_segment(jnp.asarray(image)[None], seg)
    )
    insp = detect_defects_batch(image[None], seg_mask, dfp)
    o_dm = oracle.detect_defects(image, seg_mask[0], dfp)
    if o_dm is None:
        assert not bool(insp.valid[0])
    else:
        assert bool(insp.valid[0])
        np.testing.assert_array_equal(insp.defect_masks[0], o_dm)


def test_canny_whole_image_tiled_path():
    """canny_u8 on a crop beyond the resident flood budget: hysteresis takes
    the strip-tiled propagate (ops/canny.py _propagate8) and must stay
    cv2-exact (indexing_ui.py:1536-1539 semantics)."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.canny import canny_u8
    from tpu_inspect.ops.flood_pallas import flood_fits, flood_fits_tiled

    shape = (1, 700, 1024)
    assert not flood_fits(shape), "shape no longer exercises the tiled path"
    assert flood_fits_tiled(shape)
    rng = np.random.RandomState(11)
    base = rng.randint(0, 60, (700, 1024)).astype(np.uint8)
    base[140:420, 200:800] += 120  # strong structure spanning strips
    base[500:, 100:300] += rng.randint(0, 90, (200, 200)).astype(np.uint8)
    for thr in (24, 80):
        lo, hi = max(1, thr // 2), max(2, thr)
        ours = np.asarray(canny_u8(jnp.asarray(base[None]), lo, hi))[0]
        ref = cv2.Canny(base, lo, hi)
        np.testing.assert_array_equal(ours, ref, err_msg=f"thr={thr}")


def test_label_components_whole_image_tile_seeded():
    """label_components beyond the resident budget (tile-seeded init path)
    vs cv2 connected components: identical partition with raster-first
    root values."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops import cc

    rng = np.random.RandomState(13)
    h, w = 700, 1024
    fg = (rng.rand(h, w) > 0.52).astype(np.uint8)
    fg[::9, :] = 1  # long structures spanning every tile
    fg[4::9, ::3] = 0
    got = np.asarray(cc.label_components(jnp.asarray(fg[None] > 0)))[0]
    n, lab = cv2.connectedComponents(fg, connectivity=8)
    yy, xx = np.mgrid[0:h, 0:w]
    lin = yy * w + xx
    roots = np.full(n, cc._BIG, np.int64)
    np.minimum.at(roots, lab[fg > 0], lin[fg > 0])
    expect = roots[lab]
    np.testing.assert_array_equal(got[fg > 0], expect[fg > 0])
    assert (got[fg == 0] == cc._BIG).all()


def test_largest_component_whole_image_stats():
    """largest_component_sums beyond the resident budget (tile-seeded
    labels + sort-free ring aggregation dispatch) vs cv2 stats."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops import cc

    rng = np.random.RandomState(14)
    h, w = 700, 1024
    fg = np.zeros((h, w), np.uint8)
    # blobby mold-like structures + specks
    fg[80:600, 100:900] = (rng.rand(520, 800) > 0.25).astype(np.uint8)
    fg[650:680, 40:980] = 1
    mask, area, sx, sy, has = (
        np.asarray(v)
        for v in cc.largest_component_sums(jnp.asarray(fg[None] > 0))
    )
    n, lab, stats, _ = cv2.connectedComponentsWithStats(fg, connectivity=8)
    assert n > 1 and bool(has[0])
    best = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
    np.testing.assert_array_equal(mask[0], lab == best)
    ys, xs = np.nonzero(lab == best)
    assert int(area[0]) == len(xs)
    assert int(sx[0]) == int(xs.sum()) and int(sy[0]) == int(ys.sum())


def test_filter_and_select_whole_image_tiled_green():
    """filter_and_select beyond the int32 Green's-sum budget (tiled
    per-component aggregation: per-tile segmented sorts + boundary-ring
    table, no searchsorted/scatter loops) vs cv2 RETR_EXTERNAL filtering
    on hardware."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops import contour

    rng = np.random.RandomState(15)
    h, w = 750, 900  # forces the tiled branch: (nv+1)*2*bias >= 2^31
    m = np.zeros((h, w), np.uint8)
    for _ in range(60):
        y, x = rng.randint(0, h - 40), rng.randint(0, w - 40)
        m[y : y + rng.randint(2, 36), x : x + rng.randint(2, 36)] = 255
    m[100:690, 450:452] = 255  # tall thin blob crossing many tile rows
    m[380:384, 20:880] = 255   # wide blob crossing many tile cols
    for lo, hi in [(0, 10**9), (30, 4000)]:
        ref = np.zeros_like(m)
        cnts, _ = cv2.findContours(
            m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        for c in cnts:
            if lo <= cv2.contourArea(c) <= hi:
                cv2.drawContours(ref, [c], -1, 255, -1)
        out, found = contour.filter_and_select(
            jnp.asarray(m[None] > 0),
            jnp.int32(2 * lo),
            jnp.asarray([min(2 * hi, 2**30)], jnp.int32),
        )
        np.testing.assert_array_equal(
            np.asarray(out)[0].astype(np.uint8) * 255, ref,
            err_msg=f"lo={lo} hi={hi}",
        )
        assert bool(np.asarray(found)[0]) == bool(ref.any())


def test_median_col_window_narrow_and_fallback():
    """The defect pass's per-unit 256-wide ROI column window (engine.
    _candidate_mask): narrow-ROI masks take the windowed median kernel,
    full-width ROIs the fallback — both must match the oracle exactly."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect import oracle
    from tpu_inspect.config import DefectParams
    from tpu_inspect.engine import _defect_device

    rng = np.random.RandomState(11)
    u, h, w = 16, 315, 316
    crops = rng.randint(0, 256, (u, h, w), dtype=np.uint8)
    params = DefectParams().validated()

    for span, name in (((40, 200), "narrow"), ((2, 314), "full-width")):
        masks = np.zeros((u, h, w), np.uint8)
        # solid ROI block per unit, offset per unit, spanning `span` cols
        for i in range(u):
            c0 = span[0] + (i % 3) * 5
            masks[i, 30 : h - 30, c0 : span[1]] = 255
        out, found, area, verdict = _defect_device(
            jnp.asarray(crops), jnp.asarray(masks), params=params
        )
        _, ref_areas, ref_verd = oracle.inspect_units(crops, masks, params)
        np.testing.assert_array_equal(np.asarray(area), ref_areas, err_msg=name)
        np.testing.assert_array_equal(np.asarray(verdict), ref_verd, err_msg=name)
        ref_masks = [
            oracle.detect_defects(crops[i], masks[i], params) for i in range(u)
        ]
        got = np.asarray(out)
        for i in range(u):
            exp = ref_masks[i] if ref_masks[i] is not None else np.zeros((h, w), np.uint8)
            np.testing.assert_array_equal(got[i], exp, err_msg=f"{name} unit {i}")


def test_pallas_median_cdfx_variant_parity():
    """The cdfx rank-query variant (cumulative histograms + binary-select
    cdf extraction — the round-5 production path) vs cv2 and vs the base
    variant, on hardware at the production chunk."""
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.median_pallas import median_residual_mask_pallas

    imgs = np.random.RandomState(9).randint(
        0, 256, (48, 60, 256), dtype=np.uint8
    )
    for k, thr in ((21, 24), (3, 0), (9, 255)):
        ref = []
        for im in imgs:
            bg = cv2.medianBlur(im, k)
            resid = cv2.absdiff(im, bg)
            _, m = cv2.threshold(resid, thr, 255, cv2.THRESH_BINARY)
            ref.append(m)
        ours = np.asarray(
            median_residual_mask_pallas(
                jnp.asarray(imgs), k, thr, chunk=24, variant="cdfx"
            )
        )
        np.testing.assert_array_equal(
            ours, np.stack(ref), err_msg=f"cdfx k={k} thr={thr}"
        )


def test_pallas_seg_roi_chained_parity():
    """The chained seg+zone+roi paired kernel (round 5) vs the split
    kernels + XLA zone masking, on hardware (even width -> the 2x2-block
    BBDT labeling path)."""
    import jax.numpy as jnp

    from tpu_inspect.ops import threshold
    from tpu_inspect.ops.fused_pallas import (
        seg_roi_tail_paired_pallas,
        seg_tail_paired_pallas,
    )
    from tpu_inspect.ops.gaussian import gaussian_blur_u8
    from tpu_inspect.ops.morph_pallas import _close_open_stages

    rng = np.random.RandomState(13)
    u, h, w = 6, 80, 90
    crops = rng.randint(0, 256, (u, h, w), dtype=np.uint8)
    x = gaussian_blur_u8(jnp.asarray(crops), 3)
    thr = threshold.otsu_threshold(x)
    stages = _close_open_stages(3)
    n = 4
    roi_stages = (
        ("erode", tuple((dy, -n, n) for dy in range(-n, n + 1))),
    )
    zone = np.zeros((h, w), np.uint8)
    zone[20:50, 30:70] = 1

    smask, sarea, ssx, ssy, shas, *_ = seg_tail_paired_pallas(
        x, stages=stages, fill=True, thr=thr
    )
    post = np.where(zone[None] > 0, 0, np.asarray(smask)).astype(np.uint8)
    rmask, rarea, _, _, rhas, rl, rh, cl, ch = seg_tail_paired_pallas(
        jnp.asarray(post), stages=roi_stages, fill=False, out_largest=True
    )
    got = seg_roi_tail_paired_pallas(
        x, stages, roi_stages, thr, zone=jnp.asarray(zone), use_zone=True
    )
    refs = (post, sarea, ssx, ssy, shas, rmask, rarea, rhas, rl, rh, cl, ch)
    for i, (r, g) in enumerate(zip(refs, got)):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(g), err_msg=f"chained out {i}"
        )
