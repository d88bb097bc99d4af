"""Per-kernel device micro-bench on the standard 48-unit workload.

Times each hot Pallas kernel standalone with a chained fori_loop (data-
dependent across iterations so XLA cannot hoist), reporting ms/call. This
is the measurement rig behind the PERF.md per-stage attributions: the
pipeline profile (cli profile) gives per-op truth, this gives controlled
A/B deltas when reworking one kernel.

Usage: python tools/kernel_bench.py [median blob seg roi ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, x, n=32, reps=3):
    """Chained-n steady state of fn(x)->array-tree; prints ms/call."""

    def chained(a):
        def body(i, c):
            out = fn(c)
            leaves = jax.tree_util.tree_leaves(out)
            acc = jnp.int32(0)
            for l in leaves:
                # depend on a tiny slice only: a full-plane sum per output
                # costs ~1 ms and would swamp the kernel under test (Pallas
                # calls are opaque, so partial-output use cannot DCE them)
                sl = l[(slice(0, 1),) * l.ndim]
                acc = acc + sl.reshape(()).astype(jnp.int32)
            bump = (acc & 1).astype(a.dtype)
            return c ^ bump if a.dtype in (jnp.uint8, jnp.int32) else c
        return jax.lax.fori_loop(0, n, body, a)

    fc = jax.jit(chained)
    t0 = time.perf_counter()
    jax.block_until_ready(fc(x))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fc(x))
        times.append((time.perf_counter() - t0) * 1000.0 / n)
    print(f"{name:28s} {np.median(times):8.3f} ms/call  (min {min(times):.3f}, compile {compile_s:.1f}s)")
    return float(np.median(times))


def main(which):
    from tpu_inspect.config import DefectParams, SegmentationParams
    from tpu_inspect.engine import (
        _defect_roi_full,
        _segment_device,
        exclusion_zone,
        pack_exclusions,
    )
    from tpu_inspect.ops.gaussian import gaussian_blur_u8
    from tpu_inspect.ops import threshold
    from tpu_inspect.synthetic import crop_units, standard_workload

    wl = standard_workload()
    seg = SegmentationParams().validated()
    defect = DefectParams().validated()
    crops = jnp.asarray(crop_units(np.asarray(wl["image"]), wl["grid"]))
    u, h, w = crops.shape
    print(f"workload: {u} units of {h}x{w}", file=sys.stderr)

    # intermediates (computed once, device-resident)
    blurred = gaussian_blur_u8(crops, 3)
    thr = threshold.otsu_threshold(blurred)
    rects, circles = pack_exclusions(wl["exclusions"])
    mask, sums, has_fg, shifts = _segment_device(
        crops, jnp.asarray(rects), jnp.asarray(circles),
        jnp.asarray(wl["ref_centroids"]), jnp.asarray(wl["ref_valid"]),
        seg=seg, is_reference=True, shape_hw=(h, w),
    )
    roi, roi_empty, roi_area, row_lo, row_hi, col_lo, col_hi = (
        _defect_roi_full(mask, int(defect.erode_px))
    )
    from tpu_inspect.ops.median_pallas import median_residual_mask_pallas
    cand = median_residual_mask_pallas(
        crops, 21, int(defect.threshold), row_lo=row_lo, row_hi=row_hi
    )
    max_x2 = jnp.maximum(
        jnp.int32(2 * defect.min_area),
        2 * jnp.floor(roi_area.astype(jnp.float64) * 0.98).astype(jnp.int32),
    )
    jax.block_until_ready((cand, roi, max_x2))

    res = {}
    if "median" in which:
        fn = lambda c: median_residual_mask_pallas(
            c, 21, int(defect.threshold), row_lo=row_lo, row_hi=row_hi
        )
        res["median"] = timeit("median_residual(roi rows)", fn, crops)
    if "median_full" in which:
        fn = lambda c: median_residual_mask_pallas(c, 21, int(defect.threshold))
        res["median_full"] = timeit("median_residual(all rows)", fn, crops)
    if "blob" in which:
        from tpu_inspect.ops.blob_pallas import blob_filter_pallas
        fn = lambda c: blob_filter_pallas(
            c, max_x2, min_x2=2 * int(defect.min_area), roi=roi, pre_open=True
        )
        res["blob"] = timeit("blob_filter(roi+open)", fn, cand)
    if "seg" in which:
        from tpu_inspect.ops.fused_pallas import seg_tail_pallas
        from tpu_inspect.ops.morph_pallas import _close_open_stages
        stages = _close_open_stages(3)
        fn = lambda c: seg_tail_pallas(
            c, stages=stages, fill=True, out_largest=False, thr=thr
        )
        res["seg"] = timeit("seg_tail(morph+fill+cc)", fn, blurred)
    if "roi" in which:
        from tpu_inspect.ops.fused_pallas import seg_tail_pallas
        n = int(defect.erode_px)
        stages = (("erode", tuple((dy, -n, n) for dy in range(-n, n + 1))),)
        fn = lambda c: seg_tail_pallas(
            c, stages=stages, fill=False, out_largest=True
        )
        res["roi"] = timeit("roi_tail(erode+cc)", fn, mask)
    if "segparts" in which:
        # ablations via the public params: attribute seg_tail's time to
        # morph / flood / label+stats (each variant omits one piece)
        from tpu_inspect.ops.fused_pallas import seg_tail_pallas
        from tpu_inspect.ops.morph_pallas import _close_open_stages
        stages = _close_open_stages(3)
        res["seg_nomorph"] = timeit(
            "seg_tail(no morph)",
            lambda c: seg_tail_pallas(c, stages=(), fill=True, thr=thr),
            blurred,
        )
        res["seg_nofill"] = timeit(
            "seg_tail(no flood)",
            lambda c: seg_tail_pallas(c, stages=stages, fill=False, thr=thr),
            blurred,
        )
        res["seg_bare"] = timeit(
            "seg_tail(label+stats only)",
            lambda c: seg_tail_pallas(c, stages=(), fill=False, thr=thr),
            blurred,
        )
    if "gauss" in which:
        res["gauss"] = timeit("gaussian_blur_u8(k3)", lambda c: gaussian_blur_u8(c, 3), crops)
    if "otsu" in which:
        res["otsu_hist"] = timeit("otsu histogram", threshold.histogram_u8, blurred)
        res["otsu"] = timeit("otsu hist+scan", threshold.otsu_threshold, blurred)
    if "zone" in which:
        dx = jnp.zeros((u,), jnp.int32)
        fn = lambda m: jnp.where(
            exclusion_zone((h, w), jnp.asarray(rects), jnp.asarray(circles), dx, dx),
            jnp.uint8(0), m)
        res["zone"] = timeit("exclusion_zone+apply", fn, mask)
    print({k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    which = sys.argv[1:] or [
        "median", "blob", "seg", "roi", "gauss", "otsu", "zone"
    ]
    main(which)
