"""Attribute seg_tail/roi_tail kernel time to its internal stages on HW.

Times seg_tail_pallas with pieces progressively enabled, on the exact
production inputs (blurred planes + Otsu thresholds for the seg tail; the
post-exclusion seg masks for the roi tail). Differences between steps
attribute the cost of morph / fill / label fixpoint / largest-stats.

Usage: python tools/tail_split.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_inspect.config import DefectParams, SegmentationParams
from tpu_inspect.engine import (
    _segment_device, gaussian_blur_u8, pack_exclusions,
)
from tpu_inspect.ops import threshold
from tpu_inspect.ops.fused_pallas import seg_tail_pallas
from tpu_inspect.ops.morph_pallas import _close_open_stages
from tpu_inspect.synthetic import crop_units, standard_workload
from tpu_inspect.ops.common import as_odd


def timeit(name, fn, x, n=32, reps=3):
    def chained(a):
        def body(i, c):
            out = fn(c)
            leaves = jax.tree_util.tree_leaves(out)
            acc = jnp.int32(0)
            for l in leaves:
                sl = l[(slice(0, 1),) * l.ndim]
                acc = acc + sl.reshape(()).astype(jnp.int32)
            bump = (acc & 1).astype(jnp.uint8)
            return c ^ bump
        return jax.lax.fori_loop(0, n, body, a)

    fc = jax.jit(chained)
    t0 = time.perf_counter()
    jax.block_until_ready(fc(x))
    comp = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fc(x))
        times.append((time.perf_counter() - t0) * 1000.0 / n)
    print(f"{name:36s} {np.median(times):7.3f} ms (min {min(times):.3f}, "
          f"compile {comp:.0f}s)")
    return float(np.median(times))


def main():
    wl = standard_workload()
    seg = SegmentationParams().validated()
    defect = DefectParams().validated()
    crops = jnp.asarray(crop_units(np.asarray(wl["image"]), wl["grid"]))
    u, h, w = crops.shape
    blurred = gaussian_blur_u8(crops, as_odd(seg.gaussian_blur))
    thr = threshold.otsu_threshold(blurred)
    stages = _close_open_stages(seg.morph_kernel)

    rects, circles = pack_exclusions(wl["exclusions"])
    masks, *_ = _segment_device(
        crops, jnp.asarray(rects), jnp.asarray(circles),
        jnp.asarray(wl["ref_centroids"]), jnp.asarray(wl["ref_valid"]),
        seg=seg, is_reference=True, shape_hw=(h, w),
    )
    n_ero = int(defect.erode_px)
    ero = (("erode", tuple((dy, -n_ero, n_ero) for dy in range(-n_ero, n_ero + 1))),)
    jax.block_until_ready((blurred, thr, masks))
    print(f"workload: {u} units of {h}x{w}")

    timeit("seg: thr only", lambda b: seg_tail_pallas(
        b, stages=(), fill=False, thr=thr), blurred)
    timeit("seg: thr+morph", lambda b: seg_tail_pallas(
        b, stages=stages, fill=False, thr=thr), blurred)
    timeit("seg: thr+morph+fill", lambda b: seg_tail_pallas(
        b, stages=stages, fill=True, thr=thr), blurred)
    timeit("roi: largest only", lambda m: seg_tail_pallas(
        m, stages=(), fill=False, out_largest=True), masks)
    timeit("roi: erode+largest (prod)", lambda m: seg_tail_pallas(
        m, stages=ero, fill=False, out_largest=True), masks)


if __name__ == "__main__":
    main()
