"""Sweep chunk x unroll of the col-window median-residual kernel on HW.

Mimics the engine's production call exactly: 256-wide column window around
the ROI union, ROI row bounds, chained-32 steady state. Also checks each
variant's output equals the chunk=8/unroll=1 production output.

Usage: python tools/median_sweep.py [chunk,unroll ...]   (default sweep)
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
    _defect_roi_full, _segment_device, pack_exclusions,
)
from tpu_inspect.ops.median_pallas import median_residual_mask_pallas
from tpu_inspect.synthetic import crop_units, standard_workload


def main():
    wl = standard_workload()
    seg = SegmentationParams().validated()
    defect = DefectParams().validated()
    crops = jnp.asarray(crop_units(np.asarray(wl["image"]), wl["grid"]))
    u, h, w = crops.shape
    rects, circles = pack_exclusions(wl["exclusions"])
    mask, *_ = _segment_device(
        crops, jnp.asarray(rects), jnp.asarray(circles),
        jnp.asarray(wl["ref_centroids"]), jnp.asarray(wl["ref_valid"]),
        seg=seg, is_reference=True, shape_hw=(h, w),
    )
    roi, roi_empty, roi_area, row_lo, row_hi, col_lo, col_hi = (
        _defect_roi_full(mask, int(defect.erode_px))
    )
    W = 256
    r = 10
    lo_all = int(jnp.min(col_lo))
    hi_all = int(jnp.max(col_hi))
    start = max(0, min(lo_all - r, w - W))
    assert hi_all - lo_all <= W - 2 * r, "window does not fit"
    sl = jax.lax.dynamic_slice(crops, (0, 0, start), (u, h, W))
    jax.block_until_ready((sl, row_lo, row_hi))
    thr = int(defect.threshold)

    ref = None
    variants = []
    for a in sys.argv[1:]:
        c, v = a.split(",")
        variants.append((int(c), v))
    if not variants:
        variants = [(8, "base"), (24, "base"), (24, "qdirect")]

    for chunk, variant in variants:
        fn = lambda c: median_residual_mask_pallas(
            c, 21, thr, row_lo=row_lo, row_hi=row_hi,
            chunk=chunk, variant=variant,
        )
        try:
            out = jax.block_until_ready(fn(sl))
        except Exception as e:  # noqa: BLE001
            print(f"chunk={chunk} {variant}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        if ref is None:
            ref = np.asarray(out)
            # rows outside [row_lo, row_hi) are unwritten: compare only
            # written rows
            rl, rh = np.asarray(row_lo), np.asarray(row_hi)
            sel = np.zeros(out.shape, bool)
            for i in range(u):
                sel[i, rl[i]:rh[i]] = True
            ref_sel = ref[sel]
        else:
            same = bool((np.asarray(out)[sel] == ref_sel).all())
            if not same:
                print(f"chunk={chunk} {variant}: MISMATCH")
                continue

        def chained(a, fn=fn):
            def body(i, c):
                o = fn(c)
                bump = (o[0, 0, 0] & 1).astype(jnp.uint8)
                return c ^ bump
            return jax.lax.fori_loop(0, 32, body, a)

        fc = jax.jit(chained)
        t0 = time.perf_counter()
        jax.block_until_ready(fc(sl))
        comp = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fc(sl))
            times.append((time.perf_counter() - t0) * 1000 / 32)
        print(
            f"chunk={chunk:2d} {variant:8s}: "
            f"{np.median(times):6.3f} ms/call (min {min(times):.3f}, "
            f"compile {comp:.0f}s)"
        )


if __name__ == "__main__":
    main()
