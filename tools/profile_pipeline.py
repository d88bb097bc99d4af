"""Per-op device profile of the 48-unit pipeline, with A/B toggles.

Usage: python tools/profile_pipeline.py [--no-colwin] [--iters N] [--top N]
       [--chained]

Mirrors `cli profile` but adds experiment switches (e.g. disabling the
median ROI column window) and an optional chained-loop mode that matches
bench.py's steady-state measurement exactly.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tpu_inspect.config import DefectParams, SegmentationParams
from tpu_inspect import engine
from tpu_inspect.synthetic import standard_workload
from tpu_inspect.utils import xprof


def main():
    args = sys.argv[1:]
    iters = int(args[args.index("--iters") + 1]) if "--iters" in args else 8
    top = int(args[args.index("--top") + 1]) if "--top" in args else 25
    if "--no-colwin" in args:
        engine._MEDIAN_COL_WINDOW = 10**9  # w > W never holds -> full width
        print("colwin DISABLED", file=sys.stderr)
    wl = standard_workload()
    kw = dict(
        seg=SegmentationParams().validated(),
        defect=DefectParams().validated(),
        is_reference=True,
        unit_hw=wl["unit_hw"],
        with_defects=True,
    )
    fargs = (
        jnp.asarray(wl["image"]),
        jnp.asarray(wl["origins"]),
        jnp.asarray(wl["rects"]),
        jnp.asarray(wl["circles"]),
        jnp.asarray(wl["ref_centroids"]),
        jnp.asarray(wl["ref_valid"]),
    )
    print(f"compiling on {jax.devices()[0]} ...", file=sys.stderr)
    jax.block_until_ready(engine._inspect_image_device(*fargs, **kw))

    # chained steady-state (bench.py methodology)
    N = 32

    def chained(img):
        def body(i, carry):
            img_c, acc = carry
            o = engine._inspect_image_device(img_c, *fargs[1:], **kw)
            v, a = o[4][3], o[4][2]
            bump = (a.sum(dtype=jnp.int32) & 1).astype(jnp.uint8)
            return img_c ^ bump, acc + v.sum(dtype=jnp.int32)

        _, acc = jax.lax.fori_loop(0, N, body, (img, jnp.int32(0)))
        return acc

    fc = jax.jit(chained)
    int(np.asarray(fc(fargs[0])))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(np.asarray(fc(fargs[0])))
        times.append((time.perf_counter() - t0) * 1000.0 / N)
    print(f"chained steady-state: {np.median(times):.2f} ms/image "
          f"(min {min(times):.2f})")

    with tempfile.TemporaryDirectory(prefix="tin_prof") as d:
        with jax.profiler.trace(d):
            for _ in range(iters):
                jax.block_until_ready(engine._inspect_image_device(*fargs, **kw))
        totals = xprof.device_op_totals(d)
    ranked = sorted(totals.items(), key=lambda kv: kv[1], reverse=True)
    total = sum(totals.values()) / iters
    print(f"device time: {total:.2f} ms/iter over {iters} iters")
    for name, ms in ranked[:top]:
        print(f"  {ms / iters:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
