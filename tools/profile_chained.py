"""Per-op device profile of the CHAINED steady-state loop (bench.py's
methodology): traces one chained-N dispatch and reports per-op totals
divided by N — the attribution that matches the tracked metric exactly.

Usage: python tools/profile_chained.py [--n N] [--top K]
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
    n = int(args[args.index("--n") + 1]) if "--n" in args else 16
    top = int(args[args.index("--top") + 1]) if "--top" in args else 30
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

    def chained(img):
        def body(i, carry):
            img_c, acc = carry
            o = engine._inspect_image_device(img_c, *fargs[1:], **kw)
            v, a = o[4][3], o[4][2]
            bump = (a.sum(dtype=jnp.int32) & 1).astype(jnp.uint8)
            return img_c ^ bump, acc + v.sum(dtype=jnp.int32)

        _, acc = jax.lax.fori_loop(0, n, body, (img, jnp.int32(0)))
        return acc

    print(f"compiling on {jax.devices()[0]} ...", file=sys.stderr)
    fc = jax.jit(chained)
    int(np.asarray(fc(fargs[0])))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(np.asarray(fc(fargs[0])))
        times.append((time.perf_counter() - t0) * 1000.0 / n)
    print(f"chained steady-state: {np.median(times):.2f} ms/image "
          f"(min {min(times):.2f})")

    with tempfile.TemporaryDirectory(prefix="tin_prof") as d:
        with jax.profiler.trace(d):
            int(np.asarray(fc(fargs[0])))
        totals = xprof.device_op_totals(d)
    ranked = sorted(totals.items(), key=lambda kv: kv[1], reverse=True)
    total = sum(totals.values()) / n
    print(f"device time: {total:.2f} ms/image over chained x{n}")
    for name, ms in ranked[:top]:
        print(f"  {ms / n:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
