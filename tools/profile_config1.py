"""Per-op device profile of the whole-image (config1/config1defect) chain.

Mirrors `bench.py config1defect` under jax.profiler.trace and aggregates
per-op device time with the first-party xplane reader — the attribution rig
that drove the 836 -> 198 ms sequence (PERF.md).

Usage: python tools/profile_config1.py [seg|defect] [iters]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_inspect.config import DefectParams, SegmentationParams
from tpu_inspect.engine import _defect_device, raw_segment
from tpu_inspect.synthetic import standard_workload
from tpu_inspect.utils import xprof


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "defect"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    image = standard_workload()["image"]
    seg = SegmentationParams().validated()
    defect = DefectParams().validated()

    def step(a):
        m = raw_segment(a, seg)
        if which == "seg":
            return m
        return _defect_device(a, m, params=defect)

    x = jnp.asarray(image)[None]
    f = jax.jit(step)
    print("compiling...", file=sys.stderr)
    jax.block_until_ready(f(x))
    with tempfile.TemporaryDirectory(prefix="tin_prof") as d:
        with jax.profiler.trace(d):
            for _ in range(iters):
                jax.block_until_ready(f(x))
        totals = xprof.device_op_totals(d)
    ranked = sorted(totals.items(), key=lambda kv: kv[1], reverse=True)
    total = sum(totals.values()) / iters
    print(f"device time: {total:.2f} ms/iter over {iters} iters")
    for name, ms in ranked[:40]:
        print(f"  {ms / iters:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
