"""Exclusive (self-time) per-op device profile of the chained loop.

The "XLA Ops" device line nests control-flow ops (while/conditional bodies
appear inside their parent's span), so inclusive totals double-count.
This tool re-parses events WITH offsets, reconstructs the nesting per line
from span containment, and reports exclusive self-times — what each op
actually occupies on the device timeline.

Usage: python tools/profile_selftime.py [--n N] [--top K]
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
from tpu_inspect.utils.xprof import _fields


def _parse_event_full(buf: bytes):
    mid = off = dur = 0
    for fno, _, val in _fields(buf):
        if fno == 1:
            mid = val
        elif fno == 2:
            off = val
        elif fno == 3:
            dur = val
    return mid, off, dur


def _events_with_offsets(path: str):
    """[(plane_name, line_label, [(name, off_ps, dur_ps), ...])]"""
    out = []
    with open(path, "rb") as f:
        buf = f.read()
    for fno, _, val in _fields(buf):
        if fno != 1:
            continue
        # plane
        name = ""
        lines = []
        event_names = {}
        for f2, _, v2 in _fields(val):
            if f2 == 2:
                name = v2.decode("utf-8", "replace")
            elif f2 == 3:
                lname = ""
                ldisp = ""
                evs = []
                for f3, _, v3 in _fields(v2):
                    if f3 == 2:
                        lname = v3.decode("utf-8", "replace")
                    elif f3 == 11:
                        ldisp = v3.decode("utf-8", "replace")
                    elif f3 == 4:
                        evs.append(_parse_event_full(v3))
                lines.append((ldisp or lname, evs))
            elif f2 == 4:
                key = None
                meta = None
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        key = v3
                    elif f3 == 2:
                        mid = 0
                        mname = mdisp = ""
                        for f4, _, v4 in _fields(v3):
                            if f4 == 1:
                                mid = v4
                            elif f4 == 2:
                                mname = v4.decode("utf-8", "replace")
                            elif f4 == 4:
                                mdisp = v4.decode("utf-8", "replace")
                        meta = (mid, mdisp or mname)
                if meta is not None:
                    event_names[key if key is not None else meta[0]] = meta[1]
        out.append(
            (
                name,
                [
                    (
                        label,
                        [
                            (event_names.get(mid, f"op#{mid}"), off, dur)
                            for mid, off, dur in evs
                        ],
                    )
                    for label, evs in lines
                ],
            )
        )
    return out


def self_time_totals(trace_dir: str) -> dict[str, float]:
    files = xprof.find_xplane_files(trace_dir)
    if not files:
        return {}
    totals: dict[str, float] = {}
    for plane_name, lines in _events_with_offsets(files[0]):
        if "/device:TPU" not in plane_name and not any(
            lbl == "XLA Ops" for lbl, _ in lines
        ):
            continue
        for label, evs in lines:
            if label != "XLA Ops":
                continue
            # sort by start asc, end desc so parents precede children
            evs = sorted(evs, key=lambda e: (e[1], -(e[1] + e[2])))
            stack = []  # (end_ps, child_dur_accum_index)
            child_dur = []
            for i, (name, off, dur) in enumerate(evs):
                end = off + dur
                while stack and off >= stack[-1][0]:
                    stack.pop()
                if stack:
                    child_dur[stack[-1][1]] += dur
                stack.append((end, i))
                child_dur.append(0)
            for (name, off, dur), cd in zip(evs, child_dur):
                totals[name] = totals.get(name, 0.0) + max(0, dur - cd) / 1e9
    return totals


def main():
    args = sys.argv[1:]
    n = int(args[args.index("--n") + 1]) if "--n" in args else 16
    top = int(args[args.index("--top") + 1]) if "--top" in args else 40
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
        totals = self_time_totals(d)
    ranked = sorted(totals.items(), key=lambda kv: kv[1], reverse=True)
    total = sum(totals.values()) / n
    print(f"device self-time: {total:.2f} ms/image over chained x{n}")
    for name, ms in ranked[:top]:
        print(f"  {ms / n:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
