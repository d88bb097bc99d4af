"""First-party device-trace reader (XLA ``*.xplane.pb``, protobuf wire level).

The framework's benchmark methodology (PERF.md) is device-profiler truth:
wall-clock through the development tunnel carries ±2 ms of noise, so every
kernel decision is made from ``jax.profiler`` traces. This module makes that
methodology a first-party tool: a minimal protobuf *wire-format* reader for
the XSpace/XPlane schema (no protoc, no tensorflow dependency) plus helpers
that aggregate per-op device time from a trace directory.

The reference has no profiling at all (SURVEY.md §5: "Tracing/profiling:
none"); this is the rebuild's observability subsystem, exposed via
``python -m tpu_inspect.cli profile``.

Schema (fields actually read; numbers match tensorflow/tsl xplane.proto):

  XSpace   { repeated XPlane planes = 1; }
  XPlane   { string name = 2; repeated XLine lines = 3;
             map<int64, XEventMetadata> event_metadata = 4; }
  XLine    { string name = 2; repeated XEvent events = 4;
             string display_name = 11; }
  XEvent   { int64 metadata_id = 1; int64 duration_ps = 3; }
  XEventMetadata { int64 id = 1; string name = 2; string display_name = 4; }
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields.

    Length-delimited values (wire type 2) yield the raw bytes; varints yield
    ints; fixed64/fixed32 yield raw bytes (callers never need them here).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 1:
            if pos + 8 > n:
                raise ValueError("truncated fixed64 field")
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == 5:
            if pos + 4 > n:
                raise ValueError("truncated fixed32 field")
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


# ---------------------------------------------------------------------------
# XSpace model
# ---------------------------------------------------------------------------


@dataclass
class Line:
    name: str = ""
    display_name: str = ""
    # (metadata_id, duration_ps) per event — the only event fields the
    # aggregations need
    events: list[tuple[int, int]] = field(default_factory=list)

    @property
    def label(self) -> str:
        return self.display_name or self.name


@dataclass
class Plane:
    name: str = ""
    lines: list[Line] = field(default_factory=list)
    event_names: dict[int, str] = field(default_factory=dict)


def _parse_event(buf: bytes) -> tuple[int, int]:
    mid = dur = 0
    for fno, _, val in _fields(buf):
        if fno == 1:
            mid = val
        elif fno == 3:
            dur = val
    return mid, dur


def _parse_line(buf: bytes) -> Line:
    line = Line()
    for fno, _, val in _fields(buf):
        if fno == 2:
            line.name = val.decode("utf-8", "replace")
        elif fno == 11:
            line.display_name = val.decode("utf-8", "replace")
        elif fno == 4:
            line.events.append(_parse_event(val))
    return line


def _parse_event_metadata(buf: bytes) -> tuple[int, str]:
    mid = 0
    name = disp = ""
    for fno, _, val in _fields(buf):
        if fno == 1:
            mid = val
        elif fno == 2:
            name = val.decode("utf-8", "replace")
        elif fno == 4:
            disp = val.decode("utf-8", "replace")
    return mid, disp or name


def _parse_plane(buf: bytes) -> Plane:
    plane = Plane()
    for fno, _, val in _fields(buf):
        if fno == 2:
            plane.name = val.decode("utf-8", "replace")
        elif fno == 3:
            plane.lines.append(_parse_line(val))
        elif fno == 4:  # map entry {key=1: int64, value=2: XEventMetadata}
            key = None
            meta = None
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    key = v2
                elif f2 == 2:
                    meta = _parse_event_metadata(v2)
            if meta is not None:
                mid, name = meta
                plane.event_names[key if key is not None else mid] = name
    return plane


def load_xspace(path: str) -> list[Plane]:
    """Parse one ``*.xplane.pb`` file into its planes."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fno, _, val in _fields(buf):
        if fno == 1:
            planes.append(_parse_plane(val))
    return planes


# ---------------------------------------------------------------------------
# aggregation over a jax.profiler trace directory
# ---------------------------------------------------------------------------


def find_xplane_files(trace_dir: str) -> list[str]:
    """All ``*.xplane.pb`` under a ``jax.profiler.trace`` output directory
    (they live in plugins/profile/<run>/), newest run first."""
    hits = []
    for root, _, files in os.walk(trace_dir):
        for fn in files:
            if fn.endswith(".xplane.pb"):
                hits.append(os.path.join(root, fn))
    return sorted(hits, key=os.path.getmtime, reverse=True)


def device_op_totals(
    trace_dir: str,
    *,
    plane_substr: str | None = None,
    line_label: str | None = "XLA Ops",
) -> dict[str, float]:
    """Aggregate device op name -> total milliseconds from the newest trace.

    Device planes are matched by ``plane_substr`` when given, else by the
    conventional device plane names (TPU/GPU), falling back to any plane
    that has an "XLA Ops" line (the per-op device timeline). ``line_label``
    picks the timeline within the plane (None = every line — useful for
    host planes, whose lines are named per thread). Returns {} when no
    trace or no matching plane exists (e.g. pure-host runs with the default
    selectors).

    Note on host planes: host TraceMe spans NEST, and each event's full
    duration is summed independently, so host totals are *inclusive* times
    (a parent plus its children double-counts) — use them to rank, not to
    add. The device "XLA Ops" line is flat, so device totals are additive.
    """
    files = find_xplane_files(trace_dir)
    if not files:
        return {}
    totals: dict[str, float] = {}
    for plane in load_xspace(files[0]):
        if plane_substr is not None:
            if plane_substr not in plane.name:
                continue
        elif not (
            "/device:TPU" in plane.name
            or "/device:GPU" in plane.name
            or any(l.label == "XLA Ops" for l in plane.lines)
        ):
            continue
        for line in plane.lines:
            if line_label is not None and line.label != line_label:
                continue
            for mid, dur_ps in line.events:
                name = plane.event_names.get(mid, f"op#{mid}")
                totals[name] = totals.get(name, 0.0) + dur_ps / 1e9
    return totals


def total_device_ms(trace_dir: str, **kw) -> float:
    return sum(device_op_totals(trace_dir, **kw).values())


def top_ops(
    trace_dir: str, k: int = 15, iters: int = 1, **kw
) -> list[tuple[str, float]]:
    """Top-k (op name, ms per iteration) from the newest trace."""
    totals = device_op_totals(trace_dir, **kw)
    ranked = sorted(totals.items(), key=lambda kv: kv[1], reverse=True)
    return [(name, ms / max(1, iters)) for name, ms in ranked[:k]]
