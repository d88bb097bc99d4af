"""First-party xplane trace reader (tpu_inspect.utils.xprof).

Generates a real jax.profiler trace on the test platform and checks the
wire-format parser reads its planes/lines/metadata; device-op aggregation
is exercised structurally (CPU traces carry no "XLA Ops" device line, so
the TPU-shaped queries must return {} rather than garbage).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_inspect.utils import xprof


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("trace"))
    x = jnp.asarray(np.random.RandomState(0).rand(256, 256).astype(np.float32))
    f = jax.jit(lambda a: (a @ a).sum())
    float(f(x))  # compile outside the trace
    with jax.profiler.trace(d):
        for _ in range(3):
            float(f(x))
    files = xprof.find_xplane_files(d)
    if not files:
        pytest.skip("platform produced no xplane trace")
    return d


def test_parses_planes_and_lines(trace_dir):
    files = xprof.find_xplane_files(trace_dir)
    planes = xprof.load_xspace(files[0])
    assert planes, "no planes parsed"
    named = [p for p in planes if p.name]
    assert named, "plane names not decoded"
    # some plane must carry events with positive durations + resolvable names
    total_events = 0
    for p in planes:
        for line in p.lines:
            for mid, dur in line.events:
                total_events += 1
                assert dur >= 0
                # metadata ids resolve through the map when present
                if p.event_names:
                    assert isinstance(
                        p.event_names.get(mid, ""), str
                    )
    assert total_events > 0, "no events parsed from a real trace"


def test_host_plane_aggregation(trace_dir):
    # host planes: every line (per-thread) aggregated by event name
    totals = xprof.device_op_totals(
        trace_dir, plane_substr="/host:", line_label=None
    )
    if totals:  # present on CPU platforms
        assert all(ms >= 0 for ms in totals.values())
        assert any(ms > 0 for ms in totals.values())


def test_device_query_shape(trace_dir):
    # On CPU there is no device plane: the TPU-shaped query must be empty,
    # never wrong. On TPU it returns per-op totals.
    totals = xprof.device_op_totals(trace_dir)
    assert isinstance(totals, dict)
    devplat = jax.devices()[0].platform
    if devplat == "cpu":
        assert totals == {}
    else:
        assert totals and xprof.total_device_ms(trace_dir) > 0
    ranked = xprof.top_ops(trace_dir, k=5, iters=3)
    assert len(ranked) <= 5


def test_varint_and_fields_roundtrip():
    # hand-encode a tiny message: field1 varint 300, field2 bytes "ab"
    buf = bytes([0x08, 0xAC, 0x02, 0x12, 0x02, 0x61, 0x62])
    got = list(xprof._fields(buf))
    assert got[0] == (1, 0, 300)
    assert got[1] == (2, 2, b"ab")


def test_malformed_varint_raises():
    with pytest.raises(ValueError):
        list(xprof._fields(bytes([0x08] + [0x80] * 11)))


def test_truncated_file_raises_cleanly():
    # a length-delimited field whose declared size overruns the buffer
    bad = bytes([0x0A, 0x10, 0x01, 0x02])  # field1, len16, only 2 bytes
    with pytest.raises(ValueError):
        list(xprof._fields(bad))
    # varint cut mid-byte-sequence
    with pytest.raises(ValueError):
        list(xprof._fields(bytes([0x08, 0x80])))
