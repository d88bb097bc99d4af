"""Streaming inline inspection tests (config 5)."""

import numpy as np

from tpu_inspect import engine, oracle
from tpu_inspect.config import DefectParams, GridParams, SegmentationParams
from tpu_inspect.streaming import stream_inspect
from tpu_inspect.synthetic import crop_units, make_mold_image

GRID = GridParams(
    base_unit=(20, 24, 64, 60), units_x=3, units_y=2,
    unit_space_x=10, unit_space_y=12,
)
HW = (220, 280)


def test_stream_matches_oracle_per_frame():
    frames = [
        make_mold_image(GRID, HW, seed=s, defect_rate=0.7, shift=(s % 3, -(s % 2)))
        for s in range(5)
    ]
    # reference anchors from frame 0
    ref_res = engine.segment_units(
        crop_units(frames[0], GRID), SegmentationParams()
    )
    anchors = ref_res.centroid_dict()

    results = list(
        stream_inspect(
            frames,
            GRID,
            SegmentationParams(),
            DefectParams(min_area=5),
            exclusions=[{"shape": "rect", "x": 2, "y": 2, "w": 8, "h": 8}],
            ref_centroids=anchors,
            prefetch=2,
        )
    )
    assert [r.index for r in results] == list(range(5))
    for i, r in enumerate(results):
        crops = crop_units(frames[i], GRID)
        masks, _, _ = oracle.segment_all_units(
            crops, SegmentationParams(),
            exclusions=[{"shape": "rect", "x": 2, "y": 2, "w": 8, "h": 8}],
            ref_centroids=anchors, is_reference=False,
        )
        _, areas, verdicts = oracle.inspect_units(crops, masks, DefectParams(min_area=5))
        np.testing.assert_array_equal(r.verdicts, verdicts)
        np.testing.assert_array_equal(r.areas, areas)
        assert r.ng_count == int(verdicts.sum())


def test_stream_fetch_masks():
    frames = [make_mold_image(GRID, HW, seed=9, defect_rate=1.0)]
    (r,) = stream_inspect(frames, GRID, fetch_masks=True)
    assert r.seg_masks.shape == (6, 60, 64)
    assert r.defect_masks.shape == (6, 60, 64)


def test_stream_inspect_paths_matches_in_memory(tmp_path):
    """File-based streaming (native prefetch decode) must equal in-memory
    streaming frame for frame."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    from tpu_inspect.streaming import stream_inspect_paths

    frames = [
        make_mold_image(GRID, HW, seed=s, defect_rate=0.6) for s in range(4)
    ]
    paths = []
    for i, f in enumerate(frames):
        p = str(tmp_path / f"frame_{i}.png")
        assert cv2.imwrite(p, f)
        paths.append(p)

    kw = dict(
        seg=SegmentationParams(),
        defect=DefectParams(min_area=5),
        exclusions=[{"shape": "circle", "cx": 30, "cy": 30, "r": 9}],
    )
    mem = list(stream_inspect(frames, GRID, **kw))
    file = list(stream_inspect_paths(paths, GRID, decode_threads=2, **kw))
    assert [r.index for r in file] == [r.index for r in mem]
    for a, b in zip(file, mem):
        np.testing.assert_array_equal(a.verdicts, b.verdicts)
        np.testing.assert_array_equal(a.areas, b.areas)


def test_stream_rejects_size_mismatch():
    """Size-mismatched captures must raise (the reference blocks them,
    indexing_ui.py:1212-1222) instead of inspecting clamped crops."""
    import pytest

    frames = [
        make_mold_image(GRID, HW, seed=0),
        make_mold_image(GRID, (HW[0] + 8, HW[1]), seed=1),
    ]
    with pytest.raises(ValueError, match="does not match"):
        list(stream_inspect(frames, GRID, SegmentationParams(), DefectParams()))
