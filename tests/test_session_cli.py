"""Multi-image session workflow + CLI tests (component #17, #18, #19)."""

import json
import os

import numpy as np
import pytest

from tpu_inspect import oracle
from tpu_inspect.config import DefectParams, GridParams, SegmentationParams
from tpu_inspect.session import InspectionSession, SessionError
from tpu_inspect.synthetic import crop_units, make_mold_image

GRID = GridParams(
    base_unit=(20, 24, 64, 60), units_x=3, units_y=2, blocks_x=1, blocks_y=1,
    unit_space_x=10, unit_space_y=12,
)
HW = (220, 280)


def _session(defect_rate=0.8):
    sess = InspectionSession()
    ref = make_mold_image(GRID, HW, seed=1, defect_rate=defect_rate)
    cur = make_mold_image(GRID, HW, seed=2, defect_rate=defect_rate, shift=(4, -3))
    sess.add_image("ref.png", ref)
    sess.add_image("cur.png", cur)
    return sess, ref, cur


def test_first_image_is_reference():
    sess, *_ = _session()
    assert sess.reference_path == "ref.png"
    assert sess.current_path == "ref.png"
    assert sess.is_reference


def test_workflow_with_alignment_and_verdicts():
    sess, ref, cur = _session()
    assert sess.apply_indexing(GRID) == 6
    excl = {"shape": "rect", "x": 5, "y": 5, "w": 12, "h": 10}
    sess.add_exclusion(excl)
    seg_ref = sess.results().seg
    assert seg_ref is not None and len(sess.ref_centroids) == 6

    insp_ref = sess.set_inspection(True)
    assert insp_ref.verdicts.shape == (6,)

    # switching re-runs segmentation with alignment + inspection
    sess.switch_to("cur.png")
    assert not sess.is_reference
    seg_cur = sess.results().seg
    assert (seg_cur.shifts == np.array([4, -3])).all()

    # oracle cross-check on the current image
    crops = crop_units(cur, GRID)
    ref_masks, _, _ = oracle.segment_all_units(
        crops, sess.seg_params, exclusions=sess.exclusions,
        ref_centroids=sess.ref_centroids, is_reference=False,
    )
    np.testing.assert_array_equal(seg_cur.masks, ref_masks)
    _, ref_areas, ref_verd = oracle.inspect_units(crops, ref_masks, sess.defect_params)
    np.testing.assert_array_equal(sess.results().insp.verdicts, ref_verd)


def test_exclusion_editing_locked_off_reference():
    sess, *_ = _session()
    sess.apply_indexing(GRID)
    sess.run_segmentation()
    sess.switch_to("cur.png")
    with pytest.raises(SessionError, match="reference"):
        sess.add_exclusion({"shape": "rect", "x": 0, "y": 0, "w": 5, "h": 5})
    with pytest.raises(SessionError, match="reference"):
        sess.apply_indexing(GRID)


def test_size_mismatch_blocked():
    sess, *_ = _session()
    sess.apply_indexing(GRID)
    sess.run_segmentation()
    sess.add_image("small.png", np.zeros((100, 120), np.uint8))
    with pytest.raises(SessionError, match="size mismatch"):
        sess.switch_to("small.png")


def test_grid_export_import_round_trip(tmp_path):
    sess, *_ = _session()
    sess.apply_indexing(GRID)
    sess.add_exclusion({"shape": "circle", "cx": 30, "cy": 30, "r": 8})
    sess.run_segmentation()
    path = tmp_path / "g.json"
    sess.export_grid(path)

    sess2 = InspectionSession()
    sess2.add_image("ref.png", sess.image)
    n = sess2.import_grid(path)
    assert n == 6
    assert sess2.grid == GRID
    assert sess2.exclusions == sess.exclusions
    assert sess2.ref_centroids == sess.ref_centroids


def test_cli_end_to_end(tmp_path):
    import cv2

    from tpu_inspect import cli

    ref = make_mold_image(GRID, HW, seed=5, defect_rate=1.0)
    cur = make_mold_image(GRID, HW, seed=6, defect_rate=0.0, shift=(2, 1))
    ref_p, cur_p = str(tmp_path / "ref.png"), str(tmp_path / "cur.png")
    cv2.imwrite(ref_p, ref)
    cv2.imwrite(cur_p, cur)

    grid_p = str(tmp_path / "grid.json")
    cli.main([
        "gridgen", "--base", "20,24,64,60", "--units", "3x2", "--blocks", "1x1",
        "--unit-space", "10,12", "--block-space", "0,0",
        "--image-size", "280x220", "--out", grid_p,
    ])
    assert json.load(open(grid_p))["metadata"]["units_x"] == 3

    out_dir = str(tmp_path / "out")
    cli.main([
        "inspect", "--grid", grid_p, "--image", ref_p, cur_p,
        "--out", out_dir, "--min-area", "10",
    ])
    report = json.load(open(os.path.join(out_dir, "inspection.json")))
    assert set(report) == {ref_p, cur_p}
    assert report[ref_p]["unit_count"] == 6
    assert report[ref_p]["ng_count"] >= 1  # defect_rate 1.0
    assert report[cur_p]["ng_count"] == 0  # clean capture
    # per-image masks + CSV exported
    assert os.path.exists(os.path.join(out_dir, "ref", "masks_summary.csv"))
    assert os.path.exists(os.path.join(out_dir, "ref", "mask_0000.png"))
