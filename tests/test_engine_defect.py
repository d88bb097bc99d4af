"""End-to-end defect engine + inspection verdict parity vs the OpenCV oracle
(configs 3+4 of BASELINE.json)."""

import numpy as np
import pytest

from tpu_inspect import engine, oracle
from tpu_inspect.config import DefectParams, SegmentationParams
from tpu_inspect.synthetic import crop_units, make_mold_image, sample_grid_params

EXCL = [{"shape": "circle", "cx": 160, "cy": 160, "r": 25}]


def _fixture(n_units=8, defect_rate=0.6, seed=7):
    grid = sample_grid_params()
    img = make_mold_image(grid, (3000, 4096), seed=seed, defect_rate=defect_rate)
    crops = crop_units(img, grid)[:n_units]
    seg_res = engine.segment_units(crops, SegmentationParams(), exclusions=EXCL)
    return crops, seg_res.masks


def _assert_defect_parity(crops, seg_masks, dp):
    insp = engine.detect_defects_batch(crops, seg_masks, dp)
    ref_dms, ref_areas, ref_verd = oracle.inspect_units(crops, seg_masks, dp)
    for i in range(len(crops)):
        if ref_dms[i] is None:
            assert not insp.valid[i], f"unit {i}: expected no detection"
        else:
            assert insp.valid[i], f"unit {i}: expected detection"
            np.testing.assert_array_equal(insp.defect_masks[i], ref_dms[i])
    np.testing.assert_array_equal(insp.areas, ref_areas)
    np.testing.assert_array_equal(insp.verdicts, ref_verd)
    return insp


@pytest.mark.parametrize(
    "dp",
    [
        DefectParams(),
        DefectParams(erode_px=0),
        DefectParams(threshold=10, min_area=5),
        DefectParams(min_area=0),
        DefectParams(threshold=255),
        DefectParams(erode_px=200),  # ROI erased -> all None
    ],
)
def test_defect_batch_parity(dp):
    crops, seg_masks = _fixture()
    insp = _assert_defect_parity(crops, seg_masks, dp)
    assert insp.defect_masks.shape == crops.shape


def test_defect_masks_none_equivalence():
    crops, seg_masks = _fixture(defect_rate=0.0, seed=12)
    insp = engine.detect_defects_batch(crops, seg_masks, DefectParams())
    lst = insp.defect_mask_list()
    assert all(m is None for m in lst)
    assert not insp.verdicts.any()


def test_full_inspection_pipeline_parity():
    grid = sample_grid_params()
    img = make_mold_image(grid, (3000, 4096), seed=4, defect_rate=0.5)
    crops = crop_units(img, grid)[:8]
    segp, dp = SegmentationParams(), DefectParams()
    seg_res, insp = engine.inspect_units(crops, segp, dp, exclusions=EXCL)
    ref_masks, _, _ = oracle.segment_all_units(crops, segp, exclusions=EXCL)
    _, ref_areas, ref_verd = oracle.inspect_units(crops, ref_masks, dp)
    np.testing.assert_array_equal(seg_res.masks, ref_masks)
    np.testing.assert_array_equal(insp.areas, ref_areas)
    np.testing.assert_array_equal(insp.verdicts, ref_verd)


def test_defect_on_random_noise_crops():
    # pure-noise crops exercise dense candidate masks + many blobs
    crops = np.random.RandomState(5).randint(0, 256, (4, 48, 52), dtype=np.uint8)
    seg = engine.segment_units(crops, SegmentationParams(gaussian_blur=0, morph_kernel=0))
    _assert_defect_parity(crops, seg.masks, DefectParams(threshold=8, min_area=3, erode_px=1))


def test_defect_canny_method_parity():
    crops, seg_masks = _fixture(n_units=4)
    _assert_defect_parity(crops, seg_masks, DefectParams(method="canny", threshold=24))
    # threshold range ends (indexing_ui.py:872 slider 0-255): canny low/high
    # become (max(1, t//2), max(2, t)) — 0 and 255 pin both clamps
    _assert_defect_parity(crops, seg_masks, DefectParams(method="canny", threshold=0))
    _assert_defect_parity(crops, seg_masks, DefectParams(method="canny", threshold=255))


def test_randomized_config_cross_product_fuzz():
    """Seeded fuzz over the reference's config cross-product (SURVEY §4.2):
    method x gaussian_blur x morph_kernel x adapt_block x defect method x
    median_k x threshold x erode_px x min_area, engine vs oracle, exact."""
    rng = np.random.RandomState(20260821)
    crops = rng.randint(0, 256, (4, 48, 56), dtype=np.uint8)
    for trial in range(10):
        sp = SegmentationParams(
            method=rng.choice(["otsu", "adaptive"]),
            gaussian_blur=int(rng.randint(0, 32)),
            morph_kernel=int(rng.randint(0, 32)),
            adapt_block=int(rng.randint(3, 202)),
            adapt_C=int(rng.randint(-20, 21)),
        )
        dp = DefectParams(
            method=rng.choice(["threshold", "canny"]),
            median_k=int(rng.choice([3, 5, 9, 21, 31])),
            threshold=int(rng.randint(0, 256)),
            erode_px=int(rng.randint(0, 14)),
            min_area=int(rng.randint(0, 60)),
        )
        seg = engine.segment_units(crops, sp)
        ref_masks, _, _ = oracle.segment_all_units(crops, sp)
        np.testing.assert_array_equal(
            seg.masks, ref_masks, err_msg=f"trial {trial}: {sp}"
        )
        _assert_defect_parity(crops, seg.masks, dp)
