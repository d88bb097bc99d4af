"""End-to-end segmentation engine parity vs the OpenCV oracle (configs 1+2
of BASELINE.json): full chain, exclusions, centroid-shift alignment."""

import numpy as np
import pytest

from tpu_inspect.config import SegmentationParams
from tpu_inspect.engine import segment_units
from tpu_inspect.oracle import segment_all_units
from tpu_inspect.synthetic import crop_units, make_mold_image, sample_grid_params

EXCLS = [
    {"shape": "rect", "x": 5, "y": 6, "w": 10, "h": 8},
    {"shape": "circle", "cx": 40, "cy": 30, "r": 9},
]


def _assert_pass_matches(crops, params, exclusions=(), ref_centroids=None, is_reference=True):
    res = segment_units(
        crops, params, exclusions=exclusions,
        ref_centroids=ref_centroids, is_reference=is_reference,
    )
    ref_masks, ref_cents, ref_shifts = segment_all_units(
        crops, params, exclusions=exclusions,
        ref_centroids=ref_centroids, is_reference=is_reference,
    )
    np.testing.assert_array_equal(res.masks, ref_masks)
    if is_reference:
        assert res.centroid_dict() == ref_cents
    else:
        np.testing.assert_array_equal(res.shifts, ref_shifts)
    return res


@pytest.mark.parametrize("method", ["otsu", "adaptive"])
@pytest.mark.parametrize("gb,mk", [(3, 3), (0, 0), (4, 5), (0, 2)])
def test_random_crops_parity(method, gb, mk):
    crops = np.random.RandomState(gb * 10 + mk).randint(
        0, 256, (4, 48, 56), dtype=np.uint8
    )
    p = SegmentationParams(method=method, gaussian_blur=gb, morph_kernel=mk)
    _assert_pass_matches(crops, p, exclusions=EXCLS)


@pytest.mark.parametrize("block", [3, 201])
def test_adaptive_block_range_ends_parity(block):
    """adapt_block's full reference range (indexing_ui.py:805 caps it at
    201, min 3): block 201 exceeds the crop extent, so the mean window is
    border-replicate-dominated — the regime the mid-range sweep misses."""
    crops = np.random.RandomState(block).randint(
        0, 256, (3, 64, 72), dtype=np.uint8
    )
    p = SegmentationParams(method="adaptive", adapt_block=block, adapt_C=7)
    _assert_pass_matches(crops, p, exclusions=EXCLS)


def test_mold_subset_parity_with_exclusions():
    grid = sample_grid_params()
    img = make_mold_image(grid, (3000, 4096), seed=21, defect_rate=0.5)
    crops = crop_units(img, grid)[:6]
    _assert_pass_matches(crops, SegmentationParams(), exclusions=EXCLS)


def test_alignment_shift_parity():
    grid = sample_grid_params()
    ref_img = make_mold_image(grid, (3000, 4096), seed=30)
    cur_img = make_mold_image(grid, (3000, 4096), seed=31, shift=(5, -3))
    ref_crops = crop_units(ref_img, grid)[:6]
    cur_crops = crop_units(cur_img, grid)[:6]
    p = SegmentationParams()
    res_ref = _assert_pass_matches(ref_crops, p, exclusions=EXCLS)
    anchors = res_ref.centroid_dict()
    res_cur = _assert_pass_matches(
        cur_crops, p, exclusions=EXCLS, ref_centroids=anchors, is_reference=False
    )
    # the synthetic shift must be recovered
    assert (res_cur.shifts == np.array([5, -3])).all()


def test_alignment_missing_anchor_applies_zero_shift():
    crops = np.random.RandomState(0).randint(0, 256, (3, 32, 32), dtype=np.uint8)
    p = SegmentationParams(gaussian_blur=0, morph_kernel=0)
    anchors = {1: (10.0, 10.0)}  # units 0 and 2 have no anchor
    res = _assert_pass_matches(
        crops, p, exclusions=EXCLS, ref_centroids=anchors, is_reference=False
    )
    assert (res.shifts[0] == 0).all() and (res.shifts[2] == 0).all()


def test_no_exclusions_and_empty_masks():
    # uniform crops -> Otsu threshold 0 -> empty masks, no centroids
    crops = np.full((2, 24, 24), 200, dtype=np.uint8)
    res = _assert_pass_matches(crops, SegmentationParams())
    assert res.masks.sum() == 0
    assert not res.centroid_valid.any()


def test_pack_exclusions_pads_to_power_of_two():
    """Exclusion arrays pad to power-of-two capacity with no-op entries so
    add/delete rarely recompiles (engine docstring contract)."""
    from tpu_inspect.engine import pack_exclusions

    r3 = [{"shape": "rect", "x": i, "y": i, "w": 2, "h": 2} for i in range(3)]
    rects, circles = pack_exclusions(r3)
    assert rects.shape == (4, 4)
    assert (rects[3] == 0).all()  # degenerate no-op rect
    assert circles.shape == (0, 3)
    rects1, circles1 = pack_exclusions(
        [{"shape": "circle", "cx": 5, "cy": 5, "r": 2}]
    )
    assert rects1.shape == (0, 4) and circles1.shape == (1, 3)
    rects0, circles0 = pack_exclusions([])
    assert rects0.shape == (0, 4) and circles0.shape == (0, 3)
