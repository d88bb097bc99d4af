"""Row-strip-sharded whole-image configs on the 8-virtual-device CPU mesh.

Validates parallel/strips.py bit-exact against the OpenCV oracle on small
whole-image planes: blur/threshold/morph halos, the psum'd Otsu histogram,
and the globally-converging sharded hole-fill flood (including masks whose
background snakes across several strips, and row counts that don't divide
the mesh)."""

import numpy as np
import pytest

from tpu_inspect.config import DefectParams, SegmentationParams
from tpu_inspect import oracle
from tpu_inspect.parallel.strips import (
    defect_image_sharded,
    segment_image_sharded,
    strip_mesh,
)


def _mold_like(h, w, seed):
    """A blobby two-tone image with internal holes (so the flood matters)."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w), 200, np.uint8)
    for _ in range(6):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        ry, rx = rng.randint(h // 8, h // 3), rng.randint(w // 8, w // 3)
        yy, xx = np.ogrid[:h, :w]
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
        img[blob] = 60
    # punch holes (enclosed background the fill must close)
    for _ in range(5):
        cy, cx = rng.randint(5, h - 5), rng.randint(5, w - 5)
        img[cy - 2 : cy + 2, cx - 2 : cx + 2] = 220
    img ^= rng.randint(0, 12, (h, w)).astype(np.uint8)
    return img


@pytest.mark.parametrize(
    "h,w,seg",
    [
        (256, 192, SegmentationParams(gaussian_blur=3, morph_kernel=3)),
        # H % 8 != 0: the last strip carries pad rows + virtual tails
        (250, 192, SegmentationParams(gaussian_blur=5, morph_kernel=5)),
        (256, 160, SegmentationParams(method="adaptive", adapt_block=31,
                                      adapt_C=5, morph_kernel=0)),
        (248, 160, SegmentationParams(gaussian_blur=0, morph_kernel=2)),
    ],
)
def test_segment_image_sharded_matches_oracle(h, w, seg):
    img = _mold_like(h, w, seed=h + w)
    got = segment_image_sharded(img, seg, mesh=strip_mesh())
    ref = oracle.segment_unit(img, seg.validated())
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize(
    "h,w,dp",
    [
        (256, 192, DefectParams(median_k=9, threshold=20, erode_px=3,
                                min_area=4)),
        # H % 8 != 0 + canny (global hysteresis via the gathered plane)
        (250, 192, DefectParams(method="canny", threshold=24, erode_px=2,
                                min_area=4)),
        (256, 160, DefectParams(median_k=21, threshold=40, erode_px=0,
                                min_area=2)),
    ],
)
def test_defect_image_sharded_matches_oracle(h, w, dp):
    img = _mold_like(h, w, seed=3 * h + w)
    seg = SegmentationParams(gaussian_blur=3, morph_kernel=3).validated()
    mask = oracle.segment_unit(img, seg)
    dp = dp.validated()
    out, found, area, verdict = defect_image_sharded(
        img, mask, dp, mesh=strip_mesh()
    )
    ref = oracle.detect_defects(img, mask, dp)
    if ref is None:
        assert not found and area == 0 and not verdict
    else:
        assert found
        np.testing.assert_array_equal(out, ref)
        assert area == int((ref > 0).sum())
        assert verdict == (area >= int(dp.min_area))


def test_sharded_flood_crosses_strips():
    """A background corridor snaking through every strip: exterior
    reachability must propagate through several halo-exchange rounds,
    while a sealed cavity still fills."""
    h, w = 240, 120
    img = np.full((h, w), 40, np.uint8)  # fg after inv-threshold (dark)
    # carve a bright serpentine corridor from the top border downward
    x0 = 10
    for band in range(6):
        y0, y1 = band * 40, band * 40 + 40
        img[y0:y1, x0 : x0 + 8] = 230
        x0 = w - 18 - x0
        if band < 5:
            img[y1 - 4 : y1, min(x0, w - 18 - x0) : max(x0, w - 18 - x0) + 8] = 230
    img[0:2, 10:18] = 230  # opens at the global top border
    # a sealed bright cavity (no path to any border): must be FILLED
    img[100:110, 60:70] = 230
    seg = SegmentationParams(gaussian_blur=0, morph_kernel=0)
    got = segment_image_sharded(img, seg, mesh=strip_mesh())
    ref = oracle.segment_unit(img, seg.validated())
    np.testing.assert_array_equal(got, ref)
    # sanity: the cavity really was enclosed (filled -> fg in the mask)
    assert got[102, 62] == 255
    # and the corridor really was exterior (stays background)
    assert got[20, 12] == 0
