"""Pallas TPU kernel parity tests.

The default suite runs on the CPU backend where ops dispatch to their XLA
fallbacks; this module validates the Pallas kernels themselves and only
runs on a real TPU:

    TPU_INSPECT_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_kernels.py

(bench.py's parity gate also exercises all Pallas paths every run.)
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU backend"
)


def test_pallas_median_parity():
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.median_pallas import median_blur_u8_pallas

    imgs = np.random.RandomState(0).randint(0, 256, (3, 50, 57), dtype=np.uint8)
    for k in [3, 9, 21]:
        ref = np.stack([cv2.medianBlur(im, k) for im in imgs])
        ours = np.asarray(median_blur_u8_pallas(jnp.asarray(imgs), k))
        np.testing.assert_array_equal(ours, ref)


def test_pallas_labels_parity():
    import cv2
    import jax.numpy as jnp

    from tpu_inspect.ops.cc_pallas import label_components_pallas
    from tpu_inspect.synthetic import random_blob_mask

    masks = np.stack(
        [random_blob_mask(45, 53, seed=s, n_blobs=6) for s in range(4)]
    )
    labels = np.asarray(label_components_pallas(jnp.asarray(masks > 0)))
    for i, m in enumerate(masks):
        n, lab = cv2.connectedComponents((m > 0).astype(np.uint8), connectivity=8)
        for comp in range(1, n):
            ys, xs = np.where(lab == comp)
            root = int((ys * 53 + xs).min())
            assert (labels[i][lab == comp] == root).all()
    assert (labels[0][masks[0] == 0] == 2**30).all()


def test_pallas_flood_parity():
    import jax.numpy as jnp

    from tpu_inspect.oracle import fill_holes as oracle_fill
    from tpu_inspect.ops import hole_fill
    from tpu_inspect.synthetic import random_blob_mask

    masks = np.stack([random_blob_mask(45, 53, seed=s, n_blobs=5) for s in range(4)])
    for s in range(4):
        holes = random_blob_mask(45, 53, seed=500 + s, n_blobs=8, scale=0.07)
        masks[s][holes > 0] = 0
    ref = np.stack([oracle_fill(m) for m in masks])
    ours = np.asarray(hole_fill.fill_holes(jnp.asarray(masks)))
    np.testing.assert_array_equal(ours, ref)


def test_full_pipeline_tpu_parity():
    from tpu_inspect import engine, oracle
    from tpu_inspect.config import DefectParams, SegmentationParams
    from tpu_inspect.synthetic import crop_units, make_mold_image, sample_grid_params

    grid = sample_grid_params()
    img = make_mold_image(grid, (3000, 4096), seed=7, defect_rate=0.5)
    seg_res, insp = engine.inspect_image(
        img, grid, SegmentationParams(), DefectParams(),
        exclusions=[{"shape": "circle", "cx": 160, "cy": 160, "r": 30}],
    )
    crops = crop_units(img, grid)
    ref_masks, _, _ = oracle.segment_all_units(
        crops, SegmentationParams(),
        exclusions=[{"shape": "circle", "cx": 160, "cy": 160, "r": 30}],
    )
    _, ref_areas, ref_verd = oracle.inspect_units(crops, ref_masks, DefectParams())
    np.testing.assert_array_equal(seg_res.masks, ref_masks)
    np.testing.assert_array_equal(insp.areas, ref_areas)
    np.testing.assert_array_equal(insp.verdicts, ref_verd)
