"""Morphology + hole-fill + connected-components parity vs OpenCV."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_inspect.ops import cc, hole_fill, morphology
from tpu_inspect.oracle import fill_holes as oracle_fill
from tpu_inspect.synthetic import random_blob_mask


@pytest.mark.parametrize("k", list(range(1, 16)) + [21, 31])
def test_ellipse_se_bit_exact(k):
    np.testing.assert_array_equal(
        morphology.ellipse_se(k), cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    )


def _blob_batch(u=4, h=45, w=53, seed0=0):
    return np.stack(
        [random_blob_mask(h, w, seed=seed0 + s, n_blobs=5) for s in range(u)]
    )


@pytest.mark.parametrize("k", [2, 3, 4, 5, 9, 14, 31])
def test_open_close_parity(k):
    masks = _blob_batch(seed0=k)
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
    ref_c = np.stack([cv2.morphologyEx(m, cv2.MORPH_CLOSE, se) for m in masks])
    ref_o = np.stack([cv2.morphologyEx(m, cv2.MORPH_OPEN, se) for m in masks])
    ours_c = np.asarray(morphology.morph_close(jnp.asarray(masks), se))
    ours_o = np.asarray(morphology.morph_open(jnp.asarray(masks), se))
    np.testing.assert_array_equal(ours_c, ref_c)
    np.testing.assert_array_equal(ours_o, ref_o)


def test_grayscale_erode_dilate_parity():
    imgs = np.random.RandomState(3).randint(0, 256, (3, 40, 44), dtype=np.uint8)
    for k in [3, 5, 8]:
        se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        np.testing.assert_array_equal(
            np.asarray(morphology.erode(jnp.asarray(imgs), se)),
            np.stack([cv2.erode(im, se) for im in imgs]),
        )
        np.testing.assert_array_equal(
            np.asarray(morphology.dilate(jnp.asarray(imgs), se)),
            np.stack([cv2.dilate(im, se) for im in imgs]),
        )


@pytest.mark.parametrize("n", [0, 1, 3, 6, 40, 200])
def test_erode_rect3_iterations(n):
    masks = _blob_batch(h=30, w=34, seed0=n)
    ref = (
        masks
        if n == 0
        else np.stack([cv2.erode(m, None, iterations=n) for m in masks])
    )
    ours = np.asarray(morphology.erode_rect3(jnp.asarray(masks), n))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", range(4))
def test_fill_holes_random(seed):
    masks = _blob_batch(seed0=seed * 10)
    for s in range(masks.shape[0]):
        holes = random_blob_mask(45, 53, seed=500 + seed * 10 + s, n_blobs=8, scale=0.07)
        masks[s][holes > 0] = 0
    ref = np.stack([oracle_fill(m) for m in masks])
    ours = np.asarray(hole_fill.fill_holes(jnp.asarray(masks)))
    np.testing.assert_array_equal(ours, ref)


def test_fill_holes_special_cases():
    # interior crop (all-border fg), empty, full, spiral
    interior = np.full((20, 20), 255, np.uint8)
    interior[5:9, 5:9] = 0
    empty = np.zeros((12, 12), np.uint8)
    full = np.full((12, 12), 255, np.uint8)
    spiral = np.zeros((31, 31), np.uint8)
    # build a rectangular spiral wall
    x0 = y0 = 0
    x1 = y1 = 30
    while x0 < x1:
        spiral[y0, x0 : x1 + 1] = 255
        spiral[y0 : y1 + 1, x1] = 255
        spiral[y1, x0 + 2 : x1 + 1] = 255
        x0 += 2
        y0 += 2
        x1 -= 2
        y1 -= 2
    for m in [interior, empty, full, spiral]:
        ref = oracle_fill(m)
        ours = np.asarray(hole_fill.fill_holes(jnp.asarray(m[None])))[0]
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", range(4))
def test_largest_component_parity(seed):
    masks = _blob_batch(u=5, seed0=seed * 7)
    fg = jnp.asarray(masks > 0)
    best_mask, area, centroid, has = cc.largest_component(fg)
    for i, m in enumerate(masks):
        n, lab, stats, _ = cv2.connectedComponentsWithStats(
            (m > 0).astype(np.uint8), connectivity=8
        )
        assert bool(has[i]) == (n > 1)
        if n > 1:
            areas = stats[1:, cv2.CC_STAT_AREA]
            best = 1 + int(np.argmax(areas))
            ys, xs = np.where(lab == best)
            np.testing.assert_array_equal(np.asarray(best_mask[i]), lab == best)
            assert int(area[i]) == int(areas.max())
            assert float(centroid[i][0]) == xs.mean()
            assert float(centroid[i][1]) == ys.mean()


def test_largest_component_diagonal_chain():
    # single diagonal line is ONE component under 8-connectivity
    m = np.zeros((16, 16), np.uint8)
    for i in range(10):
        m[i + 2, i + 3] = 255
    _, area, centroid, has = cc.largest_component(jnp.asarray(m[None] > 0))
    assert bool(has[0]) and int(area[0]) == 10
    assert float(centroid[0][0]) == np.arange(3, 13).mean()


def test_largest_component_empty():
    m = np.zeros((8, 8), np.uint8)
    _, area, _, has = cc.largest_component(jnp.asarray(m[None] > 0))
    assert not bool(has[0])


def test_largest_component_area_tie_prefers_first_raster():
    # two 4-px squares, equal area: OpenCV labels in raster order and
    # np.argmax keeps the first -> the top-left one must win
    m = np.zeros((12, 12), np.uint8)
    m[1:3, 1:3] = 255
    m[8:10, 8:10] = 255
    best_mask, area, centroid, _ = cc.largest_component(jnp.asarray(m[None] > 0))
    assert int(area[0]) == 4
    assert float(centroid[0][0]) == 1.5 and float(centroid[0][1]) == 1.5
