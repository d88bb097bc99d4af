"""Per-op parity tests vs OpenCV: color, gaussian, thresholds (SURVEY.md §4.2)."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_inspect.ops import color, gaussian, threshold


def _imgs(u=3, h=61, w=67, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (u, h, w), dtype=np.uint8)


def test_bgr_to_gray_matches_cv2():
    bgr = np.random.RandomState(1).randint(0, 256, (3, 32, 32, 3), dtype=np.uint8)
    ref = np.stack([cv2.cvtColor(b, cv2.COLOR_BGR2GRAY) for b in bgr])
    ours = np.asarray(color.bgr_to_gray(jnp.asarray(bgr)))
    np.testing.assert_array_equal(ours, ref)


def test_rgb_to_gray_matches_cv2():
    rgb = np.random.RandomState(2).randint(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    ref = np.stack([cv2.cvtColor(b, cv2.COLOR_RGB2GRAY) for b in rgb])
    ours = np.asarray(color.rgb_to_gray(jnp.asarray(rgb)))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("k", [1, 3, 5, 7, 9, 15, 21, 31])
def test_gaussian_blur_u8_bit_exact(k):
    imgs = _imgs(seed=k)
    ref = np.stack([cv2.GaussianBlur(im, (k, k), 0) for im in imgs])
    ours = np.asarray(gaussian.gaussian_blur_u8(jnp.asarray(imgs), k))
    np.testing.assert_array_equal(ours, ref)


def test_gaussian_blur_k_exceeds_half_image():
    imgs = _imgs(u=1, h=20, w=24, seed=7)
    # pad k//2=7 < dim: reflect101 stays valid
    ref = cv2.GaussianBlur(imgs[0], (15, 15), 0)
    ours = np.asarray(gaussian.gaussian_blur_u8(jnp.asarray(imgs), 15))[0]
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("bs,C", [(3, 10), (11, -7), (51, 10), (51, 0), (101, 3)])
def test_adaptive_threshold_bit_exact(bs, C):
    imgs = _imgs(seed=bs + C)
    ref = np.stack(
        [
            cv2.adaptiveThreshold(
                im, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY_INV, bs, C
            )
            for im in imgs
        ]
    )
    ours = np.asarray(threshold.adaptive_threshold_inv(jnp.asarray(imgs), bs, C))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", range(5))
def test_otsu_matches_cv2(seed):
    imgs = _imgs(u=4, seed=seed)
    ours = np.asarray(threshold.otsu_threshold(jnp.asarray(imgs)))
    for i, im in enumerate(imgs):
        t, ref_mask = cv2.threshold(im, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
        assert ours[i] == int(t)
    full = np.asarray(threshold.otsu_binary_inv(jnp.asarray(imgs)))
    ref_full = np.stack(
        [cv2.threshold(im, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)[1] for im in imgs]
    )
    np.testing.assert_array_equal(full, ref_full)


@pytest.mark.parametrize(
    "maker",
    [
        lambda: np.full((1, 16, 16), 128, np.uint8),  # uniform -> t=0 quirk
        lambda: np.full((1, 16, 16), 0, np.uint8),
        lambda: np.full((1, 16, 16), 255, np.uint8),
        lambda: np.where(np.arange(256).reshape(1, 16, 16) % 2 == 0, 10, 240).astype(np.uint8),
        lambda: np.repeat(np.arange(16, dtype=np.uint8)[None, :, None] * 17, 16, axis=2),
    ],
)
def test_otsu_degenerate_images(maker):
    imgs = maker()
    ours = int(np.asarray(threshold.otsu_threshold(jnp.asarray(imgs)))[0])
    ref, _ = cv2.threshold(imgs[0], 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
    assert ours == int(ref)


def test_threshold_binary_matches_cv2():
    imgs = _imgs(u=1)
    for thr in [0, 24, 128, 254, 255]:
        _, ref = cv2.threshold(imgs[0], thr, 255, cv2.THRESH_BINARY)
        ours = np.asarray(threshold.threshold_binary(jnp.asarray(imgs), thr))[0]
        np.testing.assert_array_equal(ours, ref)
