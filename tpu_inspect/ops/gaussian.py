"""Bit-exact Gaussian blur (OpenCV parity), batched over [U, H, W].

OpenCV has two distinct Gaussian paths on the reference hot path, and both
are reproduced exactly (verified against cv2 5.0 for k in 1..201):

1. ``cv2.GaussianBlur`` on CV_8U (segmentation.py:80) runs OpenCV's
   *bit-exact fixed-point* pipeline: the kernel is quantized to 8 fractional
   bits via cumulative rounding (so the quantized taps sum exactly to 256),
   both separable passes accumulate exactly in integers, and the final
   >>16 uses round-half-up. Border: BORDER_REFLECT_101.

2. ``cv2.adaptiveThreshold`` with ADAPTIVE_THRESH_GAUSSIAN_C
   (segmentation.py:85) converts to CV_32F, blurs in float32 with
   *sequential tap accumulation* (rows then columns), and converts back with
   cvRound (half-to-even). Border: BORDER_REPLICATE. Reproducing the exact
   float32 op order matters: each output pixel is
   ``fold(t: acc = acc + x[t]*k[t])`` in tap order.

Kernel values: for k <= 7 and sigma<=0 OpenCV uses fixed small-kernel tables;
otherwise ``sigma = 0.3*((k-1)*0.5 - 1) + 0.8`` and a normalized sampled
exponential.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SMALL_TAB = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def gaussian_kernel_f64(k: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV getGaussianKernel semantics (float64, normalized)."""
    if sigma <= 0 and k in _SMALL_TAB:
        return np.array(_SMALL_TAB[k], dtype=np.float64)
    sig = sigma if sigma > 0 else 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    xs = np.arange(k, dtype=np.float64) - (k - 1) * 0.5
    vals = np.exp(-(xs * xs) / (2.0 * sig * sig))
    return vals / vals.sum()


def fixed_gaussian_kernel(k: int, sigma: float = 0.0) -> np.ndarray:
    """The 8-fractional-bit quantized kernel of OpenCV's bit-exact u8 path.

    Quantization is cumulative: ``m[i] = round(256*cum[i]) - round(256*cum[i-1])``
    which guarantees ``sum(m) == 256`` (empirically verified to reproduce the
    exact taps cv2 uses for every k in 1..201).
    """
    ker = gaussian_kernel_f64(k, sigma)
    cum = np.cumsum(ker) * 256.0
    return np.diff(np.concatenate([[0.0], np.rint(cum)])).astype(np.int64)


def _sep_int_conv(x: jnp.ndarray, m: np.ndarray, pad_mode: str) -> jnp.ndarray:
    """Exact separable integer conv; returns int32 with 16 fractional bits."""
    k = len(m)
    pad = k // 2
    H, W = x.shape[-2], x.shape[-1]
    xi = x.astype(jnp.int32)
    # horizontal
    p = jnp.pad(xi, ((0, 0),) * (x.ndim - 1) + ((pad, pad),), mode=pad_mode)
    tmp = jnp.zeros_like(xi)
    for t in range(k):
        if m[t]:
            tmp = tmp + int(m[t]) * jax.lax.slice_in_dim(p, t, t + W, axis=-1)
    # vertical
    p = jnp.pad(tmp, ((0, 0),) * (x.ndim - 2) + ((pad, pad), (0, 0)), mode=pad_mode)
    out = jnp.zeros_like(xi)
    for t in range(k):
        if m[t]:
            out = out + int(m[t]) * jax.lax.slice_in_dim(p, t, t + H, axis=-2)
    return out


def gaussian_blur_u8(x: jnp.ndarray, k: int, sigma: float = 0.0) -> jnp.ndarray:
    """cv2.GaussianBlur(CV_8U, (k,k), sigma) bit-exact. x: [..., H, W] uint8.

    BORDER_REFLECT_101 (= jnp.pad mode 'reflect'); final rounding half-up.
    """
    if k <= 1:
        return x
    m = fixed_gaussian_kernel(k, sigma)
    acc = _sep_int_conv(x, m, "reflect")
    return jnp.clip((acc + 32768) >> 16, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(1,))
def _adaptive_mean_impl(x: jnp.ndarray, k: int) -> jnp.ndarray:
    ker = gaussian_kernel_f64(k).astype(np.float32)
    pad = k // 2
    H, W = x.shape[-2], x.shape[-1]
    xf = x.astype(jnp.float32)
    # horizontal, sequential tap order (OpenCV row filter accumulation)
    p = jnp.pad(xf, ((0, 0),) * (x.ndim - 1) + ((pad, pad),), mode="edge")
    tmp = jnp.zeros_like(xf)
    for t in range(k):
        # keep mul and add as separate f32 roundings (no FMA), like OpenCV
        prod = jax.lax.optimization_barrier(p[..., t : t + W] * np.float32(ker[t]))
        tmp = tmp + prod
    p = jnp.pad(tmp, ((0, 0),) * (x.ndim - 2) + ((pad, pad), (0, 0)), mode="edge")
    out = jnp.zeros_like(xf)
    for t in range(k):
        prod = jax.lax.optimization_barrier(p[..., t : t + H, :] * np.float32(ker[t]))
        out = out + prod
    # convertTo(CV_8U): cvRound = half-to-even, saturate
    return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)


def adaptive_gaussian_mean(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """The uint8 Gaussian local mean used by cv2.adaptiveThreshold (GAUSSIAN_C).

    Float32 sequential-tap conv with BORDER_REPLICATE, then cvRound back to
    uint8 — bit-exact vs OpenCV (see module docstring).
    """
    if block_size <= 1:
        return x
    return _adaptive_mean_impl(x, int(block_size))
