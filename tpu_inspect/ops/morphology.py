"""Binary/grayscale morphology (OpenCV parity), batched over [U, H, W].

- Ellipse structuring elements replicate cv2.getStructuringElement's
  integer scan-line construction (including cvRound half-to-even).
- erode/dilate use OpenCV's default border semantics: the border value is
  +inf for erode / -inf for dilate (morphologyDefaultBorderValue), i.e. the
  window is clipped to the image. For uint8 that is padding with 255 / 0.
- erode_rect3(n) reproduces ``cv2.erode(src, None, iterations=n)``
  (indexing_ui.py:1497): n iterations of a full 3x3 kernel == one
  (2n+1)x(2n+1) separable rect min-filter.

Implementation: each SE row is a contiguous run, so erosion = min over SE
rows of a 1D horizontal windowed min at that row offset — k reduce_windows
fused by XLA, rather than |SE| shifted compares.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def ellipse_se(k: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (k, k)) bit-exact."""
    k = int(k)
    se = np.zeros((k, k), dtype=np.uint8)
    r = k // 2
    c = k // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    for i in range(k):
        dy = i - r
        j1 = j2 = 0
        if abs(dy) <= r:
            dx = int(np.rint(c * np.sqrt(max(0.0, (r * r - dy * dy) * inv_r2))))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, k)
        se[i, j1:j2] = 1
    return se


def _se_runs(se: np.ndarray) -> list[tuple[int, int, int]]:
    """Decompose an SE into per-row runs [(dy, lo_dx, hi_dx)] around its anchor.

    Anchor is the OpenCV default (k//2, k//2). Assumes each row is a single
    contiguous run (true for rect and ellipse SEs).
    """
    kh, kw = se.shape
    ay, ax = kh // 2, kw // 2
    runs = []
    for i in range(kh):
        cols = np.flatnonzero(se[i])
        if cols.size == 0:
            continue
        assert (np.diff(cols) == 1).all(), "non-contiguous SE row"
        runs.append((i - ay, int(cols[0]) - ax, int(cols[-1]) - ax))
    return runs


def _window_min1d(x: jnp.ndarray, lo: int, hi: int, axis: int, neutral) -> jnp.ndarray:
    """min over x[..., p+lo : p+hi+1 ...] along `axis`, window clipped to image."""
    if lo == 0 and hi == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (-lo, hi) if lo <= 0 else (0, 0)  # lo<=0 always for our SEs
    p = jnp.pad(x, pad, constant_values=neutral)
    window = [1] * x.ndim
    window[axis] = hi - lo + 1
    return jax.lax.reduce_window(
        p, neutral, jax.lax.min, tuple(window), (1,) * x.ndim, "VALID"
    )


def _morph(x: jnp.ndarray, se: np.ndarray, *, is_erode: bool) -> jnp.ndarray:
    runs = _se_runs(se)
    neutral = jnp.uint8(255) if is_erode else jnp.uint8(0)
    xa = x if is_erode else jnp.uint8(255) - x
    H = x.shape[-2]
    # pad vertically once for all row offsets
    dys = [r[0] for r in runs]
    top, bot = -min(dys + [0]), max(dys + [0])
    pv = jnp.pad(
        xa,
        ((0, 0),) * (x.ndim - 2) + ((top, bot), (0, 0)),
        constant_values=jnp.uint8(255),
    )
    out = None
    for dy, lo, hi in runs:
        row = jax.lax.slice_in_dim(pv, top + dy, top + dy + H, axis=-2)
        m = _window_min1d(row, lo, hi, x.ndim - 1, jnp.uint8(255))
        out = m if out is None else jnp.minimum(out, m)
    return out if is_erode else jnp.uint8(255) - out


def erode(x: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return _morph(x, se, is_erode=True)


def dilate(x: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return _morph(x, se, is_erode=False)


def morph_open(x: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return dilate(erode(x, se), se)


def morph_close(x: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return erode(dilate(x, se), se)


def erode_rect3(x: jnp.ndarray, iterations: int) -> jnp.ndarray:
    """cv2.erode(x, None, iterations=n): n x (3x3 rect) == (2n+1)^2 rect.

    Separable: horizontal then vertical 1D windowed min, window clipped to
    the image (OpenCV +inf border).
    """
    n = int(iterations)
    if n <= 0:
        return x
    r = n  # radius
    h = _window_min1d(x, -r, r, x.ndim - 1, jnp.uint8(255))
    return _window_min1d(h, -r, r, x.ndim - 2, jnp.uint8(255))
