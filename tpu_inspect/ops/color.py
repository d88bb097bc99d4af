"""Color conversion ops (bit-exact vs OpenCV).

The reference converts every crop BGR->gray via cv2.cvtColor
(segmentation.py:23). OpenCV (>=4.4, incl. the cv2 5.0 oracle here) uses
15-bit fixed-point BT.601 weights:
``gray = (R*9798 + G*19235 + B*3735 + 2^14) >> 15``
(verified exhaustively over all 2^24 BGR values).
"""

from __future__ import annotations

import jax.numpy as jnp

_R, _G, _B = 9798, 19235, 3735  # BT.601 coefficients scaled by 2^15
_SHIFT = 15
_HALF = 1 << (_SHIFT - 1)


def bgr_to_gray(bgr: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] uint8 BGR -> [..., H, W] uint8 gray (OpenCV fixed point)."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    y = (r * _R + g * _G + b * _B + _HALF) >> _SHIFT
    return y.astype(jnp.uint8)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] uint8 RGB -> [..., H, W] uint8 gray (OpenCV fixed point)."""
    return bgr_to_gray(rgb[..., ::-1])
