"""Segmentation model family (otsu | adaptive)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from tpu_inspect.config import SegmentationParams
from tpu_inspect.engine import raw_segment


@dataclass(frozen=True)
class SegmentationModel:
    """A configured per-unit segmentation function over [U, H, W] uint8.

    ``__call__`` returns 0/255 uint8 masks (pre-exclusion), bit-exact vs
    the reference's segment_cell chain.
    """

    params: SegmentationParams = SegmentationParams()

    def __call__(self, crops: jnp.ndarray) -> jnp.ndarray:
        return raw_segment(crops, self.params.validated())

    @classmethod
    def otsu(cls, gaussian_blur: int = 3, morph_kernel: int = 3):
        return cls(SegmentationParams(
            method="otsu", gaussian_blur=gaussian_blur, morph_kernel=morph_kernel
        ))

    @classmethod
    def adaptive(cls, block: int = 51, C: int = 10,
                 gaussian_blur: int = 3, morph_kernel: int = 3):
        return cls(SegmentationParams(
            method="adaptive", adapt_block=block, adapt_C=C,
            gaussian_blur=gaussian_blur, morph_kernel=morph_kernel,
        ))
