"""Defect-detection model family (threshold | canny)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from tpu_inspect.config import DefectParams
from tpu_inspect.engine import InspectionResult, detect_defects_batch


@dataclass(frozen=True)
class DefectModel:
    """A configured foreign-material detector over [U, H, W] uint8 crops +
    segmentation masks; returns per-unit defect masks, areas and NG
    verdicts (bit-exact vs _detect_defects_on_pix)."""

    params: DefectParams = DefectParams()

    def __call__(self, crops, seg_masks) -> InspectionResult:
        return detect_defects_batch(crops, seg_masks, self.params.validated())

    @classmethod
    def median_residual(cls, threshold: int = 24, min_area: int = 20,
                        erode_px: int = 6):
        return cls(DefectParams(
            method="threshold", threshold=threshold,
            min_area=min_area, erode_px=erode_px,
        ))

    @classmethod
    def canny(cls, threshold: int = 24, min_area: int = 20, erode_px: int = 6):
        return cls(DefectParams(
            method="canny", threshold=threshold,
            min_area=min_area, erode_px=erode_px,
        ))
