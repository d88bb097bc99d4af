"""Model families: the inspection "models" of this framework.

The reference has no neural networks; its model families are the two
segmentation methods (Otsu / adaptive-Gaussian, segmentation.py:75-100) and
the two defect-detection methods (median-residual threshold / Canny,
indexing_ui.py:1517-1539). These wrappers expose them behind a uniform
interface so alternative families (including learned models) can slot into
the same engine pipelines.
"""

from tpu_inspect.models.segmentation import SegmentationModel
from tpu_inspect.models.defect import DefectModel

__all__ = ["SegmentationModel", "DefectModel"]
