"""Multi-chip data parallelism: device meshes + sharded inspection.

Public API re-exported from :mod:`tpu_inspect.parallel.mesh` (the sharded
streaming loop lives in :func:`tpu_inspect.streaming.stream_inspect_sharded`).
"""

from tpu_inspect.parallel.mesh import (
    image_unit_mesh,
    inspect_image_batch_sharded,
    inspect_units_sharded,
    pad_units,
    unit_mesh,
)
from tpu_inspect.parallel.strips import (
    defect_image_sharded,
    segment_image_sharded,
    strip_mesh,
)

__all__ = [
    "defect_image_sharded",
    "image_unit_mesh",
    "inspect_image_batch_sharded",
    "inspect_units_sharded",
    "pad_units",
    "segment_image_sharded",
    "strip_mesh",
    "unit_mesh",
]
