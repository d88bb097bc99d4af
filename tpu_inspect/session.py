"""Multi-image inspection session (headless reference-workflow parity).

Mirrors the reference tool's multi-image state machine
(indexing_ui.py:570-584, :1016-1292) without Qt:

- the first registered image becomes the *reference*; exclusions and
  indexing are editable only while it is current (:1233-1255, :1764-1777),
- per-image results (segmentation masks, defect masks, verdicts) are cached
  and restored on switches (:1016-1085),
- switching to an image of a different size while a grid exists is refused
  (:1212-1222),
- switching auto-reruns segmentation so exclusions re-align via centroid
  shift (:1276-1290), and re-runs inspection when the toggle is on.

The session is array-based: "paths" may be real files (decoded through
tpu_inspect.imageio) or arbitrary keys registered with in-memory arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tpu_inspect import engine
from tpu_inspect.config import DefectParams, GridParams, SegmentationParams
from tpu_inspect.geometry import clamp_exclusion_to_base_unit, grid_boxes
from tpu_inspect.persistence import (
    GridDocument,
    export_masks_and_csv,
    grid_metadata,
    load_grid,
    save_grid,
)


class SessionError(RuntimeError):
    pass


@dataclass
class ImageState:
    """Cached per-image results (the _image_states equivalent)."""

    seg: engine.SegmentationResult | None = None
    insp: engine.InspectionResult | None = None


@dataclass
class InspectionSession:
    seg_params: SegmentationParams = SegmentationParams()
    defect_params: DefectParams = DefectParams()
    grid: GridParams | None = None
    exclusions: list[dict] = field(default_factory=list)
    ref_centroids: dict[int, tuple[float, float]] = field(default_factory=dict)
    inspection_enabled: bool = False

    _images: dict[str, np.ndarray] = field(default_factory=dict)
    _order: list[str] = field(default_factory=list)
    _states: dict[str, ImageState] = field(default_factory=dict)
    reference_path: str | None = None
    current_path: str | None = None

    # -- image registry -----------------------------------------------------

    def add_image(self, path: str, image: np.ndarray | None = None) -> None:
        """Register an image (decoded from disk when no array is given).

        The first image becomes the reference (indexing_ui.py:1196-1208).
        """
        if image is None:
            from tpu_inspect.imageio import load_gray

            image = load_gray(path)
        image = np.asarray(image, dtype=np.uint8)
        if path not in self._images:
            self._order.append(path)
        self._images[path] = image
        self._states.setdefault(path, ImageState())
        if self.reference_path is None:
            self.reference_path = path
        if self.current_path is None:
            self.switch_to(path)

    @property
    def image(self) -> np.ndarray:
        if self.current_path is None:
            raise SessionError("no image loaded")
        return self._images[self.current_path]

    @property
    def is_reference(self) -> bool:
        return (
            self.reference_path is None
            or self.current_path == self.reference_path
        )

    def switch_to(self, path: str) -> None:
        """Switch current image; blocks size mismatches when a grid exists
        and re-runs segmentation/inspection (indexing_ui.py:1184-1292)."""
        if path not in self._images:
            raise SessionError(f"unknown image: {path}")
        if self.grid is not None and self.current_path is not None:
            if self._images[path].shape != self.image.shape:
                raise SessionError(
                    "image size mismatch: clear indexing before switching "
                    "(reference behavior indexing_ui.py:1212-1222)"
                )
        self.current_path = path
        if self.grid is not None:
            self.run_segmentation()
            if self.inspection_enabled:
                self.run_inspection()

    # -- indexing / exclusions ----------------------------------------------

    def _require_reference(self, what: str) -> None:
        if not self.is_reference:
            raise SessionError(
                f"{what} is locked to the reference image "
                "(indexing_ui.py:1764-1777, :1233-1255)"
            )

    def apply_indexing(self, grid: GridParams) -> int:
        self._require_reference("indexing")
        self.grid = grid
        self.ref_centroids = {}  # anchors invalid (indexing_ui.py:2197-2200)
        return grid.num_units

    def add_exclusion(self, excl: dict) -> int:
        """Add (clamped) exclusion and re-run segmentation; returns its index."""
        self._require_reference("exclusion editing")
        if self.grid is None:
            raise SessionError("create indexing first")
        _, _, bw, bh = self.grid.base_unit
        self.exclusions.append(clamp_exclusion_to_base_unit(excl, bw, bh))
        self.run_segmentation()
        return len(self.exclusions) - 1

    def modify_exclusion(self, idx: int, excl: dict) -> None:
        self._require_reference("exclusion editing")
        _, _, bw, bh = self.grid.base_unit
        self.exclusions[idx] = clamp_exclusion_to_base_unit(excl, bw, bh)
        self.run_segmentation()

    def delete_exclusion(self, idx: int) -> None:
        self._require_reference("exclusion editing")
        del self.exclusions[idx]
        self.run_segmentation()

    # -- passes --------------------------------------------------------------

    def run_segmentation(self) -> engine.SegmentationResult:
        if self.grid is None:
            raise SessionError("no grid available")
        seg_res, _ = engine.inspect_image(
            self.image,
            self.grid,
            self.seg_params,
            defect=None,
            exclusions=self.exclusions,
            ref_centroids=None if self.is_reference else self.ref_centroids,
            is_reference=self.is_reference,
        )
        if self.is_reference:
            # fresh reference run resets anchors (indexing_ui.py:2258-2265)
            self.ref_centroids = seg_res.centroid_dict()
        self._states[self.current_path].seg = seg_res
        return seg_res

    def run_inspection(self) -> engine.InspectionResult:
        """Defect pass + verdicts; auto-runs segmentation when missing
        (indexing_ui.py:1648-1662)."""
        state = self._states[self.current_path]
        if state.seg is None:
            self.run_segmentation()
        seg_res, insp = engine.inspect_image(
            self.image,
            self.grid,
            self.seg_params,
            defect=self.defect_params,
            exclusions=self.exclusions,
            ref_centroids=None if self.is_reference else self.ref_centroids,
            is_reference=self.is_reference,
        )
        if self.is_reference:
            self.ref_centroids = seg_res.centroid_dict()
        state.seg = seg_res
        state.insp = insp
        return insp

    def set_inspection(self, enabled: bool) -> engine.InspectionResult | None:
        self.inspection_enabled = bool(enabled)
        return self.run_inspection() if enabled else None

    def results(self, path: str | None = None) -> ImageState:
        return self._states[path or self.current_path]

    # -- persistence ---------------------------------------------------------

    def export_grid(self, path=None) -> dict:
        if self.grid is None:
            raise SessionError("no grid to export")
        h, w = self.image.shape
        doc = GridDocument(
            boxes=grid_boxes(self.grid),
            metadata=grid_metadata(self.grid, w, h),
            exclusions=list(self.exclusions),
            ref_centroids=dict(self.ref_centroids),
        )
        return save_grid(doc, path)

    def import_grid(self, path_or_obj) -> int:
        doc = load_grid(path_or_obj)
        params = doc.grid_params
        if params is None:
            raise SessionError("no valid boxes in grid JSON")
        self.grid = params
        self.exclusions = list(doc.exclusions)
        self.ref_centroids = dict(doc.ref_centroids)
        return len(doc.boxes)

    def export_masks(self, dirpath) -> str:
        state = self.results()
        if state.seg is None:
            raise SessionError("run segmentation first")
        return export_masks_and_csv(list(state.seg.masks), dirpath)
