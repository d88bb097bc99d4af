"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np

import jax

from tpu_inspect.config import DefectParams, GridParams, SegmentationParams
from tpu_inspect.parallel.mesh import (
    image_unit_mesh,
    inspect_image_batch_sharded,
    inspect_units_sharded,
    pad_units,
    unit_mesh,
)
from tpu_inspect import oracle

SEG = SegmentationParams(gaussian_blur=3, morph_kernel=3)
DEF = DefectParams(threshold=12, min_area=4, erode_px=1)
EXCL = [
    {"shape": "rect", "x": 3, "y": 5, "w": 8, "h": 6},
    {"shape": "circle", "cx": 30, "cy": 12, "r": 4},
]


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    assert unit_mesh().size == 8
    m2 = image_unit_mesh(2)
    assert m2.shape == {"image": 2, "unit": 4}


def test_pad_units():
    assert pad_units(48, 8) == 48
    assert pad_units(47, 8) == 48
    assert pad_units(3, 8) == 8


def test_sharded_inspect_matches_oracle():
    rng = np.random.RandomState(0)
    # 11 units (non-multiple of 8 exercises padding)
    crops = rng.randint(0, 256, (11, 40, 44), dtype=np.uint8)
    seg_res, insp = inspect_units_sharded(crops, SEG, DEF)
    ref_masks, _, _ = oracle.segment_all_units(crops, SEG)
    np.testing.assert_array_equal(seg_res.masks, ref_masks)
    _, ref_areas, ref_verd = oracle.inspect_units(crops, ref_masks, DEF)
    np.testing.assert_array_equal(insp.areas, ref_areas)
    np.testing.assert_array_equal(insp.verdicts, ref_verd)


def test_sharded_inspect_with_exclusions_and_alignment():
    """The sharded path runs the REAL workflow: exclusions + per-unit
    centroid-alignment shifts (mirrors test_session_cli's oracle flow)."""
    rng = np.random.RandomState(7)
    crops = rng.randint(0, 256, (16, 40, 44), dtype=np.uint8)

    # reference pass records anchors
    seg_ref, _ = inspect_units_sharded(
        crops, SEG, DEF, exclusions=EXCL, is_reference=True
    )
    o_masks, o_anchors, _ = oracle.segment_all_units(
        crops, SEG, exclusions=EXCL, is_reference=True
    )
    np.testing.assert_array_equal(seg_ref.masks, o_masks)
    assert seg_ref.centroid_dict() == o_anchors

    # shifted capture: exclusions must track the centroid shift per unit
    crops2 = np.roll(crops, 2, axis=2)
    seg2, insp2 = inspect_units_sharded(
        crops2,
        SEG,
        DEF,
        exclusions=EXCL,
        ref_centroids=o_anchors,
        is_reference=False,
    )
    o_masks2, _, o_shifts = oracle.segment_all_units(
        crops2, SEG, exclusions=EXCL, ref_centroids=o_anchors,
        is_reference=False,
    )
    np.testing.assert_array_equal(seg2.masks, o_masks2)
    np.testing.assert_array_equal(seg2.shifts, o_shifts)
    _, o_areas, o_verd = oracle.inspect_units(crops2, o_masks2, DEF)
    np.testing.assert_array_equal(insp2.areas, o_areas)
    np.testing.assert_array_equal(insp2.verdicts, o_verd)


def test_image_batch_sharded_matches_oracle():
    """2D ("image","unit") mesh over full-image frames (config 5)."""
    from tpu_inspect.imageio import crops_for_grid

    rng = np.random.RandomState(3)
    grid = GridParams(base_unit=(4, 6, 32, 30), units_x=4, units_y=2)
    images = rng.randint(0, 256, (2, 80, 150), dtype=np.uint8)
    anchors = {i: (15.0, 14.0) for i in range(grid.num_units)}
    mesh = image_unit_mesh(2)
    verd, areas, found, masks, dmasks = inspect_image_batch_sharded(
        images, grid, SEG, DEF, exclusions=EXCL, ref_centroids=anchors,
        mesh=mesh,
    )
    assert verd.shape == (2, grid.num_units)
    for b in range(2):
        crops = np.asarray(crops_for_grid(images[b], grid))
        o_masks, _, _ = oracle.segment_all_units(
            crops, SEG, exclusions=EXCL, ref_centroids=anchors,
            is_reference=False,
        )
        np.testing.assert_array_equal(masks[b], o_masks)
        _, o_areas, o_verd = oracle.inspect_units(crops, o_masks, DEF)
        np.testing.assert_array_equal(areas[b], o_areas)
        np.testing.assert_array_equal(verd[b], o_verd)


def test_stream_inspect_sharded():
    from tpu_inspect.streaming import stream_inspect_sharded

    rng = np.random.RandomState(5)
    grid = GridParams(base_unit=(2, 2, 24, 20), units_x=2, units_y=2)
    frames = [
        rng.randint(0, 256, (50, 60), dtype=np.uint8) for _ in range(3)
    ]
    results = list(
        stream_inspect_sharded(frames, grid, SEG, DEF, exclusions=EXCL)
    )
    assert [r.index for r in results] == [0, 1, 2]
    from tpu_inspect.imageio import crops_for_grid

    for r, frame in zip(results, frames):
        crops = np.asarray(crops_for_grid(frame, grid))
        o_masks, _, _ = oracle.segment_all_units(
            crops, SEG, exclusions=EXCL, is_reference=True
        )
        _, o_areas, o_verd = oracle.inspect_units(crops, o_masks, DEF)
        np.testing.assert_array_equal(r.areas, o_areas)
        np.testing.assert_array_equal(r.verdicts, o_verd)
        assert r.ng_count == int(o_verd.sum())


def test_graft_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
