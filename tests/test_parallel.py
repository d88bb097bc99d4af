"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np

import jax

from tpu_inspect.config import DefectParams, SegmentationParams
from tpu_inspect.parallel.mesh import inspect_units_sharded, pad_units, unit_mesh
from tpu_inspect import oracle


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    assert unit_mesh().size == 8


def test_pad_units():
    assert pad_units(48, 8) == 48
    assert pad_units(47, 8) == 48
    assert pad_units(3, 8) == 8


def test_sharded_inspect_matches_oracle():
    rng = np.random.RandomState(0)
    # 11 units (non-multiple of 8 exercises padding)
    crops = rng.randint(0, 256, (11, 40, 44), dtype=np.uint8)
    seg_p = SegmentationParams(gaussian_blur=3, morph_kernel=3)
    def_p = DefectParams(threshold=12, min_area=4, erode_px=1)
    masks, dmasks, areas, verdicts = inspect_units_sharded(crops, seg_p, def_p)
    ref_masks, _, _ = oracle.segment_all_units(crops, seg_p)
    np.testing.assert_array_equal(masks, ref_masks)
    _, ref_areas, ref_verd = oracle.inspect_units(crops, ref_masks, def_p)
    np.testing.assert_array_equal(areas, ref_areas)
    np.testing.assert_array_equal(verdicts, ref_verd)


def test_graft_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
