"""Multi-chip scaling: unit-batch data parallelism over a device mesh.

The reference has no distributed code at all (SURVEY.md section 2b): it
loops units on one CPU thread. The TPU-native scaling axis is the unit
batch: every per-unit pipeline stage is independent, so sharding the
leading [units] dimension across chips with jax.sharding turns the whole
inspection into pure data parallelism — XLA inserts zero collectives on the
hot path, and only the tiny per-unit outputs (verdicts, centroids) are
gathered at the end over ICI.

For multi-image streaming (BASELINE.json config 5), a 2D mesh
("image", "unit") shards a [images, units, H, W] batch both ways.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_inspect.config import DefectParams, SegmentationParams


def unit_mesh(devices=None) -> Mesh:
    """1D mesh over all (or given) devices; axis 'unit' shards the unit batch."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), axis_names=("unit",))


def pad_units(n: int, n_shards: int) -> int:
    """Units are padded to a multiple of the mesh size (padded units are
    all-background crops and produce OK verdicts that callers slice off)."""
    return (n + n_shards - 1) // n_shards * n_shards


@functools.partial(jax.jit, static_argnames=("seg", "defect", "mesh"))
def _sharded_inspect(crops, *, seg: SegmentationParams, defect: DefectParams, mesh: Mesh):
    from tpu_inspect.engine import _defect_device, _segment_device

    u = crops.shape[0]
    crops = jax.lax.with_sharding_constraint(
        crops, NamedSharding(mesh, P("unit", None, None))
    )
    rects = jnp.zeros((0, 4), dtype=jnp.int32)
    circles = jnp.zeros((0, 3), dtype=jnp.int32)
    refc = jnp.zeros((u, 2), dtype=jnp.float64)
    refv = jnp.zeros((u,), dtype=bool)
    masks, centroid, has_fg, shifts = _segment_device(
        crops, rects, circles, refc, refv,
        seg=seg, is_reference=True, shape_hw=(crops.shape[1], crops.shape[2]),
    )
    dmasks, found, area, verdict = _defect_device(crops, masks, params=defect)
    return masks, dmasks, area, verdict


def inspect_units_sharded(
    crops: np.ndarray,
    seg: SegmentationParams | None = None,
    defect: DefectParams | None = None,
    mesh: Mesh | None = None,
):
    """Inspect a unit batch sharded across chips.

    Returns (seg masks, defect masks, areas, verdicts) as host arrays with
    padding stripped.
    """
    seg = (seg or SegmentationParams()).validated()
    defect = (defect or DefectParams()).validated()
    mesh = mesh or unit_mesh()
    n = crops.shape[0]
    n_pad = pad_units(n, mesh.size)
    if n_pad != n:
        pad = np.zeros((n_pad - n,) + crops.shape[1:], dtype=crops.dtype)
        crops = np.concatenate([crops, pad], axis=0)
    arr = jax.device_put(
        jnp.asarray(crops, dtype=jnp.uint8),
        NamedSharding(mesh, P("unit", None, None)),
    )
    masks, dmasks, area, verdict = _sharded_inspect(arr, seg=seg, defect=defect, mesh=mesh)
    return (
        np.asarray(masks)[:n],
        np.asarray(dmasks)[:n],
        np.asarray(area)[:n],
        np.asarray(verdict)[:n],
    )
