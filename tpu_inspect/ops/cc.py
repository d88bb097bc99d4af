"""Batched 8-connected component labeling + stats (OpenCV parity).

Replaces cv2.connectedComponentsWithStats (indexing_ui.py:1505, :2240) with
an iterative min-label propagation fully vectorized over [U, H, W]:

- init: every foreground pixel is labeled with its linear index y*W+x,
- each round takes a 3x3 neighborhood min (8-connectivity) followed by
  segmented cummin sweeps along rows and columns (a label crosses a whole
  foreground run per sweep, so convergence is O(#bends), not O(diameter)),
- fixpoint: label == min linear index of the component ("root").

Roots are stable identifiers: the root is the component's raster-first
pixel, so OpenCV's label order (components numbered by first raster
appearance) maps to ascending root order, and `argmax`-style area
tie-breaks (first max) match the reference's np.argmax over OpenCV labels
(indexing_ui.py:1508-1509, :2243-2244).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

_BIG = np.int32(2**30)  # concrete (not traced): reduce_window needs a const init


def _seg_cummin(vals: jnp.ndarray, fg: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min-propagate along `axis` within contiguous fg runs (both directions)."""

    def op(a, b):
        a_f, a_v = a
        b_f, b_v = b
        # flag: does the combined segment start fresh at b?
        return a_f & b_f, jnp.where(b_f, jnp.minimum(a_v, b_v), b_v)

    v = jnp.where(fg, vals, _BIG)
    fwd = jax.lax.associative_scan((op), (fg, v), axis=axis)[1]
    bwd = jax.lax.associative_scan((op), (fg, v), axis=axis, reverse=True)[1]
    return jnp.where(fg, jnp.minimum(fwd, bwd), vals)


def _nbhd_min(vals: jnp.ndarray) -> jnp.ndarray:
    """3x3 window min (8-neighborhood + self)."""
    p = jnp.pad(vals, ((0, 0), (1, 1), (1, 1)), constant_values=_BIG)
    return jax.lax.reduce_window(
        p, _BIG, jax.lax.min, (1, 3, 3), (1, 1, 1), "VALID"
    )


def label_components(fg: jnp.ndarray) -> jnp.ndarray:
    """fg: [U, H, W] bool -> int32 root labels (y*W+x of raster-first pixel).

    Background pixels get _BIG (2^30).
    """
    u, h, w = fg.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (u, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (u, h, w), 2)
    init = jnp.where(fg, yy * w + xx, _BIG)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = jnp.where(fg, jnp.minimum(labels, _nbhd_min(labels)), _BIG)
        new = _seg_cummin(new, fg, axis=2)
        new = _seg_cummin(new, fg, axis=1)
        return new, (new != labels).any()

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return labels


def component_areas(labels: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """Per-root pixel counts. Returns [U, H*W] int32 (0 for non-roots)."""
    u, h, w = labels.shape
    hw = h * w
    flat = labels.reshape(u, hw)
    fgf = fg.reshape(u, hw)
    idx = jnp.where(fgf, flat, hw)  # spill bucket for background
    areas = jnp.zeros((u, hw + 1), dtype=jnp.int32)
    areas = areas.at[jnp.arange(u)[:, None], idx].add(1)
    return areas[:, :hw]


def largest_component(fg: jnp.ndarray):
    """Largest 8-connected component per unit.

    Returns (mask [U,H,W] bool, area [U] int32, centroid [U,2] f64 (cx, cy),
    has_fg [U] bool). Centroid is the float64 mean of member coordinates,
    matching _largest_component_centroid (indexing_ui.py:2235-2248); it is
    (0, 0) when the unit has no foreground.
    """
    u, h, w = fg.shape
    labels = label_components(fg)
    areas = component_areas(labels, fg)
    best = jnp.argmax(areas, axis=1).astype(jnp.int32)  # first max = min root
    best_mask = fg & (labels == best[:, None, None])
    area = jnp.take_along_axis(areas, best[:, None], axis=1)[:, 0]
    xs = jax.lax.broadcasted_iota(jnp.int32, (u, h, w), 2)
    ys = jax.lax.broadcasted_iota(jnp.int32, (u, h, w), 1)
    cnt = jnp.maximum(area, 1).astype(jnp.float64)
    cx = jnp.where(best_mask, xs, 0).sum(axis=(1, 2), dtype=jnp.float64) / cnt
    cy = jnp.where(best_mask, ys, 0).sum(axis=(1, 2), dtype=jnp.float64) / cnt
    has_fg = fg.any(axis=(1, 2))
    centroid = jnp.stack([cx, cy], axis=-1)
    return best_mask, area, centroid, has_fg
