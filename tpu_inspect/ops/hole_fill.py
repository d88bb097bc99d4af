"""Flood-fill hole filling as a batched fixpoint propagation (OpenCV parity).

Reproduces fill_internal_holes (segmentation.py:27-72): background pixels
4-connected to the image border are "exterior"; any remaining background is
a hole and gets filled. The reference flood-fills per border seed through
OpenCV; here reachability is computed for the whole [U, H, W] batch at once:

    reach <- border & ~fg
    repeat: reach <- row_sweep(col_sweep(reach)) until fixpoint

where each sweep extends reachability through whole free runs in one shot
using segmented cummax (a free run is fully reached as soon as it contains
one reached pixel). Convergence takes O(#bends) sweeps, not O(diameter)
pixel steps, so typical masks converge in a handful of iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_sweep(reach: jnp.ndarray, free: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Extend reach through free runs along `axis` (both directions)."""
    n = reach.shape[axis]
    idx_shape = [1] * reach.ndim
    idx_shape[axis] = n
    idx = jnp.arange(n, dtype=jnp.int32).reshape(idx_shape)
    blocked = ~free
    minus_one = jnp.int32(-1)

    def directed(rev: bool) -> jnp.ndarray:
        last_block = jax.lax.cummax(
            jnp.where(blocked, idx if not rev else (n - 1 - idx), minus_one),
            axis=axis,
            reverse=rev,
        )
        last_seed = jax.lax.cummax(
            jnp.where(reach, idx if not rev else (n - 1 - idx), minus_one),
            axis=axis,
            reverse=rev,
        )
        if rev:
            # cummax(reverse=True) of transformed indices: compare directly
            return free & (last_seed > last_block)
        return free & (last_seed > last_block)

    # forward: seed at smaller index than any block since -> reaches here
    fwd = directed(False)
    # backward: mirror indices so cummax(reverse) compares correctly
    bwd = directed(True)
    return reach | fwd | bwd


def exterior_background(fg: jnp.ndarray) -> jnp.ndarray:
    """Background 4-connected to the border. fg: [U, H, W] bool -> bool mask."""
    free = ~fg
    h, w = fg.shape[-2], fg.shape[-1]

    from tpu_inspect.ops.flood_pallas import (
        flood_fits,
        flood_fits_tiled,
        propagate_pallas,
        propagate_pallas_tiled,
    )

    if flood_fits(fg.shape):
        # the border seed is generated inside the kernel (a materialized
        # [U, H, W] border constant costs ~1.4 ms in HBM copies)
        return propagate_pallas(None, free, conn8=False, border_seed=True)

    border = jnp.zeros(fg.shape, dtype=bool)
    border = border.at[..., 0, :].set(True)
    border = border.at[..., h - 1, :].set(True)
    border = border.at[..., :, 0].set(True)
    border = border.at[..., :, w - 1].set(True)
    seed = border & free
    if flood_fits_tiled(fg.shape):
        # plane exceeds VMEM (e.g. one whole-image 4096x3000 crop):
        # halo-exchanging strip sweeps keep the fixpoint on-chip
        return propagate_pallas_tiled(seed, free, conn8=False)

    def cond(state):
        reach, changed = state
        return changed

    def body(state):
        reach, _ = state
        new = _axis_sweep(reach, free, axis=reach.ndim - 1)
        new = _axis_sweep(new, free, axis=reach.ndim - 2)
        return new, (new != reach).any()

    reach, _ = jax.lax.while_loop(cond, body, (seed, jnp.bool_(True)))
    return reach


def fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """fill_internal_holes parity: uint8 in (any >0 is fg), 0/255 out."""
    fg = mask > 0
    holes = ~fg & ~exterior_background(fg)
    return jnp.where(fg | holes, jnp.uint8(255), jnp.uint8(0))
