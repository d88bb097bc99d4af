"""Pallas TPU kernel for 8-connected min-label propagation.

The XLA while-loop formulation (ops.cc.label_components) re-reads and
re-writes ~14 MB of HBM per fixpoint iteration. Here each unit's label
plane lives in VMEM for the whole fixpoint:

- gridless kernel (gridded kernels do not compile in this environment)
  looping units, then a while_loop to convergence per unit,
- per iteration: 3x3 neighborhood min via shifted mins, then segmented
  run-min sweeps along rows and columns (Hillis-Steele prefix min with
  run-keyed offsets, since Mosaic has no scan primitives).

Returns the same labels as ops.cc.label_components: min linear index per
component on foreground, 2^30 on background.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(2**30)


def _shift2d(a, dy, dx, fill):
    """a[y, x] <- a[y + dy, x + dx], out-of-range = fill (static shifts)."""
    h, w = a.shape
    if dy > 0:
        a = jnp.concatenate([a[dy:, :], jnp.full((dy, w), fill, a.dtype)], axis=0)
    elif dy < 0:
        a = jnp.concatenate([jnp.full((-dy, w), fill, a.dtype), a[:dy, :]], axis=0)
    if dx > 0:
        a = jnp.concatenate([a[:, dx:], jnp.full((h, dx), fill, a.dtype)], axis=1)
    elif dx < 0:
        a = jnp.concatenate([jnp.full((h, -dx), fill, a.dtype), a[:, :dx]], axis=1)
    return a


def _prefix_min(a, axis, reverse):
    """Hillis-Steele inclusive prefix min along axis (static log steps)."""
    n = a.shape[axis]
    s = 1
    while s < n:
        if axis == 1:
            sh = _shift2d(a, 0, s if reverse else -s, _BIG)
        else:
            sh = _shift2d(a, s if reverse else -s, 0, _BIG)
        a = jnp.minimum(a, sh)
        s *= 2
    return a


def _label_kernel(x_ref, out_ref, scratch_ref, sem, *, u: int, h: int, w: int, k_pow: int):
    K = jnp.int32(1 << k_pow)

    def unit_body(ui, carry):
        # i8 vector compares are unsupported on this target: cast first
        m = x_ref[pl.ds(ui, 1), :, :].reshape(h, w).astype(jnp.int32) > 0
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        init = jnp.where(m, yy * w + xx, _BIG)

        # run keys (precomputed once per unit): key offset = run_id * K
        notm = (~m).astype(jnp.int32)
        row_fwd = _prefix_sum(notm, axis=1, reverse=False) * K
        row_bwd = _prefix_sum(notm, axis=1, reverse=True) * K
        col_fwd = _prefix_sum(notm, axis=0, reverse=False) * K
        col_bwd = _prefix_sum(notm, axis=0, reverse=True) * K

        def seg_sweep(lab, axis, ids_f, ids_b):
            v = jnp.where(m, lab, K - 1)
            f = _prefix_min(v - ids_f, axis, False) + ids_f
            b = _prefix_min(v - ids_b, axis, True) + ids_b
            return jnp.where(m, jnp.minimum(lab, jnp.minimum(f, b)), lab)

        def cond(c):
            return c[1]

        def body(c):
            lab, _ = c
            n8 = lab
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy or dx:
                        n8 = jnp.minimum(n8, _shift2d(lab, dy, dx, _BIG))
            new = jnp.where(m, jnp.minimum(lab, n8), _BIG)
            new = seg_sweep(new, 1, row_fwd, row_bwd)
            new = seg_sweep(new, 0, col_fwd, col_bwd)
            # Mosaic scalar reductions need 32-bit types (bool .any() fails)
            changed = (new != lab).astype(jnp.int32).max() > 0
            return new, changed

        lab, _done = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
        # int32 labels for the whole batch exceed VMEM: DMA per unit to HBM.
        # Scratch/out are tile-padded (8, 128) for DMA alignment.
        hp, wp = scratch_ref.shape
        lab_p = jnp.concatenate(
            [lab, jnp.full((hp - h, w), _BIG, jnp.int32)], axis=0
        )
        lab_p = jnp.concatenate(
            [lab_p, jnp.full((hp, wp - w), _BIG, jnp.int32)], axis=1
        )
        scratch_ref[:, :] = lab_p
        copy = pltpu.make_async_copy(scratch_ref, out_ref.at[ui], sem)
        copy.start()
        copy.wait()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


def _prefix_sum(a, axis, reverse):
    n = a.shape[axis]
    s = 1
    while s < n:
        if axis == 1:
            sh = _shift2d(a, 0, s if reverse else -s, 0)
        else:
            sh = _shift2d(a, s if reverse else -s, 0, 0)
        a = a + sh
        s *= 2
    return a


@jax.jit
def label_components_pallas(fg: jnp.ndarray) -> jnp.ndarray:
    """fg: [U, H, W] bool -> int32 min-index labels (BIG on background)."""
    u, h, w = fg.shape
    hw = h * w
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    assert (max(h, w) + 1) * (1 << k_pow) < 2**31, "unit too large for i32 keys"
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    kernel = functools.partial(_label_kernel, u=u, h=h, w=w, k_pow=k_pow)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, hp, wp), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(fg.astype(jnp.uint8))
    return out[:, :h, :w]
