"""Fused per-unit Pallas stage chains (morphology -> hole fill -> CC stats).

Two pipeline stages are chains of plane-to-plane transforms whose
intermediates have no other consumers:

- segmentation tail (segmentation.py:91-99 + alignment centroid,
  indexing_ui.py:2235-2248): threshold mask -> close+open -> hole fill ->
  largest-component centroid sums;
- defect ROI prep (indexing_ui.py:1495-1512): seg mask -> (2n+1)^2 erode ->
  largest 8-connected component.

Running them as separate kernels (morph chain, flood, CC label, CC stats)
pays a [U, H, W] HBM round trip plus XLA packing glue between every pair.
Here the whole chain runs per unit in VMEM: one input DMA, one output DMA,
one stats row. All pieces are the proven per-plane bodies of the split
kernels (ops.morph_pallas._apply_stage, ops.flood_pallas._local_fixpoint,
ops.cc_pallas._label_fixpoint/_largest_stats) — bit-exactness is inherited.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_inspect.ops.cc_pallas import (
    _label_fixpoint,
    _largest_stats,
)
from tpu_inspect.ops.flood_pallas import _local_fixpoint
from tpu_inspect.ops.morph_pallas import _apply_stage


def _tail_body(
    x_ref,
    thr_ref,
    mask_out,
    stats_out,
    buf,
    sem_out,
    *,
    u: int,
    h: int,
    w: int,
    k_pow: int,
    stages,
    fill: bool,
    out_largest: bool,
    plan: str,
):
    hp, wp = buf.shape

    def unit_body(ui, carry):
        raw = x_ref[pl.ds(ui, 1), :, :].reshape(h, w).astype(jnp.int32)
        if thr_ref is not None:
            # fused THRESH_BINARY_INV: input is the blurred gray plane and
            # thr the per-unit Otsu threshold (segmentation.py:81-82) — the
            # mask plane never materializes in HBM
            t = thr_ref[ui]
            v = jnp.where(raw <= t, jnp.int32(255), jnp.int32(0))
        else:
            # binarize (any >0 is fg) to the 0/255 domain the morphology
            # min/max chain assumes (indexing_ui.py:1489 binarizes first)
            v = jnp.where(raw > 0, jnp.int32(255), jnp.int32(0))
        for op, runs in stages:
            red = jnp.minimum if op == "erode" else jnp.maximum
            fl = np.int32(255) if op == "erode" else np.int32(0)
            v = _apply_stage(v, op, runs, red, fl)
        m = v > 0
        if fill:
            yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            border = (yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1)
            dom = ~m
            ext = _local_fixpoint(dom, border & dom, conn8=False) > 0
            m = m | ~ext  # fg + enclosed holes (segmentation.py:27-72)

        lab = _label_fixpoint(m, h, w, k_pow, plan)
        bmi, best_area, sx, sy = _largest_stats(lab, w)

        # row/col extent of the selected component (lanes 4-7): the defect
        # path's median kernel only processes ROI rows and a narrowed ROI
        # column window; emitting the bounds here saves the XLA any/argmax
        # reduction passes (empty -> (h, 0) / (w, 0), the neutrals of the
        # median kernel's group union)
        yy_l = jax.lax.broadcasted_iota(jnp.int32, bmi.shape, 0)
        xx_l = jax.lax.broadcasted_iota(jnp.int32, bmi.shape, 1)
        row_lo = jnp.where(bmi > 0, yy_l, jnp.int32(h)).min()
        row_hi = jnp.where(bmi > 0, yy_l + 1, jnp.int32(0)).max()
        col_lo = jnp.where(bmi > 0, xx_l, jnp.int32(w)).min()
        col_hi = jnp.where(bmi > 0, xx_l + 1, jnp.int32(0)).max()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        z = jnp.zeros((1, 8, 128), jnp.int32)
        has_i = jnp.where(best_area > 0, jnp.int32(1), jnp.int32(0))
        row = (
            jnp.where(lane == 0, best_area, z)
            + jnp.where(lane == 1, sx, z)
            + jnp.where(lane == 2, sy, z)
            + jnp.where(lane == 3, has_i, z)
            + jnp.where(lane == 4, row_lo, z)
            + jnp.where(lane == 5, row_hi, z)
            + jnp.where(lane == 6, col_lo, z)
            + jnp.where(lane == 7, col_hi, z)
        )
        stats_out[pl.ds(ui, 1), :, :] = row

        out = bmi * 255 if out_largest else m.astype(jnp.int32) * 255
        if hp > h:
            out = jnp.concatenate(
                [out, jnp.zeros((hp - h, w), jnp.int32)], axis=0
            )
        if wp > w:
            out = jnp.concatenate(
                [out, jnp.zeros((hp, wp - w), jnp.int32)], axis=1
            )
        buf[:, :] = out.astype(jnp.uint8)
        cp = pltpu.make_async_copy(buf, mask_out.at[ui], sem_out)
        cp.start()
        cp.wait()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


def _tail_kernel(x_ref, mask_out, stats_out, buf, sem_out, **static):
    _tail_body(x_ref, None, mask_out, stats_out, buf, sem_out, **static)


def _tail_thr_kernel(x_ref, thr_ref, mask_out, stats_out, buf, sem_out, **st):
    _tail_body(x_ref, thr_ref, mask_out, stats_out, buf, sem_out, **st)


@functools.partial(
    jax.jit, static_argnames=("stages", "fill", "out_largest", "plan")
)
def seg_tail_pallas(
    mask: jnp.ndarray,
    stages=(),
    fill: bool = False,
    out_largest: bool = False,
    plan: str = "crc",
    thr: jnp.ndarray | None = None,
):
    """mask [U,H,W] uint8 (any >0 = fg) -> (out_mask [U,H,W] uint8 0/255,
    area [U] i32, sx [U] i32, sy [U] i32, has_fg [U] bool,
    row_lo [U] i32, row_hi [U] i32, col_lo [U] i32, col_hi [U] i32 — the
    selected component's row/col extents, (h, 0) / (w, 0) when empty).

    Applies the static morphology ``stages`` (see ops.morph_pallas), then
    optional border-flood hole filling, then largest-8-connected-component
    stats, all per unit in VMEM. ``out_mask`` is the processed plane, or the
    largest component itself with ``out_largest`` (the defect-ROI form).
    With ``thr`` ([U] int32), the input is instead the blurred gray plane
    and the fg mask is the in-kernel THRESH_BINARY_INV ``x <= thr``.
    """
    u, h, w = mask.shape
    hw = h * w
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    assert (max(h, w) + 1) * (1 << k_pow) < 2**31, "unit too large for i32 keys"
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    static = dict(
        u=u,
        h=h,
        w=w,
        k_pow=k_pow,
        stages=stages,
        fill=bool(fill),
        out_largest=bool(out_largest),
        plan=plan,
    )
    out_shape = (
        jax.ShapeDtypeStruct((u, hp, wp), jnp.uint8),
        jax.ShapeDtypeStruct((u, 8, 128), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    scratch = [pltpu.VMEM((hp, wp), jnp.uint8), pltpu.SemaphoreType.DMA]
    if thr is None:
        out, stats = pl.pallas_call(
            functools.partial(_tail_kernel, **static),
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )(mask)
    else:
        out, stats = pl.pallas_call(
            functools.partial(_tail_thr_kernel, **static),
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )(mask, thr.astype(jnp.int32))
    return (
        out[:, :h, :w],
        stats[:, 0, 0],
        stats[:, 0, 1],
        stats[:, 0, 2],
        stats[:, 0, 3] > 0,
        stats[:, 0, 4],
        stats[:, 0, 5],
        stats[:, 0, 6],
        stats[:, 0, 7],
    )


def tail_fits(shape) -> bool:
    """Gate: whole-batch uint8 input + ~8 per-unit int32 planes in VMEM,
    int32-safe coordinate sums."""
    from tpu_inspect.ops.common import fused_disabled

    if fused_disabled():
        return False
    u, h, w = shape
    hw = h * w
    k_pow = max(2, int(np.ceil(np.log2(hw + 2))))
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    return (
        on_tpu
        and (max(h, w) + 1) * (1 << k_pow) < 2**31
        and max(h, w) * h * w < 2**31
        and u * h * w + 9 * hp * wp * 4 < 12 * 2**20
    )
