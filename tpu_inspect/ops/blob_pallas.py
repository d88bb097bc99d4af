"""Pallas TPU kernel for the defect blob filter (contourArea + selection).

Replaces the sort-based reduction in ops.contour.filter_and_select on TPU:
per unit, the fill-region labels and the top-blob/exterior state stay in
VMEM while top-level blobs are enumerated sequentially (each root is the
unique pixel with label == own linear index). Per root, the Green's-theorem
2x contour area is a masked sum of the crack-vertex contribution plane
(derived 81-config table, see ops.contour), the min<=area<=max decision is
a scalar compare, and kept blobs paint their whole fill region (blob +
enclosed holes/nested content — filled drawContours semantics,
indexing_ui.py:1540-1558) with a vector select. No sort, no scatter, no
final flood.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_inspect.ops._contour_table import CONTOUR_TABLE_X2
from tpu_inspect.ops.cc_pallas import _BIG, _shift2d, _sum_f32exact


def _select_kernel(
    max_hbm,
    lab_hbm,
    pk_hbm,
    out_hbm,
    lab_buf,
    pk_buf,
    out_buf,
    sem_a,
    sem_b,
    sem_out,
    *,
    u: int,
    h: int,
    w: int,
    min_x2: int,
):
    hp, wp = lab_buf.shape
    tbl = np.asarray(CONTOUR_TABLE_X2)

    def unit_body(ui, carry):
        cp_a = pltpu.make_async_copy(lab_hbm.at[ui], lab_buf, sem_a)
        cp_b = pltpu.make_async_copy(pk_hbm.at[ui], pk_buf, sem_b)
        cp_a.start()
        cp_b.start()
        cp_a.wait()
        cp_b.wait()
        lab = lab_buf[:, :]
        pk = pk_buf[:, :].astype(jnp.int32)
        top = (pk & 1) > 0
        ext = (pk & 2) > 0

        # crack-vertex config: vertex (y, x) sees pixels (y-1..y, x-1..x);
        # out-of-plane reads are exterior (state 1), matching the padded
        # construction in ops.contour.analyze_blobs
        state = jnp.where(top, jnp.int32(2), ext.astype(jnp.int32))
        s00 = _shift2d(state, -1, -1, np.int32(1))
        s01 = _shift2d(state, -1, 0, np.int32(1))
        s10 = _shift2d(state, 0, -1, np.int32(1))
        cfg = s00 + 3 * s01 + 9 * s10 + 27 * state

        def coef(col):
            out = jnp.zeros((hp, wp), dtype=jnp.int32)
            for c in np.nonzero(tbl[:, col] == 1)[0]:
                out = out + (cfg == int(c)).astype(jnp.int32)
            for c in np.nonzero(tbl[:, col] == -1)[0]:
                out = out - (cfg == int(c)).astype(jnp.int32)
            return out

        yy = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
        contrib = coef(0) + coef(1) * xx + coef(2) * yy

        # vertex -> top-blob attribution (top blobs are never 8-adjacent,
        # so at most one per vertex)
        labt = jnp.where(top, lab, jnp.int32(-1))
        attr = jnp.maximum(
            jnp.maximum(
                _shift2d(labt, -1, -1, np.int32(-1)),
                _shift2d(labt, -1, 0, np.int32(-1)),
            ),
            jnp.maximum(_shift2d(labt, 0, -1, np.int32(-1)), labt),
        )

        lin = yy * w + xx
        rootf = jnp.where(top & (lab == lin), lin, _BIG)
        # per-unit scalar broadcast into an (8,128) tile; any reduction
        # recovers it (scalar extraction from vectors is fragile in Mosaic)
        max_x2 = max_hbm[pl.ds(ui, 1), :, :].max()

        def next_root(r):
            return jnp.where(rootf > r, rootf, _BIG).min()

        def cond(c):
            return c[0] < _BIG

        def body(c):
            nxt, out = c
            # |contrib| <= 1 + (hp-1) + (wp-1): column sums f32-exact
            s = _sum_f32exact(
                jnp.where(attr == nxt, contrib, jnp.int32(0)),
                hp * (hp + wp),
            )
            a2 = jnp.abs(s)
            keep = (a2 >= jnp.int32(min_x2)) & (a2 <= max_x2)
            out = jnp.where(keep & (lab == nxt), jnp.int32(1), out)
            return next_root(nxt), out

        _, out = jax.lax.while_loop(
            cond,
            body,
            (next_root(jnp.int32(-1)), jnp.zeros((hp, wp), jnp.int32)),
        )
        out_buf[:, :] = out.astype(jnp.uint8)
        cp_out = pltpu.make_async_copy(out_buf, out_hbm.at[ui], sem_out)
        cp_out.start()
        cp_out.wait()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("min_x2", "h", "w"))
def blob_select_pallas(
    fill_labels: jnp.ndarray,
    top: jnp.ndarray,
    ext: jnp.ndarray,
    max_x2: jnp.ndarray,
    *,
    min_x2: int,
    h: int,
    w: int,
) -> jnp.ndarray:
    """fill_labels [U,H,W] i32 (BIG on exterior), top/ext [U,H,W] bool,
    max_x2 [U] i32 -> kept filled mask [U,H,W] bool (2x-contourArea filter
    min_x2 <= |area| <= max_x2 per top-level blob)."""
    u = fill_labels.shape[0]
    # vertex rows/cols reach h and w: pad past them
    hp = -(-(h + 1) // 8) * 8
    wp = -(-(w + 1) // 128) * 128
    lab_p = jnp.pad(
        fill_labels, ((0, 0), (0, hp - h), (0, wp - w)), constant_values=_BIG
    )
    packed = top.astype(jnp.uint8) | (ext.astype(jnp.uint8) << 1)
    pk_p = jnp.pad(
        packed, ((0, 0), (0, hp - h), (0, wp - w)), constant_values=2
    )
    max_b = jnp.broadcast_to(
        max_x2.astype(jnp.int32)[:, None, None], (u, 8, 128)
    )
    kernel = functools.partial(
        _select_kernel, u=u, h=h, w=w, min_x2=int(min_x2)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, hp, wp), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.int32),
            pltpu.VMEM((hp, wp), jnp.uint8),
            pltpu.VMEM((hp, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(max_b, lab_p, pk_p)
    return out[:, :h, :w] > 0


def blob_select_fits(shape) -> bool:
    _, h, w = shape
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    hp = -(-(h + 1) // 8) * 8
    wp = -(-(w + 1) // 128) * 128
    # contourArea 2x sums and lin fit int32 comfortably for unit crops
    return on_tpu and h * w < 2**24 and 10 * hp * wp * 4 < 12 * 2**20


# ---------------------------------------------------------------------------
# Fully fused blob filter: exterior flood + fill-region labeling + top-blob
# reachability + Green's-area select in ONE kernel (per-unit VMEM-resident)
# ---------------------------------------------------------------------------


def _blob_body(
    max_hbm,
    fg_hbm,
    roi_hbm,
    out_hbm,
    area_out,
    fg_buf,
    roi_buf,
    out_buf,
    sem_in,
    sem_roi,
    sem_out,
    *,
    u: int,
    h: int,
    w: int,
    k_pow: int,
    min_x2: int,
    open_stages,
):
    """The whole filter_and_select device stage per unit, VMEM-resident:

    1. exterior = 4-connected flood of background from the plane border
       (the padded plane's border stands in for the image border — padding
       is background connected to the logical border columns/rows);
    2. fill regions = ~exterior, min-index labeled (8-connected);
    3. top-level blobs = fg reachable from fill-region roots (a fill
       region's raster-first pixel is fg and belongs to its top blob, so a
       seeded 8-connected flood through fg replaces a second CC labeling);
    4. per-root Green's contourArea + min/max filter + fill-region paint
       (the _select_kernel body).

    The split formulation ran four kernels with [U, H, W] planes
    round-tripping HBM (+ XLA packing glue) between them.
    """
    from tpu_inspect.ops.cc_pallas import _label_fixpoint
    from tpu_inspect.ops.flood_pallas import _local_fixpoint

    hp, wp = fg_buf.shape
    tbl = np.asarray(CONTOUR_TABLE_X2)

    from tpu_inspect.ops.morph_pallas import _apply_stage

    def unit_body(ui, carry):
        cp_in = pltpu.make_async_copy(fg_hbm.at[ui], fg_buf, sem_in)
        cp_in.start()
        cp_roi = None
        if roi_hbm is not None:
            cp_roi = pltpu.make_async_copy(roi_hbm.at[ui], roi_buf, sem_roi)
            cp_roi.start()
        cp_in.wait()

        yy = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
        pad_zone = (yy >= h) | (xx >= w)

        v = fg_buf[:, :].astype(jnp.int32)
        if roi_hbm is not None:
            # candidate & ROI (indexing_ui.py:1528-1529); rows the
            # row-bounded median kernel left unwritten are outside the ROI
            # by construction, so the AND also launders them
            cp_roi.wait()
            roi_i = roi_buf[:, :].astype(jnp.int32)
            v = jnp.where(roi_i > 0, v, jnp.int32(0))
        for op, runs in open_stages:
            # OpenCV clip-to-image border: out-of-LOGICAL-image is the op's
            # neutral, so preset the padding region before each stage and
            # scrub it after (the flood below needs padding = background)
            red = jnp.minimum if op == "erode" else jnp.maximum
            fl = np.int32(255) if op == "erode" else np.int32(0)
            v = jnp.where(pad_zone, fl, v)
            v = _apply_stage(v, op, runs, red, fl)
        if open_stages:
            v = jnp.where(pad_zone, jnp.int32(0), v)
        m = v > 0

        # Empty-candidate fast path: most units have NO surviving candidate
        # pixels (no contours -> None in the reference, indexing_ui.py:1559),
        # so the floods / labeling / Green's filter below would burn full
        # fixpoint passes to produce an all-zero plane. Predicate the whole
        # tail on a single max-reduce instead (measured: the majority of the
        # blob kernel's time on the production workload was empty units).
        has_any = m.astype(jnp.int32).max()

        @pl.when(has_any == 0)
        def _empty():
            area_out[pl.ds(ui, 1), :, :] = jnp.zeros((1, 8, 128), jnp.int32)
            out_buf[:, :] = jnp.zeros((hp, wp), jnp.uint8)
            cp0 = pltpu.make_async_copy(out_buf, out_hbm.at[ui], sem_out)
            cp0.start()
            cp0.wait()

        @pl.when(has_any != 0)
        def _full():
            _blob_tail(ui, m)

        return carry

    def _blob_tail(ui, m):
        yy = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
        border = (yy == 0) | (yy == hp - 1) | (xx == 0) | (xx == wp - 1)
        ext = _local_fixpoint(~m, border & ~m, conn8=False) > 0
        fill = ~ext

        # min-index labels in PADDED coordinates (lin = yy*wp + xx): only
        # intra-kernel consistency matters — the painted mask is coordinate-
        # convention-free
        lab = _label_fixpoint(fill, hp, wp, k_pow, "rc")
        lin = yy * wp + xx
        roots = m & (lab == lin)
        top = _local_fixpoint(m, roots, conn8=True) > 0

        state = jnp.where(top, jnp.int32(2), ext.astype(jnp.int32))
        s00 = _shift2d(state, -1, -1, np.int32(1))
        s01 = _shift2d(state, -1, 0, np.int32(1))
        s10 = _shift2d(state, 0, -1, np.int32(1))
        cfg = s00 + 3 * s01 + 9 * s10 + 27 * state

        def coef(col):
            out = jnp.zeros((hp, wp), dtype=jnp.int32)
            for c in np.nonzero(tbl[:, col] == 1)[0]:
                out = out + (cfg == int(c)).astype(jnp.int32)
            for c in np.nonzero(tbl[:, col] == -1)[0]:
                out = out - (cfg == int(c)).astype(jnp.int32)
            return out

        contrib = coef(0) + coef(1) * xx + coef(2) * yy

        labt = jnp.where(top, lab, jnp.int32(-1))
        attr = jnp.maximum(
            jnp.maximum(
                _shift2d(labt, -1, -1, np.int32(-1)),
                _shift2d(labt, -1, 0, np.int32(-1)),
            ),
            jnp.maximum(_shift2d(labt, 0, -1, np.int32(-1)), labt),
        )

        rootf = jnp.where(roots, lin, _BIG)
        max_x2 = max_hbm[pl.ds(ui, 1), :, :].max()

        def next_root(r):
            return jnp.where(rootf > r, rootf, _BIG).min()

        def cond(c):
            return c[0] < _BIG

        def body(c):
            nxt, out = c
            # |contrib| <= 1 + (hp-1) + (wp-1): column sums f32-exact
            s = _sum_f32exact(
                jnp.where(attr == nxt, contrib, jnp.int32(0)),
                hp * (hp + wp),
            )
            a2 = jnp.abs(s)
            keep = (a2 >= jnp.int32(min_x2)) & (a2 <= max_x2)
            out = jnp.where(keep & (lab == nxt), jnp.int32(1), out)
            return next_root(nxt), out

        _, out = jax.lax.while_loop(
            cond,
            body,
            (next_root(jnp.int32(-1)), jnp.zeros((hp, wp), jnp.int32)),
        )
        # per-unit pixel area of the kept mask (the verdict input,
        # indexing_ui.py:1691-1700) — saves the XLA [U,H,W] sum + masking
        # passes downstream
        area = _sum_f32exact(out, hp)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        area_out[pl.ds(ui, 1), :, :] = jnp.where(
            lane == 0, area, jnp.zeros((1, 8, 128), jnp.int32)
        )
        out_buf[:, :] = (out * 255).astype(jnp.uint8)
        cp_out = pltpu.make_async_copy(out_buf, out_hbm.at[ui], sem_out)
        cp_out.start()
        cp_out.wait()

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


def _blob_filter_kernel(
    max_hbm, fg_hbm, out_hbm, area_out, fg_buf, out_buf, sem_in, sem_out,
    **static
):
    """No-ROI entry: same body, dummy roi refs."""
    _blob_body(
        max_hbm, fg_hbm, None, out_hbm, area_out, fg_buf, None, out_buf,
        sem_in, None, sem_out, **static,
    )


def _blob_filter_roi_kernel(
    max_hbm, fg_hbm, roi_hbm, out_hbm, area_out, fg_buf, roi_buf, out_buf,
    sem_in, sem_roi, sem_out, **static
):
    _blob_body(
        max_hbm, fg_hbm, roi_hbm, out_hbm, area_out, fg_buf, roi_buf,
        out_buf, sem_in, sem_roi, sem_out, **static,
    )


@functools.partial(jax.jit, static_argnames=("min_x2", "pre_open"))
def blob_filter_pallas(
    fg: jnp.ndarray,
    max_x2: jnp.ndarray,
    *,
    min_x2: int,
    roi: jnp.ndarray | None = None,
    pre_open: bool = False,
) -> jnp.ndarray:
    """fg [U,H,W] uint8/bool candidate mask, max_x2 [U] i32 ->
    (kept filled mask [U,H,W] uint8 0/255, pixel area [U] i32)
    (filter_and_select semantics, one fused kernel).

    Optional head stages folded into the same kernel (the defect path,
    indexing_ui.py:1528-1532): ``roi`` ANDs the candidate with the ROI
    plane, ``pre_open`` applies the 3x3-ellipse open before the filter.
    """
    u, h, w = fg.shape
    # vertex rows/cols reach h and w: pad past them (padding = background,
    # which the border flood marks exterior — matching the logical-plane
    # construction in ops.contour)
    hp = -(-(h + 1) // 8) * 8
    wp = -(-(w + 1) // 128) * 128
    k_pow = max(2, int(np.ceil(np.log2(hp * wp + 2))))
    assert (max(hp, wp) + 1) * (1 << k_pow) < 2**31
    fg_p = jnp.pad(fg.astype(jnp.uint8), ((0, 0), (0, hp - h), (0, wp - w)))
    max_b = jnp.broadcast_to(
        max_x2.astype(jnp.int32)[:, None, None], (u, 8, 128)
    )
    if pre_open:
        from tpu_inspect.ops.morph_pallas import _open_stages

        open_stages = _open_stages(3)
    else:
        open_stages = ()
    static = dict(
        u=u, h=h, w=w, k_pow=k_pow, min_x2=int(min_x2),
        open_stages=open_stages,
    )
    out_shape = (
        jax.ShapeDtypeStruct((u, hp, wp), jnp.uint8),
        jax.ShapeDtypeStruct((u, 8, 128), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    if roi is None:
        kernel = functools.partial(_blob_filter_kernel, **static)
        out, area = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((hp, wp), jnp.uint8),
                pltpu.VMEM((hp, wp), jnp.uint8),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(max_b, fg_p)
        return out[:, :h, :w], area[:, 0, 0]
    roi_p = jnp.pad(roi.astype(jnp.uint8), ((0, 0), (0, hp - h), (0, wp - w)))
    kernel = functools.partial(_blob_filter_roi_kernel, **static)
    out, area = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.uint8),
            pltpu.VMEM((hp, wp), jnp.uint8),
            pltpu.VMEM((hp, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(max_b, fg_p, roi_p)
    return out[:, :h, :w], area[:, 0, 0]


def blob_filter_fits(shape) -> bool:
    """Gate for blob_filter_pallas: the padded-plane i32 keys must fit and
    the per-unit working set (several i32 planes during the fixpoints) must
    stay within VMEM."""
    from tpu_inspect.ops.common import fused_disabled

    if fused_disabled():
        return False
    _, h, w = shape
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    hp = -(-(h + 1) // 8) * 8
    wp = -(-(w + 1) // 128) * 128
    k_pow = max(2, int(np.ceil(np.log2(hp * wp + 2))))
    return (
        on_tpu
        and (max(hp, wp) + 1) * (1 << k_pow) < 2**31
        and 12 * hp * wp * 4 < 12 * 2**20
    )
