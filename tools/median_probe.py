"""Ablation probes for the median-residual kernel's per-row cost.

Each variant strips one piece of the row loop (histogram update, query
mask, matmul, output write) — the deltas attribute the 3.7 ms of
median_residual_mask_pallas to its components. PERF-ONLY: variants are
numerically wrong by construction; never ship them.

Usage: python tools/median_probe.py [baseline noupdate noquery nomatmul ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 4


def _kernel(
    x_ref, s2_ref, lo_ref, hi_ref, out_ref, hist_ref,
    *, k, thr, u, h, w, mode,
):
    r = k // 2
    rank = (k * k + 1) // 2
    G = _CHUNK
    m = G * 256
    bins_flat = jnp.bitwise_and(
        jax.lax.broadcasted_iota(jnp.int32, (m, w), 0), jnp.int32(255)
    )
    tiles = tuple((c0, min(c0 + 128, w)) for c0 in range(0, w, 128))

    def chunk_body(ci, carry):
        c0u = ci * jnp.int32(G)

        def mn(i, c):
            return jnp.minimum(c, lo_ref[c0u + i])

        def mx(i, c):
            return jnp.maximum(c, hi_ref[c0u + i])

        y_lo = jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), mn, jnp.int32(h))
        y_hi = jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), mx, jnp.int32(0))

        def rows_flat(y):
            yc = jnp.maximum(jnp.minimum(y, jnp.int32(h - 1)), jnp.int32(0))
            parts = [
                jnp.broadcast_to(
                    x_ref[pl.ds(c0u + g, 1), pl.ds(yc, 1), 0, :]
                    .astype(jnp.int32)
                    .reshape(1, w),
                    (256, w),
                )
                for g in range(G)
            ]
            return jnp.concatenate(parts, axis=0)

        def onehot(y):
            return (rows_flat(y) == bins_flat).astype(jnp.bfloat16)

        def init_body(dy, acc):
            return acc + onehot(y_lo + dy - r)

        hist_ref[:, :] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(2 * r + 1), init_body,
            jnp.zeros((m, w), jnp.bfloat16),
        )

        def row_body(y, c):
            hist = hist_ref[:, :]
            if mode == "noquery":
                # skip gflat/mask/matmul/sums: just write hist parity
                # (i32 cast first: bf16 vector compares are unsupported)
                byte = (hist[:G, :].astype(jnp.int32) > 0).astype(jnp.uint8)
            else:
                gflat = rows_flat(y)
                E = bins_flat - gflat
                mask = jnp.where(
                    E <= -(thr + 1), jnp.float32(2049.0),
                    jnp.where(E <= thr, jnp.float32(2048.0), jnp.float32(0.0)),
                )
                combs = []
                for c0, c1 in tiles:
                    s0 = max(0, c0 - r)
                    s1 = min(w, c1 + r)
                    if mode == "nomatmul":
                        win = hist[:, c0:c1].astype(jnp.float32)
                    else:
                        win = jax.lax.dot_general(
                            hist[:, s0:s1], s2_ref[s0:s1, c0:c1],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    if mode == "nomask":
                        wm = win
                    else:
                        wm = win * mask[:, c0:c1]
                    combs.append(
                        jnp.concatenate(
                            [
                                wm[g * 256:(g + 1) * 256, :].sum(
                                    axis=0, keepdims=True)
                                for g in range(G)
                            ], axis=0,
                        )
                    )
                comb = (
                    jnp.concatenate(combs, axis=1)
                    if len(combs) > 1 else combs[0]
                )
                cc_ = comb.astype(jnp.int32)
                lo = jnp.bitwise_and(cc_, jnp.int32(2047))
                hi = jnp.right_shift(cc_, jnp.int32(11))
                bit = ((lo >= rank) | (hi < rank)).astype(jnp.int32)
                byte = (bit * 255).astype(jnp.uint8)
            for g in range(G):
                out_ref[pl.ds(c0u + g, 1), pl.ds(y, 1), 0, :] = byte[
                    g:g + 1, :].reshape(1, 1, w)
            if mode != "noupdate":
                hist_ref[:, :] = hist + onehot(y + r + 1) - onehot(y - r)
            return c

        jax.lax.fori_loop(y_lo, y_hi, row_body, jnp.int32(0))
        return carry

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(u // _CHUNK), chunk_body, jnp.int32(0)
    )


@functools.partial(jax.jit, static_argnames=("k", "thr", "mode"))
def probe(x, k, thr, row_lo, row_hi, mode):
    u, h, w = x.shape
    r = k // 2
    jj = np.arange(w)[:, None]
    pp = np.arange(w)[None, :]
    band = ((jj >= pp - r) & (jj <= pp + r)).astype(np.float32)
    band[0, :] += np.maximum(0, np.minimum(r - pp, 2 * r + 1))[0]
    band[w - 1, :] += np.maximum(0, np.minimum(pp + r - (w - 1), 2 * r + 1))[0]
    s2 = jnp.asarray(band, dtype=jnp.bfloat16)
    kernel = functools.partial(
        _kernel, k=k, thr=int(thr), u=u, h=h, w=w, mode=mode
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, h, 1, w), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_CHUNK * 256, w), jnp.bfloat16)],
    )(x.reshape(u, h, 1, w), s2, row_lo, row_hi)
    return out.reshape(u, h, w)


def main(modes):
    from tpu_inspect.config import DefectParams, SegmentationParams
    from tpu_inspect.engine import _defect_roi_full, _segment_device, pack_exclusions
    from tpu_inspect.synthetic import crop_units, standard_workload

    wl = standard_workload()
    seg = SegmentationParams().validated()
    defect = DefectParams().validated()
    crops = jnp.asarray(crop_units(np.asarray(wl["image"]), wl["grid"]))
    u, h, w = crops.shape
    rects, circles = pack_exclusions(wl["exclusions"])
    mask, *_ = _segment_device(
        crops, jnp.asarray(rects), jnp.asarray(circles),
        jnp.asarray(wl["ref_centroids"]), jnp.asarray(wl["ref_valid"]),
        seg=seg, is_reference=True, shape_hw=(h, w),
    )
    _, _, _, row_lo, row_hi, _, _ = _defect_roi_full(mask, int(defect.erode_px))
    jax.block_until_ready((row_lo, row_hi))

    n = 32
    for mode in modes:
        def chained(a, mode=mode):
            def body(i, c):
                o = probe(c, 21, 24, row_lo, row_hi, mode)
                bump = (o[0, 0, 0] & 1).astype(jnp.uint8)
                return c ^ bump
            return jax.lax.fori_loop(0, n, body, a)

        fc = jax.jit(chained)
        t0 = time.perf_counter()
        jax.block_until_ready(fc(crops))
        comp = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fc(crops))
            times.append((time.perf_counter() - t0) * 1000.0 / n)
        print(f"{mode:12s} {np.median(times):7.3f} ms (min {min(times):.3f}, compile {comp:.0f}s)")


if __name__ == "__main__":
    main(sys.argv[1:] or ["baseline", "noupdate", "noquery", "nomatmul", "nomask"])
