"""Pallas TPU kernel for exact k x k uint8 median blur.

The lax.scan formulation (ops.median) pays HBM round-trips for the
[W, 256] column-histogram carry on every row step. Here the whole crop and
the histogram state live in VMEM for the kernel's duration:

- grid over units; each program processes one [H, W] crop,
- VMEM scratch holds the vertical-window column histograms [W, 256] int32,
- a fori_loop walks output rows: horizontal windowing is a
  binary-decomposed sliding sum (Mosaic has no cumsum primitive), the
  median is ``count(prefix < rank)`` with a Hillis-Steele lane prefix, and
  the histogram updates incrementally (add entering row, drop leaving row).

Bit-exact vs cv2.medianBlur (BORDER_REPLICATE; the window always holds
k*k clamped-coordinate samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sliding_sum(p: jnp.ndarray, k: int, out_len: int) -> jnp.ndarray:
    """out[j] = sum(p[j : j + k]) along axis 0, via binary decomposition."""
    # power-of-two window sums: s[m][j] = sum p[j : j + m]
    sums = {1: p}
    m = 1
    while m * 2 <= k:
        s = sums[m]
        sums[m * 2] = s[: s.shape[0] - m] + s[m:]
        m *= 2
    out = None
    off = 0
    rem = k
    while rem:
        m = 1 << (rem.bit_length() - 1)
        part = sums[m][off : off + out_len]
        out = part if out is None else out + part
        off += m
        rem -= m
    return out


def _lane_prefix(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last (256-lane) axis."""
    n = x.shape[-1]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (s,), x.dtype), x[..., : n - s]], axis=-1
        )
        x = x + shifted
        s *= 2
    return x


def _median_kernel(x_ref, out_ref, hist_ref, *, k: int, u: int, h: int, w: int):
    # Gridless kernel (this environment's Mosaic path rejects gridded
    # kernels): one invocation loops over units, then over rows. Units and
    # rows live on leading (untiled) axes so dynamic indexing is legal.
    r = k // 2
    rank = (k * k + 1) // 2
    bins = jax.lax.broadcasted_iota(jnp.int32, (w, 256), 1)

    def unit_body(ui, _):
        def onehot(y):
            yc = jnp.maximum(jnp.minimum(y, jnp.int32(h - 1)), jnp.int32(0))
            row = x_ref[pl.ds(ui, 1), pl.ds(yc, 1), 0, :].astype(jnp.int32)
            return (row.reshape(w, 1) == bins).astype(jnp.int32)

        acc = onehot(jnp.int32(0)) * (r + 1)

        def init_body(dy, acc):
            return acc + onehot(dy)

        hist_ref[:, :] = jax.lax.fori_loop(
            jnp.int32(1), jnp.int32(r + 1), init_body, acc
        )

        def row_body(y, c):
            hist = hist_ref[:, :]
            left = jnp.broadcast_to(hist[0:1, :], (r, 256))
            right = jnp.broadcast_to(hist[w - 1 : w, :], (r, 256))
            p = jnp.concatenate([left, hist, right], axis=0)  # [w+2r, 256]
            win = _sliding_sum(p, k, w)  # [w, 256] window histograms
            cdf = _lane_prefix(win)
            med = (cdf < rank).sum(axis=1, dtype=jnp.int32).astype(jnp.uint8)
            out_ref[pl.ds(ui, 1), pl.ds(y, 1), 0, :] = med.reshape(1, 1, w)
            hist_ref[:, :] = hist + onehot(y + r + 1) - onehot(y - r)
            return c

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(h), row_body, _)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("k",))
def median_blur_u8_pallas(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x: [U, H, W] uint8 -> exact k x k median, BORDER_REPLICATE."""
    assert k % 2 == 1 and k >= 1
    if k == 1:
        return x
    u, h, w = x.shape
    kernel = functools.partial(_median_kernel, k=k, u=u, h=h, w=w)
    # units and rows on leading (untiled) axes; the trailing [1, w] is the
    # tiled plane
    x4 = x.reshape(u, h, 1, w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, h, 1, w), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, 256), jnp.int32)],
    )(x4)
    return out.reshape(u, h, w)


def _median_residual_kernel(x_ref, out_ref, hist_ref, *, k, thr, u, h, w):
    """Fused: out = 255 where |x - median_k(x)| > thr else 0.

    The defect path never needs the median value itself — only whether it
    falls outside [g-thr, g+thr]. That is two masked rank queries against
    the window histogram instead of a full 256-lane prefix:
      median < g-thr  <=>  cdf(g-thr-1) >= rank
      median > g+thr  <=>  cdf(g+thr)   <  rank
    (out-of-range thresholds degenerate correctly: empty/full masks).
    """
    r = k // 2
    rank = (k * k + 1) // 2
    bins = jax.lax.broadcasted_iota(jnp.int32, (w, 256), 1)

    def unit_body(ui, carry):
        def row_vals(y):
            yc = jnp.maximum(jnp.minimum(y, jnp.int32(h - 1)), jnp.int32(0))
            return x_ref[pl.ds(ui, 1), pl.ds(yc, 1), 0, :].astype(jnp.int32)

        def onehot(y):
            return (row_vals(y).reshape(w, 1) == bins).astype(jnp.int32)

        acc = onehot(jnp.int32(0)) * (r + 1)

        def init_body(dy, acc):
            return acc + onehot(dy)

        hist_ref[:, :] = jax.lax.fori_loop(
            jnp.int32(1), jnp.int32(r + 1), init_body, acc
        )

        def row_body(y, c):
            hist = hist_ref[:, :]
            left = jnp.broadcast_to(hist[0:1, :], (r, 256))
            right = jnp.broadcast_to(hist[w - 1 : w, :], (r, 256))
            p = jnp.concatenate([left, hist, right], axis=0)
            win = _sliding_sum(p, k, w)  # [w, 256]
            g = row_vals(y).reshape(w, 1)
            # keep everything 2D: 1D i1 vectors hit Mosaic relayout bugs
            lo = (win * (bins <= g - (thr + 1)).astype(jnp.int32)).sum(
                axis=1, dtype=jnp.int32, keepdims=True
            )
            hi = (win * (bins <= g + thr).astype(jnp.int32)).sum(
                axis=1, dtype=jnp.int32, keepdims=True
            )
            bit = ((lo >= rank) | (hi < rank)).astype(jnp.int32)  # [w, 1]
            out_ref[pl.ds(ui, 1), pl.ds(y, 1), 0, :] = (
                (bit * 255).astype(jnp.uint8).reshape(1, 1, w)
            )
            hist_ref[:, :] = hist + onehot(y + r + 1) - onehot(y - r)
            return c

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(h), row_body, carry)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("k", "thr"))
def median_residual_mask_pallas(x: jnp.ndarray, k: int, thr: int) -> jnp.ndarray:
    """255 where |x - medianBlur(x, k)| > thr, else 0 (uint8, bit-exact vs
    cv2 medianBlur + absdiff + THRESH_BINARY)."""
    assert k % 2 == 1 and k >= 1
    u, h, w = x.shape
    kernel = functools.partial(
        _median_residual_kernel, k=k, thr=int(thr), u=u, h=h, w=w
    )
    x4 = x.reshape(u, h, 1, w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, h, 1, w), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, 256), jnp.int32)],
    )(x4)
    return out.reshape(u, h, w)
