"""Exact k x k uint8 median blur (cv2.medianBlur parity), batched [U, H, W].

The defect engine's background estimate is ``cv2.medianBlur(gray, 21)``
(indexing_ui.py:1522-1525) — the single heaviest op in the reference chain.
OpenCV uses Huang's running-histogram algorithm on the CPU; here the same
histogram idea is reshaped for the VPU:

- carry a per-column vertical-window histogram ``[U, W, 256]`` down the rows
  (one lax.scan step per output row: add the entering row, subtract the
  leaving row — each a one-hot compare, fully vectorized),
- per output row, horizontal windowing is a cumsum-then-difference along W
  (border columns replicate-padded), yielding every pixel's full window
  histogram at once,
- the median is ``count(cdf < (k*k+1)//2)`` via a cumsum over the 256 bins.

Exact for any odd k with BORDER_REPLICATE semantics (window values are
clamped-coordinate reads, so the window always holds k*k samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def median_blur_u8(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x: [U, H, W] uint8 -> [U, H, W] uint8, k odd."""
    assert k % 2 == 1 and k >= 1
    if k == 1:
        return x
    u, h, w = x.shape
    r = k // 2
    rank = (k * k + 1) // 2  # 1-based order statistic of the median
    bins = jnp.arange(256, dtype=jnp.int32)

    def onehot_row(y):
        # [U, W, 256] int32 counts of row y (clamped)
        row = x[:, jnp.clip(y, 0, h - 1), :].astype(jnp.int32)
        return (row[:, :, None] == bins[None, None, :]).astype(jnp.int32)

    # initial vertical window for output row 0: rows -r..r clamped
    init = onehot_row(0) * (r + 1)
    for dy in range(1, r + 1):
        init = init + onehot_row(dy)

    def row_medians(colhist):
        # horizontal replicate padding: out-of-range cols re-count the edge
        left = jnp.repeat(colhist[:, :1], r, axis=1)
        right = jnp.repeat(colhist[:, -1:], r, axis=1)
        p = jnp.concatenate([left, colhist, right], axis=1)  # [U, W+2r, 256]
        cum = jnp.cumsum(p, axis=1)
        zero = jnp.zeros_like(cum[:, :1])
        cum = jnp.concatenate([zero, cum], axis=1)  # prefix sums
        # window at out col j covers padded cols j..j+k-1 -> cum[j+k]-cum[j]
        win = cum[:, k:, :] - cum[:, :-k, :]
        cdf = jnp.cumsum(win, axis=2)
        med = (cdf < rank).sum(axis=2).astype(jnp.uint8)
        return med

    def step(colhist, y):
        # colhist currently holds the vertical window of output row y
        med = row_medians(colhist)
        colhist = colhist + onehot_row(y + r + 1) - onehot_row(y - r)
        return colhist, med

    _, meds = jax.lax.scan(step, init, jnp.arange(h, dtype=jnp.int32))
    return jnp.transpose(meds, (1, 0, 2))
