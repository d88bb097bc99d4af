"""Pallas TPU kernel for chained morphology on [U, H, W] uint8 planes.

The XLA formulation (ops.morphology) lowers each erode/dilate to k
reduce_windows + mins, paying an HBM round-trip per stage — ~1.2 ms of the
pipeline for the seg close+open, the defect-ROI (2n+1)^2 erode and the
candidate open (indexing_ui.py:1497, :1532; segmentation.py:91-95). Here a
whole stage CHAIN runs per unit in VMEM:

- a stage is ('erode'|'dilate', runs) with OpenCV clip-to-image borders
  (erode pads +inf/255, dilate -inf/0 — morphologyDefaultBorderValue);
- per SE row-run, the horizontal window min/max is a binary-decomposed
  sliding reduction along lanes; row offsets then combine via vertical
  shifts (contiguous full-width offset ranges — rect SEs — use the same
  binary decomposition vertically);
- close+open with one SE B composes to 3 stages via Minkowski sum:
  dilate(B), erode(B ⊕ B), dilate(B).

Bit-exact vs ops.morphology (which is bit-exact vs cv2.morphologyEx).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_inspect.ops.cc_pallas import _shift2d as _shift2d_raw
from tpu_inspect.ops.morphology import _se_runs, ellipse_se


def _shift2d(a, dy, dx, fill):
    """_shift2d with shifts >= the plane extent collapsing to all-fill."""
    h, w = a.shape
    if abs(dy) >= h or abs(dx) >= w:
        return jnp.full((h, w), fill, a.dtype)
    return _shift2d_raw(a, dy, dx, fill)


def minkowski_sum(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """SE dilation a (+) b (odd square SEs, shared center anchor)."""
    ka, kb = a.shape[0], b.shape[0]
    k = ka + kb - 1
    out = np.zeros((k, k), dtype=np.uint8)
    ra, rb = ka // 2, kb // 2
    ys, xs = np.nonzero(b)
    for y, x in zip(ys, xs):
        dy, dx = int(y) - rb, int(x) - rb
        out[rb + dy : rb + dy + ka, rb + dx : rb + dx + ka] |= a
    return out


def _sliding_red(a, lo: int, hi: int, axis: int, red, fill):
    """red over a[.., p+lo : p+hi+1, ..] along axis; out-of-range = fill.

    Pads with the neutral first so every decomposed window is fully
    in-range (shifting a power-of-two partial PAST the boundary would
    otherwise drop its in-range part and inject pure fill)."""
    if lo == 0 and hi == 0:
        return a
    width = hi - lo + 1
    h, w = a.shape
    n = a.shape[axis]
    if axis == 0:
        pre = jnp.full((-lo, w), fill, a.dtype) if lo < 0 else None
        post = jnp.full((hi, w), fill, a.dtype) if hi > 0 else None
    else:
        pre = jnp.full((h, -lo), fill, a.dtype) if lo < 0 else None
        post = jnp.full((h, hi), fill, a.dtype) if hi > 0 else None
    ap = jnp.concatenate(
        [p for p in (pre, a, post) if p is not None], axis=axis
    )
    # power-of-two window reductions on the padded plane (positive shifts
    # only; windows of kept outputs never cross the padded end)
    sums = {1: ap}
    m = 1
    while m * 2 <= width:
        s = sums[m]
        sums[m * 2] = red(
            s, _shift2d(s, m if axis == 0 else 0, m if axis == 1 else 0, fill)
        )
        m *= 2
    out = None
    off = 0
    rem = width
    while rem:
        m = 1 << (rem.bit_length() - 1)
        part = (
            sums[m]
            if off == 0
            else _shift2d(
                sums[m], off if axis == 0 else 0, off if axis == 1 else 0, fill
            )
        )
        out = part if out is None else red(out, part)
        off += m
        rem -= m
    return out[:n, :] if axis == 0 else out[:, :n]


def _apply_stage(v, op: str, runs, red, fill):
    """One erode/dilate: group SE row-runs by horizontal window, reduce."""
    by_win: dict[tuple[int, int], list[int]] = {}
    for dy, lo, hi in runs:
        by_win.setdefault((lo, hi), []).append(dy)
    acc = None
    for (lo, hi), dys in sorted(by_win.items()):
        hred = _sliding_red(v, lo, hi, 1, red, fill)
        dys = sorted(dys)
        if len(dys) > 2 and dys == list(range(dys[0], dys[-1] + 1)):
            t = _sliding_red(hred, dys[0], dys[-1], 0, red, fill)
        else:
            t = None
            for dy in dys:
                s = _shift2d(hred, dy, 0, fill) if dy else hred
                t = s if t is None else red(t, s)
        acc = t if acc is None else red(acc, t)
    return acc


def _morph_kernel(x_ref, out_ref, *, u: int, h: int, w: int, stages):
    def unit_body(ui, carry):
        v = x_ref[pl.ds(ui, 1), :, :].reshape(h, w).astype(jnp.int32)
        for op, runs in stages:
            red = jnp.minimum if op == "erode" else jnp.maximum
            fill = np.int32(255) if op == "erode" else np.int32(0)
            v = _apply_stage(v, op, runs, red, fill)
        out_ref[pl.ds(ui, 1), :, :] = v.astype(jnp.uint8).reshape(1, h, w)
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("stages",))
def _morph_chain(x: jnp.ndarray, stages) -> jnp.ndarray:
    u, h, w = x.shape
    kernel = functools.partial(_morph_kernel, u=u, h=h, w=w, stages=stages)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, h, w), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def _runs_tuple(se: np.ndarray):
    return tuple(_se_runs(se))


@functools.lru_cache(maxsize=32)
def _close_open_stages(k: int):
    se = ellipse_se(k)
    return (
        ("dilate", _runs_tuple(se)),
        ("erode", _runs_tuple(minkowski_sum(se, se))),
        ("dilate", _runs_tuple(se)),
    )


def close_open_pallas(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """morph_close then morph_open with the k x k ellipse SE
    (segmentation.py:91-95), one VMEM-resident kernel."""
    return _morph_chain(mask, _close_open_stages(int(k)))


@functools.lru_cache(maxsize=32)
def _open_stages(k: int):
    se = ellipse_se(k)
    return (("erode", _runs_tuple(se)), ("dilate", _runs_tuple(se)))


def open_pallas(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """morph_open with the k x k ellipse SE (indexing_ui.py:1532)."""
    return _morph_chain(mask, _open_stages(int(k)))


def erode_rect_pallas(mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """cv2.erode(mask, None, iterations=n) == (2n+1)^2 rect min
    (indexing_ui.py:1497)."""
    runs = tuple((dy, -n, n) for dy in range(-n, n + 1))
    return _morph_chain(mask, (("erode", runs),))


def morph_fits(shape) -> bool:
    """Whether the VMEM-resident chain applies: TPU + in/out planes plus
    ~6 int32 temps per unit within budget."""
    u, h, w = shape
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    return on_tpu and (2 * u * hp * wp + 8 * hp * wp * 4) < 16 * 2**20
