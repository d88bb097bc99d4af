"""Pallas TPU kernel for seeded flood propagation (reachability fixpoints).

Covers the flood-style fixpoints of the pipeline — border-connected
background (hole filling / exterior detection), kept-blob selection, and
Canny hysteresis — with each unit's planes VMEM-resident for the whole
fixpoint (the XLA while-loop formulations round-trip ~10 MB of HBM per
iteration).

The batch stays in HBM; each unit's packed seed/domain plane is DMA'd into
a VMEM scratch, the fixpoint runs on-chip, and the reach plane is DMA'd
back out. Propagation model per iteration:
``reach := row/col run-sweeps(dilate(reach) & domain)`` where dilate is 4-
or 8-connected and a sweep extends reach through whole domain runs
(segmented any() via keyed prefix min).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_inspect.ops.cc_pallas import _prefix_min, _prefix_sum, _shift2d


def _local_fixpoint(dom, reach0, conn8: bool, dowhile: bool = True):
    """VMEM-resident reachability fixpoint of `reach0` through `dom`.

    Per iteration: neighborhood dilate (4- or 8-connected) then segmented
    run-sweeps along rows and columns (a free run is fully reached as soon
    as it contains one reached pixel). Returns int32 0/1 reach plane.

    ``dowhile`` applies the body once before the loop (saves one cond
    evaluation when the seed is never pre-converged — true for whole-plane
    floods; the strip-tiled sweeps pass False because most strips ARE
    already converged after the first down/up pair).
    """
    K = jnp.int32(4)
    h, w = dom.shape
    notd = (~dom).astype(jnp.int32)
    # backward keys from the forward prefix (bwd = total - fwd + notd):
    # a broadcast of the last prefix column replaces a second shift chain
    row_fwd = _prefix_sum(notd, axis=1, reverse=False)
    col_fwd = _prefix_sum(notd, axis=0, reverse=False)
    row_tot = jnp.broadcast_to(row_fwd[:, w - 1 : w], (h, w))
    col_tot = jnp.broadcast_to(col_fwd[h - 1 : h, :], (h, w))
    row_bwd = (row_tot - row_fwd + notd) * K
    col_bwd = (col_tot - col_fwd + notd) * K
    row_fwd = row_fwd * K
    col_fwd = col_fwd * K

    def seg_or(r, axis, ids_f, ids_b):
        # segmented any() within domain runs via keyed prefix min
        v = jnp.where(dom, 1 - r.astype(jnp.int32), K - 1)
        f = _prefix_min(v - ids_f, axis, False) + ids_f
        b = _prefix_min(v - ids_b, axis, True) + ids_b
        return dom & ((jnp.minimum(f, b) == 0) | r)

    if conn8:
        # separable 3x3 dilate: horizontal 3-max then vertical 3-max
        # (4 shifts instead of 8)
        def dilate(r):
            hmax = jnp.maximum(
                r,
                jnp.maximum(
                    _shift2d(r, 0, 1, np.int32(0)),
                    _shift2d(r, 0, -1, np.int32(0)),
                ),
            )
            vmax = jnp.maximum(
                hmax,
                jnp.maximum(
                    _shift2d(hmax, 1, 0, np.int32(0)),
                    _shift2d(hmax, -1, 0, np.int32(0)),
                ),
            )
            return ((vmax > 0) & dom).astype(jnp.int32)

    else:
        def dilate(r):
            acc = r
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                acc = jnp.maximum(acc, _shift2d(r, dy, dx, np.int32(0)))
            return ((acc > 0) & dom).astype(jnp.int32)

    # Convergence test lives in `cond`: neighborhood stability implies
    # sweep stability (a run holding both a reached and an unreached pixel
    # necessarily holds an adjacent such pair), so the expensive segmented
    # sweeps never run on the final verify pass. reach is carried as int32
    # (i1 vectors fail scf.yield legalization).
    def cond(r):
        return (dilate(r) != r).astype(jnp.int32).max() > 0

    def body(r):
        new = dilate(r) > 0
        new = seg_or(new, 1, row_fwd, row_bwd)
        new = seg_or(new, 0, col_fwd, col_bwd)
        return new.astype(jnp.int32)

    init = reach0.astype(jnp.int32)
    if dowhile:
        return jax.lax.while_loop(cond, body, body(init))
    return jax.lax.while_loop(cond, body, init)


def _flood_kernel(
    packed_ref, out_ref, buf_ref, sem_in, sem_out,
    *, u, h, w, conn8: bool, border_hw=None
):
    def unit_body(ui, carry):
        cp_in = pltpu.make_async_copy(packed_ref.at[ui], buf_ref, sem_in)
        cp_in.start()
        cp_in.wait()
        packed = buf_ref[:, :].astype(jnp.int32)
        dom = (packed & 1) > 0  # bit 0: domain (padding is 0 = blocked)
        if border_hw is not None:
            # seed = domain on the (unpadded) image border, derived from
            # iota in VMEM — materializing a [U, H, W] border constant in
            # HBM cost ~1.4 ms/call in copies (exterior_background callers)
            ho, wo = border_hw
            yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            border = (
                (yy == 0) | (yy == ho - 1) | (xx == 0) | (xx == wo - 1)
            )
            reach0 = border & dom
        else:
            reach0 = ((packed & 2) > 0) & dom  # bit 1: seed
        reach = _local_fixpoint(dom, reach0, conn8)
        buf_ref[:, :] = reach.astype(jnp.uint8)
        cp_out = pltpu.make_async_copy(buf_ref, out_ref.at[ui], sem_out)
        cp_out.start()
        cp_out.wait()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("conn8", "border_seed"))
def propagate_pallas(
    seed: jnp.ndarray | None,
    domain: jnp.ndarray,
    conn8: bool,
    border_seed: bool = False,
) -> jnp.ndarray:
    """Reachability of `seed` through `domain` ([U, H, W] bool each).

    With ``border_seed=True`` the seed argument is ignored and the seed is
    domain-on-the-image-border, generated inside the kernel (the
    exterior_background case, segmentation.py:53-67)."""
    u, h, w = domain.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if border_seed:
        packed = domain.astype(jnp.uint8)
    else:
        packed = domain.astype(jnp.uint8) | (seed.astype(jnp.uint8) << 1)
    packed = jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w)))
    kernel = functools.partial(
        _flood_kernel,
        u=u,
        h=hp,
        w=wp,
        conn8=bool(conn8),
        border_hw=(h, w) if border_seed else None,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, hp, wp), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(packed)
    return out[:, :h, :w] > 0


def flood_fits(shape: tuple[int, int, int]) -> bool:
    """Whether a unit plane fits the kernel's per-unit VMEM budget."""
    _, h, w = shape
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    # ~10 int32 working planes per unit during the fixpoint
    return on_tpu and 12 * hp * wp * 4 < 12 * 2**20


# ---------------------------------------------------------------------------
# Strip-tiled flood for unit planes too big for VMEM (BASELINE config 1:
# one 4096x3000 crop). The plane is split into horizontal strips; each
# directional sweep runs the VMEM-resident fixpoint per strip and exchanges
# one-row halos between neighbors (the spatial-tiling analogue of sequence
# parallelism, SURVEY.md section 5). Down/up sweep pairs repeat until no
# strip changes — O(#inter-strip direction reversals) pairs, not O(H).
# ---------------------------------------------------------------------------


def _strip_row(a, r: int):
    """Extract static row `r` of int32 0/1 plane `a` as a (1, W) plane.

    All literals explicitly int32: under the global x64 flag a bare `0`
    becomes int64, whose Mosaic convert lowering recurses forever.
    """
    yy = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    return jnp.where(yy == r, a, jnp.int32(0)).max(axis=0, keepdims=True)


def _strip_sweep_kernel(
    packed_ref,
    reach_in_ref,
    reach_out_ref,
    chg_ref,
    pbuf,
    rbuf,
    nbuf,
    brow,
    sem_p,
    sem_r,
    sem_n,
    sem_o,
    *,
    u: int,
    s: int,
    t: int,
    conn8: bool,
    down: bool,
):
    wp = pbuf.shape[1]

    def unit_body(ui, changed):
        brow[:, :] = jnp.zeros((8, wp), jnp.uint8)

        def strip_body(k, changed):
            si = k if down else jnp.int32(s - 1) - k
            cp = pltpu.make_async_copy(packed_ref.at[ui, si], pbuf, sem_p)
            cp.start()
            cr = pltpu.make_async_copy(reach_in_ref.at[ui, si], rbuf, sem_r)
            cr.start()
            # ahead-neighbor strip (previous sweep's reach); index clamped,
            # contribution masked out at the boundary strip below
            nbr = jnp.minimum(
                jnp.maximum(si + (1 if down else -1), jnp.int32(0)),
                jnp.int32(s - 1),
            )
            cn = pltpu.make_async_copy(reach_in_ref.at[ui, nbr], nbuf, sem_n)
            cn.start()
            cp.wait()
            cr.wait()
            cn.wait()

            packed = pbuf[:, :].astype(jnp.int32)
            dom = (packed & 1) > 0
            old = (rbuf[:, :].astype(jnp.int32) > 0) & dom
            seed = (((packed & 2) > 0) & dom) | old

            yy = jax.lax.broadcasted_iota(jnp.int32, (t, wp), 0)

            def dilate1(row):
                if conn8:
                    row = jnp.maximum(
                        row,
                        jnp.maximum(
                            _shift2d(row, 0, 1, np.int32(0)),
                            _shift2d(row, 0, -1, np.int32(0)),
                        ),
                    )
                return row

            # behind-neighbor halo (computed earlier THIS sweep, via brow):
            #   down: strip si-1's bottom row feeds local row 0
            #   up:   strip si+1's top row feeds local row t-1
            behind = dilate1(brow[0:1, :].astype(jnp.int32))
            tgt_b = 0 if down else t - 1
            seed = seed | (dom & (yy == tgt_b) & (behind > 0))
            # ahead-neighbor halo (previous sweep's stored reach):
            #   down: strip si+1's top row feeds local row t-1
            #   up:   strip si-1's bottom row feeds local row 0
            # (validity masked with a vector compare: scalar bool->int32
            # converts send Mosaic's lowering into infinite recursion)
            si_vec = jnp.full((1, wp), si, dtype=jnp.int32)
            ok_vec = (si_vec + 1 < s) if down else (si_vec > 0)
            src_a = 0 if down else t - 1
            tgt_a = t - 1 if down else 0
            ahead = jnp.where(
                ok_vec,
                dilate1(
                    _strip_row(
                        (nbuf[:, :].astype(jnp.int32) > 0).astype(jnp.int32),
                        src_a,
                    )
                ),
                jnp.int32(0),
            )
            seed = seed | (dom & (yy == tgt_a) & (ahead > 0))

            reach = _local_fixpoint(dom, seed, conn8, dowhile=False)
            changed = jnp.maximum(
                changed, (reach != old.astype(jnp.int32)).astype(jnp.int32).max()
            )
            # carry this strip's outgoing boundary row to the next strip
            out_row = _strip_row(reach, t - 1 if down else 0)
            brow[:, :] = jnp.broadcast_to(out_row, (8, wp)).astype(jnp.uint8)

            rbuf[:, :] = reach.astype(jnp.uint8)
            co = pltpu.make_async_copy(rbuf, reach_out_ref.at[ui, si], sem_o)
            co.start()
            co.wait()
            return changed

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(s), strip_body, changed)

    changed = jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))
    chg_ref[0, 0] = changed


def _strip_sweep(packed, reach, *, u, s, t, conn8, down):
    wp = packed.shape[-1]
    kernel = functools.partial(
        _strip_sweep_kernel, u=u, s=s, t=t, conn8=conn8, down=down
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((u, s, t, wp), jnp.uint8),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((t, wp), jnp.uint8),
            pltpu.VMEM((t, wp), jnp.uint8),
            pltpu.VMEM((t, wp), jnp.uint8),
            pltpu.VMEM((8, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(packed, reach)


def _strip_height_raw(w: int) -> int:
    """Multiple-of-8 strip height within the VMEM fixpoint budget (may be 0
    for planes too wide for even one 8-row strip — see flood_fits_tiled)."""
    wp = -(-w // 128) * 128
    return (12 * 2**20 // (12 * 4 * wp)) // 8 * 8


def _strip_height(w: int) -> int:
    """Largest multiple-of-8 strip height within the VMEM fixpoint budget."""
    return max(_strip_height_raw(w), 8)


@functools.partial(jax.jit, static_argnames=("conn8",))
def propagate_pallas_tiled(
    seed: jnp.ndarray, domain: jnp.ndarray, conn8: bool
) -> jnp.ndarray:
    """Reachability of `seed` through `domain` for planes beyond VMEM size.

    Same contract as propagate_pallas ([U, H, W] bool -> bool), implemented
    as halo-exchanging strip sweeps.
    """
    import sys

    # tracing depth: jit -> while_loop -> pallas -> fori -> fori -> fixpoint
    # while -> unrolled prefix ops exceeds CPython's default 1000 frames
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    u, h, w = seed.shape
    t = _strip_height(w)
    s = -(-h // t)
    hp, wp = s * t, -(-w // 128) * 128
    packed = domain.astype(jnp.uint8) | (seed.astype(jnp.uint8) << 1)
    packed = jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w)))
    packed = packed.reshape(u, s, t, wp)
    reach0 = jnp.zeros((u, s, t, wp), jnp.uint8)

    def cond(c):
        return c[1] > 0

    def body(c):
        reach, _ = c
        reach, chg_d = _strip_sweep(
            packed, reach, u=u, s=s, t=t, conn8=conn8, down=True
        )
        reach, chg_u = _strip_sweep(
            packed, reach, u=u, s=s, t=t, conn8=conn8, down=False
        )
        return reach, jnp.maximum(chg_d[0, 0], chg_u[0, 0])

    reach, _ = jax.lax.while_loop(cond, body, (reach0, jnp.int32(1)))
    return reach.reshape(u, hp, wp)[:, :h, :w] > 0


def flood_fits_tiled(shape: tuple[int, int, int]) -> bool:
    """Whether the strip-tiled kernel applies (TPU + one strip fits VMEM).

    Tests the UNCLAMPED strip height: for extremely wide planes (wp beyond
    ~21k columns) even one 8-row strip blows the budget and the caller must
    fall back to the XLA while-loop path."""
    _, _, w = shape
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu and _strip_height_raw(w) >= 8
