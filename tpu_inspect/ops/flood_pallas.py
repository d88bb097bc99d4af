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


def _flood_kernel(
    packed_ref, out_ref, buf_ref, sem_in, sem_out, *, u, h, w, conn8: bool
):
    K = jnp.int32(4)
    hp, wp = buf_ref.shape

    def unit_body(ui, carry):
        cp_in = pltpu.make_async_copy(packed_ref.at[ui], buf_ref, sem_in)
        cp_in.start()
        cp_in.wait()
        packed = buf_ref[:, :].astype(jnp.int32)
        dom = (packed & 1) > 0  # bit 0: domain (padding is 0 = blocked)
        reach0 = ((packed & 2) > 0) & dom  # bit 1: seed

        notd = (~dom).astype(jnp.int32)
        row_fwd = _prefix_sum(notd, axis=1, reverse=False) * K
        row_bwd = _prefix_sum(notd, axis=1, reverse=True) * K
        col_fwd = _prefix_sum(notd, axis=0, reverse=False) * K
        col_bwd = _prefix_sum(notd, axis=0, reverse=True) * K

        def seg_or(r, axis, ids_f, ids_b):
            # segmented any() within domain runs via keyed prefix min
            v = jnp.where(dom, 1 - r.astype(jnp.int32), K - 1)
            f = _prefix_min(v - ids_f, axis, False) + ids_f
            b = _prefix_min(v - ids_b, axis, True) + ids_b
            return dom & ((jnp.minimum(f, b) == 0) | r)

        dirs = (
            tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if dy or dx)
            if conn8
            else ((-1, 0), (1, 0), (0, -1), (0, 1))
        )

        def cond(c):
            return c[1]

        def body(c):
            # reach carried as int32 (i1 vectors fail scf.yield legalization)
            r, _ = c
            acc = r
            for dy, dx in dirs:
                acc = jnp.maximum(acc, _shift2d(r, dy, dx, np.int32(0)))
            new = (acc > 0) & dom
            new = seg_or(new, 1, row_fwd, row_bwd)
            new = seg_or(new, 0, col_fwd, col_bwd)
            new_i = new.astype(jnp.int32)
            changed = (new_i != r).astype(jnp.int32).max() > 0
            return new_i, changed

        reach, _done = jax.lax.while_loop(
            cond, body, (reach0.astype(jnp.int32), jnp.bool_(True))
        )
        buf_ref[:, :] = reach.astype(jnp.uint8)
        cp_out = pltpu.make_async_copy(buf_ref, out_ref.at[ui], sem_out)
        cp_out.start()
        cp_out.wait()
        return carry

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(u), unit_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("conn8",))
def propagate_pallas(
    seed: jnp.ndarray, domain: jnp.ndarray, conn8: bool
) -> jnp.ndarray:
    """Reachability of `seed` through `domain` ([U, H, W] bool each)."""
    u, h, w = seed.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    packed = domain.astype(jnp.uint8) | (seed.astype(jnp.uint8) << 1)
    packed = jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w)))
    kernel = functools.partial(_flood_kernel, u=u, h=hp, w=wp, conn8=bool(conn8))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((u, hp, wp), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
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
