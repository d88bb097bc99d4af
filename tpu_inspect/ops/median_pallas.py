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
import numpy as np
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


_CHUNK = 4  # units grouped into one matmul M dimension (G*256 rows)


def _median_residual_kernel(
    x_ref, s2_ref, lo_ref, hi_ref, out_ref, hist_ref,
    *, k, thr, u, h, w, chunk, variant="base",
):
    """Fused: out = 255 where |x - median_k(x)| > thr else 0.

    The defect path never needs the median value itself — only whether it
    falls outside [g-thr, g+thr]. That is two masked rank queries against
    the window histogram instead of a full 256-lane prefix:
      median < g-thr  <=>  cdf(g-thr-1) >= rank
      median > g+thr  <=>  cdf(g+thr)   <  rank
    (out-of-range thresholds degenerate correctly: empty/full masks).

    Layout/engine choices (1.8x over the sublane-major VPU formulation):
    - hist is [values-on-sublanes, w cols-on-lanes] so row loads stay
      lane-major (no per-row cross-lane transposes); BORDER_REPLICATE is
      folded into the band matrix (border columns carry the replication
      multiplicity), so the input needs no edge-padded copy at all;
    - hist lives in bfloat16: column counts <= k <= 21 are exact, and the
      horizontal 21-window sum becomes MXU matmuls hist @ S2 against a
      banded small-integer matrix with f32 accumulation (window counts
      <= 441, exact), tiled into 128-column output strips so each strip
      contracts only its (128 + k - 1)-wide K band (2.2x fewer MACs at
      w=316, k=21; measured 8.3 -> 6.8 ms on the bench workload);
    - _CHUNK units are grouped into the matmul M dimension: per-unit
      [256, K]@[K, 128] matmuls are too small to fill the MXU, so the
      histogram state is the flat [_CHUNK*256, w] stack of the group's
      per-unit histograms and every (row, col-tile) step issues ONE
      [1024, K]@[K, 128] matmul (measured 6.35 -> 5.38 ms on the full-row
      48-unit envelope; per-chunk HBM DMA variants measured no better and
      Mosaic rejects slicing the (·, ·, 1, w) layout for DMA, so x/out stay
      whole-batch VMEM-resident); the group processes the UNION of its
      units' ROI row ranges (unions only add work, never change values);
    - rank queries, per variant: "base"/"qdirect" pack both into ONE
      mul+reduce (weights 2048*[v<=g+thr] + [v<=g-thr-1]; the packed f32
      sum < 2^23 stays exact for counts <= k*k <= 2025); "cdfx" — the
      round-5 production path — maintains CUMULATIVE histograms and
      extracts the window cdf at the per-column thresholds by a
      binary-select descent (see the variant comment below).
    """
    r = k // 2
    rank = (k * k + 1) // 2
    G = chunk
    m = G * 256
    # variant = mask scheme ("base" | "qdirect" | "cdfx") with an optional
    # trailing "2" selecting the 2-row-stepped loop (e.g. "qdirect2").
    # "cdfx": the histogram state holds CUMULATIVE counts along the value
    # axis (C[v, c] = #window values <= v; per-row update is one >= compare
    # instead of one == compare, same volume), the band matmul then yields
    # the window cdf directly, and each rank query extracts cdf[t(c), c]
    # per column by a 5-stage binary-select descent (128->8 sublanes) plus
    # one 8-sublane masked reduce — ~1/3 the VPU volume of the packed
    # mask-mul-reduce query (which touches [256, w] five times per row).
    step2 = variant.endswith("2")
    mask_variant = variant[:-1] if step2 else variant
    cdfx = mask_variant == "cdfx"
    bins256 = jax.lax.broadcasted_iota(jnp.int32, (256, w), 0)
    tiles = tuple((c0, min(c0 + 128, w)) for c0 in range(0, w, 128))
    # One-hot generation alternatives measured and REJECTED on hardware
    # (tools/median_sweep.py, 48x315x256 ROI-row workload, chunk=24):
    # - nibble outer product (two [16, w] compares + one [256, w] multiply
    #   via broadcast-reshape): 4.12 ms vs 3.15 — Mosaic's [16,16,w]
    #   broadcast+reshape costs more than the [256, w] compare it saves
    #   (jnp.repeat lowers to scatter, which Pallas TPU rejects outright);
    # - bf16-domain compares (half the i32 vreg volume): Mosaic internal
    #   verification error.

    def onehot_bf16(v):
        """[1, w] i32 row -> [256, w] bf16 one-hot (cdfx: cumulative
        indicator [val <= bin], so the state accumulates per-column cdfs;
        counts stay <= k <= 45, bf16-exact either way)."""
        if cdfx:
            return (bins256 >= v).astype(jnp.bfloat16)
        return (v == bins256).astype(jnp.bfloat16)
    # NOTE on the reduce over each group's 256 value-sublanes: riding it on
    # the MXU as a block-ones matmul is a trap. The TPU MXU truncates f32
    # matmul inputs to bf16 (measured on hardware: default precision runs
    # one bf16 pass, Precision.HIGHEST three — both inexact for the 20-bit
    # integer operands here), which silently corrupted the rank queries
    # while passing in interpret mode. A bf16-exact reformulation (win
    # split into <=255 halves, power-of-two block weights, 4x stacked M)
    # IS exact but measured 16.8 ms vs 7.4 ms for the plain sublane tree
    # sum on the full-row 48-unit envelope — so the tree sum stays.

    def chunk_body(ci, carry):
        c0u = ci * jnp.int32(G)

        # group row range = union of the group's per-unit ROI row ranges
        # (padded units carry the neutral empty range lo=h, hi=0)
        def mn(i, c):
            return jnp.minimum(c, lo_ref[c0u + i])

        def mx(i, c):
            return jnp.maximum(c, hi_ref[c0u + i])

        y_lo = jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), mn, jnp.int32(h))
        y_hi = jax.lax.fori_loop(jnp.int32(0), jnp.int32(G), mx, jnp.int32(0))

        def row_vals(y):
            """Per-unit clamped row y as G [1, w] i32 vectors (no [m, w]
            broadcast materialization: downstream ops broadcast [1, w]
            against the [256, w] bin iota implicitly, per block)."""
            yc = jnp.maximum(jnp.minimum(y, jnp.int32(h - 1)), jnp.int32(0))
            return [
                x_ref[pl.ds(c0u + g, 1), pl.ds(yc, 1), 0, :]
                .astype(jnp.int32)
                .reshape(1, w)
                for g in range(G)
            ]

        # init the vertical-window histograms centered on the first
        # processed row (rows clamp to the image: BORDER_REPLICATE),
        # per 256-block (hist_ref slices are static)
        def init_body(dy, acc):
            vals = row_vals(y_lo + dy - r)
            return [a + onehot_bf16(v) for a, v in zip(acc, vals)]

        hist0 = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(2 * r + 1),
            init_body,
            [jnp.zeros((256, w), jnp.bfloat16)] * G,
        )
        for g in range(G):
            hist_ref[g * 256 : (g + 1) * 256, :] = hist0[g]

        def window_mms(hist):
            """All column-tile window matmuls for one histogram state —
            issued up front so the (independent) VPU work that follows can
            overlap them on the MXU."""
            wins = []
            for c0, c1 in tiles:
                s0 = max(0, c0 - r)
                s1 = min(w, c1 + r)
                wins.append(
                    jax.lax.dot_general(
                        hist[:, s0:s1],
                        s2_ref[s0:s1, c0:c1],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # [m, c1-c0] f32 window histograms, exact (counts <= 441)
            return wins

        def update_hist(y):
            """hist(row y) -> hist(row y+1): add row y+r+1, drop row y-r."""
            hist = hist_ref[:, :]
            vin = row_vals(y + r + 1)
            vout = row_vals(y - r)
            for g in range(G):
                sl = slice(g * 256, (g + 1) * 256)
                hist_ref[sl, :] = (
                    hist[sl, :] + onehot_bf16(vin[g]) - onehot_bf16(vout[g])
                )

        def cdf_extract(win, t):
            """win [G*256, T] f32 (per-column window cdfs, G unit blocks),
            t [G, T] i32 in [0, 255] -> [G, T] f32 = win[g*256 + t, c] for
            every unit at once: binary-select descent on the value axis
            (each stage halves the value rows of ALL blocks via one
            broadcast select on bit log2(size) of t; slice offsets stay
            vreg-aligned), then the last 3 bits via an 8-sublane masked
            reduce. Batching the blocks through one [G, size, T] select
            chain keeps the program ~G x smaller than per-unit unrolling
            (which blew the Mosaic lowering recursion limit)."""
            T = win.shape[1]
            X = win.reshape(G, 256, T)
            tt = t[:, None, :]  # [G, 1, T]
            size = 128
            while size >= 8:
                b = jnp.bitwise_and(tt, jnp.int32(size)) != 0
                X = jnp.where(b, X[:, size:, :], X[:, :size, :])
                size //= 2
            # last 3 bits: 8-sublane masked reduce (sub-vreg select stages
            # measured slower than one masked tree sum)
            i8 = jax.lax.broadcasted_iota(jnp.int32, X.shape, 1)
            sel = (i8 == jnp.bitwise_and(tt, jnp.int32(7))).astype(
                jnp.float32
            )
            return (X * sel).sum(axis=1)  # [G, T]

        def row_bytes_cdfx(y, wins):
            """cdfx rank queries: the window matmul output is already the
            per-column cdf, so each query is one extraction at the
            per-column threshold (clamped; a negative lower threshold means
            cdf = 0, patched after the extraction)."""
            # Thresholds are built per unit on [1, w] vectors and stacked
            # per tile by concatenating [1, T] slivers — the exact op
            # pattern the qdirect combs use. Doing the clip/add arithmetic
            # directly on stacked [G, w] planes sent this environment's
            # Mosaic through invalid-relayout / lowering-recursion bugs
            # ("(8,128) -> (32,128) replicated" on vector<24x256xi1>).
            # explicit i32 bounds: under the package's global x64 flag a
            # Python-int clip bound becomes a weak INT64 scalar, and
            # Mosaic's scalar int64->int32 convert rule recurses forever
            # (lesson 5 of PERF.md, now with a concrete crash signature)
            z255 = jnp.int32(255)
            z0 = jnp.int32(0)
            vg = row_vals(y)
            t1g = [jnp.clip(v + jnp.int32(thr), z0, z255) for v in vg]
            t2rg = [v - jnp.int32(thr + 1) for v in vg]
            t2g = [jnp.clip(t, z0, z255) for t in t2rg]
            rank_f = jnp.float32(rank)
            parts = []
            for (c0, c1), win in zip(tiles, wins):
                def stack(vs):
                    return jnp.concatenate(
                        [v[:, c0:c1] for v in vs], axis=0
                    )  # [G, T]

                lo = cdf_extract(win, stack(t2g))
                lo = jnp.where(stack(t2rg) < z0, jnp.float32(0.0), lo)
                hi = cdf_extract(win, stack(t1g))
                # counts <= k*k < 2^11 are f32-exact: compare in f32
                parts.append((lo >= rank_f) | (hi < rank_f))
            bit = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            )
            return (bit.astype(jnp.int32) * 255).astype(jnp.uint8)  # [G, w]

        def row_bytes(y, wins):
            """Packed dual rank queries for row y against its window
            matmuls: [G, w] uint8 result rows.

            Masks per block: E = bins - g, packed dual rank weights (the
            packed field must hold counts up to k*k, <= 2025 for k <= 45,
            enforced by the wrapper; packed f32 sum < 2^23 stays exact)."""
            if cdfx:
                return row_bytes_cdfx(y, wins)
            vg = row_vals(y)
            gmask = []
            for g in range(G):
                if mask_variant == "base":
                    E = bins256 - vg[g]
                    gmask.append(
                        jnp.where(
                            E <= -(thr + 1),
                            jnp.float32(2049.0),
                            jnp.where(
                                E <= thr, jnp.float32(2048.0), jnp.float32(0.0)
                            ),
                        )
                    )
                else:
                    # direct compares against per-column scalars: skips the
                    # [256, w] E subtraction (bin <= g+thr <=> bin-g <= thr)
                    b1 = bins256 <= vg[g] + thr
                    b2 = bins256 <= vg[g] - (thr + 1)
                    gmask.append(
                        jnp.where(b1, jnp.float32(2048.0), jnp.float32(0.0))
                        + jnp.where(b2, jnp.float32(1.0), jnp.float32(0.0))
                    )
            combs = []
            for (c0, c1), win in zip(tiles, wins):
                combs.append(
                    jnp.concatenate(
                        [
                            (
                                win[g * 256 : (g + 1) * 256, :]
                                * gmask[g][:, c0:c1]
                            ).sum(axis=0, keepdims=True)
                            for g in range(G)
                        ],
                        axis=0,
                    )
                )  # [G, c1-c0] sublane tree sum (see exactness note above)
            comb = (
                jnp.concatenate(combs, axis=1) if len(combs) > 1 else combs[0]
            )
            cc_ = comb.astype(jnp.int32)  # [G, w]
            lo = jnp.bitwise_and(cc_, jnp.int32(2047))
            hi = jnp.right_shift(cc_, jnp.int32(11))
            bit = ((lo >= rank) | (hi < rank)).astype(jnp.int32)
            return (bit * 255).astype(jnp.uint8)  # [G, w]

        def write_row(y, byte):
            for g in range(G):
                out_ref[pl.ds(c0u + g, 1), pl.ds(y, 1), 0, :] = byte[
                    g : g + 1, :
                ].reshape(1, 1, w)

        if not step2:

            def row_body(y, c):
                wins = window_mms(hist_ref[:, :])
                update_hist(y)
                write_row(y, row_bytes(y, wins))
                return c

            jax.lax.fori_loop(y_lo, y_hi, row_body, jnp.int32(0))
        else:
            # 2-row stepping: halves the sequential loop-trip count. Each
            # iteration issues BOTH rows' window matmuls around one hist
            # update, doubling the work Mosaic can overlap between the MXU
            # (4 matmuls) and the VPU (2 one-hot updates + 2 rank queries).
            # The final odd row's second-slot write is predicated off; its
            # (discarded) query still reads clamped rows, which is safe.
            def row_body2(t, c):
                y = y_lo + t * jnp.int32(2)
                wins0 = window_mms(hist_ref[:, :])
                update_hist(y)
                wins1 = window_mms(hist_ref[:, :])
                update_hist(y + jnp.int32(1))
                write_row(y, row_bytes(y, wins0))
                byte1 = row_bytes(y + jnp.int32(1), wins1)

                @pl.when(y + jnp.int32(1) < y_hi)
                def _second():
                    write_row(y + jnp.int32(1), byte1)

                return c

            trips = jnp.maximum(
                jnp.int32(0), (y_hi - y_lo + jnp.int32(1)) // jnp.int32(2)
            )
            jax.lax.fori_loop(jnp.int32(0), trips, row_body2, jnp.int32(0))
        return carry

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(u // chunk), chunk_body, jnp.int32(0)
    )


@functools.partial(
    jax.jit, static_argnames=("k", "thr", "chunk", "variant")
)
def median_residual_mask_pallas(
    x: jnp.ndarray,
    k: int,
    thr: int,
    row_lo: jnp.ndarray | None = None,
    row_hi: jnp.ndarray | None = None,
    chunk: int = _CHUNK,
    variant: str = "base",
) -> jnp.ndarray:
    """255 where |x - medianBlur(x, k)| > thr, else 0 (uint8, bit-exact vs
    cv2 medianBlur + absdiff + THRESH_BINARY; indexing_ui.py:1519-1535).

    ``row_lo``/``row_hi`` ([U] int32) optionally bound the processed rows
    per unit: rows outside [row_lo, row_hi) are left UNWRITTEN (the defect
    path masks the result with the ROI, whose empty rows are exactly the
    skipped ones — indexing_ui.py:1528). ~34% of rows skip on the sample
    workload (the mold doesn't reach the crop margins)."""
    assert k % 2 == 1 and k >= 1
    # the packed dual rank query stores cdf counts (<= k*k) in an 11-bit
    # field; callers gate larger kernels to the XLA fallback
    assert k * k < 2048, f"median-residual kernel supports k <= 45, got {k}"
    u, h, w = x.shape
    r = k // 2
    # band matrix with BORDER_REPLICATE folded in:
    #   band[j, c] = #{d in [c-r, c+r] : clamp(d, 0, w-1) == j}
    # (border columns carry the replication multiplicity <= r+1; entries are
    # small integers, bf16-exact, and f32 accumulation of <= k*k is exact).
    # Dense [w, w] stays small because wide planes are grid-tiled into the
    # [48, 315, 316] envelope before reaching this kernel (<= 200 KB bf16).
    jj = np.arange(w)[:, None]
    pp = np.arange(w)[None, :]
    band = ((jj >= pp - r) & (jj <= pp + r)).astype(np.float32)
    band[0, :] += np.maximum(0, np.minimum(r - pp, 2 * r + 1))[0]
    band[w - 1, :] += np.maximum(0, np.minimum(pp + r - (w - 1), 2 * r + 1))[0]
    assert (band.sum(axis=0) == k).all()
    s2 = jnp.asarray(band, dtype=jnp.bfloat16)
    if row_lo is None:
        row_lo = jnp.zeros((u,), jnp.int32)
    if row_hi is None:
        row_hi = jnp.full((u,), h, jnp.int32)
    row_lo = row_lo.astype(jnp.int32)
    row_hi = row_hi.astype(jnp.int32)
    pad_u = (-u) % chunk
    if pad_u:
        # pad to a whole group; padded units carry the EMPTY row range
        # (lo=h, hi=0), the neutral element of the group's min/max union,
        # so they add no rows to any group they share
        x = jnp.concatenate([x, jnp.zeros((pad_u, h, w), x.dtype)], axis=0)
        row_lo = jnp.concatenate([row_lo, jnp.full((pad_u,), h, jnp.int32)])
        row_hi = jnp.concatenate([row_hi, jnp.zeros((pad_u,), jnp.int32)])
    up = u + pad_u
    kernel = functools.partial(
        _median_residual_kernel, k=k, thr=int(thr), u=up, h=h, w=w,
        chunk=int(chunk), variant=str(variant),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((up, h, 1, w), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk * 256, w), jnp.bfloat16)],
    )(
        x.reshape(up, h, 1, w),
        s2,
        row_lo,
        row_hi,
    )
    return out.reshape(up, h, w)[:u]


# ---------------------------------------------------------------------------
# Strip-tiled variant: planes too big for whole-batch VMEM residency
# (e.g. the defect pass on a single whole-image 4096x3000 crop)
# ---------------------------------------------------------------------------

# The per-item shape the tiling re-cuts planes into: the proven kernel
# envelope of the 48-unit production workload. Module-level so interpret-
# mode tests can shrink it to exercise the stitching cheaply.
_ITEM_ENVELOPE = (315, 316)


def median_residual_mask_tiled(
    x: jnp.ndarray,
    k: int,
    thr: int,
    batch: int = 48,
    row_lo: jnp.ndarray | None = None,
    row_hi: jnp.ndarray | None = None,
    col_lo: jnp.ndarray | None = None,
    col_hi: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Grid-tiled median_residual_mask_pallas for planes beyond whole-batch
    VMEM residency (same contract, bit-exact).

    The plane is cut into a grid of [315, 316] items with r-px halos on all
    sides — exactly the kernel envelope the 48-unit production workload
    compiles and runs in (this environment's Mosaic path deadlocks or
    check-crashes compiling the MXU median kernel at small batch counts
    and/or wide rows, so re-tiling into the proven batched shape is both the
    fast path and the only reliable one). Halos are materialized with
    clamped indices (clamping IS BORDER_REPLICATE at true image edges); a
    retained output's window never crosses an item edge, so the kernel's
    folded border replication only ever affects discarded halo outputs and
    the true image borders, where it is correct. Items are processed
    ``batch`` at a time (the last call zero-padded) so every call shares
    one compiled kernel.

    ``row_lo``/``row_hi``/``col_lo``/``col_hi`` ([U] int32, optional)
    bound the computed region per unit, exactly like the resident kernel's
    row bounds: each item intersects its plane-row range with the unit's
    ROI row range, and items entirely outside the ROI rows OR columns get
    the empty range, so the whole-image defect pass only pays for ~the
    mold's bounding box instead of the full plane. Rows outside the bounds
    are left UNWRITTEN (callers mask with the ROI, indexing_ui.py:1528).
    """
    assert k % 2 == 1 and k >= 1
    u, h, w = x.shape
    r = k // 2
    ih, iw = _ITEM_ENVELOPE
    if h <= ih and w <= iw:
        # plane already inside the envelope: only the batch count is unsafe.
        # Pad units up to ``batch`` and chunk — no halos or stitching needed.
        pad = (-u) % batch
        xp = (
            jnp.concatenate([x, jnp.zeros((pad, h, w), x.dtype)], axis=0)
            if pad
            else x
        )
        outs = [
            median_residual_mask_pallas(xp[b0 : b0 + batch], k, thr)
            for b0 in range(0, xp.shape[0], batch)
        ]
        return jnp.concatenate(outs, axis=0)[:u]
    row_t, col_t = ih - 2 * r, iw - 2 * r
    assert row_t > 0 and col_t > 0
    n_r = -(-h // row_t)
    n_c = -(-w // col_t)
    ri = jnp.clip(
        jnp.arange(n_r, dtype=jnp.int32)[:, None] * row_t
        + jnp.arange(ih, dtype=jnp.int32)[None, :]
        - r,
        0,
        h - 1,
    )
    ci = jnp.clip(
        jnp.arange(n_c, dtype=jnp.int32)[:, None] * col_t
        + jnp.arange(iw, dtype=jnp.int32)[None, :]
        - r,
        0,
        w - 1,
    )
    xi = x[:, ri][:, :, :, ci]  # [u, n_r, ih, n_c, iw]
    items = xi.transpose(0, 1, 3, 2, 4).reshape(u * n_r * n_c, ih, iw)
    n = items.shape[0]
    pad = (-n) % batch
    if pad:
        items = jnp.concatenate(
            [items, jnp.zeros((pad, ih, iw), items.dtype)], axis=0
        )
    if row_lo is None:
        lo_all = jnp.full((n,), r, jnp.int32)
        hi_all = jnp.full((n,), r + row_t, jnp.int32)
    else:
        # per-item kernel row range = the item's plane rows intersected
        # with its unit's ROI row range, shifted into halo coordinates;
        # items whose plane rows or columns miss the ROI entirely carry
        # the empty range (lo=ih, hi=0), the kernel's skip neutral
        i_idx = jnp.arange(n_r, dtype=jnp.int32)[None, :, None]
        j_idx = jnp.arange(n_c, dtype=jnp.int32)[None, None, :]
        r0 = row_lo.astype(jnp.int32)[:, None, None] - i_idx * row_t
        r1 = row_hi.astype(jnp.int32)[:, None, None] - i_idx * row_t
        lo_l = jnp.clip(r0, 0, row_t)
        hi_l = jnp.clip(r1, 0, row_t)
        ok = hi_l > lo_l
        if col_lo is not None:
            c0 = col_lo.astype(jnp.int32)[:, None, None]
            c1 = col_hi.astype(jnp.int32)[:, None, None]
            ok = ok & (c0 < (j_idx + 1) * col_t) & (c1 > j_idx * col_t)
        else:
            ok = jnp.broadcast_to(ok, (u, n_r, n_c))
            lo_l = jnp.broadcast_to(lo_l, (u, n_r, n_c))
            hi_l = jnp.broadcast_to(hi_l, (u, n_r, n_c))
        lo_all = jnp.where(ok, lo_l + r, jnp.int32(ih)).reshape(n)
        hi_all = jnp.where(ok, hi_l + r, jnp.int32(0)).reshape(n)
    if pad:
        lo_all = jnp.concatenate([lo_all, jnp.full((pad,), ih, jnp.int32)])
        hi_all = jnp.concatenate([hi_all, jnp.zeros((pad,), jnp.int32)])
    outs = []
    for b0 in range(0, items.shape[0], batch):
        o = median_residual_mask_pallas(
            items[b0 : b0 + batch], k, thr,
            row_lo=lo_all[b0 : b0 + batch],
            row_hi=hi_all[b0 : b0 + batch],
        )
        outs.append(o[:, r : r + row_t, r : r + col_t])
    out = jnp.concatenate(outs, axis=0)[:n]
    out = (
        out.reshape(u, n_r, n_c, row_t, col_t)
        .transpose(0, 1, 3, 2, 4)
        .reshape(u, n_r * row_t, n_c * col_t)
    )
    return out[:, :h, :w]


_MEDIAN_VMEM_BUDGET = 15 * 2**20  # the TPU scoped-VMEM limit is 16 MB
# (compiler: "Scoped allocation ... limit 16.00M"); 15 MB keeps headroom


def _median_vmem_bytes(u: int, h: int, w: int) -> int:
    """Estimated VMEM working set of the resident kernel: u8 in+out planes
    plus the grouped w-wide temporaries (flat [_CHUNK*256, w] hist bf16,
    bins/E/mask/onehot temporaries, dense folded band matrix)."""
    m = _CHUNK * 256
    # ~3 m-row f32/i32 temporaries live at once (E, mask, win) on top of
    # the bf16 hist scratch; the 48-unit production envelope lands at
    # ~14 MB and is verified compiling + bit-exact
    temps = w * (m * 2 + 3 * m * 4) + 2 * w * w
    return 2 * u * h * w + temps


def median_fits(shape) -> bool:
    """Whole-batch VMEM residency gate for median_residual_mask_pallas.

    Batches under 16 route to the tiled path (which pads them into the
    batched envelope): this environment's Mosaic compile of the MXU median
    kernel at tiny unit counts was observed to deadlock (u=1 with the
    pre-MXU-era formulation too), and the padded call reuses the one
    already-compiled production program instead of gambling on a fresh
    compile per odd shape (u=16 and u=48 verified compiling + bit-exact)."""
    u, h, w = shape
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return (
        on_tpu and u >= 16 and _median_vmem_bytes(u, h, w) < _MEDIAN_VMEM_BUDGET
    )


def median_fits_tiled(shape) -> bool:
    """Grid-tiled gate: every call re-tiles into the fixed [48, 315, 316]
    item envelope, which always fits — the gate only checks the platform
    (the item halo needs k <= 45, already enforced by the k*k < 2048 packed
    rank-query limit)."""
    del shape
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
