"""Fused band-cost + banded-DTW Pallas kernel.

The unfused scoring path materializes, per 10 ms shift, the per-pair
normalized windows (B·P·L·C), ten rolled window reads, and the cost band
(B·P·L·2w) — several GB of HBM traffic per step at large stream batches and
~99% of step time. This kernel fuses the whole scoring chain per (stream-tile,
pair) grid cell: window rows sit in VMEM (the window block index depends only
on the tile, so it is reused across the pair iterations), the per-pair CMN
mean is subtracted on the fly, and each DP row computes its band of cosine
costs in registers before the min-plus update. HBM traffic drops to reading
the window once per tile.

Numerics: cosine terms use f32 mul-accumulate over C with the same
dot/sqrt/guard structure as the reference (comparator.rs:28-48); the DP chain
is strictly left-to-right like ops/pallas_dtw.py. Norm accumulation order
differs from the unfused path by ~1 ulp (reduction tree), within the
framework's score tolerance.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
SUBLANES = 8
LANES = 128


def _kernel(Lm, C, w, lens_ref, means_ref, templates_ref,
            win_ref, out_ref, wn2_s):
    """Grid cell = (stream tile g, pair k); blocks deliver the right slices.

    lens_ref:      (P,) i32 scalar-prefetch — per-pair DP lengths
    means_ref:     (1, C, 1, 8, 128) VMEM — this pair's CMN means, this tile
    templates_ref: (1, Lm, C) VMEM — this pair's CMN'd template rows
    win_ref:       (Lm, C, 1, 8, 128) VMEM — raw window rows for this tile
    out_ref:       (1, 1, 8, 128) VMEM — similarity (padded dp[m-1][n])
    wn2_s:         (Lm, 8, 128) VMEM scratch — |W[c]-m|² per window row
    """
    W2 = 2 * w
    k = pl.program_id(1)
    n = lens_ref[k]
    m = means_ref[0, :, 0]  # (C, 8, 128)

    def cbody(c, _):
        d = win_ref[c, :, 0] - m
        wn2_s[c] = jnp.sum(d * d, axis=0)
        return 0

    # static bounds throughout: traced bounds lower to scf.while with the
    # full vector carry, which Mosaic compiles pathologically slowly
    jax.lax.fori_loop(0, Lm, cbody, 0)

    inf_tile = jnp.full((SUBLANES, LANES), INF, jnp.float32)
    prev0 = tuple(
        jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
        for j in range(W2)
    )
    carry0 = (prev0, inf_tile)

    def row(r, carry):
        prev, result = carry
        # template row as unrolled scalars (static lane indices — Mosaic has
        # no dynamic-lane vector loads or 1-D shape casts) and its norm²
        t = [templates_ref[0, r - 1, c] for c in range(C)]
        tn = t[0] * t[0]
        for c in range(1, C):
            tn = tn + t[c] * t[c]
        new = []
        for j in range(W2):
            cdp = r - w + j  # DP column (1-based)
            wc = jnp.clip(cdp - 1, 0, Lm - 1)
            # dot(T[r], W[c]-m) as C scalar×tile FMAs on (8,128) tiles
            dot = t[0] * (win_ref[wc, 0, 0] - means_ref[0, 0, 0])
            for c in range(1, C):
                dot = dot + t[c] * (win_ref[wc, c, 0] - means_ref[0, c, 0])
            mag = jnp.sqrt(tn * wn2_s[wc])
            sim = jnp.where(mag == 0.0, 0.0, dot / jnp.where(mag == 0.0, 1.0, mag))
            cost = 1.0 - sim
            valid = (cdp >= 1) & (cdp <= jnp.minimum(n, r + w - 1))
            cost = jnp.where(valid, cost, INF)
            ins = prev[j + 1] if j + 1 < W2 else inf_tile
            base = jnp.minimum(ins, prev[j])
            new.append((cost, cost + base))
        for j in range(1, W2):
            new[j] = (new[j][0], jnp.minimum(new[j][1], new[j][0] + new[j - 1][1]))
        vals = tuple(v for _, v in new)
        # harvest similarity at padded cell (m-1, n): row r == n-1, offset w+1
        result = jnp.where(r == n - 1, vals[w + 1], result)
        return (vals, result)

    _, result = jax.lax.fori_loop(1, Lm + 1, row, carry0)
    out_ref[0, 0] = result


def fused_dtw_batch(
    win: jnp.ndarray,
    means: jnp.ndarray,
    templates: jnp.ndarray,
    tnorms: jnp.ndarray,
    lens: tuple,
    band: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """win: (B, Lm, C); means: (B, P, C); templates: (P, Lm, C);
    tnorms: (P, Lm); lens: per-pair lengths → sims (B, P)."""
    B, Lm, C = win.shape
    P = means.shape[1]
    w = band
    TILE = SUBLANES * LANES
    n_tiles = -(-B // TILE)
    Bp = n_tiles * TILE
    if Bp != B:
        win = jnp.pad(win, ((0, Bp - B), (0, 0), (0, 0)))
        means = jnp.pad(means, ((0, Bp - B), (0, 0), (0, 0)))
    # stream-minor layouts
    win_t = jnp.transpose(win, (1, 2, 0)).reshape(Lm, C, n_tiles, SUBLANES, LANES)
    means_t = jnp.transpose(means, (1, 2, 0)).reshape(P, C, n_tiles, SUBLANES, LANES)
    lens_arr = jnp.asarray(np.asarray(lens, np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, P),
        in_specs=[
            pl.BlockSpec(
                (1, C, 1, SUBLANES, LANES),
                lambda g, k, lens: (k, 0, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Lm, C), lambda g, k, lens: (k, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Lm, C, 1, SUBLANES, LANES),
                lambda g, k, lens: (0, 0, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, SUBLANES, LANES),
            lambda g, k, lens: (g, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Lm, SUBLANES, LANES), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        partial(_kernel, Lm, C, w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, SUBLANES, LANES), jnp.float32),
        interpret=interpret,
    )(lens_arr, means_t, templates, win_t)
    # (tiles, P, 8, 128) → (B, P)
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(Bp, P)
    return out[:B]


@lru_cache(maxsize=16)
def make_fused_scorer(lens: tuple, band: int):
    """custom_vmap wrapper: unbatched call falls back to the scan DP path;
    the batched (vmapped-over-streams) call runs the fused kernel."""

    def _single(win, means, templates, tnorms):
        from .dtw import band_costs, banded_dtw_batch

        normwin = win[None] - means[:, None, :]  # (P, Lm, C)
        costs = band_costs(templates, normwin, band)
        return banded_dtw_batch(costs, jnp.asarray(lens, jnp.int32), band)

    @jax.custom_batching.custom_vmap
    def scorer(win, means, templates, tnorms):
        return _single(win, means, templates, tnorms)

    @scorer.def_vmap
    def _rule(axis_size, in_batched, win, means, templates, tnorms):
        wb, mb, tb, nb = in_batched
        if not wb or not mb or tb or nb:
            raise NotImplementedError("unexpected batching pattern")
        return fused_dtw_batch(win, means, templates, tnorms, lens, band), True

    return scorer
