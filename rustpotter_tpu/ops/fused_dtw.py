"""Fused band-cost + banded-DTW Pallas kernel.

The unfused scoring path materializes, per 10 ms shift, the per-pair
normalized windows (B·P·L·C), ten rolled window reads, and the cost band
(B·P·L·2w) — several GB of HBM traffic per step at large stream batches and
~99% of step time. This kernel fuses the whole scoring chain per (stream-tile,
pair): window rows are DMA'd to VMEM once, the CMN diff is built in VMEM, and
each DP row computes its band of cosine costs in registers before the min-plus
update. HBM traffic drops to reading the window once per tile.

Numerics: cosine terms use f32 mul-accumulate over C with the same
dot/sqrt/guard structure as the reference (comparator.rs:28-48); the DP chain
is strictly left-to-right like ops/pallas_dtw.py. Norm accumulation order
differs from the unfused path by ~1 ulp (reduction tree), within the
framework's score tolerance.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
SUBLANES = 8
LANES = 128


def _kernel(lens, Lm, C, w, n_pairs, means_ref, templates_ref, tnorms_ref,
            win_hbm, out_ref, win_s, diff_s, wn2_s, sem):
    """One stream tile (8×128 streams), all pairs.

    means_ref:     (P, C, 8, 128) VMEM — per-pair CMN means
    templates_ref: (P, Lm, C) VMEM — CMN'd template rows (shared)
    tnorms_ref:    (P, Lm) VMEM — template row norms² (shared)
    win_hbm:       (Lm, C, 8, 128) ANY/HBM — raw window rows for this tile
    out_ref:       (P, 8, 128) VMEM — similarities (padded dp[m-1][n])
    """
    W2 = 2 * w
    g = pl.program_id(0)
    dma = pltpu.make_async_copy(win_hbm.at[:, :, g], win_s, sem)
    dma.start()
    dma.wait()

    inf_tile = jnp.full((SUBLANES, LANES), INF, jnp.float32)

    for k in range(n_pairs):
        n = lens[k]
        m = means_ref[k, :, 0]  # (C, 8, 128)

        def cbody(c, _):
            d = win_s[c] - m
            diff_s[c] = d
            wn2_s[c] = jnp.sum(d * d, axis=0)
            return 0

        jax.lax.fori_loop(0, n, cbody, 0)

        prev0 = tuple(
            jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
            for j in range(W2)
        )

        def row(r, prev):
            t_row = templates_ref[k, r - 1]  # (C,)
            tn = tnorms_ref[k, r - 1]  # scalar
            new = []
            for j in range(W2):
                cdp = r - w + j  # DP column (1-based)
                wc = jnp.clip(cdp - 1, 0, Lm - 1)
                dot = jnp.sum(t_row[:, None, None] * diff_s[wc], axis=0)
                mag2 = tn * wn2_s[wc]
                mag = jnp.sqrt(mag2)
                sim = jnp.where(mag == 0.0, 0.0, dot / jnp.where(mag == 0.0, 1.0, mag))
                cost = 1.0 - sim
                valid = (cdp >= 1) & (cdp <= jnp.minimum(n, r + w - 1))
                cost = jnp.where(valid, cost, INF)
                ins = prev[j + 1] if j + 1 < W2 else inf_tile
                base = jnp.minimum(ins, prev[j])
                new.append((cost, cost + base))
            for j in range(1, W2):
                new[j] = (new[j][0], jnp.minimum(new[j][1], new[j][0] + new[j - 1][1]))
            return tuple(v for _, v in new)

        final = jax.lax.fori_loop(1, n, row, prev0)
        # similarity = padded dp[m-1][n]: after the r = n-1 row, offset w+1
        out_ref[0, k] = final[w + 1]


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
    tnorms: (P, Lm); lens: static per-pair lengths → sims (B, P)."""
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

    n_pairs = P
    kern = partial(_kernel, tuple(int(x) for x in lens), Lm, C, w, n_pairs)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (n_pairs, C, 1, SUBLANES, LANES),
                lambda g: (0, 0, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_pairs, Lm, C), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pairs, Lm), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # full array; tile DMA'd in-kernel
        ],
        out_specs=pl.BlockSpec(
            (1, n_pairs, SUBLANES, LANES),
            lambda g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_pairs, SUBLANES, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Lm, C, SUBLANES, LANES), jnp.float32),  # win tile
            pltpu.VMEM((Lm, C, SUBLANES, LANES), jnp.float32),  # diff
            pltpu.VMEM((Lm, SUBLANES, LANES), jnp.float32),  # wn2
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(means_t, templates, tnorms, win_t)
    # (tiles, P, 8, 128) → (B, P)
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(Bp, P)
    return out[:B]


from functools import lru_cache


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
