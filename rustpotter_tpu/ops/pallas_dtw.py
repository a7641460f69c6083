"""Pallas TPU kernel: batched banded DTW dynamic program.

The DP recurrence is inherently sequential over template rows; the XLA
lax.scan formulation (ops/dtw.banded_dtw_batch) dispatches ~L tiny fused ops
per template and is latency-bound. This kernel runs the whole DP in one
Mosaic program per batch tile: the band (width 2w) is unrolled into VPU
registers, a fori_loop walks the L rows, and the (streams × templates) batch
rides the (8, 128) vector lanes. Cost tiles live in VMEM.

Semantics identical to the reference DP (/root/reference/src/mfcc/dtw.rs:56-105
— including the padded [m-1][n] similarity cell): the in-row deletion chain is
evaluated strictly left-to-right, preserving f32 summation order.
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
TILE_N = SUBLANES * LANES  # batch entries per program


def _dtw_kernel(L: int, w: int, lens_ref, costs_ref, out_ref):
    """lens_ref: (8, 128) i32; costs_ref: (L, 2w, 8, 128) f32;
    out_ref: (8, 128) f32."""
    W2 = 2 * w
    lens = lens_ref[0]
    inf_tile = jnp.full((SUBLANES, LANES), INF, jnp.float32)

    # DP row 0 in band coordinates: dp[0][0]=0 sits at offset j=w, rest +inf
    prev0 = tuple(
        jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
        for j in range(W2)
    )
    result0 = inf_tile

    def body(r, carry):
        prev, result = carry
        new = []
        for j in range(W2):
            ins = prev[j + 1] if j + 1 < W2 else inf_tile
            base = jnp.minimum(ins, prev[j])
            c = r - w + j  # absolute DP column of this lane
            valid = (c >= 1) & (c <= jnp.minimum(lens, r + w - 1))
            cj = jnp.where(valid, costs_ref[0, r - 1, j], INF)
            new.append((cj, cj + base))
        # in-row deletion chain, strictly left-to-right (exact f32 order)
        for j in range(1, W2):
            new[j] = (new[j][0], jnp.minimum(new[j][1], new[j][0] + new[j - 1][1]))
        vals = tuple(v for _, v in new)
        # harvest similarity at padded cell (m-1, n): row r == len-1, j = w+1
        hit = r == (lens - 1)
        result = jnp.where(hit, vals[w + 1], result)
        return vals, result

    _, result = jax.lax.fori_loop(1, L + 1, body, (prev0, result0))
    out_ref[0] = result


@partial(jax.jit, static_argnames=("band", "interpret"))
def banded_dtw_pallas(
    costs: jnp.ndarray, lengths: jnp.ndarray, band: int, interpret: bool = False
) -> jnp.ndarray:
    """costs: (B, L, 2w) band costs; lengths: (B,) i32 → (B,) similarities.

    Drop-in replacement for ops.dtw.banded_dtw_batch with the DP in a single
    Pallas kernel per 1024-entry batch tile.
    """
    B, L, W2 = costs.shape
    w = band
    assert W2 == 2 * w
    n_tiles = -(-B // TILE_N)
    Bp = n_tiles * TILE_N
    if Bp != B:
        costs = jnp.pad(costs, ((0, Bp - B), (0, 0), (0, 0)))
        lengths = jnp.pad(lengths, (0, Bp - B), constant_values=1)
    # (Bp, L, W2) → (tiles, L, W2, 8, 128): batch on the minor (lane) dims
    costs_t = jnp.transpose(costs, (1, 2, 0)).reshape(L, W2, n_tiles, SUBLANES, LANES)
    costs_t = jnp.transpose(costs_t, (2, 0, 1, 3, 4))
    lens_t = lengths.astype(jnp.int32).reshape(n_tiles, SUBLANES, LANES)

    out = pl.pallas_call(
        partial(_dtw_kernel, L, w),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, SUBLANES, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, L, W2, SUBLANES, LANES), lambda g: (g, 0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.float32),
        interpret=interpret,
    )(lens_t, costs_t)
    return out.reshape(Bp)[:B]
