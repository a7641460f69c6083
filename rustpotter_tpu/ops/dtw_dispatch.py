"""Banded-DTW backend dispatch: Pallas kernel on TPU, lax.scan elsewhere.

Both backends implement the identical DP (bit-matching results). The wrapper
carries a custom vmap rule: when the stream step is vmapped over a batch of
streams, the per-stream template batches are flattened into one big kernel
batch (B·K entries ride the vector lanes) instead of padding each stream's
handful of templates to a full lane tile.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp

from .dtw import banded_dtw_batch
from .pallas_dtw import banded_dtw_pallas


def use_pallas() -> bool:
    env = os.environ.get("RUSTPOTTER_PALLAS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=8)
def get_banded_dtw(band: int, pallas: bool | None = None):
    """Returns fn(costs (N, L, 2w), lengths (N,)) -> (N,) similarities."""
    if pallas is None:
        pallas = use_pallas()

    if pallas:
        def impl(costs, lengths):
            return banded_dtw_pallas(costs, lengths, band)
    else:
        def impl(costs, lengths):
            return banded_dtw_batch(costs, lengths, band)

    @jax.custom_batching.custom_vmap
    def banded(costs, lengths):
        return impl(costs, lengths)

    @banded.def_vmap
    def _rule(axis_size, in_batched, costs, lengths):
        costs_b, lens_b = in_batched
        B = axis_size
        if not costs_b:
            costs = jnp.broadcast_to(costs, (B,) + costs.shape)
        if not lens_b:
            lengths = jnp.broadcast_to(lengths, (B,) + lengths.shape)
        N, L, W2 = costs.shape[1:]
        flat = impl(costs.reshape(B * N, L, W2), lengths.reshape(B * N))
        return flat.reshape(B, N), True

    return banded
