"""Score maps and score-mode reductions.

Parity: /root/reference/src/mfcc/comparator.rs:15-26 (logistic cost→score map),
/root/reference/src/wakewords/comp/wakeword_comp.rs:38-49,109-139 (percentile
with linear interpolation and the ScoreMode dispatch), and
/root/reference/src/wakewords/nn/wakeword_nn.rs:161-163 (inverse-similarity).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import ScoreMode


def cost_to_score(normalized_cost: jnp.ndarray, score_ref: float) -> jnp.ndarray:
    """1 / (1 + e^((cost - ref)/ref)) — maps DTW cost into (0, 1)."""
    ref = jnp.float32(score_ref)
    return 1.0 / (1.0 + jnp.exp((normalized_cost - ref) / ref))


def nn_inverse_similarity(n1: jnp.ndarray, n2: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """1 - 1/(1 + e^(((n1-n2) - ref)/ref)) — NN logit pair → score."""
    return 1.0 - (1.0 / (1.0 + jnp.exp(((n1 - n2) - reference) / reference)))


def percentile_sorted(sorted_values: jnp.ndarray, percentile: float) -> jnp.ndarray:
    """Linear-interpolated percentile over an ascending-sorted last axis.

    index = p/100 * (n-1); exact hit → value, else lerp between neighbours
    (wakeword_comp.rs:38-49, computed in f32 like the reference).
    """
    n = sorted_values.shape[-1]
    index = jnp.float32(percentile) / jnp.float32(100.0) * jnp.float32(n - 1)
    index_floor = jnp.floor(index)
    i = index_floor.astype(jnp.int32)
    d = index - index_floor
    lo = sorted_values[..., i]
    hi = sorted_values[..., jnp.minimum(i + 1, n - 1)]
    return jnp.where(index_floor == index, lo, lo * (1.0 - d) + hi * d)


_PERCENTILES = {
    ScoreMode.MEDIAN: 50.0,
    ScoreMode.P25: 25.0,
    ScoreMode.P50: 50.0,
    ScoreMode.P75: 75.0,
    ScoreMode.P80: 80.0,
    ScoreMode.P90: 90.0,
    ScoreMode.P95: 95.0,
}


def reduce_scores(scores: jnp.ndarray, mode: ScoreMode) -> jnp.ndarray:
    """Reduce per-template scores (last axis) to one score per the ScoreMode."""
    if mode == ScoreMode.AVERAGE:
        return jnp.mean(scores, axis=-1)
    if mode == ScoreMode.MAX:
        return jnp.max(scores, axis=-1)
    return percentile_sorted(jnp.sort(scores, axis=-1), _PERCENTILES[mode])
