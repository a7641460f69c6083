"""Score maps and score-mode reductions.

Parity: /root/reference/src/mfcc/comparator.rs:15-26 (logistic cost→score map),
/root/reference/src/wakewords/comp/wakeword_comp.rs:38-49,109-139 (percentile
with linear interpolation and the ScoreMode dispatch), and
/root/reference/src/wakewords/nn/wakeword_nn.rs:161-163 (inverse-similarity).
"""
from __future__ import annotations

import jax.numpy as jnp


def cost_to_score(normalized_cost: jnp.ndarray, score_ref: float) -> jnp.ndarray:
    """1 / (1 + e^((cost - ref)/ref)) — maps DTW cost into (0, 1)."""
    ref = jnp.float32(score_ref)
    return 1.0 / (1.0 + jnp.exp((normalized_cost - ref) / ref))


def nn_inverse_similarity(n1: jnp.ndarray, n2: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """1 - 1/(1 + e^(((n1-n2) - ref)/ref)) — NN logit pair → score."""
    return 1.0 - (1.0 / (1.0 + jnp.exp(((n1 - n2) - reference) / reference)))


# The ScoreMode reduction (Average/Max/interpolated percentiles over the
# padded template axis) lives in runtime/stream_step._reduce_mode — the single
# implementation of the wakeword_comp.rs:38-49,109-139 semantics.
