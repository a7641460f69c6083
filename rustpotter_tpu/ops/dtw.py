"""Dynamic time warping: build-time host DTW and the TPU runtime banded DTW.

Reference semantics re-derived from /root/reference/src/mfcc/dtw.rs:
  - full O(mn) DP with cosine distance + optimal-path backtrack (dtw.rs:11-55,
    106-138) — used only at wakeword build time by the averager, so it stays a
    host (numpy) routine with dynamic shapes.
  - Sakoe-Chiba banded DP with window = max(band, |m-n|) (dtw.rs:56-105). The
    reference pads the matrix to (m+1)x(n+1), then resizes dropping column 0 and
    reads the similarity at [m-1][n-1] of the RESIZED matrix — i.e. padded cell
    [m-1][n]. This off-by-one (only the first m-1 template frames are force-
    aligned) is reproduced exactly: `banded_dtw_*` returns padded dp[m-1][n].

TPU design: the runtime DP runs in *band coordinates* — for row r the band
covers columns c ∈ [r-w, r+w), stored as a fixed-width 2w vector with offset
j = c - (r - w). A lax.scan walks rows; insertion/match come from the previous
row (a one-lane shift), and the in-row deletion chain is a 2w-step min-plus
prefix scan, unrolled (2w is small, default 10). Everything is vectorized over
an arbitrary leading batch (streams × templates), which is where the
parallelism is — per the north star, batch is the long dimension, not sequence.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(np.inf)


# --------------------------------------------------------------------- host

def cosine_distance_np(a: np.ndarray, b: np.ndarray) -> np.float32:
    """1 - cosine_similarity, f32, with the magnitude==0 → similarity 0 guard
    (reference src/mfcc/comparator.rs:28-48)."""
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    dot_ab = np.float32(np.dot(a, b))
    dot_a = np.float32(np.dot(a, a))
    dot_b = np.float32(np.dot(b, b))
    magnitude = np.float32(np.sqrt(np.float32(dot_a * dot_b)))
    sim = np.float32(0.0) if magnitude == 0.0 else np.float32(dot_ab / magnitude)
    return np.float32(1.0) - sim


def full_dtw_np(a: np.ndarray, b: np.ndarray) -> tuple[np.float32, np.ndarray]:
    """Unbanded DTW (dtw.rs:11-55). a: (m, c), b: (n, c) float32.

    Returns (similarity = dp[m-1][n-1], dp matrix) for path backtracking.
    """
    m, n = len(a), len(b)
    an = a / np.linalg.norm(a, axis=1, keepdims=True).clip(min=np.finfo(np.float32).tiny)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True).clip(min=np.finfo(np.float32).tiny)
    # distance matrix in one shot; zero-magnitude rows → similarity 0
    sims = (an @ bn.T).astype(np.float32)
    a_zero = (a == 0).all(axis=1)
    b_zero = (b == 0).all(axis=1)
    sims[a_zero, :] = 0.0
    sims[:, b_zero] = 0.0
    cost = (np.float32(1.0) - sims).astype(np.float32)
    dp = np.full((m, n), INF, dtype=np.float32)
    dp[0, 0] = cost[0, 0]
    for i in range(1, m):
        dp[i, 0] = cost[i, 0] + dp[i - 1, 0]
    for j in range(1, n):
        dp[0, j] = cost[0, j] + dp[0, j - 1]
    for i in range(1, m):
        # vectorized row update: dp[i, j] = cost + min(dp[i-1,j], dp[i-1,j-1], dp[i,j-1])
        up = dp[i - 1, 1:]
        diag = dp[i - 1, :-1]
        best = np.minimum(up, diag)
        row = dp[i]
        acc = row[0]
        c = cost[i]
        for j in range(1, n):
            acc = c[j] + min(best[j - 1], acc)
            row[j] = acc
    return dp[m - 1, n - 1], dp


def retrieve_optimal_path_np(dp: np.ndarray) -> list[tuple[int, int]]:
    """Backtrack (dtw.rs:106-138): greedy min of (up, left, diag) with the
    reference's priority matches > insertion > deletion on ties."""
    m, n = dp.shape
    i, j = m - 1, n - 1
    path = [(0, 0)] * min(i, j)  # reference pre-fills min(m-1,n-1) zero entries
    while i > 0 or j > 0:
        if i > 0 and j > 0:
            insertion = dp[i - 1, j]
            deletion = dp[i, j - 1]
            matches = dp[i - 1, j - 1]
            mn = min(insertion, deletion, matches)
            if mn == matches:
                i, j = i - 1, j - 1
            elif mn == insertion:
                i -= 1
            else:
                j -= 1
        elif i > 0:
            i -= 1
        else:
            j -= 1
        path.append((i, j))
    path.reverse()
    return path


def banded_dtw_np(a: np.ndarray, b: np.ndarray, band: int) -> np.float32:
    """Reference-shaped banded DTW on host (golden oracle for the JAX kernel)."""
    m, n = len(a), len(b)
    w = max(band, abs(m - n))
    dp = np.full((m + 1, n + 1), INF, dtype=np.float32)
    dp[0, 0] = np.float32(0.0)
    for r in range(1, m + 1):
        start = max(1, r - w)
        for c in range(start, min(n + 1, r + w)):
            cost = cosine_distance_np(a[r - 1], b[c - 1])
            dp[r, c] = cost + min(dp[r - 1, c], dp[r, c - 1], dp[r - 1, c - 1])
    return dp[m - 1, n]


# ---------------------------------------------------------------- TPU / JAX

def band_costs(
    templates: jnp.ndarray,
    windows: jnp.ndarray,
    band: int,
) -> jnp.ndarray:
    """Cosine-distance costs restricted to the DP band.

    templates: (..., L, C) — rows r = 0..L-1 (DP row r+1)
    windows:   (..., L, C) — cols c = 0..L-1 (DP col c+1)
    returns    (..., L, 2w) where [..., r, j] = dist(T[r], W[r - w + j])
               (DP cell (r+1, c+1) with c = r - w + j; out-of-range → +inf is
               NOT applied here — invalid lanes are masked in the DP scan).
    """
    w = band
    t_norm = jnp.sum(templates * templates, axis=-1)  # (..., L)
    w_norm = jnp.sum(windows * windows, axis=-1)
    L = templates.shape[-2]
    cols = []
    for j in range(2 * w):
        shift = j - w  # c = r + shift
        rolled = jnp.roll(windows, -shift, axis=-2)
        rolled_norm = jnp.roll(w_norm, -shift, axis=-1)
        dot = jnp.sum(templates * rolled, axis=-1)  # (..., L)
        mag = jnp.sqrt(t_norm * rolled_norm)
        sim = jnp.where(mag == 0.0, 0.0, dot / jnp.where(mag == 0.0, 1.0, mag))
        cols.append(jnp.float32(1.0) - sim)
    return jnp.stack(cols, axis=-1)  # (..., L, 2w)


@partial(jax.jit, static_argnames=("band",))
def banded_dtw_batch(
    costs: jnp.ndarray,
    lengths: jnp.ndarray,
    band: int,
) -> jnp.ndarray:
    """Batched band-coordinate DP.

    costs:   (B, L, 2w) band costs from `band_costs` (square m = n = length
             case — the runtime always compares equal-length sequences because
             the live window is truncated to the template length).
    lengths: (B,) actual sequence lengths (≤ L); rows beyond are ignored.
    returns  (B,) similarity = padded dp[m-1][n] (the reference off-by-one).

    The scan carries the previous DP row in band coordinates (offset
    j = c - (r - w), width 2w). The similarity cell (m-1, n) has offset
    j = w + 1 in row m-1 and is harvested from the scan at r = m-1.
    """
    B, L, W2 = costs.shape
    w = band
    assert W2 == 2 * w

    # row r=0 in band coords: col c at j = c + w; dp[0][0]=0 at j=w, others inf
    row0 = jnp.full((B, W2), INF)
    row0 = row0.at[:, w].set(0.0)

    js = jnp.arange(W2)

    def step(carry, inputs):
        prev_row, result = carry
        cost_r, r = inputs  # cost_r: (B, 2w); r: DP row index (1-based)
        c = r - w + js  # (2w,) absolute column per lane
        valid = (c >= jnp.maximum(1, r - w)) & (c <= jnp.minimum(lengths[:, None], r + w - 1))
        # insertion dp[r-1][c] → prev[j+1]; matches dp[r-1][c-1] → prev[j]
        ins = jnp.concatenate([prev_row[:, 1:], jnp.full((B, 1), INF)], axis=1)
        base = jnp.minimum(ins, prev_row)  # (B, 2w)
        # deletion chain: cur[j] = cost[j] + min(base[j], cur[j-1]) — unrolled
        # min-plus prefix scan over the (small) band width
        cost_m = jnp.where(valid, cost_r, INF)
        # deletion chain: cur[j] = cost[j] + min(base[j], cur[j-1]).
        # Iterative single-step propagation converges in 2w-1 steps and keeps
        # the reference's left-to-right f32 summation association.
        cur = cost_m + base
        for _ in range(W2 - 1):
            shifted = jnp.concatenate([jnp.full((B, 1), INF), cur[:, :-1]], axis=1)
            cur = jnp.minimum(cur, cost_m + shifted)
        cur = jnp.where(valid, cur, INF)
        # harvest similarity at (r = m-1, j = w+1) where m = length
        hit = r == (lengths - 1)
        result = jnp.where(hit, cur[:, w + 1], result)
        # lengths == 1 edge: dp[0][1] = inf in reference (row 0 all inf but j=w)
        return (cur, result), None

    rows = jnp.arange(1, L + 1)
    (final_row, result), _ = jax.lax.scan(
        step, (row0, jnp.full((B,), INF)), (jnp.swapaxes(costs, 0, 1), rows)
    )
    return result
