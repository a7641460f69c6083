"""Fused band-cost + banded-DTW Pallas kernel.

The unfused scoring path materializes, per 10 ms shift, the per-pair
normalized windows (B·P·L·C), ten rolled window reads, and the cost band
(B·P·L·2w) — several GB of HBM traffic per step at large stream batches and
~99% of step time. This kernel fuses the whole scoring chain per stream-tile
grid cell: window rows sit in VMEM, the per-pair CMN mean is handled
algebraically, and each DP row computes its band of cosine costs in registers
before the min-plus update. HBM traffic drops to reading the window once per
tile.

Kernel structure (all measured on a real v5e chip via perfetto traces,
tools/kernel_probe.py — wall-clock async loops through the remote-execution
tunnel are NOT trustworthy):
  - ALL pairs are processed inside one grid cell, with the pair loop INSIDE
    the row loop: the ~C·2w window-tile loads per DP row are issued once and
    reused by every pair (the per-(row,pair) load variant measured 1.66 ms
    at B=8192, P=6, Lm=100).
  - dot(T[r], W[c]-m) = dot(T[r], W[c]) - dot(T[r], m): the second term is
    (pair,row)-indexed and precomputed into VMEM scratch, so the per-cell CMN
    subtraction (C vector subs per band cell) disappears from the inner loop.
  - cos = (dot(T', W[c]) - dot(T', m)) * rwn[c] with T' = T·rsqrt(|T|²)
    pre-normalized OUTSIDE the kernel (a scalar-unit rsqrt/select per row
    measurably costs more than it saves — sreg↔vreg domain crossings) and
    rwn = guarded 1/|W[c]-m| precomputed per (pair, window row): no sqrt or
    divide in the inner loop.

Numerics: cosine terms use f32 mul-accumulate over C with the same
dot/guard structure as the reference (comparator.rs:28-48): |T|=0 or
|W-m|=0 ⇒ cos 0. The DP chain is strictly left-to-right like
ops/pallas_dtw.py. Accumulation order differs from the unfused path by
~1 ulp (reduction tree), within the framework's score tolerance.
Known parity divergence (intentional, ADVICE r2): the reference guards
sqrt(dot_a*dot_b)==0, which also fires when the f32 PRODUCT of the two
norms underflows to 0 with both norms nonzero; this kernel guards the two
norms separately (|T|²==0, |W-m|²==0), so a subnormal-product row would
yield a real cosine where the reference returns 0. Requires both row norms
< ~1e-19 — unreachable with real MFCC data (log-mel features have O(1-10)
values), and the separate guards avoid a per-cell product+compare in the
inner loop.
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

# Template scalars the v3/v4 kernels may place in SMEM per launch. Measured
# on v5e (r5, tools/tpu_kernel_parity.py check 7 compile probe): SMEM is
# 1 MiB per core and Mosaic pads scalar-array elements to 32 bytes, so the
# hard cap is 32768 f32 values; 30000 leaves margin for the lens/gate SMEM
# operands. Launches beyond this must split (runtime/stream_step.py groups
# whole wakewords per launch under this budget).
SMEM_TEMPLATE_VALUES = 30000


def _check_band(band: int) -> None:
    """The DP phase harvests the similarity at band slot w+1 (the padded
    [m-1][n] cell), which only exists inside the 2w-wide frontier for
    w >= 2 — a band_size of 1 would index past it at trace time with an
    opaque error (ADVICE r3). The reference's default band is 5
    (constants.rs:5); configure band_size >= 2 for the fused kernels."""
    if band < 2:
        raise ValueError(
            f"fused DTW kernels require band_size >= 2 (got {band}): the "
            "[m-1][n] similarity cell lies outside a width-2 frontier"
        )


def _kernel(Lm, C, w, P, lens_ref, means_ref, templates_ref,
            win_ref, out_ref, *scratch):
    """Grid cell = stream tile g; blocks deliver this tile's slices.

    lens_ref:      (P,) i32 scalar-prefetch — per-pair DP lengths
    means_ref:     (P, C, 1, 8, 128) VMEM — per-pair CMN means, this tile
    templates_ref: (P, Lm, C) VMEM — pre-normalized template rows
    win_ref:       (Lm, C, 1, 8, 128) VMEM — raw window rows for this tile
    out_ref:       (1, P, 8, 128) VMEM — similarity (padded dp[m-1][n])
    scratch:       2P VMEM buffers (Lm, 8, 128): per-pair rwn then dotm
    """
    W2 = 2 * w
    rwn_s = scratch[:P]
    dotm_s = scratch[P:]

    # --- pre-passes, per pair: guarded 1/|W[c]-m| and dot(T'[r], m).
    # static bounds throughout: traced bounds lower to scf.while with the
    # full vector carry, which Mosaic compiles pathologically slowly
    for k in range(P):
        m = means_ref[k, :, 0]  # (C, 8, 128)

        def cbody(c, _, k=k, m=m):
            d = win_ref[c, :, 0] - m
            wn2 = jnp.sum(d * d, axis=0)
            rwn_s[k][c] = jnp.where(wn2 == 0.0, 0.0, jax.lax.rsqrt(wn2))
            return 0

        jax.lax.fori_loop(0, Lm, cbody, 0)

        def dbody(r, _, k=k, m=m):
            acc = templates_ref[k, r, 0] * m[0]
            for c in range(1, C):
                acc = acc + templates_ref[k, r, c] * m[c]
            dotm_s[k][r] = acc
            return 0

        jax.lax.fori_loop(0, Lm, dbody, 0)

    inf_tile = jnp.full((SUBLANES, LANES), INF, jnp.float32)
    prev0 = tuple(
        jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
        for j in range(W2)
    )
    carry0 = ((prev0,) * P, (inf_tile,) * P)

    def row(r, carry):
        prevs, results = carry
        new_prevs, new_results = [], []
        # window tiles for this row's band columns, loaded once and shared
        # by every pair; band slot j has DP column cdp = r - w + j
        wv = []
        for j in range(W2):
            wc = jnp.clip(r - w + j - 1, 0, Lm - 1)
            wv.append((wc, [win_ref[wc, c, 0] for c in range(C)]))
        for k in range(P):
            prev = prevs[k]
            n = lens_ref[k]
            # pre-normalized template row as unrolled scalars (static lane
            # indices — Mosaic has no dynamic-lane vector loads or 1-D casts)
            t = [templates_ref[k, r - 1, c] for c in range(C)]
            dotm = dotm_s[k][r - 1]
            new = []
            for j in range(W2):
                cdp = r - w + j  # DP column (1-based)
                wc, wtiles = wv[j]
                # dot(T'[r], W[c]) as C scalar×tile FMAs on (8,128) tiles
                dot = t[0] * wtiles[0]
                for c in range(1, C):
                    dot = dot + t[c] * wtiles[c]
                cost = 1.0 - (dot - dotm) * rwn_s[k][wc]
                valid = (cdp >= 1) & (cdp <= jnp.minimum(n, r + w - 1))
                cost = jnp.where(valid, cost, INF)
                ins = prev[j + 1] if j + 1 < W2 else inf_tile
                base = jnp.minimum(ins, prev[j])
                new.append((cost, cost + base))
            for j in range(1, W2):
                new[j] = (new[j][0], jnp.minimum(new[j][1], new[j][0] + new[j - 1][1]))
            vals = tuple(v for _, v in new)
            # harvest similarity at padded cell (m-1, n): row r == n-1,
            # offset w+1
            new_results.append(jnp.where(r == n - 1, vals[w + 1], results[k]))
            new_prevs.append(vals)
        return (tuple(new_prevs), tuple(new_results))

    _, results = jax.lax.fori_loop(1, Lm + 1, row, carry0)
    for k in range(P):
        out_ref[0, k] = results[k]


def _kernel_v2(Lm, C, w, P, jch, lens_ref, means_ref, templates_ref,
               win_ref, out_ref, *scratch):
    """Two-phase variant of `_kernel` (same blocks + 2P rwn/dotm scratch,
    plus P cost-band scratch buffers).

    The v1 kernel keeps the whole DP frontier for every pair (P*2w tiles)
    live across the row loop while ALSO issuing the band dot products in the
    same body — Mosaic spills the frontier to VMEM and the kernel measures
    ~4x its FMA roofline (1.70 ms at B=8192, P=6, Lm=100 on v5e). Splitting
    the work fixes the register pressure:

      phase 1 (cost band): for each DP row, accumulate the 2w*P cosine dots
        with a (j-chunk, coeff)-outer / pair-inner loop — each window tile is
        loaded once and feeds P FMAs while only P*jch accumulators are live,
        and there is NO loop-carried vector state. Costs land in VMEM scratch.
      phase 2 (DP): one fori_loop per pair over the precomputed band rows —
        the carry is just the 2w-tile frontier + the result tile, which fits
        in registers.

    f32 accumulation order over C is the same linear chain as v1, so scores
    are bit-identical to v1 (and stay within the framework tolerance vs the
    unfused path).
    """
    W2 = 2 * w
    rwn_s = scratch[:P]
    dotm_s = scratch[P:2 * P]
    cost_s = scratch[2 * P:]

    # --- pre-passes, per pair: guarded 1/|W[c]-m| and dot(T'[r], m)
    for k in range(P):
        m = means_ref[k, :, 0]  # (C, 8, 128)

        def cbody(c, _, k=k, m=m):
            d = win_ref[c, :, 0] - m
            wn2 = jnp.sum(d * d, axis=0)
            rwn_s[k][c] = jnp.where(wn2 == 0.0, 0.0, jax.lax.rsqrt(wn2))
            return 0

        jax.lax.fori_loop(0, Lm, cbody, 0)

        def dbody(r, _, k=k, m=m):
            acc = templates_ref[k, r, 0] * m[0]
            for c in range(1, C):
                acc = acc + templates_ref[k, r, c] * m[c]
            dotm_s[k][r] = acc
            return 0

        jax.lax.fori_loop(0, Lm, dbody, 0)

    # --- phase 1: cost band into scratch. Row body is pure FMA streaming.
    def cost_row(r, _):
        # r: DP row (1-based); template row r-1; band slot j covers window
        # column wc = clip(r - w + j - 1) (validity applied in phase 2)
        for j0 in range(0, W2, jch):
            jj_n = min(jch, W2 - j0)
            accs = [[None] * jj_n for _ in range(P)]
            for c in range(C):
                ts = [templates_ref[k, r - 1, c] for k in range(P)]
                for jj in range(jj_n):
                    wc = jnp.clip(r - w + (j0 + jj) - 1, 0, Lm - 1)
                    wt = win_ref[wc, c, 0]
                    for k in range(P):
                        prodsum = ts[k] * wt
                        accs[k][jj] = prodsum if accs[k][jj] is None \
                            else accs[k][jj] + prodsum
            for jj in range(jj_n):
                wc = jnp.clip(r - w + (j0 + jj) - 1, 0, Lm - 1)
                for k in range(P):
                    cost_s[k][r - 1, j0 + jj] = 1.0 - (
                        (accs[k][jj] - dotm_s[k][r - 1]) * rwn_s[k][wc]
                    )
        return 0

    jax.lax.fori_loop(1, Lm + 1, cost_row, 0)

    # --- phase 2: banded DP per pair, small register frontier
    inf_tile = jnp.full((SUBLANES, LANES), INF, jnp.float32)
    for k in range(P):
        n = lens_ref[k]
        prev0 = tuple(
            jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
            for j in range(W2)
        )

        def dp_row(r, carry, k=k, n=n):
            prev, result = carry
            new = []
            for j in range(W2):
                cdp = r - w + j  # DP column (1-based)
                cost = cost_s[k][r - 1, j]
                valid = (cdp >= 1) & (cdp <= jnp.minimum(n, r + w - 1))
                cost = jnp.where(valid, cost, INF)
                ins = prev[j + 1] if j + 1 < W2 else inf_tile
                base = jnp.minimum(ins, prev[j])
                new.append((cost, cost + base))
            for j in range(1, W2):
                new[j] = (new[j][0],
                          jnp.minimum(new[j][1], new[j][0] + new[j - 1][1]))
            vals = tuple(v for _, v in new)
            result = jnp.where(r == n - 1, vals[w + 1], result)
            return (vals, result)

        _, result = jax.lax.fori_loop(1, Lm + 1, dp_row, (prev0, inf_tile))
        out_ref[0, k] = result


def _kernel_v3(Lm, F, C, w, D, K, jch, lens_ref, means_ref, win_ref, tsm_ref,
               dotm_ref, gate_ref, out_ref, *scratch):
    """Gated three-improvement variant of `_kernel_v2`. NOTE: the r5
    latency-hiding unrolls (DP interleave, rwn/linearize/cost-row unrolls)
    live in `_kernel_v4` only — the serving chunk's kernel; v3 is retained
    as the per-shift A/B reference and the non-chunk batched API's backend.
    (v5e probe numbers in
    tools/vpu_probe.py motivate each):

      1. template scalars come from SMEM (tsm_ref, (P*Lm, C)): a (1x1) VMEM
         element load + broadcast measures ~26 cycles (probe `sload`), an SMEM
         scalar load ~2 (probe `smemload`) — the v2 kernel spent ~40% of its
         time on template loads.
      2. dot(T'[r], m) comes in precomputed (dotm_ref) — an MXU einsum outside
         the kernel — instead of a P·Lm·C scalar-load pre-pass.
      3. the avg-template pairs are scored FIRST, and each wakeword's template
         pairs are computed only when ANY stream in the tile passes the
         avg-gate bound (gate_ref, sim-domain, +inf disables): the reference's
         early abort (wakeword_comp.rs:85-94) as a tile-granular skip. Skipped
         pairs write +inf sims → cost_to_score → 0, which downstream masking
         already treats as "no detection" (gated-out streams never read their
         template scores).

    Pair layout (matches _dtw_scores): p = d*K + k for templates, D*K + d for
    the avg pair of wakeword d. Scratch: P rwn buffers (Lm, 8, 128) +
    max(K, 1) cost-band buffers (Lm, 2w, 8, 128), reused across wakewords.

    The window buffer is CIRCULAR with F >= Lm rows: lens_ref[P+1] = rot =
    physical row of the newest frame; logical window column i (0-based,
    oldest-first) lives at physical (rot + 1 + i) % F. The rotation is
    resolved ONCE per grid cell by linearizing the Lm logical columns into
    VMEM scratch (lin_s) — indices derived from the runtime `rot` scalar in
    the HOT loops trip a pathological Pallas lowering path (measured: the
    same kernel lowers in 2 s with affine indices vs 167 s with
    rot-dependent ones), and affine loads are faster at runtime too.
    """
    W2 = 2 * w
    P = D * K + D
    lin_s = scratch[0]
    rwn_s = scratch[1:P + 1]
    cost_s = scratch[P + 1:]
    g = pl.program_id(0)
    rot = lens_ref[P + 1]

    # --- linearize the circular window: lin_s[c_log] = win[(rot+1+c_log)%F].
    # ONE bulk (C, 8, 128) load per column: per-tile loads at a rot-derived
    # (non-affine) index each cost ~6 s of Pallas lowering; the bulk load at
    # the same index lowers in O(1) and DMAs faster too.
    def lin_body(c, _):
        ph = rot + 1 + c
        ph = jnp.where(ph >= F, ph - F, ph)
        lin_s[c] = win_ref[ph, :, 0]
        return 0

    jax.lax.fori_loop(0, Lm, lin_body, 0)

    # lane-validity mask for the gate reduction: padded streams produce
    # finite garbage sims that must not keep a tile alive. lens_ref[P] = B.
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    )
    lane_valid = (g * (SUBLANES * LANES) + iota) < lens_ref[P]

    def compute_rwn(p):
        m = means_ref[p, :, 0]  # (C, 8, 128)

        def cbody(c, _):
            d = lin_s[c] - m
            wn2 = jnp.sum(d * d, axis=0)
            rwn_s[p][c] = jnp.where(wn2 == 0.0, 0.0, jax.lax.rsqrt(wn2))
            return 0

        jax.lax.fori_loop(0, Lm, cbody, 0)

    def cost_phase(pairs):
        """Band-cost rows for a static tuple of pair ids, W tiles shared."""
        np_ = len(pairs)

        def cost_row(r, _):
            wcl = [jnp.clip(r - w + j - 1, 0, Lm - 1) for j in range(W2)]
            for j0 in range(0, W2, jch):
                jj_n = min(jch, W2 - j0)
                accs = [[None] * jj_n for _ in range(np_)]
                for c in range(C):
                    ts = [tsm_ref[p * Lm + r - 1, c] for p in pairs]
                    for jj in range(jj_n):
                        wt = lin_s[wcl[j0 + jj], c]
                        for i in range(np_):
                            prodsum = ts[i] * wt
                            accs[i][jj] = prodsum if accs[i][jj] is None \
                                else accs[i][jj] + prodsum
                for jj in range(jj_n):
                    for i, p in enumerate(pairs):
                        cost_s[i][r - 1, j0 + jj] = 1.0 - (
                            (accs[i][jj] - dotm_ref[p, r - 1, 0])
                            * rwn_s[p][wcl[j0 + jj]]
                        )
            return 0

        jax.lax.fori_loop(1, Lm + 1, cost_row, 0)

    inf_tile = jnp.full((SUBLANES, LANES), INF, jnp.float32)

    def dp_phase(i, p):
        """Banded DP over cost_s[i] for pair id p; writes out_ref and
        returns the similarity tile."""
        n = lens_ref[p]
        prev0 = tuple(
            jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
            for j in range(W2)
        )

        def dp_row(r, carry):
            prev, result = carry
            new = []
            for j in range(W2):
                cdp = r - w + j
                cost = cost_s[i][r - 1, j]
                valid = (cdp >= 1) & (cdp <= jnp.minimum(n, r + w - 1))
                cost = jnp.where(valid, cost, INF)
                ins = prev[j + 1] if j + 1 < W2 else inf_tile
                base = jnp.minimum(ins, prev[j])
                new.append((cost, cost + base))
            for j in range(1, W2):
                new[j] = (new[j][0],
                          jnp.minimum(new[j][1], new[j][0] + new[j - 1][1]))
            vals = tuple(v for _, v in new)
            result = jnp.where(r == n - 1, vals[w + 1], result)
            return (vals, result)

        _, result = jax.lax.fori_loop(1, Lm + 1, dp_row, (prev0, inf_tile))
        out_ref[0, p] = result
        return result

    for d in range(D):
        ap = D * K + d
        compute_rwn(ap)
        cost_phase((ap,))
        avg_sim = dp_phase(0, ap)
        gated = jnp.where(lane_valid, avg_sim, INF)
        any_pass = jnp.any(gated <= gate_ref[d])
        tpl_pairs = tuple(d * K + k for k in range(K))

        @pl.when(any_pass)
        def _compute(d=d, tpl_pairs=tpl_pairs):
            for p in tpl_pairs:
                compute_rwn(p)
            cost_phase(tpl_pairs)
            for i, p in enumerate(tpl_pairs):
                dp_phase(i, p)

        @pl.when(jnp.logical_not(any_pass))
        def _skip(tpl_pairs=tpl_pairs):
            for p in tpl_pairs:
                out_ref[0, p] = inf_tile


def _kernel_v4(Lm, F, C, w, D, K, jch, dpg, dik, lens_ref, means_ref, win_ref,
               new_ref, tsm_ref, dotm_ref, gate_ref, out_ref, *scratch):
    """Whole-chunk variant of `_kernel_v3`: grid (stream tile g, shift s) —
    ONE kernel invocation scores all 3 MFCC shifts of a 30 ms chunk.

    The reference scores the window after every 10 ms frame push
    (detector.rs:374-397). The per-shift windows differ only in the s newest
    rows, so instead of writing rows between three kernel launches (which
    forces the window through the XLA while-carry — measured two full
    (F, C, B) layout-conversion copies per chunk plus a tiled copy per shift,
    ~700 us at B=8192), the kernel takes the PRE-chunk circular window plus
    the 3 new rows (new_ref) and linearizes the VIRTUAL window of shift s in
    VMEM: logical column i comes from new_ref when i >= F - (s+1), else from
    win_ref at the rot-derived row. The window block's index map ignores s,
    so Mosaic keeps it resident across the 3 shift grid-steps: one window
    DMA per stream tile per CHUNK instead of per shift.

    Correctness of the virtual window: a stream whose row write is masked
    off (extractor warm-up, or halted by an earlier in-chunk detection) has
    win_count < F at every remaining shift of the chunk (warm-up and
    win_count reset together, runtime/stream_step.py), so its scores are
    discarded by the `run` mask downstream — the virtual rows are only ever
    consumed where they equal the really-written rows.

    means_ref/dotm_ref carry the per-SHIFT CMN means (computed against the
    same virtual windows) and their template dot products; pair layout,
    SMEM templates, gating and the DP recurrence are exactly _kernel_v3's.
    """
    W2 = 2 * w
    P = D * K + D
    KB = max(K, 1)
    lin_s = scratch[0]
    rwn_s = scratch[1:P + 1]
    cost_s = scratch[P + 1:P + 1 + KB]
    dotm_s = scratch[P + 1 + KB:]  # dik mode: per-template-pair dotm
    g = pl.program_id(0)
    s = pl.program_id(1)
    ns = s + 1  # number of new rows visible at this shift
    rot0 = lens_ref[P + 1]
    rot_s = rot0 + ns
    rot_s = jnp.where(rot_s >= F, rot_s - F, rot_s)

    # --- linearize the virtual window for shift s. Columns below F-3 can
    # never be new rows (ns <= 3) — static fori_loop of bulk loads; the last
    # <=3 columns select new_ref[i - (F - ns)] when that index is >= 0.
    # 4 columns per iteration (same latency-hiding unroll as compute_rwn;
    # a static tail covers lim % 4).
    lim = min(max(F - 3, 0), Lm)
    UL = 4

    def lin_one(c):
        ph = rot_s + 1 + c
        ph = jnp.where(ph >= F, ph - F, ph)
        lin_s[c] = win_ref[ph, :, 0]

    def lin_body(cb, _):
        for u in range(UL):
            lin_one(cb * UL + u)
        return 0

    jax.lax.fori_loop(0, lim // UL, lin_body, 0)
    for c in range(lim - lim % UL, lim):
        lin_one(c)
    for i in range(lim, Lm):
        ph = rot_s + 1 + i
        ph = jnp.where(ph >= F, ph - F, ph)
        wv = win_ref[ph, :, 0]
        nj = i - (F - ns)  # new-row index, valid when >= 0
        nv = new_ref[jnp.clip(nj, 0, 2), :, 0]
        lin_s[i] = jnp.where(nj >= 0, nv, wv)

    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    )
    lane_valid = (g * (SUBLANES * LANES) + iota) < lens_ref[P]

    def compute_rwn(p, U=8):
        # U columns per iteration: each column's square-sum is a dependent
        # add tree + rsqrt; independent trees per body give the scheduler
        # latency-hiding work (same trick as dp_phase_multi). Measured at
        # bench shapes (dpg=3): U=1 2107.4, U=2 1863.0, U=4 1786.2 µs
        # kernel/chunk. Static tail covers Lm % U.
        m = means_ref[0, p, :, 0]  # (C, 8, 128)

        def one(c):
            d = lin_s[c] - m
            wn2 = jnp.sum(d * d, axis=0)
            rwn_s[p][c] = jnp.where(wn2 == 0.0, 0.0, jax.lax.rsqrt(wn2))

        def cbody(cb, _):
            c0 = cb * U
            for u in range(U):
                one(c0 + u)
            return 0

        jax.lax.fori_loop(0, Lm // U, cbody, 0)
        for c in range(Lm - Lm % U, Lm):
            one(c)

    def cost_phase(pairs, dget=None, UR=2):
        np_ = len(pairs)
        if dget is None:
            dget = lambda i, p, r: dotm_ref[0, p, r - 1, 0]

        def one_row(r):
            wcl = [jnp.clip(r - w + j - 1, 0, Lm - 1) for j in range(W2)]
            for j0 in range(0, W2, jch):
                jj_n = min(jch, W2 - j0)
                accs = [[None] * jj_n for _ in range(np_)]
                for c in range(C):
                    ts = [tsm_ref[p * Lm + r - 1, c] for p in pairs]
                    for jj in range(jj_n):
                        wt = lin_s[wcl[j0 + jj], c]
                        for i in range(np_):
                            prodsum = ts[i] * wt
                            accs[i][jj] = prodsum if accs[i][jj] is None \
                                else accs[i][jj] + prodsum
                for jj in range(jj_n):
                    for i, p in enumerate(pairs):
                        cost_s[i][r - 1, j0 + jj] = 1.0 - (
                            (accs[i][jj] - dget(i, p, r))
                            * rwn_s[p][wcl[j0 + jj]]
                        )

        # UR rows per iteration (latency-hiding unroll like compute_rwn;
        # static tail) — rows are independent
        def cost_row(rb, _):
            for u in range(UR):
                one_row(1 + rb * UR + u)
            return 0

        jax.lax.fori_loop(0, Lm // UR, cost_row, 0)
        for r in range(Lm - Lm % UR + 1, Lm + 1):
            one_row(r)

    inf_tile = jnp.full((SUBLANES, LANES), INF, jnp.float32)

    def dp_phase(i, p):
        n = lens_ref[p]
        prev0 = tuple(
            jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
            for j in range(W2)
        )

        def dp_row(r, carry):
            prev, result = carry
            new = []
            for j in range(W2):
                cdp = r - w + j
                cost = cost_s[i][r - 1, j]
                valid = (cdp >= 1) & (cdp <= jnp.minimum(n, r + w - 1))
                cost = jnp.where(valid, cost, INF)
                ins = prev[j + 1] if j + 1 < W2 else inf_tile
                base = jnp.minimum(ins, prev[j])
                new.append((cost, cost + base))
            for j in range(1, W2):
                new[j] = (new[j][0],
                          jnp.minimum(new[j][1], new[j][0] + new[j - 1][1]))
            vals = tuple(v for _, v in new)
            result = jnp.where(r == n - 1, vals[w + 1], result)
            return (vals, result)

        _, result = jax.lax.fori_loop(1, Lm + 1, dp_row, (prev0, inf_tile))
        out_ref[0, 0, p] = result
        return result

    def dp_phase_multi(ips):
        """Several pairs' banded DPs interleaved in ONE row loop: the
        min-prefix chain over the band slots is a serial dependence
        (~2·(2w−1) ops of ~1.55 c latency each per row) that a single pair
        cannot hide; independent chains give the scheduler work to overlap.
        Live state is G·(2w+1) tiles. Measured at bench shapes (v5e,
        kernel_probe --dpg=G): G=1 2246.6 µs/chunk, G=2 2147.4, G=3 2107.4,
        G=5 2109.3 (flat past 3, no spill penalty even at 55 live tiles) —
        default 3."""
        G = len(ips)
        ns = [lens_ref[p] for _, p in ips]
        z = tuple(
            jnp.zeros((SUBLANES, LANES), jnp.float32) if j == w else inf_tile
            for j in range(W2)
        )

        def dp_row(r, carry):
            prevs, ress = carry
            news = [[] for _ in range(G)]
            for j in range(W2):
                cdp = r - w + j
                for g_, (i, _p) in enumerate(ips):
                    c = cost_s[i][r - 1, j]
                    v = (cdp >= 1) & (cdp <= jnp.minimum(ns[g_], r + w - 1))
                    c = jnp.where(v, c, INF)
                    ins = prevs[g_][j + 1] if j + 1 < W2 else inf_tile
                    news[g_].append((c, c + jnp.minimum(ins, prevs[g_][j])))
            for j in range(1, W2):
                for g_ in range(G):
                    news[g_][j] = (
                        news[g_][j][0],
                        jnp.minimum(news[g_][j][1],
                                    news[g_][j][0] + news[g_][j - 1][1]),
                    )
            vals = tuple(tuple(v for _, v in news[g_]) for g_ in range(G))
            ress = tuple(
                jnp.where(r == ns[g_] - 1, vals[g_][w + 1], ress[g_])
                for g_ in range(G)
            )
            return (vals, ress)

        _, ress = jax.lax.fori_loop(
            1, Lm + 1, dp_row, ((z,) * G, (inf_tile,) * G)
        )
        for g_, (_i, p) in enumerate(ips):
            out_ref[0, 0, p] = ress[g_]

    def compute_dotm(i, p, UD=4):
        """dik mode: dot(T'[r], m_p) per row into dotm_s[i] — the same f32
        FMA chain the v1 kernel used, but with ~2-cycle SMEM template loads
        (v3 mechanism) and UD rows per body (latency-hiding unroll). Runs
        only under the gate's pl.when, so idle-fleet tiles skip it AND the
        host-side dotm einsum/relayout for template pairs disappears."""
        m = means_ref[0, p, :, 0]  # (C, 8, 128)

        def one(r):
            acc = tsm_ref[p * Lm + r, 0] * m[0]
            for c in range(1, C):
                acc = acc + tsm_ref[p * Lm + r, c] * m[c]
            dotm_s[i][r] = acc

        def rbody(rb, _):
            for u in range(UD):
                one(rb * UD + u)
            return 0

        jax.lax.fori_loop(0, Lm // UD, rbody, 0)
        for r in range(Lm - Lm % UD, Lm):
            one(r)

    for d in range(D):
        ap = D * K + d
        compute_rwn(ap)
        # dik: dotm_ref carries ONLY the D avg pairs (index d, not ap)
        avg_dget = (lambda i, p, r, d=d: dotm_ref[0, d, r - 1, 0]) if dik \
            else None
        cost_phase((ap,), dget=avg_dget)
        avg_sim = dp_phase(0, ap)
        gated = jnp.where(lane_valid, avg_sim, INF)
        any_pass = jnp.any(gated <= gate_ref[d])
        tpl_pairs = tuple(d * K + k for k in range(K))

        @pl.when(any_pass)
        def _compute(d=d, tpl_pairs=tpl_pairs):
            for p in tpl_pairs:
                compute_rwn(p)
            if dik:
                for i, p in enumerate(tpl_pairs):
                    compute_dotm(i, p)
                cost_phase(tpl_pairs,
                           dget=lambda i, p, r: dotm_s[i][r - 1])
            else:
                cost_phase(tpl_pairs)
            G = max(1, int(dpg))
            ips = list(enumerate(tpl_pairs))
            if G <= 1:
                for i, p in ips:
                    dp_phase(i, p)
            else:
                a = 0
                while a < len(ips):
                    grp = ips[a:a + G]
                    if len(grp) == 1:
                        dp_phase(*grp[0])
                    else:
                        dp_phase_multi(grp)
                    a += G

        @pl.when(jnp.logical_not(any_pass))
        def _skip(tpl_pairs=tpl_pairs):
            for p in tpl_pairs:
                out_ref[0, 0, p] = inf_tile


def tile_streams(x: jnp.ndarray, B: int) -> jnp.ndarray:
    """(..., B) -> (..., n_tiles, 8, 128): pad the stream axis to a whole
    number of (8, 128) vector tiles and split it. Done ONCE per chunk on
    the window/new-row operands so every downstream einsum produces the
    kernel's tiled layout directly (an untiled einsum output forces XLA to
    materialize full-size relayout copies — measured ~59 MB for dotm)."""
    TILE = SUBLANES * LANES
    n_tiles = -(-B // TILE)
    Bp = n_tiles * TILE
    if Bp != B:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)]
        x = jnp.pad(x, pad)
    return x.reshape(x.shape[:-1] + (n_tiles, SUBLANES, LANES))


def fused_dtw_chunk_v4(
    win_t: jnp.ndarray,
    new_t: jnp.ndarray,
    means3_t: jnp.ndarray,
    templates: jnp.ndarray,
    tnorms: jnp.ndarray,
    gate_bounds: jnp.ndarray,
    lens: tuple,
    band: int,
    D: int,
    K: int,
    rot0,
    interpret: bool = False,
    jch: int = 5,
    dpg: int = 3,
    dik: bool = True,
) -> jnp.ndarray:
    """Whole-chunk v4 driver (untiled convenience entry — the batched
    runtime tiles once and calls fused_dtw_chunk_v4_tiled). win_t (F, C, B)
    = PRE-chunk circular window with cursor rot0; new_t (3, C, B) = the
    chunk's 3 new MFCC frames; means3_t (3, P, C, B) = per-shift CMN means
    over the virtual windows. Returns sims (B, 3, P)."""
    F, C, B = win_t.shape
    return fused_dtw_chunk_v4_tiled(
        tile_streams(win_t, B), tile_streams(new_t, B),
        tile_streams(means3_t, B), templates, tnorms, gate_bounds,
        lens, band, D, K, rot0, B, interpret=interpret, jch=jch, dpg=dpg,
        dik=dik,
    )


def fused_dtw_chunk_v4_tiled(
    win5: jnp.ndarray,
    new5: jnp.ndarray,
    means5: jnp.ndarray,
    templates: jnp.ndarray,
    tnorms: jnp.ndarray,
    gate_bounds: jnp.ndarray,
    lens: tuple,
    band: int,
    D: int,
    K: int,
    rot0,
    B: int,
    interpret: bool = False,
    jch: int = 5,
    dpg: int = 3,
    dik: bool = True,
) -> jnp.ndarray:
    """Tiled v4 entry: win5 (F, C, g, 8, 128), new5 (3, C, g, 8, 128),
    means5 (3, P, C, g, 8, 128) — see tile_streams. Returns sims (B, 3, P).
    dpg = DP interleave group size (see _kernel_v4 dp_phase_multi; 3 ships).
    dik = template-pair dotm computed IN-KERNEL under the gate's pl.when
    (see _kernel_v4.compute_dotm): the host-side dotm einsum + its 59 MB
    relayout then cover only the D avg pairs, and idle-fleet (gated-out)
    tiles skip the template dotm entirely."""
    F, C, n_tiles = win5.shape[0], win5.shape[1], win5.shape[2]
    Lm = templates.shape[1]
    P = means5.shape[1]
    Bp = n_tiles * SUBLANES * LANES
    assert P == D * K + D, (P, D, K)
    assert F >= Lm, (F, Lm)
    assert F >= 3, F
    _check_band(band)
    w = band
    templates = templates * jnp.where(
        tnorms == 0.0, 0.0, jax.lax.rsqrt(tnorms)
    )[..., None]
    # dot(T'[r], m) per (shift, pair, row, stream): one MXU einsum per chunk
    # (hoisted across the 3 shifts — VERDICT r3 next#1a), computed straight
    # in the tiled layout so no relayout copy materializes
    # PRECISION CONSTRAINT (found the hard way, round 4): the kernel
    # computes cost = 1 - (dot - dotm)·rwn with rwn = 1/|W - m|. On
    # near-constant (silence) windows |W - m| ~ 1e-4, so dotm's ABSOLUTE
    # error is amplified ~1e4x into the cosine. HIGH (3-pass bf16,
    # ~3e-4 abs at these magnitudes) turned 5 s of silence into
    # score-0.9999 false detections on-chip (caught by tools/tpu_parity.py);
    # HIGHEST (~1.3e-6 abs) matches the in-kernel f32 dot's accuracy.
    # dik: only the AVG pairs' dotm is precomputed (template pairs compute
    # theirs in-kernel with the same f32 FMA chain — HIGHEST-equivalent)
    dsrc = means5[:, D * K:] if dik else means5
    dtmp = templates[D * K:] if dik else templates
    dotm5 = jnp.einsum(
        "plc,spcguv->splguv", dtmp, dsrc,
        precision=jax.lax.Precision.HIGHEST,
    )  # (3, D or P, Lm, g, 8, 128)
    lens_arr = jnp.concatenate([
        jnp.asarray(np.asarray(lens, np.int32)),
        jnp.asarray([B], jnp.int32),
        jnp.asarray(rot0, jnp.int32).reshape(1),
    ])
    tsm = templates.reshape(P * Lm, C)
    gate_smem = gate_bounds.astype(jnp.float32)

    grid_in_specs = [
        pl.BlockSpec(
            (1, P, C, 1, SUBLANES, LANES),
            lambda g, s, lens: (s, 0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        # window block index ignores s → resident across the 3 shift steps
        pl.BlockSpec(
            (F, C, 1, SUBLANES, LANES),
            lambda g, s, lens: (0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (3, C, 1, SUBLANES, LANES),
            lambda g, s, lens: (0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, D if dik else P, Lm, 1, SUBLANES, LANES),
            lambda g, s, lens: (s, 0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch_shapes = [
        pltpu.VMEM((Lm, C, SUBLANES, LANES), jnp.float32)  # linearized window
    ] + [
        pltpu.VMEM((Lm, SUBLANES, LANES), jnp.float32) for _ in range(P)
    ] + [
        pltpu.VMEM((Lm, 2 * w, SUBLANES, LANES), jnp.float32)
        for _ in range(max(K, 1))
    ] + ([
        pltpu.VMEM((Lm, SUBLANES, LANES), jnp.float32)
        for _ in range(max(K, 1))
    ] if dik else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, 3),
        in_specs=grid_in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, P, SUBLANES, LANES),
            lambda g, s, lens: (g, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch_shapes,
    )
    tile_b = SUBLANES * LANES * 4
    need = (
        2 * (F * C + 3 * C + P * C + (D if dik else P) * Lm) * tile_b
        + sum(int(np.prod(sh.shape)) * 4 for sh in scratch_shapes)
        + 2 * P * tile_b
    )
    vmem_limit = max(16 * 1024 * 1024, int(need * 1.25))
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    except TypeError:
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_limit)
    out = pl.pallas_call(
        partial(_kernel_v4, Lm, F, C, w, D, K, jch, dpg, dik),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, 3, P, SUBLANES, LANES), jnp.float32
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(lens_arr, means5, win5, new5, tsm, dotm5, gate_smem)
    out = jnp.transpose(out, (0, 3, 4, 1, 2)).reshape(Bp, 3, P)
    return out[:B]


def fused_dtw_batch_v3(
    win: jnp.ndarray,
    means: jnp.ndarray,
    templates: jnp.ndarray,
    tnorms: jnp.ndarray,
    gate_bounds: jnp.ndarray,
    lens: tuple,
    band: int,
    D: int,
    K: int,
    interpret: bool = False,
    jch: int = 5,
    rot=None,
) -> jnp.ndarray:
    """v3 driver. Args as `fused_dtw_batch` plus gate_bounds: (D,) f32
    sim-domain bounds (avg-pair sim <= bound keeps the tile computing that
    wakeword's template pairs; +inf disables gating). Pair layout must be
    templates (D*K) then avg pairs (D).

    win is (B, F, C) with F >= Lm (= templates.shape[1]); when `rot` is
    given it is the CIRCULAR buffer cursor (newest frame's physical row);
    rot=None means the buffer is linear (oldest first), i.e. rot = F-1."""
    B, F, C = win.shape
    Lm = templates.shape[1]
    P = means.shape[1]
    assert P == D * K + D, (P, D, K)
    assert F >= Lm, (F, Lm)
    if rot is None:
        rot = jnp.asarray(F - 1, jnp.int32)
    return fused_dtw_batch_v3_t(
        jnp.transpose(win, (1, 2, 0)),
        jnp.transpose(means, (1, 2, 0)),
        templates, tnorms, gate_bounds, lens, band, D, K, rot,
        interpret=interpret, jch=jch,
    )


def fused_dtw_batch_v3_t(
    win_t: jnp.ndarray,
    means_t: jnp.ndarray,
    templates: jnp.ndarray,
    tnorms: jnp.ndarray,
    gate_bounds: jnp.ndarray,
    lens: tuple,
    band: int,
    D: int,
    K: int,
    rot,
    interpret: bool = False,
    jch: int = 5,
) -> jnp.ndarray:
    """Stream-MINOR v3 entry: win_t (F, C, B), means_t (P, C, B) — the
    serving layout the batched runtime maintains incrementally, so NO
    full-window transpose happens per shift (it measured ~450 us/step at
    B=8192). Returns sims (B, P)."""
    F, C, B = win_t.shape
    Lm = templates.shape[1]
    P = means_t.shape[0]
    assert P == D * K + D, (P, D, K)
    assert F >= Lm, (F, Lm)
    _check_band(band)
    w = band
    templates = templates * jnp.where(
        tnorms == 0.0, 0.0, jax.lax.rsqrt(tnorms)
    )[..., None]
    # dot(T'[r], m) per (stream, pair, row): MXU einsum outside the kernel.
    # f32 at HIGHEST precision — the subtraction (dot - dotm) tolerates the
    # ~1e-7 relative accumulation-order difference (documented tolerance).
    # Output order (p, l, b): the kernel's stream-minor layout comes straight
    # out of the dot_general instead of a separate (B,P,Lm) transpose pass.
    dotm = jnp.einsum(
        "plc,pcb->plb", templates, means_t,
        precision=jax.lax.Precision.HIGHEST,
    )
    TILE = SUBLANES * LANES
    n_tiles = -(-B // TILE)
    Bp = n_tiles * TILE
    if Bp != B:
        win_t = jnp.pad(win_t, ((0, 0), (0, 0), (0, Bp - B)))
        means_t = jnp.pad(means_t, ((0, 0), (0, 0), (0, Bp - B)))
        dotm = jnp.pad(dotm, ((0, 0), (0, 0), (0, Bp - B)))
    win_t = win_t.reshape(F, C, n_tiles, SUBLANES, LANES)
    means_t = means_t.reshape(P, C, n_tiles, SUBLANES, LANES)
    dotm_t = dotm.reshape(P, Lm, n_tiles, SUBLANES, LANES)
    # lens with the true B and the circular cursor appended (kernel reads
    # lens_ref[P] = B for the lane mask, lens_ref[P+1] = rot)
    lens_arr = jnp.concatenate([
        jnp.asarray(np.asarray(lens, np.int32)),
        jnp.asarray([B], jnp.int32),
        jnp.asarray(rot, jnp.int32).reshape(1),
    ])
    tsm = templates.reshape(P * Lm, C)
    gate_smem = gate_bounds.astype(jnp.float32)

    grid_in_specs = [
        pl.BlockSpec(
            (P, C, 1, SUBLANES, LANES),
            lambda g, lens: (0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (F, C, 1, SUBLANES, LANES),
            lambda g, lens: (0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (P, Lm, 1, SUBLANES, LANES),
            lambda g, lens: (0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch_shapes = [
        pltpu.VMEM((Lm, C, SUBLANES, LANES), jnp.float32)  # linearized window
    ] + [
        pltpu.VMEM((Lm, SUBLANES, LANES), jnp.float32) for _ in range(P)
    ] + [
        pltpu.VMEM((Lm, 2 * w, SUBLANES, LANES), jnp.float32)
        for _ in range(max(K, 1))
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=grid_in_specs,
        out_specs=pl.BlockSpec(
            (1, P, SUBLANES, LANES),
            lambda g, lens: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch_shapes,
    )
    tile_b = SUBLANES * LANES * 4
    need = (
        2 * (F * C + P * C + P * Lm) * tile_b  # win+means+dotm, dbl-buffered
        + sum(int(np.prod(s.shape)) * 4 for s in scratch_shapes)
        + 2 * P * tile_b
    )
    vmem_limit = max(16 * 1024 * 1024, int(need * 1.25))
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    except TypeError:
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_limit)
    out = pl.pallas_call(
        partial(_kernel_v3, Lm, F, C, w, D, K, jch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, SUBLANES, LANES), jnp.float32),
        compiler_params=compiler_params,
        interpret=interpret,
    )(lens_arr, means_t, win_t, tsm, dotm_t, gate_smem)
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(Bp, P)
    return out[:B]


def fused_dtw_batch(
    win: jnp.ndarray,
    means: jnp.ndarray,
    templates: jnp.ndarray,
    tnorms: jnp.ndarray,
    lens: tuple,
    band: int,
    interpret: bool = False,
    variant: int = 2,
    jch: int = 5,
) -> jnp.ndarray:
    """win: (B, Lm, C); means: (B, P, C); templates: (P, Lm, C);
    tnorms: (P, Lm) = |T[r]|² per row; lens: per-pair lengths → sims (B, P).

    variant 2 (default) = two-phase cost-band + per-pair DP kernel
    (`_kernel_v2`); variant 1 = the original single-loop kernel, kept for
    A/B probing (tools/kernel_probe.py --v1)."""
    B, Lm, C = win.shape
    P = means.shape[1]
    _check_band(band)
    w = band
    # pre-normalize template rows (guarded: zero rows stay zero ⇒ cos 0);
    # keeps scalar-unit rsqrt/select out of the kernel's row loop
    templates = templates * jnp.where(
        tnorms == 0.0, 0.0, jax.lax.rsqrt(tnorms)
    )[..., None]
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

    grid_in_specs = [
        pl.BlockSpec(
            (P, C, 1, SUBLANES, LANES),
            lambda g, lens: (0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (P, Lm, C), lambda g, lens: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (Lm, C, 1, SUBLANES, LANES),
            lambda g, lens: (0, 0, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    scratch_shapes = [
        pltpu.VMEM((Lm, SUBLANES, LANES), jnp.float32) for _ in range(2 * P)
    ]
    if variant == 2:
        scratch_shapes += [
            pltpu.VMEM((Lm, 2 * w, SUBLANES, LANES), jnp.float32)
            for _ in range(P)
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=grid_in_specs,
        out_specs=pl.BlockSpec(
            (1, P, SUBLANES, LANES),
            lambda g, lens: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch_shapes,
    )
    # raise the scoped-VMEM cap past the 16 MiB default when the working set
    # needs it (window + means blocks double-buffered, rwn/dotm/cost scratch),
    # with ~25% headroom for Mosaic temporaries — sized from the actual
    # shapes so small configs still compile on 16/32 MiB-VMEM parts (ADVICE r2)
    tile_b = SUBLANES * LANES * 4  # bytes per (8,128) f32 tile
    need = (
        2 * (Lm * C + P * C) * tile_b  # win + means blocks, double-buffered
        + P * Lm * C * 4 * 2  # template block (f32), double-buffered
        + sum(int(np.prod(s.shape)) * 4 for s in scratch_shapes)
        + 2 * P * tile_b  # output block
    )
    vmem_limit = max(16 * 1024 * 1024, int(need * 1.25))
    try:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    except TypeError:  # older pallas: TPUCompilerParams
        compiler_params = pltpu.TPUCompilerParams(vmem_limit_bytes=vmem_limit)
    kern = partial(_kernel, Lm, C, w, P) if variant == 1 else \
        partial(_kernel_v2, Lm, C, w, P, jch)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, SUBLANES, LANES), jnp.float32),
        compiler_params=compiler_params,
        interpret=interpret,
    )(lens_arr, means_t, templates, win_t)
    # (tiles, P, 8, 128) → (B, P)
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(Bp, P)
    return out[:B]


@lru_cache(maxsize=16)
def make_fused_scorer_v3(lens: tuple, band: int, D: int, K: int, Lm: int):
    """custom_vmap wrapper for the gated v3 kernel. The unbatched fallback
    computes every pair unconditionally (gate ignored); the batched kernel
    writes +inf template sims for tiles where no stream passes a wakeword's
    avg-gate bound. The two are detection-equivalent — gated-out streams'
    template scores are never consumed downstream (the masked prune in
    stream_step._dtw_scores), mirroring the reference's early abort
    (wakeword_comp.rs:85-94) where aborted windows produce no scores at all.

    win is the circular (F, C) buffer with cursor `rot` (unbatched)."""

    def _single(win, means, templates, tnorms, gate_bounds, rot):
        from .dtw import band_costs, banded_dtw_batch

        win_lin = jnp.roll(win, -(rot + 1), axis=0)[:Lm]
        normwin = win_lin[None] - means[:, None, :]  # (P, Lm, C)
        costs = band_costs(templates, normwin, band)
        return banded_dtw_batch(costs, jnp.asarray(lens, jnp.int32), band)

    @jax.custom_batching.custom_vmap
    def scorer(win, means, templates, tnorms, gate_bounds, rot):
        return _single(win, means, templates, tnorms, gate_bounds, rot)

    @scorer.def_vmap
    def _rule(axis_size, in_batched, win, means, templates, tnorms,
              gate_bounds, rot):
        wb, mb, tb, nb, gb, rb = in_batched
        if not wb or not mb or tb or nb or gb or rb:
            raise NotImplementedError("unexpected batching pattern")
        return (
            fused_dtw_batch_v3(
                win, means, templates, tnorms, gate_bounds, lens, band, D, K,
                rot=rot,
            ),
            True,
        )

    return scorer


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
