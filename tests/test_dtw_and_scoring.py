"""Unit tests: banded-DTW backends vs the host oracle, percentile reductions,
and multi-wakeword detection."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from rustpotter_tpu import RustpotterConfig, ScoreMode
from rustpotter_tpu.config import ScoreMode as SM
from rustpotter_tpu.ops.dtw import band_costs, banded_dtw_batch, banded_dtw_np, full_dtw_np
from rustpotter_tpu.ops.pallas_dtw import banded_dtw_pallas
from rustpotter_tpu.runtime.detector import Rustpotter
from rustpotter_tpu.runtime.stream_step import _reduce_mode
from rustpotter_tpu.wakewords.files import load_wakeword


def test_banded_dtw_backends_match_oracle():
    rng = np.random.default_rng(0)
    B, L, C, w = 37, 60, 8, 5
    lens = rng.integers(20, 61, B).astype(np.int32)
    a = rng.normal(0, 1, (B, L, C)).astype(np.float32)
    b = rng.normal(0, 1, (B, L, C)).astype(np.float32)
    costs = band_costs(jnp.asarray(a), jnp.asarray(b), w)
    scan = np.asarray(banded_dtw_batch(costs, jnp.asarray(lens), w))
    pal = np.asarray(banded_dtw_pallas(costs, jnp.asarray(lens), w, interpret=True))
    np.testing.assert_array_equal(scan, pal)
    for i in [0, 5, 17, 36]:
        oracle = banded_dtw_np(a[i][: lens[i]], b[i][: lens[i]], w)
        assert abs(float(scan[i]) - float(oracle)) < 1e-4


def test_full_dtw_against_banded_consistency():
    # the banded DP with a window >= |m-n|+max(m,n) degenerates to cell
    # [m-1][n] of the unbanded DP; spot check path cost monotonicity instead
    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, (20, 5)).astype(np.float32)
    b = rng.normal(0, 1, (24, 5)).astype(np.float32)
    sim, dp = full_dtw_np(a, b)
    assert np.isfinite(sim)
    assert sim == dp[-1, -1]


def _rust_percentile(sorted_vals, pct):
    n = len(sorted_vals)
    index = np.float32(pct) / np.float32(100.0) * np.float32(n - 1)
    lo = int(np.floor(index))
    if lo == index:
        return sorted_vals[int(index)]
    d = index - np.floor(index)
    return np.float32(sorted_vals[lo] * (1 - d) + sorted_vals[lo + 1] * d)


def test_percentile_reductions_match_reference_formula():
    rng = np.random.default_rng(2)
    for K in [3, 5, 8]:
        scores = rng.uniform(0, 1, (4, 8)).astype(np.float32)
        kvalid = jnp.full((4,), K, jnp.int32)
        for mode, pct in [
            (SM.MEDIAN, 50), (SM.P25, 25), (SM.P50, 50), (SM.P75, 75),
            (SM.P80, 80), (SM.P90, 90), (SM.P95, 95),
        ]:
            got = np.asarray(_reduce_mode(jnp.asarray(scores), kvalid, mode))
            for i in range(4):
                want = _rust_percentile(np.sort(scores[i, :K]), pct)
                assert abs(got[i] - want) < 1e-6, (mode, i)
        got = np.asarray(_reduce_mode(jnp.asarray(scores), kvalid, SM.AVERAGE))
        for i in range(4):
            assert abs(got[i] - scores[i, :K].mean()) < 1e-6
        got = np.asarray(_reduce_mode(jnp.asarray(scores), kvalid, SM.MAX))
        for i in range(4):
            assert abs(got[i] - scores[i, :K].max()) < 1e-6


def test_multi_wakeword_detection(resources):
    """Two DTW wakewords active at once: the right one wins."""
    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.2
    cfg.detector.threshold = 0.5
    cfg.detector.score_mode = ScoreMode.MAX
    rp = Rustpotter(cfg)
    rp.add_wakeword_ref("oye", load_wakeword(os.path.join(resources, "oye_casa_g.rpw")))
    rp.add_wakeword_ref("alexa", load_wakeword(os.path.join(resources, "alexa.rpw")))
    raw = open(os.path.join(resources, "oye_casa_g_1.wav"), "rb").read()[44:]
    wav = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    sil = np.zeros(16000 * 2, np.float32)
    audio = np.concatenate([sil, wav, sil])
    dets = rp.process_audio_sequence(audio[: len(audio) // 480 * 480])
    assert len(dets) == 1
    assert dets[0].name == "oye casa"
    assert dets[0].score > 0.7


def test_fused_kernel_matches_unfused():
    """Fused cost+DP Pallas kernel (interpret mode) vs the scan path."""
    from rustpotter_tpu.ops.fused_dtw import fused_dtw_batch

    rng = np.random.default_rng(3)
    B, Lm, C, w, P = 50, 60, 8, 5, 4
    lens = (60, 41, 33, 55)
    win = rng.normal(0, 1, (B, Lm, C)).astype(np.float32)
    templates = rng.normal(0, 1, (P, Lm, C)).astype(np.float32)
    means = rng.normal(0, 0.2, (B, P, C)).astype(np.float32)
    tnorms = np.sum(templates**2, axis=-1).astype(np.float32)
    normwin = win[:, None, :, :] - means[:, :, None, :]
    costs = band_costs(
        jnp.asarray(np.broadcast_to(templates, (B, P, Lm, C))).reshape(B * P, Lm, C),
        jnp.asarray(normwin).reshape(B * P, Lm, C),
        w,
    )
    lens_b = jnp.asarray(np.broadcast_to(np.array(lens, np.int32), (B, P)).reshape(-1))
    oracle = np.asarray(banded_dtw_batch(costs, lens_b, w)).reshape(B, P)
    fused = np.asarray(
        fused_dtw_batch(
            jnp.asarray(win), jnp.asarray(means), jnp.asarray(templates),
            jnp.asarray(tnorms), lens, w, interpret=True,
        )
    )
    np.testing.assert_allclose(fused, oracle, rtol=3e-6, atol=1e-4)


def test_fused_v3_matches_oracle_and_gates():
    """The gated v3 kernel (SMEM templates + external dotm + avg-gate tile
    skip, interpret mode): with the gate disabled it must match the scan-path
    oracle; with a finite gate bound, tiles where no stream passes write +inf
    template sims while avg sims stay exact."""
    from rustpotter_tpu.ops.fused_dtw import fused_dtw_batch_v3

    rng = np.random.default_rng(4)
    D, K = 2, 3
    P = D * K + D
    B, Lm, C, w = 40, 50, 8, 5
    lens = (50, 41, 33, 47, 50, 38) + (45, 50)  # D*K templates then D avgs
    win = rng.normal(0, 1, (B, Lm, C)).astype(np.float32)
    templates = rng.normal(0, 1, (P, Lm, C)).astype(np.float32)
    means = rng.normal(0, 0.2, (B, P, C)).astype(np.float32)
    tnorms = np.sum(templates**2, axis=-1).astype(np.float32)
    normwin = win[:, None, :, :] - means[:, :, None, :]
    costs = band_costs(
        jnp.asarray(np.broadcast_to(templates, (B, P, Lm, C))).reshape(B * P, Lm, C),
        jnp.asarray(normwin).reshape(B * P, Lm, C),
        w,
    )
    lens_b = jnp.asarray(np.broadcast_to(np.array(lens, np.int32), (B, P)).reshape(-1))
    oracle = np.asarray(banded_dtw_batch(costs, lens_b, w)).reshape(B, P)

    no_gate = jnp.full((D,), np.inf, jnp.float32)
    got = np.asarray(
        fused_dtw_batch_v3(
            jnp.asarray(win), jnp.asarray(means), jnp.asarray(templates),
            jnp.asarray(tnorms), no_gate, lens, w, D, K, interpret=True,
        )
    )
    np.testing.assert_allclose(got, oracle, rtol=3e-6, atol=2e-4)

    # gate wakeword 0 with a bound no stream meets; leave wakeword 1 open.
    # B=40 < one 1024-stream tile, so the whole batch is one tile.
    avg0 = oracle[:, D * K + 0]
    bound = jnp.asarray([float(avg0.min()) - 1.0, np.inf], jnp.float32)
    gated = np.asarray(
        fused_dtw_batch_v3(
            jnp.asarray(win), jnp.asarray(means), jnp.asarray(templates),
            jnp.asarray(tnorms), bound, lens, w, D, K, interpret=True,
        )
    )
    assert np.all(np.isinf(gated[:, 0:K]))  # wakeword 0 templates skipped
    np.testing.assert_allclose(gated[:, K : D * K], oracle[:, K : D * K],
                               rtol=3e-6, atol=2e-4)  # wakeword 1 computed
    np.testing.assert_allclose(gated[:, D * K :], oracle[:, D * K :],
                               rtol=3e-6, atol=2e-4)  # avg pairs always exact

    # a bound exactly at one stream's avg sim keeps the tile computing
    bound2 = jnp.asarray([float(avg0.min()), np.inf], jnp.float32)
    alive = np.asarray(
        fused_dtw_batch_v3(
            jnp.asarray(win), jnp.asarray(means), jnp.asarray(templates),
            jnp.asarray(tnorms), bound2, lens, w, D, K, interpret=True,
        )
    )
    np.testing.assert_allclose(alive[:, 0:K], oracle[:, 0:K], rtol=3e-6, atol=2e-4)


def test_sort_network_matches_np_sort():
    """The compare-exchange network used by the percentile reduction must be
    a correct ascending sort for every K ≤ 8 (and fall back above)."""
    from rustpotter_tpu.runtime.stream_step import sort_last_axis

    rng = np.random.default_rng(0)
    for K in range(1, 10):
        x = rng.normal(size=(257, K)).astype(np.float32)
        got = np.asarray(sort_last_axis(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.sort(x, axis=-1))
    # with INF padding (the padded-template case)
    x = np.where(rng.random((64, 5)) < 0.3, np.inf, rng.normal(size=(64, 5))).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(sort_last_axis(jnp.asarray(x))), np.sort(x, axis=-1))


def test_fused_v4_chunk_matches_per_shift_oracle():
    """The whole-chunk v4 kernel (grid (tile, shift), virtual windows) must
    reproduce, per shift, the scan-path oracle run on the materialized
    virtual window of that shift — including F > Lm (mixed-config window
    longer than the largest template), a nontrivial circular cursor, and
    the per-(shift, wakeword) gate skip."""
    from rustpotter_tpu.ops.fused_dtw import fused_dtw_chunk_v4

    rng = np.random.default_rng(6)
    D, K = 2, 2
    P = D * K + D
    B, Lm, C, w = 30, 40, 8, 5
    for F in (Lm, Lm + 2, Lm + 9):
        lens = (40, 31, 28, 37) + (35, 40)
        win_t = rng.normal(0, 1, (F, C, B)).astype(np.float32)  # circular
        new_t = rng.normal(0, 1, (3, C, B)).astype(np.float32)
        templates = rng.normal(0, 1, (P, Lm, C)).astype(np.float32)
        tnorms = np.sum(templates**2, axis=-1).astype(np.float32)
        means3 = rng.normal(0, 0.2, (3, P, C, B)).astype(np.float32)
        rot0 = F - 2  # wrap-around exercised

        # oracle: materialize each shift's virtual window, then scan-path DP
        oracle = np.zeros((B, 3, P), np.float32)
        virt = win_t.copy()
        for s in range(3):
            ns = s + 1
            slot = (rot0 + 1 + s) % F
            virt[slot] = new_t[s]
            rot_s = (rot0 + ns) % F
            # linearize: logical i at physical (rot_s + 1 + i) % F
            order = [(rot_s + 1 + i) % F for i in range(Lm)]
            lin = np.transpose(virt[order], (2, 0, 1))  # (B, Lm, C)
            # (B, P, Lm, C): per-pair CMN-normalized virtual window
            normwin = lin[:, None, :, :] - np.transpose(
                means3[s], (2, 0, 1)
            )[:, :, None, :]
            costs = band_costs(
                jnp.asarray(
                    np.broadcast_to(templates, (B, P, Lm, C))
                ).reshape(B * P, Lm, C),
                jnp.asarray(normwin).reshape(B * P, Lm, C),
                w,
            )
            lens_b = jnp.asarray(
                np.broadcast_to(np.array(lens, np.int32), (B, P)).reshape(-1)
            )
            oracle[:, s] = np.asarray(
                banded_dtw_batch(costs, lens_b, w)
            ).reshape(B, P)

        no_gate = jnp.full((D,), np.inf, jnp.float32)
        got = np.asarray(
            fused_dtw_chunk_v4(
                jnp.asarray(win_t), jnp.asarray(new_t), jnp.asarray(means3),
                jnp.asarray(templates), jnp.asarray(tnorms), no_gate,
                lens, w, D, K, rot0, interpret=True,
            )
        )
        np.testing.assert_allclose(got, oracle, rtol=3e-6, atol=2e-4,
                                   err_msg=f"F={F}")

        # gate wakeword 0 out with a bound below every stream's avg sim at
        # every shift; wakeword 1 stays open — template sims must be +inf
        # for ww0 only, avg sims exact everywhere
        bound = jnp.asarray(
            [float(oracle[:, :, D * K + 0].min()) - 1.0, np.inf], jnp.float32
        )
        gated = np.asarray(
            fused_dtw_chunk_v4(
                jnp.asarray(win_t), jnp.asarray(new_t), jnp.asarray(means3),
                jnp.asarray(templates), jnp.asarray(tnorms), bound,
                lens, w, D, K, rot0, interpret=True,
            )
        )
        assert np.all(np.isinf(gated[:, :, 0:K])), f"F={F}"
        np.testing.assert_allclose(
            gated[:, :, K:], oracle[:, :, K:], rtol=3e-6, atol=2e-4,
            err_msg=f"F={F}",
        )


import pytest


@pytest.mark.parametrize(
    "n_ww,k",
    [
        (4, 10),  # per-wakeword whole launches (per_launch = 1)
        (3, 8),   # grouped packing: 2 wakewords share a launch
        (1, 25),  # single wakeword past the budget: K-chunked calls
    ],
)
def test_chunk_group_split_matches_fallback(monkeypatch, n_ww, k):
    """Big template sets (past the SMEM guard) split into grouped launches
    (whole wakewords packed per call) or, when one wakeword alone exceeds
    the budget, K-chunked calls with the avg pair replicated per chunk
    (gating preserved). Every split shape must reproduce the virt-window
    per-stream fallback."""
    import rustpotter_tpu.ops.fused_dtw as fd
    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.bundle import build_bundle
    from rustpotter_tpu.runtime.stream_step import _dtw_scores_chunk
    from rustpotter_tpu.wakewords.files import WakewordRef

    wws = []
    for w in range(n_ww):
        rng = np.random.default_rng(70 + w)
        feats = {
            f"s{i}.wav": rng.normal(0, 2, (100 - 2 * (i % 5), 16)).astype(np.float32)
            for i in range(k)
        }
        wws.append((f"w{w}", WakewordRef(
            name=f"w{w}", samples_features=feats,
            avg_features=rng.normal(0, 2, (100, 16)).astype(np.float32),
            rms_level=0.05,
        )))
    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2
    static, params = build_bundle(wws, cfg)
    D, K, Lm, C = static.n_dtw, static.kmax, static.lmax, static.mfcc_size
    from rustpotter_tpu.ops.fused_dtw import SMEM_TEMPLATE_VALUES
    assert (D * K + D) * Lm * C > SMEM_TEMPLATE_VALUES  # genuinely past the guard
    params = jax.tree_util.tree_map(jnp.asarray, params)

    F = static.max_mfcc_frames
    B = 8
    rng = np.random.default_rng(3)
    win_t = jnp.asarray(rng.normal(0, 1, (F, C, B)).astype(np.float32))
    new_t = jnp.asarray(rng.normal(0, 1, (3, C, B)).astype(np.float32))
    rot0 = jnp.asarray(F - 2, jnp.int32)

    # interpret-mode kernels so the grouped path runs on CPU
    real_v4 = fd.fused_dtw_chunk_v4_tiled
    monkeypatch.setattr(
        fd, "fused_dtw_chunk_v4_tiled",
        lambda *a, **k: real_v4(*a, **{**k, "interpret": True}),
    )
    grouped_static = static.__class__(**{**static.__dict__, "dtw_fused": True})
    got = _dtw_scores_chunk(grouped_static, params, win_t, new_t, rot0)
    fb_static = static.__class__(**{**static.__dict__, "dtw_fused": False})
    want = _dtw_scores_chunk(fb_static, params, win_t, new_t, rot0)
    for s in range(3):
        g_det, g_sc, g_avg, _ = got[s]
        w_det, w_sc, w_avg, _ = want[s]
        np.testing.assert_allclose(np.asarray(g_avg), np.asarray(w_avg),
                                   rtol=2e-5, atol=2e-5)
        # the gate's kernel-side tile skip is conservative vs the per-stream
        # score-domain comparison: where the fallback says detected, the
        # grouped path must agree; scores compared where both computed
        w_det_np, g_det_np = np.asarray(w_det), np.asarray(g_det)
        np.testing.assert_array_equal(w_det_np & g_det_np, w_det_np)
        both = w_det_np & g_det_np
        np.testing.assert_allclose(
            np.asarray(g_sc)[both], np.asarray(w_sc)[both], rtol=2e-5, atol=2e-5
        )
