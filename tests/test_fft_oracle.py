"""The rustfft-order FFT oracle (tools/rustfft_oracle.py) pinned against the
reference's committed artifacts. See docs/NN_EXACTNESS.md for the full
experiment; these tests keep its two load-bearing claims from regressing:
the plan structure is a correct DFT at the f32 floor, and the end-to-end
Rust-order chain reproduces the committed .rpw features to ~2 ulps."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_oracle_fft_structure():
    from rustfft_oracle import validate_structure

    res = validate_structure()
    bad = {k: v for k, v in res.items() if v > 1e-4}
    assert not bad, bad


def test_oracle_reproduces_committed_features(resources):
    import fft_oracle_experiment as E
    from rustfft_oracle import fft480

    from rustpotter_tpu.wakewords.files import load_wakeword

    gold = load_wakeword(os.path.join(resources, "oye_casa_g.rpw"))
    key = "oye_casa_g_1.wav"
    target = np.asarray(gold.samples_features[key], np.float32)
    samples = E.wav_i16_to_f32(os.path.join(resources, key))
    samples = samples[: len(samples) // 480 * 480]
    ext = E.OracleExtractor(gold.mfcc_size + 1, fft=fft480)
    feats = E.cmn_f32(ext.mfccs(ext.frames_from_samples(samples)))
    assert feats.shape == target.shape
    u = E.ulp_dist(feats, target)
    # measured 2026-08-20: exact=0.31 (glibc libm) / 0.24 (f64-rounded),
    # p50=2 ulps, max abs 9.5e-6 — see docs/NN_EXACTNESS.md §2
    assert float((u == 0).mean()) >= 0.15
    assert np.percentile(u, 50) <= 4
    assert np.abs(feats - target).max() <= 2e-5
