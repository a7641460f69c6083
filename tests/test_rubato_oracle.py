"""Regression pins for the f32 resampler oracle (audio/rustfft_f32.py) and
the golden-identified filter table (VERDICT r3 next #2).

The full identification/ANOVA experiments live in tools/rubato_fit.py and
tools/rubato_logit_experiment.py (results in docs/NN_EXACTNESS.md §5);
these tests pin what must not rot: the FFT blocks' structure, the packaged
table's end-to-end proximity to the committed golden, and the backend
selection in FftResampler.
"""
import os

import numpy as np
import pytest

from rustpotter_tpu.audio import rustfft_f32 as ro
from rustpotter_tpu.audio.resampler import FftResampler, _load_identified_table
from rustpotter_tpu.utils.wav import read_wav

RES = "/root/reference/tests/resources"
F32 = np.float32


def test_fft_blocks_structurally_correct():
    res = ro.validate_structure()
    bad = {k: v for k, v in res.items() if v > 1e-4}
    assert not bad, bad


def test_identified_table_tracks_golden():
    """First 60 chunks of real_sample through the packaged-table oracle +
    the f32 gain filter: within 1.2e-7 of the committed golden with a
    nontrivial bit-exact fraction (the f64 path's floor was 8.9e-8 with
    ~0% bit-exact at these chunks before identification)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from rubato_fit import apply_gain, f32_gain, f32_seq_rms

    table = _load_identified_table(1440, 480)
    assert table is not None
    x48, _ = read_wav(f"{RES}/real_sample.wav")
    gold, _ = read_wav(f"{RES}/gain-normalizer_example.wav")
    nc = 60
    chunks = x48[: nc * 1440].astype(F32).reshape(nc, 1440)
    y = ro.rubato_resample_batch(chunks, *table)
    out = np.stack([apply_gain(y[c], f32_gain(f32_seq_rms(y[c]))) for c in range(nc)])
    tgt = gold[: nc * 480].astype(F32).reshape(nc, 480)
    assert float(np.abs(out - tgt).max()) <= 1.2e-7
    frac = float((out.view(np.int32) == tgt.view(np.int32)).mean())
    assert frac >= 0.08, frac


def test_fft_resampler_backend_selection(monkeypatch):
    rng = np.random.default_rng(0)
    chunk = rng.normal(0, 0.01, 1440).astype(F32)
    r = FftResampler(1440, 480)
    assert r._oracle is not None  # default: oracle backend at (1440, 480)
    y_orc = r.process(chunk)
    table = _load_identified_table(1440, 480)
    direct = ro.RubatoOracle(*table)
    np.testing.assert_array_equal(y_orc, direct.process(chunk))
    # env opt-out returns the f64 path
    monkeypatch.setenv("RUSTPOTTER_RESAMPLER", "f64")
    r64 = FftResampler(1440, 480)
    assert r64._oracle is None
    y64 = r64.process(chunk)
    assert np.abs(y64 - y_orc).max() < 1e-6  # same filter family, f64 FFTs
    # other ratios fall back to the f64 cutoff-law path
    monkeypatch.delenv("RUSTPOTTER_RESAMPLER")
    assert FftResampler(960, 480)._oracle is None
