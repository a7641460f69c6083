"""Golden tests: MFCC front-end + builder vs the reference's committed .rpw
fixtures (produced by the Rust implementation; see BASELINE.md §A)."""
import os

import numpy as np
import pytest

from rustpotter_tpu.mfcc.offline import compute_mfccs
from rustpotter_tpu.utils import cbor
from rustpotter_tpu.wakewords.builder import build_wakeword_ref_from_files
from rustpotter_tpu.wakewords.files import WakewordRef, load_wakeword, save_wakeword

G_FILES = ["oye_casa_g_1.wav", "oye_casa_g_2.wav", "oye_casa_g_3.wav", "oye_casa_g_4.wav", "oye_casa_g_5.wav"]
REAL_FILES = [f"oye_casa_real_{i}.wav" for i in range(1, 7)]


@pytest.fixture(scope="module")
def oye_casa_g(resources):
    return load_wakeword(os.path.join(resources, "oye_casa_g.rpw"))


def test_rpw_load(oye_casa_g):
    assert isinstance(oye_casa_g, WakewordRef)
    assert oye_casa_g.name == "oye casa"
    assert oye_casa_g.mfcc_size == 5
    assert len(oye_casa_g.samples_features) == 5
    assert oye_casa_g.avg_features.shape == (108, 5)


def test_mfcc_16k_matches_golden(resources, oye_casa_g):
    """16 kHz i16 path: encoder + MFCC + CMN vs stored feature matrices."""
    for f in G_FILES:
        mine, _ = compute_mfccs(os.path.join(resources, f), 5)
        gold = oye_casa_g.samples_features[f]
        assert mine.shape == gold.shape, f
        np.testing.assert_allclose(mine, gold, atol=2e-4, err_msg=f)


def test_rms_level_median(resources, oye_casa_g):
    rms = []
    for f in G_FILES:
        _, r = compute_mfccs(os.path.join(resources, f), 5)
        rms.append(r)
    med = float(np.sort(np.array(rms, np.float32))[len(rms) // 2])
    assert abs(med - oye_casa_g.rms_level) < 1e-6


def test_builder_avg_features_matches_golden(resources, oye_casa_g):
    """Full build: files → templates → DTW-averaged template vs golden."""
    ww = build_wakeword_ref_from_files(
        "oye casa", [os.path.join(resources, f) for f in G_FILES], mfcc_size=5
    )
    assert ww.avg_features.shape == oye_casa_g.avg_features.shape
    np.testing.assert_allclose(ww.avg_features, oye_casa_g.avg_features, atol=3e-4)
    assert abs(ww.rms_level - oye_casa_g.rms_level) < 1e-6


def test_mfcc_48k_resampled_matches_golden(resources):
    """48 kHz f32 path: the FFT resampler feeds the MFCC chain. The resampler
    matches the reference's committed golden waveforms to 8.9e-8 absolute
    (see audio/resampler.py), so 48 kHz MFCC parity sits at the same f32
    noise floor as the 16 kHz path (measured ≤2.5e-5)."""
    gold_ww = load_wakeword(os.path.join(resources, "oye_casa_real.rpw"))
    for f in REAL_FILES:
        mine, _ = compute_mfccs(os.path.join(resources, f), 5)
        gold = gold_ww.samples_features[f]
        assert mine.shape == gold.shape, f
        np.testing.assert_allclose(mine, gold, atol=1e-4, err_msg=f)


def test_builder_48k_wakeword_rebuild_matches_golden(resources):
    """Full 48 kHz wakeword rebuild (tests/wakeword.rs:57-71): build from the
    six oye_casa_real f32 wavs and compare avg_features + rms_level + shapes
    against the committed oye_casa_real.rpw fixture."""
    gold_ww = load_wakeword(os.path.join(resources, "oye_casa_real.rpw"))
    ww = build_wakeword_ref_from_files(
        "oye casa", [os.path.join(resources, f) for f in REAL_FILES], mfcc_size=5
    )
    assert set(ww.samples_features) == set(gold_ww.samples_features)
    for k, v in ww.samples_features.items():
        assert v.shape == gold_ww.samples_features[k].shape, k
    assert ww.avg_features.shape == gold_ww.avg_features.shape
    np.testing.assert_allclose(ww.avg_features, gold_ww.avg_features, atol=3e-4)
    assert abs(ww.rms_level - gold_ww.rms_level) < 1e-6


def test_rpw_roundtrip(tmp_path, oye_casa_g):
    p = str(tmp_path / "roundtrip.rpw")
    save_wakeword(oye_casa_g, p)
    back = load_wakeword(p)
    assert back.name == oye_casa_g.name
    np.testing.assert_array_equal(back.avg_features, oye_casa_g.avg_features)
    for k, v in oye_casa_g.samples_features.items():
        np.testing.assert_array_equal(back.samples_features[k], v)


def test_v2_loads_as_ref(resources):
    ww = load_wakeword(os.path.join(resources, "oye_casa_g_v2.rpw"))
    assert isinstance(ww, WakewordRef)
    assert ww.mfcc_size == 5


def test_cbor_bitexact_roundtrip(resources):
    raw = open(os.path.join(resources, "oye_casa_g.rpw"), "rb").read()
    obj = cbor.loads(raw)
    ww = WakewordRef.from_cbor_obj(obj)
    assert cbor.dumps(ww.to_cbor_obj()) == raw
