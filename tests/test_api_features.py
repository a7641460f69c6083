"""API-surface parity tests: record feature, config updates, accessors,
config enum string round-trips."""
import glob
import os

import numpy as np

from rustpotter_tpu import (
    DetectorConfig,
    RustpotterConfig,
    SampleFormat,
    ScoreMode,
    VADMode,
)
from rustpotter_tpu.runtime.detector import Rustpotter
from rustpotter_tpu.utils.wav import read_wav
from rustpotter_tpu.wakewords.files import load_wakeword


def _audio(resources):
    raw = open(os.path.join(resources, "oye_casa_g_1.wav"), "rb").read()[44:]
    wav = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    sil = np.zeros(16000 * 2, np.float32)
    s = np.concatenate([sil, wav, sil])
    return s[: len(s) // 480 * 480]


def test_record_feature(resources, tmp_path):
    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.2
    cfg.detector.record_path = str(tmp_path)
    rp = Rustpotter(cfg)
    rp.add_wakeword_ref("w", load_wakeword(os.path.join(resources, "oye_casa_g.rpw")))
    audio = _audio(resources)
    for i in range(len(audio) // 480):
        rp.process_audio(audio[i * 480 : (i + 1) * 480])
    records = glob.glob(str(tmp_path / "[[]oye*")) + glob.glob(str(tmp_path / "*.wav"))
    assert len(records) >= 1
    samples, spec = read_wav(records[0])
    assert spec.sample_rate == 16000 and spec.is_float


def test_partial_accessors(resources):
    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.2
    rp = Rustpotter(cfg)
    rp.add_wakeword_ref("w", load_wakeword(os.path.join(resources, "oye_casa_g.rpw")))
    audio = _audio(resources)
    saw_partial = False
    for i in range(len(audio) // 480):
        rp.process_audio(audio[i * 480 : (i + 1) * 480])
        p = rp.get_partial_detection()
        if p is not None:
            saw_partial = True
            assert p.score > 0.5
    assert saw_partial
    assert rp.get_rms_level() >= 0.0
    assert rp.get_gain() == 1.0


def test_update_detector_config(resources):
    rp = Rustpotter(RustpotterConfig())
    rp.add_wakeword_ref("w", load_wakeword(os.path.join(resources, "oye_casa_g.rpw")))
    new = DetectorConfig(threshold=0.9, score_mode=ScoreMode.P90)
    rp.update_detector_config(new)
    assert rp.config.detector.threshold == 0.9
    # detector still functional after rebuild
    audio = _audio(resources)
    rp.process_audio_sequence(audio)


def test_config_enum_round_trips():
    for m in ScoreMode:
        assert ScoreMode.from_str(str(m)) == m
    for v in VADMode:
        assert VADMode.from_str(str(v)) == v
    assert SampleFormat.int_of_size(16) == SampleFormat.I16
    assert SampleFormat.float_of_size(32) == SampleFormat.F32
    assert SampleFormat.int_of_size(64) is None
    assert VADMode.EASY.value_factor == 2.0


def test_wrong_buffer_size_returns_none(resources):
    rp = Rustpotter(RustpotterConfig())
    rp.add_wakeword_ref("w", load_wakeword(os.path.join(resources, "oye_casa_g.rpw")))
    assert rp.process_samples(np.zeros(100, np.float32)) is None
    assert rp.process_bytes(b"\x00" * 10) is None


def test_mixed_mfcc_sizes_rejected(resources):
    rp = Rustpotter(RustpotterConfig())
    rp.add_wakeword_ref("a", load_wakeword(os.path.join(resources, "oye_casa_g.rpw")))
    import pytest

    with pytest.raises(ValueError, match="mfcc size"):
        rp.add_wakeword("b", load_wakeword(os.path.join(resources, "ok_casa-tiny.rpw")))


def test_gain_rounding_half_away_from_zero():
    """Gain quantization at an exact .x5 boundary must round half away from
    zero like Rust f32::round (gain_normalizer_filter.rs:27) — NOT banker's
    rounding. 0.25 → 0.3 (banker's would give 0.2)."""
    from rustpotter_tpu.audio.filters import GainNormalizerFilter

    # sqrt(0.00390625)=0.0625 and sqrt(0.0625)=0.25 are exact in f32, so
    # gain = 0.0625/0.25 = 0.25 exactly → x10 = 2.5, the tie case
    f = GainNormalizerFilter(0.1, 1.0, fixed_rms_level=0.00390625)
    sig = np.ones(8, np.float32)
    out, gain = f.filter(sig, 0.0625)
    assert gain == np.float32(0.3), gain
    np.testing.assert_allclose(out, 0.3 * sig, rtol=1e-7)

    # and the in-graph runtime formula agrees (same floor(x*10+0.5) form)
    import jax.numpy as jnp

    g = jnp.clip(jnp.floor(jnp.float32(0.25) * 10.0 + 0.5) / 10.0, 0.1, 1.0)
    assert float(g) == 0.30000001192092896  # f32(0.3)
