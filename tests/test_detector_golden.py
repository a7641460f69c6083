"""Golden end-to-end detection tests vs the Rust reference's asserted outputs
(/root/reference/tests/detector.rs; consolidated table in BASELINE.md §A).

Detections (count, order, counters) must match exactly; float scores to ~1e-4
(the BASELINE.json contract: identical detections, scores allclose)."""
import os

import numpy as np
import pytest

from rustpotter_tpu import RustpotterConfig, SampleFormat, ScoreMode, VADMode
from rustpotter_tpu.runtime.detector import Rustpotter
from rustpotter_tpu.utils.wav import read_wav

SCORE_TOL = 2e-4


def simulate_stream_bytes(resources, wav1, wav2, gain1=1.0, gain2=1.0):
    """5 s silence + wav1·gain + 5 s silence + wav2·gain + 5 s silence, i16 LE
    bytes with the 44-byte header stripped (detector.rs:372-426)."""

    def wav_with_gain(path, gain):
        raw = open(path, "rb").read()[44:]
        s = np.frombuffer(raw, "<i2").astype(np.float32) * gain
        return np.clip(np.round(s), -32768, 32767).astype("<i2").tobytes()

    silence = bytes(16000 * 2 * 5)
    return (
        silence
        + wav_with_gain(os.path.join(resources, wav1), gain1)
        + silence
        + wav_with_gain(os.path.join(resources, wav2), gain2)
        + silence
    )


def run_simulation(resources, config, rpw, gain1=1.0, gain2=1.0):
    config.fmt.sample_rate = 16000
    config.fmt.sample_format = SampleFormat.I16
    config.fmt.channels = 1
    rp = Rustpotter(config)
    rp.add_wakeword_from_file("wakeword", os.path.join(resources, rpw))
    data = simulate_stream_bytes(
        resources, "oye_casa_g_1.wav", "oye_casa_g_2.wav", gain1, gain2
    )
    samples = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    return rp.process_audio_sequence(samples)


def run_with_audio_file(resources, config, rpw, wav):
    samples, spec = read_wav(os.path.join(resources, wav))
    from rustpotter_tpu.mfcc.offline import audio_fmt_from_spec

    config.fmt = audio_fmt_from_spec(spec)
    rp = Rustpotter(config)
    rp.add_wakeword_from_file("wakeword", os.path.join(resources, rpw))
    silence = np.zeros(spec.sample_rate * 5, np.float32)
    stream = np.concatenate([samples.astype(np.float32), silence])
    # 48 kHz: resample host-side chunk by chunk like process_samples does
    n = len(stream) // rp.get_samples_per_frame()
    out = []
    enc = rp.wav_encoder
    frames16 = [
        enc.rencode_and_resample(stream[i * enc.input_samples_per_frame : (i + 1) * enc.input_samples_per_frame])
        for i in range(n)
    ]
    return rp.process_audio_sequence(np.concatenate(frames16))


def base_config(**det):
    c = RustpotterConfig()
    c.detector.avg_threshold = det.pop("avg_threshold", 0.2)
    c.detector.threshold = det.pop("threshold", 0.5)
    c.filters.gain_normalizer.enabled = det.pop("gain_normalizer", False)
    c.filters.band_pass.enabled = det.pop("band_pass", False)
    c.detector.score_mode = det.pop("score_mode", ScoreMode.MAX)
    for k, v in det.items():
        setattr(c.detector, k, v)
    return c


def check(dets, expected):
    """expected: list of dicts with subsets of score/avg_score/counter."""
    assert len(dets) == len(expected), [d.score for d in dets]
    for d, e in zip(dets, expected):
        if "score" in e:
            assert abs(d.score - e["score"]) < SCORE_TOL, (d.score, e["score"])
        if "avg_score" in e:
            assert abs(d.avg_score - e["avg_score"]) < SCORE_TOL, (d.avg_score, e["avg_score"])
        if "counter" in e:
            assert d.counter == e["counter"], (d.counter, e["counter"])


def test_detect_max_score_mode(resources):
    dets = run_simulation(resources, base_config(), "oye_casa_g.rpw")
    check(
        dets,
        [
            {"score": 0.7310586, "avg_score": 0.6495044},
            {"score": 0.721843, "avg_score": 0.5804737},
        ],
    )


def test_detect_v2_file(resources):
    dets = run_simulation(resources, base_config(), "oye_casa_g_v2.rpw")
    check(
        dets,
        [
            {"score": 0.7310586, "avg_score": 0.6495044},
            {"score": 0.721843, "avg_score": 0.5804737},
        ],
    )


def test_detect_median_score_mode(resources):
    dets = run_simulation(
        resources, base_config(score_mode=ScoreMode.MEDIAN), "oye_casa_g.rpw"
    )
    check(
        dets,
        [
            {"score": 0.60123634, "avg_score": 0.64608675},
            {"score": 0.63968724, "avg_score": 0.5288923},
        ],
    )


def test_detect_average_score_mode(resources):
    dets = run_simulation(
        resources, base_config(score_mode=ScoreMode.AVERAGE), "oye_casa_g.rpw"
    )
    check(
        dets,
        [
            {"score": 0.60458726, "avg_score": 0.64608675},
            {"score": 0.6313083, "avg_score": 0.5750509},
        ],
    )


def test_detect_with_vad(resources):
    cfg = base_config()
    cfg.detector.vad_mode = VADMode.EASY
    dets = run_simulation(resources, cfg, "oye_casa_g.rpw")
    check(
        dets,
        [
            {"score": 0.7310586, "avg_score": 0.6495044},
            {"score": 0.721843, "avg_score": 0.5804737},
        ],
    )


def test_ignore_words(resources):
    cfg = base_config(avg_threshold=0.0, threshold=0.45, min_scores=0)
    dets = run_simulation(resources, cfg, "alexa.rpw")
    assert len(dets) == 0


def test_ignore_words_with_filters(resources):
    cfg = base_config(
        avg_threshold=0.0, threshold=0.45, min_scores=0,
        gain_normalizer=True, band_pass=True,
    )
    dets = run_simulation(resources, cfg, "alexa.rpw")
    assert len(dets) == 0


def test_band_pass_filter(resources):
    cfg = base_config(avg_threshold=0.0, band_pass=True)
    cfg.filters.band_pass.low_cutoff = 80.0
    cfg.filters.band_pass.high_cutoff = 400.0
    dets = run_simulation(resources, cfg, "oye_casa_g.rpw")
    check(dets, [{"score": 0.6858197}, {"score": 0.66327363}])


def test_gain_normalizer_filter(resources):
    cfg = base_config(avg_threshold=0.0, gain_normalizer=True)
    dets = run_simulation(resources, cfg, "oye_casa_g.rpw", gain1=0.2, gain2=5.0)
    check(dets, [{"score": 0.7304294}, {"score": 0.71067876}])


def test_both_filters(resources):
    cfg = base_config(
        avg_threshold=0.0, gain_normalizer=True, band_pass=True,
        score_mode=ScoreMode.MEDIAN,
    )
    cfg.filters.band_pass.low_cutoff = 80.0
    cfg.filters.band_pass.high_cutoff = 500.0
    dets = run_simulation(resources, cfg, "oye_casa_g.rpw", gain1=0.2, gain2=5.0)
    check(dets, [{"score": 0.5775406}, {"score": 0.5828697}])
