"""BASELINE config[1] end-to-end scenario: an 8-template wakeword scored with
P90/P95 percentile modes while the avg-template gate is active.

The reference has no committed golden for this exact configuration, so the
test checks the interaction invariants directly against the reference
semantics (/root/reference/src/wakewords/comp/wakeword_comp.rs:38-49
percentile-with-interpolation, :85-94 avg gate) using the per-template score
map each detection carries, plus a host re-computation of the percentile from
those 8 scores with the literal Rust formula — and pins the detection
counts/counters as a determinism regression fixture.
"""
import os

import numpy as np
import pytest

from rustpotter_tpu import RustpotterConfig, SampleFormat, ScoreMode
from rustpotter_tpu.runtime.detector import Rustpotter
from rustpotter_tpu.wakewords.builder import build_wakeword_ref_from_files

from test_detector_golden import simulate_stream_bytes


def _rust_percentile(sorted_vals, pct):
    # wakeword_comp.rs:38-49 — linear interpolation between floor/ceil ranks
    n = len(sorted_vals)
    index = np.float32(pct) / np.float32(100.0) * np.float32(n - 1)
    lo = int(np.floor(index))
    if lo == index:
        return np.float32(sorted_vals[int(index)])
    d = np.float32(index - np.floor(index))
    return np.float32(sorted_vals[lo] * (1 - d) + sorted_vals[lo + 1] * d)


@pytest.fixture(scope="module")
def eight_template_ref(resources):
    paths = [
        os.path.join(resources, f"oye_casa_g_{i}.wav") for i in range(1, 6)
    ] + [
        os.path.join(resources, w) for w in ("alexa.wav", "alexa2.wav", "alexa3.wav")
    ]
    ww = build_wakeword_ref_from_files("oye_casa_8t", paths, mfcc_size=16)
    assert len(ww.samples_features) == 8
    assert ww.avg_features is not None
    return ww


def _run(resources, ww, mode, avg_threshold, threshold):
    cfg = RustpotterConfig()
    cfg.detector.score_mode = mode
    cfg.detector.avg_threshold = avg_threshold
    cfg.detector.threshold = threshold
    cfg.fmt.sample_rate = 16000
    cfg.fmt.sample_format = SampleFormat.I16
    cfg.fmt.channels = 1
    rp = Rustpotter(cfg)
    rp.add_wakeword_ref("oye_casa_8t", ww)
    data = simulate_stream_bytes(resources, "oye_casa_g_1.wav", "oye_casa_g_2.wav")
    samples = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    return rp.process_audio_sequence(samples)


@pytest.mark.parametrize(
    "mode,pct,threshold,expected_n",
    [(ScoreMode.P90, 90, 0.48, 2), (ScoreMode.P95, 95, 0.48, 2)],
)
def test_percentile_with_avg_gate_8_templates(
    resources, eight_template_ref, mode, pct, threshold, expected_n
):
    avg_threshold = 0.2
    dets = _run(resources, eight_template_ref, mode, avg_threshold, threshold)
    # determinism fixture: both utterances must fire (the 3 alexa templates
    # drag the P90/P95 of an oye_casa window down, hence threshold 0.48)
    assert len(dets) == expected_n, [(d.score, d.counter) for d in dets]
    for d in dets:
        # avg gate was active and passed on the winning window
        # (wakeword_comp.rs:85-94: abort when avg score < avg_threshold)
        assert d.avg_score >= avg_threshold
        # the emitted score IS the Rust percentile of the 8 template scores
        assert len(d.scores) == 8
        per_template = np.sort(np.asarray(list(d.scores.values()), np.float32))
        want = _rust_percentile(per_template, pct)
        assert abs(d.score - float(want)) < 1e-5, (d.score, want)
        assert d.score >= threshold
        assert d.counter >= 5  # default min_scores


def test_avg_gate_suppresses_below_avg_threshold(resources, eight_template_ref):
    """Same stream, avg_threshold above the windows' avg-template score:
    the gate must abort every candidate (wakeword_comp.rs:91-93), yielding
    zero detections even though per-template scores clear the threshold."""
    dets = _run(resources, eight_template_ref, ScoreMode.P90, 0.95, 0.48)
    assert len(dets) == 0


def test_p90_vs_p95_ordering(resources, eight_template_ref):
    """With ascending-sorted scores, P95 >= P90 on every detection window —
    checks the interpolated rank actually moves with the mode at K=8."""
    d90 = _run(resources, eight_template_ref, ScoreMode.P90, 0.2, 0.48)
    d95 = _run(resources, eight_template_ref, ScoreMode.P95, 0.2, 0.48)
    assert len(d90) == len(d95) == 2
    for a, b in zip(d90, d95):
        assert b.score >= a.score - 1e-6
