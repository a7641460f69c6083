"""44.1 kHz end-to-end detection tripwire (non-3:1 resampler ratio).

The reference accepts arbitrary input rates via its FFT resampler
(/root/reference/src/audio/encoder.rs:63-102, rubato 0.14 FftFixedInOut); its
committed fixtures only ever exercise 48 kHz → 16 kHz (ratio 3:1). Our cutoff
law at other ratios is validated spectrally (tests/test_resampler.py) — this
test adds a detection-level tripwire: the 16 kHz golden stream, offline-
upsampled to 44.1 kHz at high quality (scipy polyphase, way above the
pipeline's own quality), must reproduce the 16 kHz run's detections through
the 44.1→16 path (chunk sizing 1323→480 per 30 ms).

Counters may legitimately shift by the resampler's group-delay (240 output
samples = 1.5 shifts) re-aligning frame boundaries; detection count, order,
and scores near the golden values must hold, and the actual counters are
pinned as a regression fixture against the 16 kHz run's.
"""
import os

import numpy as np
import pytest

from rustpotter_tpu import RustpotterConfig, SampleFormat, ScoreMode
from rustpotter_tpu.runtime.detector import Rustpotter

from test_detector_golden import simulate_stream_bytes


def _detect(resources, samples, sample_rate):
    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.2
    cfg.detector.threshold = 0.5
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.fmt.sample_rate = sample_rate
    cfg.fmt.sample_format = SampleFormat.F32
    cfg.fmt.channels = 1
    rp = Rustpotter(cfg)
    rp.add_wakeword_from_file("wakeword", os.path.join(resources, "oye_casa_g.rpw"))
    if sample_rate == 16000:
        return rp.process_audio_sequence(samples)
    enc = rp.wav_encoder
    n_in = enc.input_samples_per_frame
    n = len(samples) // n_in
    frames16 = [
        enc.rencode_and_resample(samples[i * n_in : (i + 1) * n_in])
        for i in range(n)
    ]
    return rp.process_audio_sequence(np.concatenate(frames16))


def test_44100_detections_match_16k_run(resources):
    from scipy.signal import resample_poly

    data = simulate_stream_bytes(resources, "oye_casa_g_1.wav", "oye_casa_g_2.wav")
    s16 = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0

    dets16 = _detect(resources, s16, 16000)
    assert len(dets16) == 2
    assert abs(dets16[0].score - 0.7310586) < 2e-4  # golden (BASELINE.md §A)
    assert abs(dets16[1].score - 0.721843) < 2e-4

    # high-quality offline 16k→44.1k upsample (441/160), float64 internally —
    # the test stimulus, not the code under test
    s441 = resample_poly(s16.astype(np.float64), 441, 160).astype(np.float32)
    dets441 = _detect(resources, s441, 44100)

    assert len(dets441) == 2, [
        (d.score, d.counter) for d in dets441
    ]
    for d16, d441 in zip(dets16, dets441):
        assert d441.name == d16.name
        # resampling is not bit-transparent; scores must stay close to the
        # 16 kHz run (the two detections sit ~0.23 above threshold)
        assert abs(d441.score - d16.score) < 0.02, (d441.score, d16.score)
        # the avg-template score is more sensitive (single template, lower
        # margin); measured offset is 0.034 on detection 2
        assert abs(d441.avg_score - d16.avg_score) < 0.05
        # counter = consecutive over-threshold windows; measured EXACT
        # (19 == 19 on both detections) — allow 1 frame of group-delay
        # realignment headroom
        assert abs(d441.counter - d16.counter) <= 1, (d441.counter, d16.counter)


def test_22050_detections_match_16k_run(resources):
    """VERDICT r3 missing #3: the cutoff law's base is identified at the only
    shape the reference's fixtures exercise (1440, 480). This tripwire pins
    the law at a second downsample ratio (22.05 kHz -> 16 kHz). Same
    contract as the 44.1 kHz tripwire."""
    from scipy.signal import resample_poly

    data = simulate_stream_bytes(resources, "oye_casa_g_1.wav", "oye_casa_g_2.wav")
    s16 = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    dets16 = _detect(resources, s16, 16000)
    assert len(dets16) == 2

    s22 = resample_poly(s16.astype(np.float64), 441, 320).astype(np.float32)
    dets_r = _detect(resources, s22, 22050)
    assert len(dets_r) == 2, [(d.score, d.counter) for d in dets_r]
    for d16, dr in zip(dets16, dets_r):
        assert dr.name == d16.name
        assert abs(dr.score - d16.score) < 0.02, (dr.score, d16.score)
        assert abs(dr.avg_score - d16.avg_score) < 0.05
        assert abs(dr.counter - d16.counter) <= 1, (dr.counter, d16.counter)


def test_8000_upsample_detects_with_pinned_scores(resources):
    """The UPSAMPLE branch of the cutoff law (fft_size_in < fft_size_out:
    rubato skips the out/in scaling — audio/resampler.py calculate_cutoff).

    Two effects make 8 kHz scores legitimately lower than the 16 kHz run's
    0.731/0.721: (a) the stream loses the 4-8 kHz band entirely, and (b)
    the law keeps the anti-imaging transition width constant in FFT BINS
    (docs note in audio/resampler.py), so at fft_size_in=240 the relative
    cutoff drops to base^(16/240) ≈ 0.84 — a real 3.3-4 kHz rolloff that an
    ideal polyphase upsampler doesn't have (measured: ideal-upsample run
    scores 0.663/0.685 vs our 0.602/0.585). Both reconstructions of
    rubato's formula that fit the (1440, 480) golden — exponential
    base^(16/N) and linear 1 - k/N — agree on this behavior, so the pin
    below is the law's prediction, kept as a regression fixture until a
    non-3:1 reference artifact exists to identify against."""
    from scipy.signal import resample_poly

    data = simulate_stream_bytes(resources, "oye_casa_g_1.wav", "oye_casa_g_2.wav")
    s16 = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    s8 = resample_poly(s16.astype(np.float64), 1, 2)

    dets_r = _detect(resources, s8.astype(np.float32), 8000)
    assert len(dets_r) == 2, [(d.score, d.counter) for d in dets_r]
    assert [d.name for d in dets_r] == ["oye casa", "oye casa"]
    pinned = [(0.6024, 17), (0.5849, 13)]
    for dr, (score, counter) in zip(dets_r, pinned):
        assert abs(dr.score - score) < 0.01, (dr.score, score)
        assert abs(dr.counter - counter) <= 1, (dr.counter, counter)
