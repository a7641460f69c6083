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
