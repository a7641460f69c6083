"""In-graph (on-chip) 48 kHz resampling in the batched runtime must match the
host-side resampler path used by the single-stream detector."""
import os

import jax.numpy as jnp
import numpy as np

from rustpotter_tpu import RustpotterConfig, ScoreMode
from rustpotter_tpu.mfcc.offline import audio_fmt_from_spec
from rustpotter_tpu.runtime.batch import BatchedDetector
from rustpotter_tpu.runtime.detector import Rustpotter
from rustpotter_tpu.utils.wav import read_wav
from rustpotter_tpu.wakewords.files import load_wakeword


def test_batched_48k_in_graph_matches_host(resources):
    ww = load_wakeword(os.path.join(resources, "oye_casa_real.rpw"))
    samples, spec = read_wav(os.path.join(resources, "real_sample.wav"))
    cfg = RustpotterConfig()
    cfg.fmt = audio_fmt_from_spec(spec)
    cfg.detector.avg_threshold = 0.3
    cfg.detector.threshold = 0.47
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.min_scores = 5

    stream = np.concatenate(
        [samples.astype(np.float32), np.zeros(spec.sample_rate * 5, np.float32)]
    )
    # host path (oracle, validated against reference goldens)
    rp = Rustpotter(cfg)
    rp.add_wakeword_ref("w", ww)
    in_len = rp.get_samples_per_frame()
    n = len(stream) // in_len
    f16 = np.concatenate(
        [rp.wav_encoder.rencode_and_resample(stream[i * in_len : (i + 1) * in_len]) for i in range(n)]
    )
    host_dets = rp.process_audio_sequence(f16)
    assert len(host_dets) == 3

    # batched path with the resampler inside the jitted step
    det = BatchedDetector([("w", ww)], cfg, batch_size=2, in_graph_resample=True)
    assert det.static.input_samples == 1440
    states = det.init_states()
    frames48 = stream[: n * in_len].reshape(n, in_len)
    batch = np.stack([frames48, frames48], axis=1)  # (T, 2, 1440)
    states, events = det.process_sequence(det.params, states, jnp.asarray(batch))
    fired = np.asarray(events.fired)
    assert fired[:, 0].sum() == 3
    idx = np.nonzero(fired[:, 0])[0]
    for t, d in zip(idx, host_dets):
        assert abs(float(events.score[t, 0]) - d.score) < 1e-4
        assert int(events.counter[t, 0]) == d.counter
