"""On-TPU golden parity check for the batched (fused-kernel) detection path.

Feeds the reference's oye_casa_g streaming scenario (detector.rs:25-38) to a
batch of identical streams on the real TPU and asserts stream 0 reproduces the
golden detections (scores within tolerance, counters exact) and every stream
agrees bit-exactly with stream 0.

Usage: python tools/tpu_parity.py [B]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = os.environ.get("RUSTPOTTER_REF_RESOURCES", "/root/reference/tests/resources")


def simulate_stream_bytes(wav1, wav2, gain1=1.0, gain2=1.0):
    def wav_with_gain(path, gain):
        raw = open(path, "rb").read()[44:]
        s = np.frombuffer(raw, "<i2").astype(np.float32) * gain
        return np.clip(np.round(s), -32768, 32767).astype("<i2").tobytes()

    silence = bytes(16000 * 2 * 5)
    return (
        silence
        + wav_with_gain(os.path.join(RES, wav1), gain1)
        + silence
        + wav_with_gain(os.path.join(RES, wav2), gain2)
        + silence
    )


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from rustpotter_tpu.wakewords.files import load_wakeword

    ww = load_wakeword(os.path.join(RES, "oye_casa_g.rpw"))
    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.2
    cfg.detector.threshold = 0.5
    cfg.detector.score_mode = ScoreMode.MAX

    data = simulate_stream_bytes("oye_casa_g_1.wav", "oye_casa_g_2.wav")
    samples = np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    n_chunks = len(samples) // 480
    frames = samples[: n_chunks * 480].reshape(n_chunks, 480)

    det = BatchedDetector([("wakeword", ww)], cfg, batch_size=B)
    states = det.init_states()
    batch = jnp.broadcast_to(jnp.asarray(frames)[:, None, :], (n_chunks, B, 480))
    states, events = det.process_sequence(det.params, states, batch)
    fired = np.asarray(events.fired)  # (T, B)
    scores = np.asarray(events.score)
    avgs = np.asarray(events.avg_score)
    counters = np.asarray(events.counter)

    # every stream identical
    assert (fired == fired[:, :1]).all(), "streams disagree on fired"
    assert (scores == scores[:, :1]).all(), "streams disagree on score"
    assert (counters == counters[:, :1]).all(), "streams disagree on counter"

    t_idx = np.nonzero(fired[:, 0])[0]
    got = [(scores[t, 0], avgs[t, 0], counters[t, 0]) for t in t_idx]
    print("detections:", got)
    golden = [(0.7310586, 0.6495044), (0.721843, 0.5804737)]
    assert len(got) == 2, f"expected 2 detections, got {len(got)}"
    for (s, a, c), (gs, ga) in zip(got, golden):
        assert abs(s - gs) < 2e-4, (s, gs)
        assert abs(a - ga) < 2e-4, (a, ga)
    # --- phase 2: NN batched path on-chip (ok_casa-tiny, 48 kHz recording
    # resampled host-side through the f32 oracle resampler). The exact
    # emitted window is argmax-noise-sensitive (docs/NN_EXACTNESS.md), so
    # the on-chip contract is: one detection, right label, score in the
    # golden band, counter within the documented ±2, and every stream
    # bit-identical to stream 0.
    from rustpotter_tpu.audio.encoder import AudioEncoder
    from rustpotter_tpu.config import AudioFmt, SampleFormat
    from rustpotter_tpu.utils.wav import read_wav

    nn = load_wakeword(os.path.join(RES, "ok_casa-tiny.rpw"))
    wav, spec = read_wav(os.path.join(RES, "ok_casa.wav"))
    fmt = AudioFmt(
        sample_rate=spec.sample_rate, sample_format=SampleFormat.F32, channels=1
    )
    enc = AudioEncoder(fmt, 30, 16000)
    stream = np.concatenate(
        [wav.astype(np.float32), np.zeros(spec.sample_rate * 5, np.float32)]
    )
    n_in = enc.input_samples_per_frame
    nch = len(stream) // n_in
    frames16 = np.concatenate([
        enc.rencode_and_resample(stream[i * n_in:(i + 1) * n_in])
        for i in range(nch)
    ]).reshape(-1, 480)

    cfg2 = RustpotterConfig()
    cfg2.detector.avg_threshold = 0.0
    det2 = BatchedDetector([("ok_casa", nn)], cfg2, batch_size=B)
    st2 = det2.init_states()
    batch2 = jnp.broadcast_to(
        jnp.asarray(frames16)[:, None, :], (len(frames16), B, 480)
    )
    st2, ev2 = det2.process_sequence(det2.params, st2, batch2)
    fired2 = np.asarray(ev2.fired)
    assert (fired2 == fired2[:, :1]).all(), "NN streams disagree on fired"
    assert (np.asarray(ev2.score) == np.asarray(ev2.score)[:, :1]).all()
    t2 = np.nonzero(fired2[:, 0])[0]
    assert len(t2) == 1, f"NN path: expected 1 detection, got {len(t2)}"
    s2 = float(np.asarray(ev2.score)[t2[0], 0])
    c2 = int(np.asarray(ev2.counter)[t2[0], 0])
    ww2 = int(np.asarray(ev2.ww)[t2[0], 0])
    print(f"NN detection: score {s2:.7f} counter {c2} ww {ww2}")
    assert ww2 == 0 and abs(s2 - 0.9997649) < 1e-3 and abs(c2 - 34) <= 2, (
        s2, c2, ww2
    )
    print(f"PARITY OK on {jax.default_backend()} B={B} "
          f"(fused={os.environ.get('RUSTPOTTER_FUSED', '1')})")


if __name__ == "__main__":
    main()
