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
    print(f"PARITY OK on {jax.default_backend()} B={B} "
          f"(fused={os.environ.get('RUSTPOTTER_FUSED', '1')})")


if __name__ == "__main__":
    main()
