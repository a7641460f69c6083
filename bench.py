"""Throughput benchmark: batched streaming wakeword detection on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: real-time 16 kHz audio streams sustainable per chip (= audio-seconds
processed per wall second). North star (BASELINE.json): ≥100k streams per
v5e-16 ⇒ 6250 streams/chip; vs_baseline is the fraction of that per-chip
target. The workload matches BASELINE.json config[3]: batched concurrent
streams, DTW wakeword (5 templates) + avg-template gate, full front-end.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    # persistent compilation cache: the step program is large and first
    # compiles are slow through the remote-compile service
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from rustpotter_tpu.wakewords.files import WakewordRef

    B = int(os.environ.get("BENCH_STREAMS", "8192"))
    T = int(os.environ.get("BENCH_CHUNKS", "34"))  # ~1 s of audio per stream

    rng = np.random.default_rng(0)
    feats = {
        f"s{i}.wav": rng.normal(0, 2, (100 - 2 * i, 16)).astype(np.float32)
        for i in range(5)
    }
    ww = WakewordRef(
        name="bench",
        samples_features=feats,
        avg_features=rng.normal(0, 2, (100, 16)).astype(np.float32),
        rms_level=0.05,
    )
    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2
    det = BatchedDetector([("w", ww)], cfg, batch_size=B)

    frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))
    states = det.init_states()
    # warmup + compile (per-chunk step; host loop amortizes over the batch)
    states, _ = det.process_chunk(det.params, states, frames)
    jax.block_until_ready(states)

    t0 = time.perf_counter()
    for _ in range(T):
        states, events = det.process_chunk(det.params, states, frames)
    jax.block_until_ready(states)
    elapsed = time.perf_counter() - t0

    audio_seconds = B * T * 0.03
    streams_rt = audio_seconds / elapsed
    per_chip_target = 100_000 / 16
    print(
        json.dumps(
            {
                "metric": "realtime_16khz_streams_per_chip",
                "value": round(streams_rt, 1),
                "unit": "streams (audio-sec/s)",
                "vs_baseline": round(streams_rt / per_chip_target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
