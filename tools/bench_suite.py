"""Extended benchmark suite: one JSON line per scenario.

bench.py stays the driver-facing single-metric bench (DTW Max mode,
BASELINE.json config[3] shape). This suite adds the breadth scenarios from
STATUS.md item 5 so per-path regressions are visible:

  dtw_max      5-template DTW wakeword + avg gate, ScoreMode.MAX   (primary)
  dtw_median   same workload through the sorted-percentile reduction
  nn_medium    Medium classifier-NN wakeword (train_size 168, mfcc 16)
  dtw_10k      10 240 streams single chip (BASELINE.json config[3] scale)
  mixed        one DTW + one NN wakeword scored per stream per shift
  dtw_nogate   dtw_max with avg_threshold 0: gate disabled, full compute

Usage: python tools/bench_suite.py [scenario ...]   (default: all)
Metric per scenario: real-time 16 kHz streams sustainable per chip;
vs_baseline = fraction of the 6 250 streams/chip north-star.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PER_CHIP_TARGET = 100_000 / 16


def _dtw_wakeword():
    # own fixed-seed rng: template contents must not depend on which
    # scenarios ran earlier in the same invocation
    rng = np.random.default_rng(7)
    from rustpotter_tpu.wakewords.files import WakewordRef

    feats = {
        f"s{i}.wav": rng.normal(0, 2, (100 - 2 * i, 16)).astype(np.float32)
        for i in range(5)
    }
    return WakewordRef(
        name="bench",
        samples_features=feats,
        avg_features=rng.normal(0, 2, (100, 16)).astype(np.float32),
        rms_level=0.05,
    )


def _nn_wakeword():
    from rustpotter_tpu.wakewords.files import ModelType, WakewordModel
    from rustpotter_tpu.wakewords.nn import init_params, params_to_tensor_data

    train_size = 168
    mfcc_size = 16
    # input = flattened train_size×mfcc_size window, matching the runtime's
    # NN path (stream_step._nn_scores_one flattens (train_size, mfcc_size))
    params = init_params(ModelType.MEDIUM, train_size * mfcc_size, mfcc_size, 2, seed=3)
    return WakewordModel(
        labels=["bench", "none"],
        train_size=train_size,
        mfcc_size=mfcc_size,
        m_type=ModelType.MEDIUM,
        weights=params_to_tensor_data(params),
        rms_level=0.05,
    )


def _run(name, wakewords, score_mode, B, T, avg_threshold=0.2):
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig
    from rustpotter_tpu.runtime.batch import BatchedDetector

    rng = np.random.default_rng(1)  # per-scenario fixed seed for input frames
    cfg = RustpotterConfig()
    cfg.detector.score_mode = score_mode
    cfg.detector.avg_threshold = avg_threshold
    det = BatchedDetector(wakewords, cfg, batch_size=B)
    frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))
    states = det.init_states()
    states, _ = det.process_chunk(det.params, states, frames)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(T):
        states, _ = det.process_chunk(det.params, states, frames)
    jax.block_until_ready(states)
    elapsed = time.perf_counter() - t0
    streams_rt = B * T * 0.03 / elapsed
    print(
        json.dumps(
            {
                "metric": f"realtime_16khz_streams_per_chip[{name}]",
                "value": round(streams_rt, 1),
                "unit": "streams (audio-sec/s)",
                "vs_baseline": round(streams_rt / PER_CHIP_TARGET, 4),
            }
        ),
        flush=True,
    )


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rustpotter_tpu import ScoreMode

    B = int(os.environ.get("BENCH_STREAMS", "8192"))
    T = int(os.environ.get("BENCH_CHUNKS", "34"))
    scenarios = {
        "dtw_max": lambda: _run(
            "dtw_max", [("w", _dtw_wakeword())], ScoreMode.MAX, B, T
        ),
        "dtw_median": lambda: _run(
            "dtw_median", [("w", _dtw_wakeword())], ScoreMode.MEDIAN, B, T
        ),
        "nn_medium": lambda: _run(
            "nn_medium", [("w", _nn_wakeword())], ScoreMode.MAX, B, T
        ),
        "dtw_10k": lambda: _run(
            "dtw_10k", [("w", _dtw_wakeword())], ScoreMode.MAX, 10240, T
        ),
        # avg_threshold 0 disables the avg gate: every tile computes every
        # template pair — the v3 kernel's worst case (the reference's own
        # cost model has the same split: wakeword_comp.rs:85-94 skips the
        # per-template loop when the avg gate fails)
        "dtw_nogate": lambda: _run(
            "dtw_nogate", [("w", _dtw_wakeword())], ScoreMode.MAX, B, T,
            avg_threshold=0.0,
        ),
        "mixed": lambda: _run(
            "mixed",
            [("w", _dtw_wakeword()), ("m", _nn_wakeword())],
            ScoreMode.MAX,
            B,
            T,
        ),
    }
    picked = sys.argv[1:] or list(scenarios)
    unknown = [n for n in picked if n not in scenarios]
    if unknown:
        print(
            f"unknown scenario(s) {unknown}; available: {', '.join(scenarios)}",
            file=sys.stderr,
        )
        sys.exit(2)
    for name in picked:
        scenarios[name]()


if __name__ == "__main__":
    main()
