"""Extended benchmark suite: one JSON line per scenario.

bench.py stays the driver-facing single-metric bench (DTW Max mode,
BASELINE.json config[3] shape). This suite adds the breadth scenarios so
per-path regressions are visible:

  dtw_max      5-template DTW wakeword + avg gate, ScoreMode.MAX   (primary)
  dtw_median   same workload through the sorted-percentile reduction
  nn_medium    Medium classifier-NN wakeword (train_size 168, mfcc 16)
  dtw_10k      10 240 streams single chip (BASELINE.json config[3] scale)
  mixed        one DTW + one NN wakeword scored per stream per shift
  dtw_nogate   dtw_max with avg_threshold 0: gate disabled, full compute
  dtw_many     4 wakewords x 10 templates — past the SMEM template guard,
               so the per-wakeword chunked-v4 path is measured
               (reference: multiple add_wakeword, detector.rs:304-346)
  dtw_48k      dtw_max with 48 kHz input and in_graph_resample=True: the
               on-chip FFT-OLA resampler (XLA rFFT) runs inside the jitted
               chunk (1440 raw samples/frame; encoder.rs:63-102 parity)

Reproducibility (VERDICT r3 weak #3): every scenario runs in a FRESH
SUBPROCESS (no run-order variance), and the PRIMARY number is the
device-op time per 30 ms chunk from a perfetto trace — wall-clock through
the bench tunnel is recorded alongside but is hostage to RPC overhead the
device never sees. `device_bound_streams = B * 0.03 / device_s_per_chunk`.

Usage: python tools/bench_suite.py [scenario ...]   (default: all)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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


def _many_dtw_wakewords(n_ww: int = 4, k: int = 10):
    """Template volume past the 256 KiB SMEM guard: (n_ww*k + n_ww) pairs x
    100 x 16 f32 = 281 KiB at (4, 10) -> the batched chunk takes
    per-wakeword chunked v4 calls (gating preserved)."""
    from rustpotter_tpu.wakewords.files import WakewordRef

    out = []
    for w in range(n_ww):
        rng = np.random.default_rng(70 + w)
        feats = {
            f"s{i}.wav": rng.normal(0, 2, (100 - 2 * (i % 5), 16)).astype(np.float32)
            for i in range(k)
        }
        out.append((
            f"w{w}",
            WakewordRef(
                name=f"w{w}",
                samples_features=feats,
                avg_features=rng.normal(0, 2, (100, 16)).astype(np.float32),
                rms_level=0.05,
            ),
        ))
    return out


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


def _run(name, wakewords, score_mode, B, T, avg_threshold=0.2,
         sample_rate=16000):
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig, SampleFormat
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from kernel_probe import trace_kernel_us

    seq = int(os.environ.get("BENCH_SEQ", "4"))
    rng = np.random.default_rng(1)  # per-scenario fixed seed for input frames
    cfg = RustpotterConfig()
    cfg.detector.score_mode = score_mode
    cfg.detector.avg_threshold = avg_threshold
    in_graph = sample_rate != 16000
    if in_graph:
        cfg.fmt.sample_rate = sample_rate
        cfg.fmt.sample_format = SampleFormat.F32
        cfg.fmt.channels = 1
    det = BatchedDetector(
        wakewords, cfg, batch_size=B, in_graph_resample=in_graph
    )
    n_in = det.static.input_samples
    frames = jnp.asarray(rng.normal(0, 0.05, (B, n_in)).astype(np.float32))

    # --- wall clock, seq-grouped dispatch (same convention as bench.py)
    fseq = jnp.broadcast_to(frames[None], (seq,) + frames.shape)
    states = det.init_states()
    states, _ = det.process_sequence(det.params, states, fseq)  # warmup
    jax.block_until_ready(states)
    rounds = -(-T // seq)
    t0 = time.perf_counter()
    for _ in range(rounds):
        states, _ = det.process_sequence(det.params, states, fseq)
    jax.block_until_ready(states)
    elapsed = (time.perf_counter() - t0) * (T / (rounds * seq))
    streams_wall = B * T * 0.03 / elapsed

    # --- device-op time per chunk (PRIMARY): perfetto trace of the
    # single-chunk program; the top-level jit_* op is the whole chunk
    holder = {"s": det.init_states()}

    def stepfn():
        holder["s"], _ = det.process_chunk(det.params, holder["s"], frames)
        return holder["s"]

    # sanity guard: on pure-noise input no scenario should mass-fire —
    # a numerically broken scoring path (e.g. the round-4 dotm-precision
    # regression: silence scoring 0.9999) would otherwise still post a
    # great-looking throughput number
    holder0 = {"s": det.init_states()}
    fired_frac = 0.0
    for _ in range(3):
        holder0["s"], ev = det.process_chunk(det.params, holder0["s"], frames)
    import jax as _jax
    _jax.block_until_ready(holder0["s"])
    fired_frac = float(np.asarray(ev.fired).mean())
    scores_ok = bool(np.isfinite(np.asarray(ev.score)).all())
    assert fired_frac < 0.5 and scores_ok, (
        f"sanity guard: fired_frac={fired_frac} finite={scores_ok}"
    )

    ops = trace_kernel_us(stepfn, (), 12, top=8)
    dev_us = max(
        (us for nm, us in ops.items() if nm.startswith("jit_")), default=0.0
    )
    streams_dev = B * 0.03 / (dev_us * 1e-6) if dev_us else 0.0
    print(
        json.dumps(
            {
                "metric": f"realtime_16khz_streams_per_chip[{name}]",
                "device_us_per_chunk": round(dev_us, 1),
                "device_bound_streams": round(streams_dev, 1),
                "wall_streams": round(streams_wall, 1),
                "unit": "streams (audio-sec/s)",
                "vs_baseline": round(streams_dev / PER_CHIP_TARGET, 4),
                "B": B,
                "chunks_per_dispatch": seq,
            }
        ),
        flush=True,
    )


def scenario_table(B, T):
    from rustpotter_tpu import ScoreMode

    return {
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
        # template pair — the kernel's worst case (the reference's own cost
        # model has the same split: wakeword_comp.rs:85-94 skips the
        # per-template loop when the avg gate fails)
        "dtw_nogate": lambda: _run(
            "dtw_nogate", [("w", _dtw_wakeword())], ScoreMode.MAX, B, T,
            avg_threshold=0.0,
        ),
        # gate ACTIVE and failing on the noise streams (avg_threshold 0.8):
        # the idle-fleet serving cost — the reference's early abort
        # (wakeword_comp.rs:85-94) as the v4 kernel's per-tile skip. This is
        # the common production regime (most streams match no wakeword most
        # of the time); dtw_max/dtw_nogate are the worst case.
        "dtw_gated": lambda: _run(
            "dtw_gated", [("w", _dtw_wakeword())], ScoreMode.MAX, B, T,
            avg_threshold=0.8,
        ),
        "dtw_many20_gated": lambda: _run(
            "dtw_many20_gated", _many_dtw_wakewords(20, 10), ScoreMode.MAX,
            min(B, 4096), T, avg_threshold=0.8,
        ),
        "dtw_many": lambda: _run(
            "dtw_many", _many_dtw_wakewords(), ScoreMode.MAX,
            min(B, 4096), T,
        ),
        # fleet-scaling curve (VERDICT r4 next#6): 10 and 20 wakewords x 10
        # templates through the grouped launch packer (3 wakewords = 33
        # pairs per kernel call under the 256 KiB SMEM template budget)
        "dtw_many10": lambda: _run(
            "dtw_many10", _many_dtw_wakewords(10, 10), ScoreMode.MAX,
            min(B, 4096), T,
        ),
        "dtw_many20": lambda: _run(
            "dtw_many20", _many_dtw_wakewords(20, 10), ScoreMode.MAX,
            min(B, 4096), T,
        ),
        "dtw_48k": lambda: _run(
            "dtw_48k", [("w", _dtw_wakeword())], ScoreMode.MAX, B, T,
            sample_rate=48000,
        ),
        "mixed": lambda: _run(
            "mixed",
            [("w", _dtw_wakeword()), ("m", _nn_wakeword())],
            ScoreMode.MAX,
            B,
            T,
        ),
    }


def main():
    B = int(os.environ.get("BENCH_STREAMS", "8192"))
    T = int(os.environ.get("BENCH_CHUNKS", "34"))
    all_names = [
        "dtw_max", "dtw_median", "nn_medium", "dtw_10k", "dtw_nogate",
        "dtw_gated", "dtw_many", "dtw_many10", "dtw_many20",
        "dtw_many20_gated", "dtw_48k", "mixed",
    ]
    picked = [a for a in sys.argv[1:] if not a.startswith("--")] or all_names
    unknown = [n for n in picked if n not in all_names]
    if unknown:
        print(
            f"unknown scenario(s) {unknown}; available: {', '.join(all_names)}",
            file=sys.stderr,
        )
        sys.exit(2)

    in_proc = (
        os.environ.get("BENCH_SUITE_INPROC") == "1" or len(picked) == 1
    )
    if not in_proc:
        # fresh subprocess per scenario: no run-order variance
        for name in picked:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), name], check=False
            )
        return

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    scenarios = scenario_table(B, T)
    for name in picked:
        scenarios[name]()


if __name__ == "__main__":
    main()
