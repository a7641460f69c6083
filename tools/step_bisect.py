"""Bisect the full batched step's device time by stubbing the scorer seam.

Variants (cumulative):
  stub     — run_wakeword_detectors replaced by constants: measures the
             front-end + window/state machinery + event plumbing
  dtwraw   — _dtw_scores runs (cums/means/kernel/reduce) but its outputs are
             discarded in favor of constants: measures the scoring chain
             without the detection state feedback
  dtwall   — like dtwraw but every wakeword head (DTW and NN) runs with
             outputs discarded: adds the NN forward cost
  dtwlive  — all heads run and feed the real argmax/best-candidate merge,
             but the detection state feedback is still stubbed
  full     — unmodified step

Usage: python tools/step_bisect.py [B] [iters]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit_chained(det, states, frames, n):
    import jax

    # states are DONATED by process_chunk — chain through the returned state
    ss, _ = det.process_chunk(det.params, states, frames)
    jax.block_until_ready(ss)
    t0 = time.perf_counter()
    for _ in range(n):
        ss, _ = det.process_chunk(det.params, ss, frames)
    jax.block_until_ready(ss)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime import stream_step
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from bench import build_bench_wakeword

    ww, _ = build_bench_wakeword()
    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))

    real_rwd = stream_step.run_wakeword_detectors

    def stub(static, params, win, rot):
        z = jnp.float32(0.0)
        return (
            jnp.bool_(False) & (win[0, 0] > 0),  # keep a win dependence
            jnp.int32(0),
            z + win[0, 0] * 1e-20,
            z,
            jnp.zeros((static.smax,), jnp.float32),
        )

    def dtwraw(static, params, win, rot):
        d, s, a, m = stream_step._dtw_scores(static, params, win, rot)
        keep = s[0] * 1e-20
        return (
            jnp.bool_(False) & d[0],
            jnp.int32(0),
            keep,
            jnp.float32(0.0) + a[0] * 1e-20,
            jnp.zeros((static.smax,), jnp.float32) + m[0] * 1e-20,
        )

    def dtwall(static, params, win, rot):
        # consume every stream's outputs (nothing DCE-able) but keep the
        # detection decision constant-false so state feedback is inert
        d, s, a, m = stream_step._dtw_scores(static, params, win, rot)
        keep = (jnp.sum(s) + jnp.sum(a) + jnp.sum(m) + jnp.sum(d)) * 1e-20
        return (
            jnp.bool_(False) & d[0],
            jnp.int32(0),
            keep,
            jnp.float32(0.0),
            jnp.zeros((static.smax,), jnp.float32),
        )

    def dtwlive(static, params, win, rot):
        # real detection decision (state feedback live) but best-candidate
        # payload stubbed
        d, s, a, m = stream_step._dtw_scores(static, params, win, rot)
        masked = jnp.where(d, s, -jnp.inf)
        return (
            jnp.any(d),
            jnp.argmax(masked),
            jnp.max(masked),
            jnp.float32(0.0),
            jnp.zeros((static.smax,), jnp.float32),
        )

    for name, fn in [("stub", stub), ("dtwraw", dtwraw), ("dtwall", dtwall), ("dtwlive", dtwlive), ("full", real_rwd)]:
        stream_step.run_wakeword_detectors = fn
        det = BatchedDetector([("w", ww)], cfg, batch_size=B)
        ms = timeit_chained(det, det.init_states(), frames, N)
        print(f"  {name:7s}: {ms:7.3f} ms/step  -> {B*0.03/(ms/1e3):8.0f} streams rt")
    stream_step.run_wakeword_detectors = real_rwd


if __name__ == "__main__":
    main()
