"""Probe compile time + runtime of the full batched step, fused vs unfused.

Usage: RUSTPOTTER_FUSED=1 python tools/compile_probe.py [B]
Prints lower/compile/run timings so the pathological-compile culprit can be
bisected (see docs/ARCHITECTURE.md, STATUS.md round-2 item 1).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from rustpotter_tpu.wakewords.files import WakewordRef

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

    t0 = time.perf_counter()
    lowered = det.process_chunk.lower(det.params, states, frames)
    t1 = time.perf_counter()
    print(f"lower: {t1 - t0:.2f}s", flush=True)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"compile: {t2 - t1:.2f}s", flush=True)

    states, ev = compiled(det.params, states, frames)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        states, ev = compiled(det.params, states, frames)
    jax.block_until_ready(states)
    dt = (time.perf_counter() - t0) / N
    print(f"run: {dt * 1e3:.3f} ms/chunk  -> {B * 0.03 / dt:.0f} streams rt", flush=True)


if __name__ == "__main__":
    main()
