"""Time compile + run of the full batched step via the jit fast path.

Usage: [RUSTPOTTER_FUSED=1] python tools/step_probe.py [B] [N_ITERS]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 20
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
    # states are DONATED — keep chaining through the returned state
    s, _ = det.process_chunk(det.params, states, frames)
    jax.block_until_ready(s)
    print(f"first call (trace+compile+run): {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(N):
        s, ev = det.process_chunk(det.params, s, frames)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / N
    print(
        f"run: {dt * 1e3:.3f} ms/chunk -> {B * 0.03 / dt:.0f} streams rt "
        f"(fused={os.environ.get('RUSTPOTTER_FUSED')})",
        flush=True,
    )


if __name__ == "__main__":
    main()
