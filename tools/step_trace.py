"""Perfetto device-op breakdown of one full batched step.

Usage: python tools/step_trace.py [scenario] [B]   (scenario: dtw_max,
nn_medium, mixed, dtw_nogate — same definitions as tools/bench_suite.py)

Prints the top device ops by per-step time — ground truth for where the step
budget goes (wall-clock stage timing through the axon tunnel hides overlap).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from kernel_probe import trace_kernel_us


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "dtw_max"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
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
    from bench_suite import _dtw_wakeword, _nn_wakeword

    wws = {
        "dtw_max": [("w", _dtw_wakeword())],
        "dtw_nogate": [("w", _dtw_wakeword())],
        "nn_medium": [("m", _nn_wakeword())],
        "mixed": [("w", _dtw_wakeword()), ("m", _nn_wakeword())],
    }[scenario]
    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.0 if scenario == "dtw_nogate" else 0.2
    det = BatchedDetector(wws, cfg, batch_size=B)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))
    states = det.init_states()

    # states are DONATED by process_chunk — rebind through a holder so the
    # traced loop never re-passes a consumed buffer
    holder = {"s": states}

    def stepfn():
        holder["s"], _ = det.process_chunk(det.params, holder["s"], frames)
        return holder["s"]

    res = trace_kernel_us(stepfn, (), 20, top=30)
    # dump the HLO of the exact program traced (same jit object -> cache hit,
    # identical instruction names) so trace rows map to real tensors
    try:
        txt = det.process_chunk.lower(
            det.params, holder["s"], frames
        ).compile().as_text()
        hlo_path = f"/tmp/steptrace_hlo_{scenario}_{B}.txt"
        with open(hlo_path, "w") as f:
            f.write(txt)
        print(f"HLO -> {hlo_path}")
    except Exception as e:  # pragma: no cover - diagnostic only
        print(f"(HLO dump failed: {e})")
    total = 0.0
    print(f"scenario={scenario} B={B} — top device ops, us per step:")
    for name, us in res.items():
        if any(s in name for s in ("profiler", "block_until", "try_to_block",
                                   "PjitFunction", "Pjit", "api.py")):
            continue
        print(f"  {us:9.1f} us  {name[:100]}")
        total += us


if __name__ == "__main__":
    main()
