"""Dump the optimized HLO of one batched chunk step and name the big ops.

Usage: python tools/hlo_dump.py [scenario] [B] [grep ...]

Compiles the serving chunk program for the current default backend and prints
every instruction whose name matches the given substrings (default: the
copy/reshape/fusion ops the step trace flags), with operand shapes — the
missing link between `tools/step_trace.py`'s per-op device times and the
actual tensors being moved.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "dtw_max"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    greps = sys.argv[3:] or ["copy", "reshape", "transpose"]
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
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
    compiled = (
        jax.jit(lambda s: det.process_chunk(det.params, s, frames))
        .lower(states)
        .compile()
    )
    txt = compiled.as_text()
    out_path = f"/tmp/hlo_{scenario}_{B}.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"full HLO -> {out_path} ({len(txt)} bytes)")
    for line in txt.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*=", s)
        if not m:
            continue
        name = m.group(1)
        if any(g in name for g in greps):
            print(s[:400])


if __name__ == "__main__":
    main()
