"""Per-stage timing of the batched step at serving batch size.

Times each stage of the step as an isolated jit at the same shapes, next to
the full step, so regressions localize (used to chase the nn_medium / mixed
gaps recorded in BENCH_SUITE.md).

Usage: python tools/step_breakdown.py [B]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from rustpotter_tpu.ops import frontend
    from rustpotter_tpu.wakewords import nn as nn_mod
    from rustpotter_tpu.wakewords.files import ModelType
    from rustpotter_tpu.wakewords.nn import init_params

    rng = np.random.default_rng(0)
    F, C, TS = 168, 16, 168
    frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))
    win = jnp.asarray(rng.normal(0, 1, (B, F, C)).astype(np.float32))
    mfcc = jnp.asarray(rng.normal(0, 1, (B, C)).astype(np.float32))
    params = [
        (jnp.asarray(w), jnp.asarray(b))
        for w, b in init_params(ModelType.MEDIUM, TS * C, C, 2, seed=3)
    ]

    @jax.jit
    def mfcc_chunk(frames):
        shifts = frontend.pre_emphasis(frames.reshape(B, 3, 160))
        consts = frontend.get_constants(C + 1)
        outs = []
        buf = frames
        for i in range(3):
            buf = jnp.concatenate([buf[:, 160:], shifts[:, i]], axis=-1)
            outs.append(frontend.mfcc_from_frames(buf, consts))
        return outs

    @jax.jit
    def roll3(win, mfcc):
        for _ in range(3):
            win = jnp.concatenate([win[:, 1:], mfcc[:, None, :]], axis=1)
        return win

    @jax.jit
    def nn3(win):
        outs = []
        for _ in range(3):
            x = win[:, :TS]
            x = x - jnp.mean(x, axis=1, keepdims=True)
            outs.append(jax.vmap(lambda xx: nn_mod.forward(params, xx.reshape(-1)))(x))
            win = jnp.concatenate([win[:, 1:], win[:, :1]], axis=1)
        return outs

    @jax.jit
    def cmn_flatten3(win):
        outs = []
        for _ in range(3):
            x = win[:, :TS]
            x = x - jnp.mean(x, axis=1, keepdims=True)
            outs.append(x.reshape(B, -1).sum(axis=-1))
            win = jnp.concatenate([win[:, 1:], win[:, :1]], axis=1)
        return outs

    print(f"B={B}  (ms per 30ms chunk)")
    print(f"  mfcc x3:        {timeit(mfcc_chunk, frames):7.3f}")
    print(f"  window roll x3: {timeit(roll3, win, mfcc):7.3f}")
    print(f"  cmn+flatten x3: {timeit(cmn_flatten3, win):7.3f}")
    print(f"  nn fwd x3:      {timeit(nn3, win):7.3f}")

    # full steps
    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from tools.bench_suite import _dtw_wakeword, _nn_wakeword

    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2
    for name, wws in [
        ("nn_medium", [("m", _nn_wakeword())]),
        ("dtw_max", [("w", _dtw_wakeword())]),
        ("mixed", [("w", _dtw_wakeword()), ("m", _nn_wakeword())]),
    ]:
        det = BatchedDetector(wws, cfg, batch_size=B)
        # states are DONATED by process_chunk — chain through a holder
        holder = {"s": det.init_states()}

        def stepfn(frames):
            holder["s"], _ = det.process_chunk(det.params, holder["s"], frames)
            return holder["s"]

        ms = timeit(stepfn, frames)
        print(f"  full step [{name}]: {ms:7.3f}  -> {B*0.03/(ms/1e3):8.0f} streams rt")


if __name__ == "__main__":
    main()
