"""Time Pallas lowering + XLA compile of the fused DTW kernels in isolation.

Companion harness for the cold-start numbers in docs/PERF.md: identical
back-to-back fresh-process runs of this probe measured v4 lowering at 4.2 s
and 176.9 s (v3: 123 s / 198 s) on a quiet machine — the spread is the axon
remote helper's artifact cache and queueing, NOT program structure. Run this
before attributing a cold-start change to a kernel edit.

Usage: python tools/lower_probe.py [v3|v4] [B]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "v4"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu.ops.fused_dtw import fused_dtw_batch_v3_t, fused_dtw_chunk_v4

    rng = np.random.default_rng(0)
    F = Lm = 100
    C, w = 16, 5
    lens = (100, 98, 96, 94, 92, 97)
    P, D, K = 6, 1, 5
    win_t = jnp.asarray(rng.normal(0, 1, (F, C, B)).astype(np.float32))
    tpl = jnp.asarray(rng.normal(0, 1, (P, Lm, C)).astype(np.float32))
    tn = jnp.sum(tpl * tpl, axis=-1)
    gb = jnp.full((D,), np.inf, jnp.float32)
    if which == "v3":
        means1 = jnp.asarray(rng.normal(0, 0.2, (P, C, B)).astype(np.float32))
        fn = jax.jit(
            lambda a, b: fused_dtw_batch_v3_t(
                a, b, tpl, tn, gb, lens, w, D, K, jnp.int32(F - 3)
            )
        )
        args = (win_t, means1)
    else:
        new_t = jnp.asarray(rng.normal(0, 1, (3, C, B)).astype(np.float32))
        means3 = jnp.asarray(rng.normal(0, 0.2, (3, P, C, B)).astype(np.float32))
        fn = jax.jit(
            lambda a, b, c: fused_dtw_chunk_v4(
                a, b, c, tpl, tn, gb, lens, w, D, K, jnp.int32(F - 3)
            )
        )
        args = (win_t, new_t, means3)
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t1 = time.perf_counter()
    print(f"{which} lower: {t1 - t0:.2f}s", flush=True)
    lowered.compile()
    print(f"{which} compile: {time.perf_counter() - t1:.2f}s", flush=True)


if __name__ == "__main__":
    main()
