"""Time the fused DTW kernel alone at bench shapes (B, Lm=100, C=16, w=5, P=6).

Uses a jax profiler perfetto trace and reports the custom-call's on-device
duration. Wall-clock async loops through the axon tunnel are NOT trustworthy
(dispatch pipelining/result caching can hide device time entirely); the trace
is ground truth.

Usage: python tools/kernel_probe.py [B] [iters] [--v1|--v2|--v4] [--gate] [--jch=N]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def trace_kernel_us(fn, args, n, label_contains=None, top=10):
    """Run fn n times under a profiler trace; return {name: us_per_call}.

    label_contains: optional tuple of substrings — when given, only complete
    ('X') events whose name contains one of them are summed, isolating e.g.
    the fused custom-call from surrounding copies (ADVICE r2)."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    tmpdir = tempfile.mkdtemp(prefix="kprobe_")
    jax.profiler.start_trace(tmpdir, create_perfetto_trace=True)
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    files = sorted(glob.glob(tmpdir + "/**/perfetto_trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    dur = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if label_contains and not any(s in name for s in label_contains):
                continue
            dur[name] += e["dur"]
    return {name: d / n for name, d in dur.most_common(top)}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = [a for a in sys.argv[1:] if a.startswith("--")]
    B = int(args[0]) if len(args) > 0 else 8192
    N = int(args[1]) if len(args) > 1 else 20
    variant = 1 if "--v1" in opts else (2 if "--v2" in opts else (4 if "--v4" in opts else 3))
    gate = "--gate" in opts  # v3: bound that no random stream passes
    jch = 5
    dpg = 3
    dik = True
    for o in opts:
        if o.startswith("--jch="):
            jch = int(o.split("=")[1])
        if o.startswith("--dpg="):
            dpg = int(o.split("=")[1])
        if o.startswith("--dik="):
            dik = bool(int(o.split("=")[1]))
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu.ops.fused_dtw import (
        fused_dtw_batch, fused_dtw_batch_v3, fused_dtw_chunk_v4,
    )

    rng = np.random.default_rng(0)
    Lm, C, w = 100, 16, 5
    # bench shape: one wakeword, 5 templates + 1 avg pair (D=1, K=5)
    lens = (100, 98, 96, 94, 92, 97)
    P = len(lens)
    D, K = 1, P - 1
    win = jnp.asarray(rng.normal(0, 1, (B, Lm, C)).astype(np.float32))
    means = jnp.asarray(rng.normal(0, 0.2, (B, P, C)).astype(np.float32))
    templates = jnp.asarray(rng.normal(0, 1, (P, Lm, C)).astype(np.float32))
    tnorms = jnp.sum(templates * templates, axis=-1)

    if variant == 4:
        # whole-chunk kernel: reported time covers all 3 shifts
        bounds = jnp.asarray([-1.0 if gate else np.inf], jnp.float32)
        win_t = jnp.transpose(win, (1, 2, 0))
        new_t = jnp.asarray(rng.normal(0, 1, (3, C, B)).astype(np.float32))
        means3 = jnp.asarray(rng.normal(0, 0.2, (3, P, C, B)).astype(np.float32))
        fn = jax.jit(
            lambda w_, n_, m_: fused_dtw_chunk_v4(
                w_, n_, m_, templates, tnorms, bounds, lens, w, D, K,
                jnp.int32(Lm - 2), jch=jch, dpg=dpg, dik=dik,
            )
        )
        print(f"variant=4 jch={jch} dpg={dpg} dik={dik} B={B} gate={gate} (time = 3 shifts)")
        for name, us in trace_kernel_us(fn, (win_t, new_t, means3), N).items():
            print(f"{us:10.1f} us/call  {name[:90]}")
        return

    if variant == 3:
        bounds = jnp.asarray([-1.0 if gate else np.inf], jnp.float32)
        fn = jax.jit(
            lambda w_, m_, t_, n_: fused_dtw_batch_v3(
                w_, m_, t_, n_, bounds, lens, w, D, K, jch=jch
            )
        )
    else:
        fn = jax.jit(
            lambda w_, m_, t_, n_: fused_dtw_batch(
                w_, m_, t_, n_, lens, w, variant=variant, jch=jch
            )
        )
    print(f"variant={variant} jch={jch} B={B} gate={gate}")
    for name, us in trace_kernel_us(fn, (win, means, templates, tnorms), N).items():
        print(f"{us:10.1f} us/call  {name[:90]}")


if __name__ == "__main__":
    main()
