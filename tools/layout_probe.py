"""Measure what explicit state-layout pins do to the serving chunk.

VERDICT r4 weak #2/#5: the donated states pytree lets XLA pick parameter
layouts; at dtw_max it picks a non-default window layout and inserts a 52 MB
relayout copy per chunk (copy.38, 73 us), at nn_medium the 3-row window
update loses in-place-ness and rewrites all 88 MB (copy.74, 137 us), and
`mixed` pays both directions (~550 us of copies). This probe compiles the
chunk with `jax.experimental.layout.Format` pins forcing DEFAULT row-major
layouts on every state leaf, and reports every copy-like HLO instruction
over 4 MB in both variants (and optionally traces both on-device).

Usage: python tools/layout_probe.py [scenario] [B] [--time]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def big_copies(hlo_txt: str, min_bytes: int = 4 * 1024 * 1024):
    out = []
    for m in re.finditer(
        r"%([\w.-]*(?:copy|transpose|bitcast_fusion)[\w.-]*) = "
        r"(f32|s32|pred|bf16)\[([\d,]*)\]", hlo_txt
    ):
        name, dtype, dims = m.groups()
        if name.startswith("bitcast"):
            continue  # pure bitcasts are free
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 0
        nbytes = n * (4 if dtype in ("f32", "s32") else 2)
        if nbytes >= min_bytes:
            out.append((name, dtype, dims, nbytes))
    return out


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "dtw_max"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    do_time = "--time" in sys.argv
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import layout as jlayout

    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from rustpotter_tpu.runtime.stream_step import make_batched_chunk
    from bench_suite import _dtw_wakeword, _nn_wakeword
    from kernel_probe import trace_kernel_us

    wws = {
        "dtw_max": [("w", _dtw_wakeword())],
        "nn_medium": [("m", _nn_wakeword())],
        "mixed": [("w", _dtw_wakeword()), ("m", _nn_wakeword())],
    }[scenario]
    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2
    det = BatchedDetector(wws, cfg, batch_size=B)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))
    states = det.init_states()
    chunk_fn = make_batched_chunk(det.static)

    dev = jax.devices()[0]
    sds = jax.sharding.SingleDeviceSharding(dev)

    def fmt_for(leaf):
        return jlayout.Format(
            jlayout.Layout(major_to_minor=tuple(range(np.ndim(leaf)))), sds
        )

    st_fmts = jax.tree.map(fmt_for, states)
    pinned = jax.jit(
        chunk_fn,
        in_shardings=(None, st_fmts, None),
        out_shardings=(st_fmts, None),
        donate_argnums=(1,),
    )

    variants = {"unpinned": det.process_chunk, "pinned": pinned}
    for name, fn in variants.items():
        txt = fn.lower(det.params, states, frames).compile().as_text()
        cps = big_copies(txt)
        tot = sum(c[3] for c in cps)
        print(f"--- {name}: {len(cps)} big copies, {tot/1e6:.1f} MB total")
        for nm, dt, dims, nb in sorted(cps, key=lambda c: -c[3]):
            print(f"    {nb/1e6:8.1f} MB  {nm} {dt}[{dims}]")
        path = f"/tmp/layoutprobe_{scenario}_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"    HLO -> {path}")

    if do_time:
        for name, fn in variants.items():
            st = jax.device_put(states, st_fmts) if name == "pinned" else states
            holder = {"s": st}

            def stepfn(fn=fn):
                holder["s"], _ = fn(det.params, holder["s"], frames)
                return holder["s"]

            ops = trace_kernel_us(stepfn, (), 12, top=4)
            dev_us = max(
                (us for nm, us in ops.items() if nm.startswith("jit_")),
                default=0.0,
            )
            print(f"{name}: {dev_us:.1f} us/chunk device "
                  f"({B * 0.03 / (dev_us * 1e-6):,.0f} streams/chip)")


if __name__ == "__main__":
    main()
