"""Serving latency story: end-to-end per-chunk latency vs batch size and
dispatch grouping (VERDICT r4 missing #2).

The reference is a 30 ms-cadence streaming detector (detector.rs:347): one
call = one chunk, latency = that call's wall time. The batched TPU runtime
adds two latency sources on top of device compute:
  - dispatch overhead (host->device submit + result readback; through the
    axon bench tunnel this includes ~3.7 ms of RPC a colocated host never
    sees — both numbers are recorded);
  - chunk grouping (process_sequence over BENCH_SEQ chunks amortizes
    dispatch overhead but delays the FIRST chunk's result by the whole
    group: worst-case added latency = (seq-1) * 30 ms of audio buffering
    plus the group's compute).

Measured axes:
  1. B sweep at seq=1: device us/chunk (perfetto) + wall per-dispatch
     latency percentiles -> streams/chip vs per-chunk latency;
  2. seq sweep at the headline B: throughput vs worst-case event latency
     (= buffering delay + group wall time).

Usage: python tools/latency_bench.py [--b 512,2048,8192] [--seq 1,2,4,8]
Each configuration runs in this process (shapes share the JAX cache with
bench_suite). Emits one JSON line per row.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _percentiles(xs, ps=(50, 90, 99)):
    a = np.asarray(xs)
    return {f"p{p}": round(float(np.percentile(a, p)), 3) for p in ps}


def main():
    bs = [512, 2048, 8192]
    seqs = [1, 2, 4, 8]
    for a in sys.argv[1:]:
        if a.startswith("--b"):
            bs = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--seq"):
            seqs = [int(x) for x in a.split("=", 1)[1].split(",")]
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
    from bench_suite import _dtw_wakeword
    from kernel_probe import trace_kernel_us

    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2
    rng = np.random.default_rng(1)
    reps = 40

    # ---- axis 1: B sweep at seq=1 (per-chunk dispatch = reference cadence)
    for B in bs:
        det = BatchedDetector([("w", _dtw_wakeword())], cfg, batch_size=B)
        frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))
        holder = {"s": det.init_states()}

        def stepfn():
            holder["s"], ev = det.process_chunk(det.params, holder["s"], frames)
            return holder["s"], ev

        s, ev = stepfn()
        jax.block_until_ready((s, ev))
        lats = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s, ev = stepfn()
            jax.block_until_ready(ev)  # the event IS the serving result
            lats.append((time.perf_counter() - t0) * 1e3)
        ops = trace_kernel_us(lambda: stepfn()[0], (), 12, top=4)
        dev_us = max(
            (us for nm, us in ops.items() if nm.startswith("jit_")), default=0.0
        )
        print(json.dumps({
            "axis": "batch_sweep", "B": B, "seq": 1,
            "device_us_per_chunk": round(dev_us, 1),
            "device_bound_streams": round(B * 0.03 / (dev_us * 1e-6), 1)
            if dev_us else 0.0,
            "wall_latency_ms": _percentiles(lats),
            "note": "wall includes bench-tunnel RPC (~3.7 ms) a colocated "
                    "host does not pay",
        }), flush=True)

    # ---- axis 2: seq sweep at the headline B
    B = bs[-1]
    det = BatchedDetector([("w", _dtw_wakeword())], cfg, batch_size=B)
    frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))
    for seq in seqs:
        fseq = jnp.broadcast_to(frames[None], (seq,) + frames.shape)
        holder = {"s": det.init_states()}

        def seqfn():
            holder["s"], ev = det.process_sequence(det.params, holder["s"], fseq)
            return holder["s"], ev

        s, ev = seqfn()
        jax.block_until_ready((s, ev))
        lats = []
        for _ in range(max(8, reps // seq)):
            t0 = time.perf_counter()
            s, ev = seqfn()
            jax.block_until_ready(ev)
            lats.append((time.perf_counter() - t0) * 1e3)
        group_ms = _percentiles(lats)
        streams_wall = B * seq * 0.03 / (np.median(lats) * 1e-3)
        print(json.dumps({
            "axis": "seq_sweep", "B": B, "seq": seq,
            "group_wall_ms": group_ms,
            "wall_streams": round(float(streams_wall), 1),
            # a detection in the group's FIRST chunk is reported after the
            # remaining (seq-1) chunks were buffered (30 ms audio each) and
            # the whole group was computed
            "worst_event_latency_ms": round(
                (seq - 1) * 30.0 + group_ms["p50"], 1
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
