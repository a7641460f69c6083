"""Throughput benchmark: batched streaming wakeword detection on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: real-time 16 kHz audio streams sustainable per chip (= audio-seconds
processed per wall second). North star (BASELINE.json): ≥100k streams per
v5e-16 ⇒ 6250 streams/chip; vs_baseline is the fraction of that per-chip
target. The workload matches BASELINE.json config[3]: batched concurrent
streams, DTW wakeword (5 templates, lens 92-100 × 16 coeffs) + avg-template
gate, full front-end.

Correctness guard: before the timed loop, stream 0 plays a real utterance of
the benched wakeword (the templates are MFCCs of synthesized audio, not
random matrices) through the same jitted step at the same batch size, and the
bench asserts the detection fires — a perf regression that breaks detection
semantics fails the bench instead of reporting a number.

Mesh mode (`--mesh N`, BASELINE.json config[4] harness): shards the same
workload over an N-device `streams` mesh via shard_map, reporting per-chip
throughput and scaling efficiency vs a single-device run at B/N. Works today
on the virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) and on any real slice.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PER_CHIP_TARGET = 100_000 / 16


def build_bench_wakeword(mfcc_size: int = 16):
    """5-template DTW wakeword from synthesized utterances (chirp + noise),
    lens 100/98/96/94/92 × mfcc_size — the r1 bench shapes, but with real
    audio behind them so detection is testable. Returns (wakeword, utterance)."""
    import jax

    from rustpotter_tpu.mfcc.averager import average_templates
    from rustpotter_tpu.mfcc.offline import mfcc_pipeline
    from rustpotter_tpu.wakewords.files import WakewordRef

    words = []
    for i in range(5):
        frames = 100 - 2 * i
        n = (frames + 3) * 160
        rng = np.random.default_rng(100 + i)
        t = np.arange(n) / 16000.0
        sig = 0.35 * np.sin(
            2 * np.pi * np.cumsum(250 + 900 * t / t[-1]) / 16000.0
        ) + 0.02 * rng.normal(size=n)
        words.append(sig.astype(np.float32))
    # build-time MFCCs on the host CPU backend: 5 distinct shapes would
    # otherwise each pay a TPU compile before the bench even starts
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        feats = {
            f"s{i}.wav": np.asarray(mfcc_pipeline(w, mfcc_size + 1))
            for i, w in enumerate(words)
        }
    items = sorted(feats.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    avg = average_templates([m for _, m in items])
    ww = WakewordRef(
        name="bench", samples_features=feats, avg_features=avg, rms_level=0.05
    )
    return ww, words[0]


def correctness_pass(det, jnp, jax, B, utterance, noise_frames):
    """Stream 0: silence prefill + the utterance + silence tail; all other
    streams noise. Asserts stream 0 fires with the benched wakeword."""
    F = det.static.max_mfcc_frames
    prefill = (F // 3 + 4) * 480
    # the tail must outlast the window (the word keeps matching while any of
    # it remains in the F-frame window) plus the F/2 countdown
    tail = ((F + F // 2 + 30) // 3) * 480
    stream0 = np.concatenate(
        [np.zeros(prefill, np.float32), utterance, np.zeros(tail, np.float32)]
    )
    n_chunks = len(stream0) // 480
    stream0 = stream0[: n_chunks * 480].reshape(n_chunks, 480)
    states = det.init_states()
    fired0 = 0
    for t in range(n_chunks):
        frames = noise_frames.at[0].set(jnp.asarray(stream0[t]))
        states, ev = det.process_chunk(det.params, states, frames)
        fired0 += int(np.asarray(ev.fired)[0])
    assert fired0 >= 1, "correctness guard: benched wakeword did not fire"
    return fired0


def timed_loop(det, jax, states, frames, T, seq=1):
    """Advance every stream T chunks; returns elapsed wall seconds.

    seq > 1 groups `seq` 30 ms chunks into one process_sequence dispatch
    (a lax.scan — one XLA call per seq·30 ms of audio per stream). This
    amortizes per-dispatch host/RPC overhead, which through the remote
    tunnel of this bench environment is NOT representative of a colocated
    serving host; the device-op time per chunk (tools/step_trace.py) is
    identical either way. The added serving latency is seq·30 ms."""
    import jax.numpy as jnp

    if seq > 1:
        fseq = jnp.broadcast_to(frames[None], (seq,) + frames.shape)
        states, _ = det.process_sequence(det.params, states, fseq)  # warmup
        jax.block_until_ready(states)
        rounds = -(-T // seq)
        t0 = time.perf_counter()
        for _ in range(rounds):
            states, events = det.process_sequence(det.params, states, fseq)
        jax.block_until_ready(states)
        return (time.perf_counter() - t0) * (T / (rounds * seq))
    states, _ = det.process_chunk(det.params, states, frames)  # warmup/compile
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(T):
        states, events = det.process_chunk(det.params, states, frames)
    jax.block_until_ready(states)
    return time.perf_counter() - t0


def main():
    import jax

    # the axon sitecustomize ignores the JAX_PLATFORMS env var; honor an
    # explicit =cpu request so `JAX_PLATFORMS=cpu bench.py --mesh 8` works
    # on the virtual CPU mesh (docs/MULTIHOST.md). Other values are left to
    # the sitecustomize — forcing 'axon' here would also hide the cpu
    # backend that build_bench_wakeword uses for host-side MFCCs.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.batch import BatchedDetector

    mesh_n = 0
    if "--mesh" in sys.argv:
        mesh_n = int(sys.argv[sys.argv.index("--mesh") + 1])

    B = int(os.environ.get("BENCH_STREAMS", "8192"))
    T = int(os.environ.get("BENCH_CHUNKS", "34"))  # ~1 s of audio per stream
    # chunks per dispatch (see timed_loop): default 16 = 480 ms dispatch
    # granularity. The bench tunnel adds several ms of RPC overhead per
    # dispatch that a colocated serving host does not see (device-op time
    # per chunk is unchanged — tools/step_trace.py); grouping amortizes it
    # (r5 sweep at B=8192: wall 64.8k/69.7k/72.7k streams at SEQ 8/16/32
    # vs 84.3k device-bound). This is a THROUGHPUT metric; the serving
    # latency/grouping trade is recorded in BENCH_SUITE.md's latency
    # section, and the recommended colocated serving config is seq=1.
    SEQ = int(os.environ.get("BENCH_SEQ", "16"))

    ww, utterance = build_bench_wakeword()
    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2

    rng = np.random.default_rng(0)

    if mesh_n:
        from rustpotter_tpu.parallel.mesh import StreamSharding, make_stream_mesh

        devices = jax.devices()[:mesh_n]
        assert len(devices) == mesh_n, f"need {mesh_n} devices, have {len(jax.devices())}"
        assert B % mesh_n == 0
        mesh = make_stream_mesh(devices)
        sharding = StreamSharding(mesh)
        det = BatchedDetector([("w", ww)], cfg, batch_size=B, sharding=sharding)
        frames = jax.device_put(
            jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32)),
            sharding.state,
        )
        elapsed = timed_loop(det, jax, det.init_states(), frames, T, seq=SEQ)
        total_rt = B * T * 0.03 / elapsed
        # single-device reference at the same per-device load
        det1 = BatchedDetector([("w", ww)], cfg, batch_size=B // mesh_n)
        frames1 = jnp.asarray(rng.normal(0, 0.05, (B // mesh_n, 480)).astype(np.float32))
        elapsed1 = timed_loop(det1, jax, det1.init_states(), frames1, T, seq=SEQ)
        single_rt = (B // mesh_n) * T * 0.03 / elapsed1
        per_chip = total_rt / mesh_n
        print(
            json.dumps(
                {
                    "metric": "realtime_16khz_streams_per_chip[mesh]",
                    "value": round(per_chip, 1),
                    "unit": "streams (audio-sec/s)",
                    "vs_baseline": round(per_chip / PER_CHIP_TARGET, 4),
                    "mesh_devices": mesh_n,
                    "total_streams_rt": round(total_rt, 1),
                    "single_device_streams_rt": round(single_rt, 1),
                    "scaling_efficiency": round(per_chip / single_rt, 4),
                }
            )
        )
        return

    det = BatchedDetector([("w", ww)], cfg, batch_size=B)
    noise_frames = jnp.asarray(rng.normal(0, 0.05, (B, 480)).astype(np.float32))

    if os.environ.get("BENCH_SKIP_CORRECTNESS") != "1":
        correctness_pass(det, jnp, jax, B, utterance, noise_frames)

    elapsed = timed_loop(det, jax, det.init_states(), noise_frames, T, seq=SEQ)
    streams_rt = B * T * 0.03 / elapsed
    print(
        json.dumps(
            {
                "metric": "realtime_16khz_streams_per_chip",
                "value": round(streams_rt, 1),
                "unit": "streams (audio-sec/s)",
                "vs_baseline": round(streams_rt / PER_CHIP_TARGET, 4),
                "chunks_per_dispatch": SEQ,
            }
        )
    )


if __name__ == "__main__":
    main()
