"""NN serving-precision campaign: does DEFAULT (1-pass bf16) hold the
golden bands? (round 5 — the headroom note in docs/NN_STEP_TRACE_r05.md)

The NN serving tier is HIGH (3-pass bf16). DEFAULT would roughly halve the
NN GEMM + let the MFCC DFT drop too — but logits move ~3e-3 relative and
the counter bands (CPU ±1 / on-chip ±2) are the risk. This probe runs, at
each precision, ON-CHIP:

  1. the ok_casa NN golden e2e (host-resampled 16 kHz frames, B=32 —
     the tools/tpu_parity.py NN flow): detections, score, counter, logit
     payload vs the documented bands (score 0.9997649 ± 1e-3, counter
     34 ± 2, one detection, all streams identical);
  2. a pure-noise serving batch at B=8192 (no mass-firing, finite
     scores) + the traced device time per chunk.

Usage: python tools/nn_precision_probe.py [HIGH DEFAULT ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

RES = os.environ.get("RUSTPOTTER_REF_RESOURCES", "/root/reference/tests/resources")


def run(prec_name: str):
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig
    from rustpotter_tpu.config import AudioFmt, SampleFormat
    from rustpotter_tpu.audio.encoder import AudioEncoder
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from rustpotter_tpu.wakewords import nn as nn_mod
    from rustpotter_tpu.wakewords.files import load_wakeword
    from rustpotter_tpu.utils.wav import read_wav
    from kernel_probe import trace_kernel_us
    from bench_suite import _nn_wakeword

    nn_mod._PRECISION_SERVING = getattr(jax.lax.Precision, prec_name)
    out = {"precision": prec_name}

    # --- 1. ok_casa golden e2e (host-resampled, like tools/tpu_parity.py)
    nn = load_wakeword(os.path.join(RES, "ok_casa-tiny.rpw"))
    wav, spec = read_wav(os.path.join(RES, "ok_casa.wav"))
    fmt = AudioFmt(sample_rate=spec.sample_rate,
                   sample_format=SampleFormat.F32, channels=1)
    enc = AudioEncoder(fmt, 30, 16000)
    stream = np.concatenate(
        [np.asarray(wav, np.float32), np.zeros(spec.sample_rate * 5, np.float32)]
    )
    n_in = enc.input_samples_per_frame
    nch = len(stream) // n_in
    frames16 = np.concatenate([
        enc.rencode_and_resample(stream[i * n_in:(i + 1) * n_in])
        for i in range(nch)
    ]).reshape(-1, 480)
    B = 32
    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.0
    det = BatchedDetector([("ok_casa", nn)], cfg, batch_size=B)
    st = det.init_states()
    batch = jnp.broadcast_to(
        jnp.asarray(frames16)[:, None, :], (len(frames16), B, 480)
    )
    st, ev = det.process_sequence(det.params, st, batch)
    fired = np.asarray(ev.fired)
    out["streams_agree"] = bool((fired == fired[:, :1]).all())
    t = np.nonzero(fired[:, 0])[0]
    out["n_detections"] = int(len(t))
    if len(t):
        out["score"] = round(float(np.asarray(ev.score)[t[0], 0]), 7)
        out["counter"] = int(np.asarray(ev.counter)[t[0], 0])
        sc = np.asarray(ev.scores)[t[0], 0]
        out["logit_margin"] = round(float(abs(sc[0] - sc[1])), 3)
    out["band_ok"] = bool(
        len(t) == 1 and out["streams_agree"]
        and abs(out.get("score", 0) - 0.9997649) < 1e-3
        and abs(out.get("counter", 0) - 34) <= 2
        and abs(out.get("logit_margin", 0) - 20.58) <= 1.5
    )

    # --- 2. serving-shape noise sanity + device time
    det2 = BatchedDetector([("m", _nn_wakeword())], cfg, batch_size=8192)
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.normal(0, 0.05, (8192, 480)).astype(np.float32))
    holder = {"s": det2.init_states()}

    def stepfn():
        holder["s"], ev = det2.process_chunk(det2.params, holder["s"], noise)
        return holder["s"], ev

    s, ev2 = stepfn()
    jax.block_until_ready((s, ev2))
    for _ in range(2):
        s, ev2 = stepfn()
    jax.block_until_ready(s)
    out["noise_fired_frac"] = round(float(np.asarray(ev2.fired).mean()), 4)
    out["scores_finite"] = bool(np.isfinite(np.asarray(ev2.score)).all())
    ops = trace_kernel_us(lambda: stepfn()[0], (), 12, top=4)
    dev_us = max((us for nm, us in ops.items() if nm.startswith("jit_")),
                 default=0.0)
    out["device_us_per_chunk"] = round(dev_us, 1)
    out["device_bound_streams"] = round(8192 * 0.03 / (dev_us * 1e-6), 1) \
        if dev_us else 0.0
    return out


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for prec in (sys.argv[1:] or ["HIGH", "DEFAULT"]):
        print(run(prec), flush=True)


if __name__ == "__main__":
    main()
