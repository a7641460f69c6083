"""On-chip resample-GEMM precision experiment (VERDICT r4 next #5).

dtw_48k pays ~867 us/chunk over dtw_max for ONE (n_in, 2·n_out) MXU GEMM at
HIGHEST (audio/resampler.py). This probe decides whether HIGH (3-pass bf16,
~half the cost) holds every documented band, ON-CHIP:

  1. waveform delta: in-graph resampled ok_casa 48 kHz audio, HIGH vs
     HIGHEST vs the host f32-oracle output;
  2. the ok_casa NN golden e2e THROUGH the in-graph resampler at both
     precisions (detection count, label, score band, counter band, logit
     margin), plus 5 s of trailing digital silence as a no-fire guard —
     the log-mel front-end's measured silence sensitivity (±8 logits per
     1e-7 waveform noise, docs/NN_EXACTNESS.md) is exactly what HIGH's
     extra rounding could excite.

Usage: python tools/resample_precision_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = os.environ.get("RUSTPOTTER_REF_RESOURCES", "/root/reference/tests/resources")


def run_e2e(precision: str):
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig, SampleFormat
    from rustpotter_tpu.audio import resampler as rs
    from rustpotter_tpu.runtime.batch import BatchedDetector
    from rustpotter_tpu.wakewords.files import load_wakeword
    from rustpotter_tpu.utils.wav import read_wav

    rs.GEMM_PRECISION = precision
    nn = load_wakeword(os.path.join(RES, "ok_casa-tiny.rpw"))
    wav, spec = read_wav(os.path.join(RES, "ok_casa.wav"))
    assert spec.sample_rate == 48000, spec
    stream = np.concatenate(
        [np.asarray(wav, np.float32), np.zeros(spec.sample_rate * 5, np.float32)]
    )
    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.0
    cfg.fmt.sample_rate = 48000
    cfg.fmt.sample_format = SampleFormat.F32
    cfg.fmt.channels = 1
    B = 4
    det = BatchedDetector([("ok_casa", nn)], cfg, batch_size=B,
                          in_graph_resample=True)
    n_in = det.static.input_samples
    nch = len(stream) // n_in
    frames = jnp.broadcast_to(
        jnp.asarray(stream[: nch * n_in].reshape(nch, 1, n_in)), (nch, B, n_in)
    )
    st = det.init_states()
    st, ev = det.process_sequence(det.params, st, frames)
    fired = np.asarray(ev.fired)
    assert (fired == fired[:, :1]).all(), "streams disagree"
    t = np.nonzero(fired[:, 0])[0]
    out = {
        "precision": precision,
        "n_detections": int(len(t)),
    }
    if len(t):
        out["score"] = float(np.asarray(ev.score)[t[0], 0])
        out["counter"] = int(np.asarray(ev.counter)[t[0], 0])
        sc = np.asarray(ev.scores)[t[0], 0]
        out["logits"] = [round(float(x), 4) for x in sc[:2]]
        out["logit_margin"] = round(float(sc[0] - sc[1]), 4)
        # trailing-silence no-fire guard: a legitimate detection emits up to
        # window + countdown frames after the word (the partial countdown
        # spans ~F/2 30 ms chunks); only fires well past that horizon are
        # resample-noise on digital silence
        F = det.static.max_mfcc_frames
        wav_chunks = len(np.asarray(wav)) // n_in + F
        out["fires_in_silence"] = int((t > wav_chunks).sum())
    return out


def waveform_delta():
    import jax
    import jax.numpy as jnp

    from rustpotter_tpu.audio import resampler as rs
    from rustpotter_tpu.utils.wav import read_wav

    wav, spec = read_wav(os.path.join(RES, "ok_casa.wav"))
    x = np.asarray(wav, np.float32)
    n_in = 1440
    nch = len(x) // n_in
    chunks = jnp.asarray(x[: nch * n_in].reshape(nch, n_in))
    outs = {}
    for prec in ("HIGHEST", "HIGH"):
        rs.GEMM_PRECISION = prec
        fn = rs.make_jax_resampler(1440, 480)

        def run(chunks):
            def body(ov, ch):
                ov, y = fn(ov, ch)
                return ov, y

            _, ys = jax.lax.scan(body, jnp.zeros((480,), jnp.float32), chunks)
            return ys

        outs[prec] = np.asarray(jax.jit(run)(chunks))
    d = np.abs(outs["HIGH"] - outs["HIGHEST"])
    print(f"waveform HIGH vs HIGHEST: max abs {d.max():.3e}  "
          f"p99.9 {np.percentile(d, 99.9):.3e}  (signal rms "
          f"{np.sqrt((outs['HIGHEST']**2).mean()):.3e})")


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    waveform_delta()
    for prec in ("HIGHEST", "HIGH"):
        print(run_e2e(prec))


if __name__ == "__main__":
    main()
