"""Measure the MFCC front-end's HIGH-vs-HIGHEST matmul-precision delta on
real audio, ON-CHIP (VERDICT r4 next #1c: "try the MFCC GEMM chain at HIGH
with a batched-vs-single tolerance measurement").

The serving chunk runs the 6 DFT GEMMs per chunk at HIGH (3-pass bf16);
the single-stream parity path keeps HIGHEST. This probe frames every golden
wav the detection suites use, runs mfcc_from_frames at both precisions on
the TPU, and reports the absolute/relative deltas — the number the serving
tier's tolerance note in ops/frontend.py cites. It also reports the delta
against the CPU float32 reference chain (the quantity the 2.2e-5 parity
contract is written against).

Usage: python tools/mfcc_precision_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = os.environ.get("RUSTPOTTER_REF_RESOURCES", "/root/reference/tests/resources")
WAVS = [
    "alexa.wav", "alexa2.wav", "alexa3.wav", "ok_casa.wav",
    "oye_casa_g_1.wav", "oye_casa_g_2.wav", "oye_casa_real_1.wav",
]


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp

    from rustpotter_tpu.ops import frontend
    from rustpotter_tpu.utils.wav import read_wav

    consts = frontend.get_constants(17)
    frames_all = []
    for w in WAVS:
        path = os.path.join(RES, w)
        if not os.path.exists(path):
            continue
        wav, spec = read_wav(path)
        if spec.sample_rate != 16000:
            continue
        samples = np.asarray(wav, np.float32)
        if samples.ndim > 1:
            samples = samples.mean(axis=-1)
        n_shifts = len(samples) // 160
        shifts = samples[: n_shifts * 160].reshape(n_shifts, 160)
        pre = np.asarray(frontend.pre_emphasis(jnp.asarray(shifts)))
        fr = np.asarray(frontend.frames_from_shifts(jnp.asarray(pre)))
        frames_all.append(fr)
    frames = np.concatenate(frames_all)  # (N, 480)
    print(f"{frames.shape[0]} frames from {len(frames_all)} wavs")

    P = jax.lax.Precision
    fhi = jax.jit(lambda x: frontend.mfcc_from_frames(x, consts, precision=P.HIGHEST))
    fme = jax.jit(lambda x: frontend.mfcc_from_frames(x, consts, precision=P.HIGH))
    x = jnp.asarray(frames)
    hi = np.asarray(fhi(x))
    me = np.asarray(fme(x))
    # CPU f32 reference chain (true f32 matmuls — what the parity contract
    # compares against)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        ref = np.asarray(
            jax.jit(lambda x: frontend.mfcc_from_frames(x, consts))(frames)
        )
    scale = np.abs(ref).max()
    for name, a in (("HIGHEST", hi), ("HIGH", me)):
        d = np.abs(a - ref)
        print(
            f"on-chip {name:7s} vs CPU-f32: max abs {d.max():.3e}  "
            f"p99.9 {np.percentile(d, 99.9):.3e}  rel-to-range {d.max()/scale:.3e}"
        )
    d = np.abs(hi - me)
    print(f"on-chip HIGH vs HIGHEST:     max abs {d.max():.3e}  "
          f"p99.9 {np.percentile(d, 99.9):.3e}")


if __name__ == "__main__":
    main()
