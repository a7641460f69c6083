"""Decisive experiment (VERDICT r2 #2): does the rustfft-order f32 oracle
reproduce the reference's committed MFCC features bit-for-bit — and if not,
where does the residual live?

Target: /root/reference/tests/resources/oye_casa_g.rpw holds the f32 MFCC
template matrices exactly as the Rust build path produced them
(wakeword_ref_build.rs:42-88 -> wav_file_extractor.rs:18-68 ->
extractor.rs). Every stage after the FFT is sequential scalar f32 Rust with
a defined accumulation order, re-derived here op by op; the FFT is the
rustfft 6.1 scalar plan from tools/rustfft_oracle.py. If the whole chain is
right, the .rpw floats match exactly — thousands of values, a far denser
signal than the two NN logits.

RESULTS (2026-08-20, committed in docs/NN_EXACTNESS.md):
  - oracle vs oye_casa_g.rpw: 31% of feature floats bit-exact, ulp p50=2
    (with glibc libm float routines; 24% with f64-rounded transcendentals).
  - an f64-perfect FFT scores WORSE (21% exact): the rustfft plan structure
    (MixedRadix(Butterfly32 split-radix, GoodThomasSmall(3,5))) is
    validated — its f32 rounding pattern correlates with the goldens beyond
    any "perfect" FFT.
  - 1-ulp FFT perturbation -> ~1 ulp feature wobble (amplification ~1);
    the 2-ulp residual is consistent with 1-ulp libm table differences
    (cosf/logf of the machine that generated the goldens).
  - the NN logit chain is NOT feature-chaotic: +-2ulp feature noise ->
    3e-6 logit delta. But ok_casa.wav has rms 6.4e-4; log-mel of its
    near-silent bins amplifies *waveform* noise at the f32 floor (1e-7
    absolute) into +-8 logit swings. Exact-logit parity therefore requires
    a BIT-EXACT rubato resampler; ours is at the f32 floor (8.9e-8 vs the
    committed full-band golden) and that is still +-8 logits of slack.

Usage:
  python tools/fft_oracle_experiment.py [wav_index 1-5]   # stage-1 features
  python tools/fft_oracle_experiment.py sensitivity       # amplification
Reports exact-match fraction and ulp-distance histograms.
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from rustfft_oracle import fft480

F32 = np.float32
RES = "/root/reference/tests/resources"


def _load_libm():
    """Bind glibc's float32 cosf/logf/expf — Rust f32::cos/ln/exp lower to
    these on a glibc target, and using them (vs f64-rounded) measurably
    improves golden exactness (0.24 -> 0.31): the goldens were produced on a
    glibc machine."""
    import ctypes

    try:
        libm = ctypes.CDLL("libm.so.6")
    except OSError:
        return None
    table = {}
    for pyfn, cname in ((math.cos, "cosf"), (math.log, "logf"), (math.exp, "expf")):
        cf = getattr(libm, cname)
        cf.restype = ctypes.c_float
        cf.argtypes = [ctypes.c_float]
        table[pyfn] = cf
    return table


_LIBM = _load_libm()


def f32_math(fn, x):
    """Rust libm float fn: glibc float32 routine when available, else
    f64-op-rounded-to-f32 (a correctly-rounded approximation)."""
    if _LIBM is not None and fn in _LIBM:
        return F32(_LIBM[fn](float(F32(x))))
    return F32(fn(float(F32(x))))


def hamming_window_f32(n: int) -> np.ndarray:
    # extractor.rs:115-120: 0.54 - (0.46 * (2. * PI * (s/(n-1))).cos())
    two_pi = F32(2.0) * F32(math.pi)  # f32 product, left-to-right
    out = np.empty(n, F32)
    for s in range(n):
        ratio = F32(s) / F32(n - 1)
        arg = two_pi * ratio
        out[s] = F32(0.54) - (F32(0.46) * f32_math(math.cos, arg))
    return out


def mel_filter_bank_f32(sample_rate: int, mss: int, num_coefficients: int):
    # extractor.rs:164-198 in exact f32
    def freq_to_mel(freq: int) -> np.float32:
        # 1127. * (1. + (f as f32 / 700.0)).ln()
        x = F32(1.0) + (F32(freq) / F32(700.0))
        return F32(1127.0) * f32_math(math.log, x)

    max_mel = F32(math.floor(freq_to_mel(sample_rate // 2)))
    min_mel = F32(math.floor(freq_to_mel(0)))
    centres = []
    for i in range(num_coefficients + 2):
        f = F32(i) * (max_mel - min_mel) / F32(num_coefficients + 1) + min_mel
        tmp = f32_math(math.log, F32(1.0) + F32(1000.0) / F32(700.0)) / F32(1000.0)
        tmp = (f32_math(math.exp, f * tmp) - F32(1.0)) / (F32(sample_rate) / F32(2.0))
        centres.append(int(math.floor(F32(0.5) + F32(700.0) * F32(mss) * tmp)))
    fb = np.zeros((num_coefficients, mss), F32)
    for i in range(num_coefficients):
        b, c, e = centres[i], centres[i + 1], centres[i + 2]
        for k in range(b, c):
            fb[i, k] = F32(k - b) / F32(c - b)
        for k in range(c, e):
            fb[i, k] = F32(e - k) / F32(e - c)
    return fb


def dct_cos_table_f32(n: int) -> np.ndarray:
    # extractor.rs:146-163: (pi_over_n * (j + 0.5) * k).cos(), args in f32
    pi_over_n = F32(math.pi) / F32(n)
    tbl = np.empty((n, n), F32)  # [k, j]
    for k in range(n):
        for j in range(n):
            arg = (pi_over_n * (F32(j) + F32(0.5))) * F32(k)
            tbl[k, j] = f32_math(math.cos, arg)
    return tbl


F32_MIN_POSITIVE = F32(1.1754943508222875e-38)


class OracleExtractor:
    """extractor.rs re-derived, f32 op order preserved, batched over frames
    only where order-free (elementwise)."""

    def __init__(self, num_coefficients: int, fft=fft480):
        self.nc = num_coefficients
        self.ham = hamming_window_f32(480)
        self.fb = mel_filter_bank_f32(16000, 240, num_coefficients)
        self.dct = dct_cos_table_f32(num_coefficients)
        self.fft = fft

    def frames_from_samples(self, samples: np.ndarray) -> np.ndarray:
        """Reproduce compute(): chunks of 160, sliding 480 buffer; first
        frame once 480 buffered (frame t = shifts [t+1..t+3] pre-emphasized,
        with per-shift carry reset)."""
        n_shift = len(samples) // 160
        shifts = samples[: n_shift * 160].reshape(n_shift, 160).astype(F32)
        prev = np.concatenate([np.zeros((n_shift, 1), F32), shifts[:, :-1]], axis=1)
        pre = shifts - F32(0.97) * prev
        flat = pre.reshape(-1)
        frames = []
        # buffer fills with shifts 0..2 (len 480 after 3), first emit at shift 3
        for t in range(3, n_shift):
            frames.append(flat[(t - 2) * 160 : (t - 2) * 160 + 480])
        return np.stack(frames) if frames else np.zeros((0, 480), F32)

    def magnitude_spectrum(self, frames: np.ndarray) -> np.ndarray:
        re = frames * self.ham[None, :]
        im = np.zeros_like(re)
        fr, fi = self.fft(re, im)
        return np.sqrt((fr[:, :240] * fr[:, :240]) + (fi[:, :240] * fi[:, :240]))

    def mfccs(self, frames: np.ndarray) -> np.ndarray:
        ms = self.magnitude_spectrum(frames)
        F = ms.shape[0]
        # mel: per coeff, sequential sum over j of (ms*ms)*fb  (iterator order)
        mel = np.zeros((F, self.nc), F32)
        for i in range(self.nc):
            acc = np.zeros(F, F32)
            for j in range(240):
                acc = acc + (ms[:, j] * ms[:, j]) * self.fb[i, j]
            mel[:, i] = acc
        logmel = np.empty_like(mel)
        for i in range(self.nc):
            for f in range(F):
                logmel[f, i] = f32_math(math.log, mel[f, i] + F32_MIN_POSITIVE)
        # DCT: out[k] = 2 * sequential-sum_j x[j]*cos[k, j]
        out = np.zeros((F, self.nc), F32)
        for k in range(self.nc):
            acc = np.zeros(F, F32)
            for j in range(self.nc):
                acc = acc + logmel[:, j] * self.dct[k, j]
            out[:, k] = F32(2.0) * acc
        return out[:, 1:]  # drop coefficient 0


def cmn_f32(frames: np.ndarray) -> np.ndarray:
    # normalizer.rs: sequential f32 sum over frames, subtract sum/n
    n, c = frames.shape
    s = np.zeros(c, F32)
    for i in range(n):
        s = s + frames[i]
    return frames - (s / F32(n))[None, :]


def wav_i16_to_f32(path: str) -> np.ndarray:
    import struct
    raw = open(path, "rb").read()
    # minimal RIFF parse: find 'data' chunk
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    pos = 12
    while pos < len(raw):
        cid = raw[pos : pos + 4]
        sz = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if cid == b"data":
            data = raw[pos + 8 : pos + 8 + sz]
            break
        pos += 8 + sz + (sz & 1)
    s = np.frombuffer(data, "<i2").astype(F32)
    return s / F32(32767.0)  # audio_types.rs: v as f32 / i16::MAX as f32


def ulp_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    # map to monotonic integer space
    ai = np.where(ai < 0, -(ai & 0x7FFFFFFF), ai)
    bi = np.where(bi < 0, -(bi & 0x7FFFFFFF), bi)
    return np.abs(ai - bi)


def sensitivity():
    """Measure the amplification chain that bounds NN logit parity:
    feature-ulp -> logit, and waveform -> logit on the real ok_casa stream."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rustpotter_tpu import RustpotterConfig
    from rustpotter_tpu.mfcc.offline import audio_fmt_from_spec
    from rustpotter_tpu.ops import frontend
    from rustpotter_tpu.runtime.detector import Rustpotter
    from rustpotter_tpu.utils.wav import read_wav
    from rustpotter_tpu.wakewords.files import load_wakeword
    from rustpotter_tpu.wakewords.nn import forward, params_from_tensor_data

    m = load_wakeword(os.path.join(RES, "ok_casa-tiny.rpw"))
    params = params_from_tensor_data(m.weights)
    T = m.train_size
    rng = np.random.default_rng(0)

    # 1) generic-window feature-ulp sensitivity
    win = rng.normal(0, 1.5, (T, m.mfcc_size)).astype(F32)
    win -= win.mean(0, keepdims=True)
    base = np.asarray(forward(params, jnp.asarray(win.reshape(-1))))
    ds = []
    for _ in range(20):
        bump = rng.integers(-2, 3, win.shape).astype(np.int32)
        w2 = (win.view(np.int32) + bump).view(F32)
        ds.append(np.abs(np.asarray(forward(params, jnp.asarray(w2.reshape(-1)))) - base).max())
    print(f"+-2ulp features -> logit delta: max={max(ds):.2e}")

    # 2) waveform sensitivity on the real (quiet, rms ~6e-4) ok_casa stream
    samples, spec = read_wav(os.path.join(RES, "ok_casa.wav"))
    cfg = RustpotterConfig()
    cfg.fmt = audio_fmt_from_spec(spec)
    rp = Rustpotter(cfg)
    rp.add_wakeword_from_file("w", os.path.join(RES, "ok_casa-tiny.rpw"))
    silence = np.zeros(spec.sample_rate * 5, np.float32)
    stream = np.concatenate([samples.astype(np.float32), silence])
    in_len = rp.get_samples_per_frame()
    enc = rp.wav_encoder
    s16 = np.concatenate([
        enc.rencode_and_resample(stream[i * in_len : (i + 1) * in_len])
        for i in range(len(stream) // in_len)
    ])[: 245 * 160]
    consts = frontend.get_constants(m.mfcc_size + 1)

    def logits_at(s, t):
        pre = frontend.pre_emphasis(jnp.asarray(s.reshape(-1, 160)))
        feats = np.asarray(frontend.mfcc_from_frames(frontend.frames_from_shifts(pre), consts))
        w = feats[t - T : t]
        w = w - w.mean(0, keepdims=True)
        return np.asarray(forward(params, jnp.asarray(w.reshape(-1).astype(F32))))

    base = logits_at(s16, 233)
    print(f"stream rms={float(np.sqrt((s16**2).mean())):.2e}; "
          f"t=233 logits={base}")
    for amp in (1e-7, 1e-6, 1e-5):
        d = max(
            np.abs(logits_at(s16 + rng.normal(0, amp, len(s16)).astype(F32), 233) - base).max()
            for _ in range(3)
        )
        print(f"waveform noise {amp:.0e} -> logit delta max={d:.2f}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "sensitivity":
        sensitivity()
        return
    idx = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    from rustpotter_tpu.wakewords.files import load_wakeword

    gold = load_wakeword(os.path.join(RES, "oye_casa_g.rpw"))
    key = f"oye_casa_g_{idx}.wav"
    target = np.asarray(gold.samples_features[key], F32)
    print(f"target {key}: {target.shape}")

    samples = wav_i16_to_f32(os.path.join(RES, key))
    # wav_file_extractor: chunks_exact(480) through the encoder (passthrough
    # at 16 kHz mono), then extractor per 480-chunk
    n = len(samples) // 480 * 480
    samples = samples[:n]
    ext = OracleExtractor(gold.mfcc_size + 1)
    frames = ext.frames_from_samples(samples)
    feats = ext.mfccs(frames)
    feats = cmn_f32(feats)
    print(f"oracle features: {feats.shape}")
    if feats.shape != target.shape:
        print("SHAPE MISMATCH — framing wrong"); return
    u = ulp_dist(feats, target)
    exact = float((u == 0).mean())
    print(f"exact-match fraction: {exact:.4f}")
    print(f"ulp histogram: max={u.max()}, mean={u.mean():.2f}, "
          f"p50={np.percentile(u,50):.0f}, p90={np.percentile(u,90):.0f}")
    print(f"max abs diff: {np.abs(feats-target).max():.3e}")


if __name__ == "__main__":
    main()
