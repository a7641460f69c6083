"""Identify rubato's f32 frequency-domain filter table from the committed
golden and measure the f32 resampler oracle's bit-exactness.

Key observation: rubato's resample_unit multiplies the 1441-bin input
spectrum by filter_f and TRUNCATES to 481 bins before the inverse FFT —
so only filter_f[0..480] ever reaches the output, and each golden chunk
is (up to f32 rounding) LINEAR in those 481 complex values:

    golden_c / gain_c = head(IRFFT(spec_c * f)) + tail(IRFFT(spec_{c-1} * f))

That makes the table recoverable by least squares over the 356 chunks of
`gain-normalizer_example.wav` (= resample(real_sample.wav) x stepwise
quantized gain, /root/reference/src/audio/gain_normalizer_filter.rs:81-131)
WITHOUT knowing rubato's window/sinc/cutoff construction arithmetic at all.
The LS is then ITERATED against the f32 oracle's own outputs: the model
residual r_c = golden_c/g_c - oracle_c is re-projected onto the (linear)
filter coordinates, so the recovered table is the one that best explains
the golden UNDER THE ORACLE'S f32 ARITHMETIC — per-bin f32 rounding of the
table included. Provenance, like round 1's cutoff fit, is from committed
reference artifacts; docs/NN_EXACTNESS.md carries the results.

Usage: python tools/rubato_fit.py [--save out.npz] [--iters N]
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from rustpotter_tpu.audio import resampler as rs
from rustpotter_tpu.utils.wav import read_wav

from rustpotter_tpu.audio import rustfft_f32 as ro

RES = "/root/reference/tests/resources"
N_IN, N_OUT = 1440, 480
F32 = np.float32


def f32_seq_rms(x: np.ndarray) -> np.float32:
    """Rust get_rms_level: sequential f32 sum of squares, /len, sqrt."""
    sq = (x.astype(F32) * x.astype(F32)).astype(F32)
    s = np.cumsum(sq, dtype=F32)[-1]
    return np.sqrt(F32(s / F32(len(x))))


def f32_gain(rms: np.float32, rms_ref: float = 0.003,
             min_gain: float = 0.1, max_gain: float = 1.0) -> np.float32:
    """gain_normalizer_filter.rs:14-38, window_size=1, f32 ops; Rust
    f32::round = half away from zero (gain is positive)."""
    if rms == 0.0:
        return F32(1.0)
    # gain = rms_level_sqrt / rms.sqrt(), rounded to 0.1 steps, clamped
    ratio = F32(np.sqrt(F32(rms_ref))) / np.sqrt(F32(rms))
    g = F32(np.floor(F32(ratio * F32(10.0)) + F32(0.5))) / F32(10.0)
    return F32(np.clip(g, min_gain, max_gain))


def apply_gain(y: np.ndarray, g: np.float32) -> np.ndarray:
    if g == F32(1.0):
        return y.astype(F32)
    return np.clip((y.astype(F32) * g).astype(F32), F32(-1.0), F32(1.0))


class LinearModel:
    """f64 linear model golden_c/g_c = H_c @ [Re f; Im f] with the one-chunk
    overlap carry. With nyq=True the 481st output-spectrum bin is the
    filtered INPUT Nyquist bin (rubato's downsampling quirk hypothesis), so
    unknown #480 pairs with input bin 1440 instead of 480."""

    def __init__(self, x48: np.ndarray, n_chunks: int, nyq: bool = False):
        self.nc = n_chunks
        self.specs = np.empty((n_chunks, 481), np.complex128)
        for c in range(n_chunks):
            buf = np.zeros(2 * N_IN)
            buf[:N_IN] = x48[c * N_IN:(c + 1) * N_IN]
            full = np.fft.rfft(buf)
            self.specs[c] = full[:481]
            if nyq:
                self.specs[c][480] = full[1440]
        eye = np.eye(481, dtype=np.complex128)
        self.Wr = np.fft.irfft(eye, 960) * 960.0       # (481, 960)
        self.Wi = np.fft.irfft(1j * eye, 960) * 960.0

    def iter_H(self):
        prev_tail = None
        for c in range(self.nc):
            d = self.specs[c]
            Gr = self.Wr * d.real[:, None] + self.Wi * d.imag[:, None]
            Gi = self.Wi * d.real[:, None] - self.Wr * d.imag[:, None]
            head = np.concatenate([Gr[:, :480], Gi[:, :480]], axis=0).T
            tail = np.concatenate([Gr[:, 480:], Gi[:, 480:]], axis=0).T
            H = head if prev_tail is None else head + prev_tail
            prev_tail = tail
            yield c, H

    def normal_matrix(self):
        A = np.zeros((962, 962))
        for _, H in self.iter_H():
            A += H.T @ H
        return A

    def project(self, resids: np.ndarray) -> np.ndarray:
        """resids (nc, 480) -> b = sum H^T r."""
        b = np.zeros(962)
        for c, H in self.iter_H():
            b += H.T @ resids[c]
        return b


def main():
    iters = 5
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    nyq = "--nyq" in sys.argv
    if "--fft45" in sys.argv:
        ro.FFT45_VARIANT = sys.argv[sys.argv.index("--fft45") + 1]
        print(f"fft45 variant: {ro.FFT45_VARIANT}")
    if "--cfft-f64" in sys.argv:
        ro.CFFT_F64 = True
        print("complex FFTs inside realfft wrappers: f64-rounded")
    if "--fma-cmul" in sys.argv:
        ro.FMA_CMUL = "avx"
        print("cmul: AVX fmaddsub contraction (r5 SIMD experiment)")
    fwd_f64 = "--fwd-f64" in sys.argv
    inv_f64 = "--inv-f64" in sys.argv
    if fwd_f64 or inv_f64:
        print(f"stage swap: fwd_f64={fwd_f64} inv_f64={inv_f64}")
    x48, _ = read_wav(f"{RES}/real_sample.wav")
    gold, _ = read_wav(f"{RES}/gain-normalizer_example.wav")
    nc = min(len(x48) // N_IN, len(gold) // N_OUT)
    chunks = x48[: nc * N_IN].astype(F32).reshape(nc, N_IN)
    gold_c = gold[: nc * N_OUT].astype(F32).reshape(nc, N_OUT)
    print(f"chunks: {nc}")

    model = LinearModel(x48, nc, nyq=nyq)
    print("building normal matrix...")
    A = model.normal_matrix()
    Ainv = np.linalg.inv(A + 1e-9 * np.eye(962))

    # start from the repo's f64-designed filter (round-1 identified cutoff)
    f = np.fft.rfft(rs.design_filter(N_IN, N_OUT))[:481].copy()

    for it in range(iters):
        FR = np.zeros(N_IN + 1, F32)
        FI = np.zeros(N_IN + 1, F32)
        FR[:481] = f.real.astype(F32)
        FI[:481] = f.imag.astype(F32)
        FI[0] = 0.0
        if nyq:
            # unknown #480 is the filter's INPUT-Nyquist coefficient
            FR[1440], FI[1440] = FR[480], FI[480]
            FR[480] = FI[480] = 0.0
        y = ro.rubato_resample_batch(chunks, FR, FI, nyquist_override=nyq,
                                     fwd_f64=fwd_f64, inv_f64=inv_f64)
        gains = np.array([f32_gain(f32_seq_rms(y[c])) for c in range(nc)])
        out = np.stack([apply_gain(y[c], gains[c]) for c in range(nc)])
        same = out.view(np.int32) == gold_c.view(np.int32)
        exact = int(same.sum())
        maxdiff = float(np.abs(out - gold_c).max())
        print(f"iter {it}: bit-exact {exact}/{nc * N_OUT} "
              f"({100.0 * exact / (nc * N_OUT):.2f}%), max|diff| {maxdiff:.3e}")
        if it == iters - 1:
            break
        resids = gold_c.astype(np.float64) / gains[:, None] - y.astype(np.float64)
        du = Ainv @ model.project(resids)
        f = f + (du[:481] + 1j * du[481:])

    if "--save" in sys.argv:
        outp = sys.argv[sys.argv.index("--save") + 1]
        np.savez(outp, filter_re=FR, filter_im=FI)
        print(f"saved table -> {outp}")


if __name__ == "__main__":
    main()
