"""MFCC front-end ops: pre-emphasis, framing, windowed DFT, mel filterbank, DCT.

TPU-native design: the whole frame→MFCC pipeline is expressed as two GEMMs plus
elementwise ops so it maps onto the MXU (GEMM-native NDFT — the magnitude
spectrum is |frame·W_cos + i·frame·W_sin|, the mel projection is a fixed
(240, n_coeff) matrix, and the DCT is an (n, n) matrix). Everything is batched
over a leading axis of frames (and, in the runtime, streams).

Semantics parity (values, not code) with the reference extractor
/root/reference/src/mfcc/extractor.rs:
  - pre-emphasis 0.97 applied per 160-sample shift with the carry reset to 0 at
    each shift boundary (extractor.rs:87-97 — `tmp_sample` is local per call)
  - Hamming window 0.54 - 0.46 cos(2πs/(N-1)) (extractor.rs:115-120)
  - 480-pt DFT, first 240 magnitude bins (extractor.rs:101-114)
  - triangular mel filterbank with integer-floored centre indices applied to
    squared magnitudes (extractor.rs:135-145,164-198)
  - ln(x + f32::MIN_POSITIVE) (extractor.rs:128)
  - DCT-II scaled by 2, coefficient 0 dropped by the caller (extractor.rs:146-163)
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DETECTOR_INTERNAL_SAMPLE_RATE,
    MAGNITUDE_SPECTRUM_SIZE,
    MFCCS_EXTRACTOR_PRE_EMPHASIS,
    SAMPLES_PER_FRAME,
    SAMPLES_PER_SHIFT,
)

F32_MIN_POSITIVE = np.float32(1.1754943508222875e-38)  # f32::MIN_POSITIVE

# Matmul precision for the front-end GEMMs: HIGHEST keeps true-f32 accumulation
# on the MXU (6-pass bf16 decomposition), required for golden-score parity.
# The batched serving chunk passes HIGH (3-pass bf16) instead: the r5 on-chip
# measurement over 553 golden-wav frames (tools/mfcc_precision_probe.py) puts
# HIGH at 5.9e-5 of the mfcc range vs CPU-f32 (HIGHEST: 7.3e-6) — the on-chip
# e2e golden suite (tools/tpu_parity.py) passes with this tier, and the DTW
# cosine stays a true cosine of the (noisy) window (dot and dotm derive from
# the SAME mfcc values), so silence windows cannot manufacture detections the
# way the r4 dotm-precision regression did.
_PRECISION = jax.lax.Precision.HIGHEST
_PRECISION_SERVING = jax.lax.Precision.HIGH


def hamming_window(n: int = SAMPLES_PER_FRAME) -> np.ndarray:
    s = np.arange(n, dtype=np.float32)
    return (
        np.float32(0.54)
        - np.float32(0.46) * np.cos(np.float32(2.0 * math.pi) * (s / np.float32(n - 1)))
    ).astype(np.float32)


def _frequency_to_mel(frequency: float) -> float:
    return 1127.0 * math.log(1.0 + frequency / 700.0)


def mel_filter_bank(
    sample_rate: int,
    magnitude_spectrum_size: int,
    num_coefficients: int,
    min_frequency: int = 0,
    max_frequency: int | None = None,
) -> np.ndarray:
    """(num_coefficients, magnitude_spectrum_size) triangular filterbank.

    Centre bins use the reference's exact floor-based construction
    (extractor.rs:174-181), including its idiosyncratic inverse-mel constant
    computed from ln(1 + 1000/700)/1000.
    """
    if max_frequency is None:
        max_frequency = sample_rate // 2
    max_mel = math.floor(np.float32(_frequency_to_mel(max_frequency)))
    min_mel = math.floor(np.float32(_frequency_to_mel(min_frequency)))
    centre_indices = []
    for i in range(num_coefficients + 2):
        f = np.float32(i) * (np.float32(max_mel) - np.float32(min_mel)) / np.float32(
            num_coefficients + 1
        ) + np.float32(min_mel)
        tmp = np.float32(math.log(np.float32(1.0 + 1000.0 / 700.0)) / 1000.0)
        tmp = (np.exp(np.float32(f * tmp), dtype=np.float32) - np.float32(1.0)) / (
            np.float32(sample_rate) / np.float32(2.0)
        )
        centre_indices.append(
            int(
                math.floor(
                    np.float32(0.5)
                    + np.float32(700.0) * np.float32(magnitude_spectrum_size) * tmp
                )
            )
        )
    fb = np.zeros((num_coefficients, magnitude_spectrum_size), dtype=np.float32)
    for i in range(num_coefficients):
        begin, centre, end = centre_indices[i], centre_indices[i + 1], centre_indices[i + 2]
        up = centre - begin
        down = end - centre
        for k in range(begin, centre):
            fb[i, k] = np.float32(k - begin) / np.float32(up)
        for k in range(centre, end):
            fb[i, k] = np.float32(end - k) / np.float32(down)
    return fb


def dct_matrix(n: int) -> np.ndarray:
    """(n, n) matrix D with out = D @ x: out[k] = 2 Σ_j x[j] cos(π/n (j+0.5) k)."""
    pi_over_n = np.float32(math.pi) / np.float32(n)
    k = np.arange(n, dtype=np.float32)[:, None]
    j = np.arange(n, dtype=np.float32)[None, :]
    return (np.float32(2.0) * np.cos(pi_over_n * (j + np.float32(0.5)) * k)).astype(
        np.float32
    )


def dft_matrices(n: int = SAMPLES_PER_FRAME, bins: int = MAGNITUDE_SPECTRUM_SIZE):
    """Real-DFT as two GEMM weight matrices (n, bins): cos and -sin parts.

    X[k] = Σ_j x[j] e^{-2πi jk/n}; re = x @ C, im = x @ S.
    Built in float64 then rounded to f32 so the twiddles carry < 1 ulp error.
    """
    j = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * j * k / float(n)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


class FrontendConstants:
    """Precomputed constant matrices for a given mfcc output size."""

    def __init__(self, num_coefficients: int, sample_rate: int = DETECTOR_INTERNAL_SAMPLE_RATE):
        self.num_coefficients = num_coefficients
        self.hamming = hamming_window(SAMPLES_PER_FRAME)
        self.mel_fb_t = mel_filter_bank(
            sample_rate, MAGNITUDE_SPECTRUM_SIZE, num_coefficients
        ).T.copy()  # (240, n)
        self.dct_t = dct_matrix(num_coefficients).T.copy()  # (n, n)
        cos_m, sin_m = dft_matrices()
        # fold the Hamming window into the DFT weights: one GEMM does window+DFT
        self.dft_cos = (self.hamming[:, None] * cos_m).astype(np.float32)  # (480, 240)
        self.dft_sin = (self.hamming[:, None] * sin_m).astype(np.float32)


@lru_cache(maxsize=8)
def get_constants(num_coefficients: int) -> FrontendConstants:
    return FrontendConstants(num_coefficients)


def pre_emphasis(shifts: jnp.ndarray) -> jnp.ndarray:
    """shifts: (..., SAMPLES_PER_SHIFT). Carry resets to 0 at every shift
    boundary (reference quirk, extractor.rs:87-97)."""
    prev = jnp.concatenate(
        [jnp.zeros((*shifts.shape[:-1], 1), shifts.dtype), shifts[..., :-1]], axis=-1
    )
    return shifts - jnp.float32(MFCCS_EXTRACTOR_PRE_EMPHASIS) * prev


def mfcc_from_frames(
    frames: jnp.ndarray, consts: FrontendConstants, precision=None
) -> jnp.ndarray:
    """frames: (..., 480) pre-emphasized sample frames → (..., n-1) MFCCs.

    Two MXU GEMMs (windowed DFT), a mel GEMM, log, and a DCT GEMM. The first
    cepstral coefficient is dropped (extractor.rs:84-85). `precision` defaults
    to the HIGHEST parity tier; the serving chunk passes _PRECISION_SERVING
    (see the tier note at the top of this file)."""
    if precision is None:
        precision = _PRECISION
    re = jnp.matmul(frames, consts.dft_cos, precision=precision)
    im = jnp.matmul(frames, consts.dft_sin, precision=precision)
    power = re * re + im * im  # |X[k]|^2 — reference squares the magnitude again
    mel = jnp.matmul(power, jnp.asarray(consts.mel_fb_t), precision=precision)
    logmel = jnp.log(mel + F32_MIN_POSITIVE)
    mfcc = jnp.matmul(logmel, jnp.asarray(consts.dct_t), precision=precision)
    return mfcc[..., 1:]


def frames_from_shifts(pre_shifts: jnp.ndarray) -> jnp.ndarray:
    """(num_shifts, 160) pre-emphasized shifts → (num_shifts-3, 480) frames.

    Frame t (t ≥ 0) is shifts [t+1, t+2, t+3]: the reference's sliding buffer
    emits its first frame on the 4th shift (extractor.rs:69-79), skewing the
    stream by one shift (160 samples) relative to naive framing.
    """
    n = pre_shifts.shape[0]
    flat = pre_shifts.reshape(-1)
    idx = (jnp.arange(n - 3)[:, None] + 1) * SAMPLES_PER_SHIFT + jnp.arange(
        SAMPLES_PER_FRAME
    )[None, :]
    return flat[idx]


def cmn(frames: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Cepstral mean normalization: subtract per-coefficient mean over frames
    (reference src/mfcc/normalizer.rs:3-31)."""
    return frames - jnp.mean(frames, axis=axis, keepdims=True)


def rms_level(samples: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """√(mean(x²)) — reference src/audio/gain_normalizer_filter.rs:49-55."""
    return jnp.sqrt(jnp.mean(jnp.square(samples), axis=axis))
