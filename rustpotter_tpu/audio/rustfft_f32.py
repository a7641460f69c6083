"""f32 oracle of the reference's resampler stack: rustfft 6.1.0 (scalar) +
realfft 3.3.0 + rubato 0.14.1 `FftFixedInOut<f32>`, for the 48 kHz->16 kHz
path (fft_size_in 1440 / fft_size_out 480; real FFTs of 2880 and 960).

Purpose (VERDICT r3 missing #1 / next #2): the reference's exact NN-logit
assertions (/root/reference/tests/detector.rs:225-230) embed the f32
rounding of rubato's resampler. The repo's production resampler
(rustpotter_tpu/audio/resampler.py) computes the same FFT-OLA in f64 and
lands at the f32 noise floor (8.9e-8 vs the committed golden) — but
docs/NN_EXACTNESS.md shows 1e-7 waveform noise moves the ok_casa
none-logit by +-8, so settling the exact-logit question needs the
resampler's own f32 accumulation order. This module re-derives it the same
way tools/rustfft_oracle.py settled the MFCC FFT: every f32 op in plan
order, validated structurally against f64 DFTs, with the committed f32
golden wav (`gain-normalizer_example.wav`) as the end-to-end arbiter.

Plan derivation (rustfft 6.1.0 scalar planner, versions pinned by the
reference's Cargo.lock):
  complex 1440 = 2^5 * 45, trailing_zeros 5 >= MIN_RADIX4_BITS
    -> MixedRadix { width: Butterfly32, height: plan(45) }
  45 -> butterfly-pair search -> GoodThomasAlgorithmSmall { Butterfly5,
        Butterfly9 } (gcd 1; Butterfly9 = 3x3 mixed radix)
  complex 480 (inverse) = MixedRadix { Butterfly32, GoodThomasSmall(3, 5) }
        with FftDirection::Inverse twiddles — same recipe as the forward
        plan tools/rustfft_oracle.py validated against the .rpw features.
realfft 3.3.0 RealToComplexEven(2880) / ComplexToRealEven(960) wrap those
complex FFTs with split/merge twiddle passes re-derived below.

All blocks carry (B, n) float32 re/im planes; complex multiplies follow
num_complex's (a.re*b.re - a.im*b.im, a.re*b.im + a.im*b.re) with no FMA
contraction, matching Rust scalar builds.
"""
from __future__ import annotations

import math

import numpy as np

F32 = np.float32


def tw(index: int, fft_len: int, fwd: bool = True) -> tuple[np.float32, np.float32]:
    """rustfft twiddles::compute_twiddle: f64 angle, f32 result; the inverse
    direction conjugates (twiddles.rs computes forward then conjugates)."""
    angle = -2.0 * math.pi * (index % fft_len) / fft_len
    if not fwd:
        angle = -angle
    return F32(math.cos(angle)), F32(math.sin(angle))


# r5 bounded SIMD experiment (VERDICT r4 next #7): rustfft's AVX codepath
# multiplies complex pairs with _mm256_fmaddsub_ps — one operand product is
# rounded (vmulps), the other is FUSED into the add/sub (single rounding):
#   re = fused(ar*br - rnd(ai*bi)),  im = fused(ar*bi + rnd(ai*br)).
# "avx" emulates that contraction (f64 holds the f32 product exactly; the
# residual double-rounding mismatch vs a true FMA is ~2^-29-rare, far below
# the 16-19% bit-exactness scale the ANOVA measures). None = scalar builds'
# mul+add. Flipped by tools/rubato_fit.py --fma-cmul.
FMA_CMUL = None


def cmul(ar, ai, br, bi):
    if FMA_CMUL == "avx":
        t1 = ai * bi  # f32 ops round per-element already (vmulps)
        t2 = ai * br
        ar64, br64, bi64 = (np.asarray(x, np.float64) for x in (ar, br, bi))
        re = np.asarray(ar64 * br64 - np.asarray(t1, np.float64), F32)
        im = np.asarray(ar64 * bi64 + np.asarray(t2, np.float64), F32)
        return re, im
    return ar * br - ai * bi, ar * bi + ai * br


def rot90(re, im, fwd: bool):
    """twiddles::rotate_90: forward z*(-i), inverse z*(+i). The passthrough
    component is copied — callers assign the result back into the same
    arrays (bf8), and a view would read already-overwritten data."""
    return (im.copy(), -re) if fwd else (-im, re.copy())


# ------------------------------------------------------------- butterflies

def bf2(re, im, fwd: bool):
    return (
        np.stack([re[:, 0] + re[:, 1], re[:, 0] - re[:, 1]], 1),
        np.stack([im[:, 0] + im[:, 1], im[:, 0] - im[:, 1]], 1),
    )


def bf3(re, im, fwd: bool):
    twr, twi = tw(1, 3, fwd)
    xpr = re[:, 1] + re[:, 2]
    xpi = im[:, 1] + im[:, 2]
    xnr = re[:, 1] - re[:, 2]
    xni = im[:, 1] - im[:, 2]
    sumr = re[:, 0] + xpr
    sumi = im[:, 0] + xpi
    tar = re[:, 0] + twr * xpr
    tai = im[:, 0] + twr * xpi
    tbr = -twi * xni
    tbi = twi * xnr
    return (
        np.stack([sumr, tar + tbr, tar - tbr], 1),
        np.stack([sumi, tai + tbi, tai - tbi], 1),
    )


def bf4(re, im, fwd: bool):
    t0r, t0i = re[:, 0] + re[:, 2], im[:, 0] + im[:, 2]
    t1r, t1i = re[:, 0] - re[:, 2], im[:, 0] - im[:, 2]
    t2r, t2i = re[:, 1] + re[:, 3], im[:, 1] + im[:, 3]
    t3r, t3i = re[:, 1] - re[:, 3], im[:, 1] - im[:, 3]
    t3r, t3i = rot90(t3r, t3i, fwd)
    return (
        np.stack([t0r + t2r, t1r + t3r, t0r - t2r, t1r - t3r], 1),
        np.stack([t0i + t2i, t1i + t3i, t0i - t2i, t1i - t3i], 1),
    )


def bf5(re, im, fwd: bool):
    t1r, t1i = tw(1, 5, fwd)
    t2r, t2i = tw(2, 5, fwd)
    x14pr, x14pi = re[:, 1] + re[:, 4], im[:, 1] + im[:, 4]
    x14nr, x14ni = re[:, 1] - re[:, 4], im[:, 1] - im[:, 4]
    x23pr, x23pi = re[:, 2] + re[:, 3], im[:, 2] + im[:, 3]
    x23nr, x23ni = re[:, 2] - re[:, 3], im[:, 2] - im[:, 3]
    sumr = re[:, 0] + x14pr + x23pr
    sumi = im[:, 0] + x14pi + x23pi
    b14re_a = re[:, 0] + t1r * x14pr + t2r * x23pr
    b14re_b = t1i * x14ni + t2i * x23ni
    b14im_a = im[:, 0] + t1r * x14pi + t2r * x23pi
    b14im_b = t1i * x14nr + t2i * x23nr
    b23re_a = re[:, 0] + t2r * x14pr + t1r * x23pr
    b23re_b = t2i * x14ni - t1i * x23ni
    b23im_a = im[:, 0] + t2r * x14pi + t1r * x23pi
    b23im_b = t2i * x14nr - t1i * x23nr
    return (
        np.stack([sumr, b14re_a - b14re_b, b23re_a - b23re_b,
                  b23re_a + b23re_b, b14re_a + b14re_b], 1),
        np.stack([sumi, b14im_a + b14im_b, b23im_a + b23im_b,
                  b23im_a - b23im_b, b14im_a - b14im_b], 1),
    )


ROOT2 = F32(math.sqrt(0.5))


def bf8(re, im, fwd: bool):
    er, ei = bf4(re[:, 0::2], im[:, 0::2], fwd)
    orr, oi = bf4(re[:, 1::2], im[:, 1::2], fwd)
    orr = orr.copy(); oi = oi.copy()
    r1, i1 = rot90(orr[:, 1], oi[:, 1], fwd)
    orr[:, 1], oi[:, 1] = (orr[:, 1] + r1) * ROOT2, (oi[:, 1] + i1) * ROOT2
    orr[:, 2], oi[:, 2] = rot90(orr[:, 2], oi[:, 2], fwd)
    r3, i3 = rot90(orr[:, 3], oi[:, 3], fwd)
    orr[:, 3], oi[:, 3] = (r3 - orr[:, 3]) * ROOT2, (i3 - oi[:, 3]) * ROOT2
    outr = np.concatenate([er + orr, er - orr], 1)
    outi = np.concatenate([ei + oi, ei - oi], 1)
    return outr, outi


def bf9(re, im, fwd: bool):
    """rustfft Butterfly9: 3x3 mixed radix (three column Butterfly3s,
    twiddles at (row, col) in {1,2}x{1,2} with indices row*col mod 9, three
    row Butterfly3s)."""
    B = re.shape[0]
    # columns [0,3,6], [1,4,7], [2,5,8]
    cr = [re[:, c::3] for c in range(3)]
    ci = [im[:, c::3] for c in range(3)]
    for c in range(3):
        cr[c], ci[c] = bf3(cr[c], ci[c], fwd)
    tws = {1: tw(1, 9, fwd), 2: tw(2, 9, fwd), 4: tw(4, 9, fwd)}
    for col in (1, 2):
        for row in (1, 2):
            twr, twi = tws[(row * col) % 9 if (row * col) != 4 else 4]
            r, i = cmul(cr[col][:, row], ci[col][:, row], twr, twi)
            cr[col][:, row], ci[col][:, row] = r, i
    # row FFTs across columns: row r -> [col0[r], col1[r], col2[r]]
    outr = np.empty((B, 9), F32)
    outi = np.empty((B, 9), F32)
    for row in range(3):
        rr = np.stack([cr[c][:, row] for c in range(3)], 1)
        ri = np.stack([ci[c][:, row] for c in range(3)], 1)
        rr, ri = bf3(rr, ri, fwd)
        # output: X[row + 3*j] = rowfft[j]
        for j in range(3):
            outr[:, row + 3 * j] = rr[:, j]
            outi[:, row + 3 * j] = ri[:, j]
    return outr, outi


def _split_radix(re, im, half_fn, quarter_fn, n, fwd):
    q = n // 4
    er, ei = half_fn(re[:, 0::2], im[:, 0::2], fwd)
    o1r, o1i = quarter_fn(re[:, 1::4], im[:, 1::4], fwd)
    idx3 = [(4 * k - 1) % n for k in range(q)]
    o3r, o3i = quarter_fn(re[:, idx3], im[:, idx3], fwd)
    outr = np.empty_like(re)
    outi = np.empty_like(im)
    for k in range(q):
        twr, twi = tw(k, n, fwd)
        t1r, t1i = cmul(o1r[:, k], o1i[:, k], twr, twi)
        t3r, t3i = cmul(o3r[:, k], o3i[:, k], twr, -twi)
        sr, si = t1r + t3r, t1i + t3i
        dr, di = t1r - t3r, t1i - t3i
        dr, di = rot90(dr, di, fwd)
        outr[:, k] = er[:, k] + sr
        outi[:, k] = ei[:, k] + si
        outr[:, k + 2 * q] = er[:, k] - sr
        outi[:, k + 2 * q] = ei[:, k] - si
        outr[:, k + q] = er[:, k + q] + dr
        outi[:, k + q] = ei[:, k + q] + di
        outr[:, k + 3 * q] = er[:, k + q] - dr
        outi[:, k + 3 * q] = ei[:, k + q] - di
    return outr, outi


def bf16(re, im, fwd: bool):
    return _split_radix(re, im, bf8, bf4, 16, fwd)


def bf32(re, im, fwd: bool):
    return _split_radix(re, im, bf16, bf8, 32, fwd)


# -------------------------------------------------- composite algorithms

def good_thomas_small(re, im, width_fn, width, height_fn, height, fwd):
    n = width * height
    gather = np.empty((height, width), np.int64)
    for h in range(height):
        for w in range(width):
            gather[h, w] = (w * height + h * width) % n
    B = re.shape[0]
    xr = re[:, gather.reshape(-1)].reshape(B, height, width)
    xi = im[:, gather.reshape(-1)].reshape(B, height, width)
    xr2, xi2 = width_fn(xr.reshape(B * height, width), xi.reshape(B * height, width), fwd)
    xr = xr2.reshape(B, height, width)
    xi = xi2.reshape(B, height, width)
    xr = np.swapaxes(xr, 1, 2).reshape(B * width, height)
    xi = np.swapaxes(xi, 1, 2).reshape(B * width, height)
    xr, xi = height_fn(xr, xi, fwd)
    xr = np.swapaxes(xr.reshape(B, width, height), 1, 2)
    xi = np.swapaxes(xi.reshape(B, width, height), 1, 2)
    out_rows = np.arange(n) % height
    out_cols = np.arange(n) % width
    return xr[:, out_rows, out_cols], xi[:, out_rows, out_cols]


_MR_TW_CACHE: dict = {}


def _mr_twiddles(width: int, height: int, fwd: bool):
    key = (width, height, fwd)
    if key not in _MR_TW_CACHE:
        n = width * height
        twr = np.empty((width, height), np.float32)
        twi = np.empty((width, height), np.float32)
        for x in range(width):
            for y in range(height):
                twr[x, y], twi[x, y] = tw(x * y, n, fwd)
        _MR_TW_CACHE[key] = (twr, twi)
    return _MR_TW_CACHE[key]


def mixed_radix(re, im, width_fn, width, height_fn, height, fwd):
    B, n = re.shape
    assert n == width * height
    xr = np.swapaxes(re.reshape(B, height, width), 1, 2)
    xi = np.swapaxes(im.reshape(B, height, width), 1, 2)
    xr2, xi2 = height_fn(xr.reshape(B * width, height), xi.reshape(B * width, height), fwd)
    xr = xr2.reshape(B, width, height)
    xi = xi2.reshape(B, width, height)
    twr, twi = _mr_twiddles(width, height, fwd)
    xr, xi = cmul(xr, xi, twr[None], twi[None])
    xr = np.swapaxes(xr, 1, 2)
    xi = np.swapaxes(xi, 1, 2)
    xr2, xi2 = width_fn(xr.reshape(B * height, width), xi.reshape(B * height, width), fwd)
    xr = xr2.reshape(B, height, width)
    xi = xi2.reshape(B, height, width)
    outr = np.swapaxes(xr, 1, 2).reshape(B, n)
    outi = np.swapaxes(xi, 1, 2).reshape(B, n)
    return outr, outi


def fft15(re, im, fwd: bool):
    return good_thomas_small(re, im, bf3, 3, bf5, 5, fwd)


# plan variants for the 45-point sub-FFT (the one block of the 1440 plan
# with no prior artifact validation — rubato_fit.py scans these against the
# golden; FFT45_VARIANT selects the active one)
def _fft45_gt59(re, im, fwd):
    return good_thomas_small(re, im, bf5, 5, bf9, 9, fwd)


def _fft45_gt95(re, im, fwd):
    return good_thomas_small(re, im, bf9, 9, bf5, 5, fwd)


def _fft45_gt315(re, im, fwd):
    return good_thomas_small(re, im, bf3, 3, fft15, 15, fwd)


def _fft45_gt153(re, im, fwd):
    return good_thomas_small(re, im, fft15, 15, bf3, 3, fwd)


def _fft45_mr59(re, im, fwd):
    return mixed_radix(re, im, bf5, 5, bf9, 9, fwd)


def _fft45_mr95(re, im, fwd):
    return mixed_radix(re, im, bf9, 9, bf5, 5, fwd)


FFT45_VARIANTS = {
    "gt59": _fft45_gt59, "gt95": _fft45_gt95, "gt315": _fft45_gt315,
    "gt153": _fft45_gt153, "mr59": _fft45_mr59, "mr95": _fft45_mr95,
}
FFT45_VARIANT = "gt59"


def fft45(re, im, fwd: bool):
    return FFT45_VARIANTS[FFT45_VARIANT](re, im, fwd)


def fft480(re, im, fwd: bool):
    return mixed_radix(re, im, bf32, 32, fft15, 15, fwd)


def fft1440(re, im, fwd: bool):
    return mixed_radix(re, im, bf32, 32, fft45, 45, fwd)


# --------------------------------------------------------------- realfft

def r2c_even(x: np.ndarray, cfft, n: int):
    """realfft 3.3 RealToComplexEven::process for even length n: pack pairs
    into a complex FFT of n/2, then the split pass. x: (B, n) f32 ->
    (re, im) each (B, n/2 + 1). Twiddle k = compute_twiddle(k, n) * 0.5
    (f64 angle -> f32, then the 0.5 fold); the loop computes
      X[k]    = 0.5*sum + tw(x)diff   (component form below)
      X[N-k]  = conj(0.5*sum - tw(x)diff)
    validated against np.fft.rfft by validate_structure()."""
    B = x.shape[0]
    N = n // 2
    zr = x[:, 0::2].copy()
    zi = x[:, 1::2].copy()
    zr, zi = cfft(zr, zi, True)
    outr = np.empty((B, N + 1), F32)
    outi = np.zeros((B, N + 1), F32)
    outr[:, 0] = zr[:, 0] + zi[:, 0]
    outr[:, N] = zr[:, 0] - zi[:, 0]
    outi[:, 0] = 0.0
    outi[:, N] = 0.0
    half = F32(0.5)
    twiddle_count = N // 2 if N % 2 == 0 else N // 2 + 1
    ks = np.arange(1, twiddle_count)
    key = ("r2c", n)
    if key not in _MR_TW_CACHE:
        ang = -2.0 * math.pi * ks.astype(np.float64) / n
        _MR_TW_CACHE[key] = (
            np.cos(ang).astype(F32) * half, np.sin(ang).astype(F32) * half
        )
    twr, twi = _MR_TW_CACHE[key]
    xkr, xki = zr[:, ks], zi[:, ks]
    xnkr, xnki = zr[:, N - ks], zi[:, N - ks]
    sumr, sumi = xkr + xnkr, xki - xnki
    diffr, diffi = xkr - xnkr, xki + xnki
    # tw' = tw * (-i) folded: out = 0.5*sum + (tw*(-i))*diff where the
    # component products each round once (realfft's loop arithmetic)
    ar = twi * diffr + twr * diffi
    ai = twi * diffi - twr * diffr
    outr[:, ks] = half * sumr + ar
    outi[:, ks] = half * sumi + ai
    outr[:, N - ks] = half * sumr - ar
    outi[:, N - ks] = ai - half * sumi
    if N % 2 == 0:
        # middle element: X[N/2] = conj(Z[N/2])
        outr[:, N // 2] = zr[:, N // 2]
        outi[:, N // 2] = -zi[:, N // 2]
    return outr, outi


def c2r_even(sr: np.ndarray, si: np.ndarray, cifft, n: int):
    """realfft 3.3 ComplexToRealEven::process for even n: merge pass into a
    complex INVERSE FFT of n/2, unpack pairs. (B, n/2+1) spectrum ->
    (B, n) f32, UNnormalized (ifft(fft(x)) == (n/2)*x per rustfft's inverse;
    the overall 1/n normalization lives in rubato's filter scaling)."""
    B = sr.shape[0]
    N = n // 2
    zr = np.empty((B, N), F32)
    zi = np.empty((B, N), F32)
    zr[:, 0] = sr[:, 0] + sr[:, N]
    zi[:, 0] = sr[:, 0] - sr[:, N]
    twiddle_count = N // 2 if N % 2 == 0 else N // 2 + 1
    ks = np.arange(1, twiddle_count)
    key = ("c2r", n)
    if key not in _MR_TW_CACHE:
        ang = -2.0 * math.pi * ks.astype(np.float64) / n
        _MR_TW_CACHE[key] = (np.cos(ang).astype(F32), np.sin(ang).astype(F32))
    twr, twi = _MR_TW_CACHE[key]
    xkr, xki = sr[:, ks], si[:, ks]
    xnkr, xnki = sr[:, N - ks], si[:, N - ks]
    sumr, sumi = xkr + xnkr, xki - xnki
    diffr, diffi = xkr - xnkr, xki + xnki
    # Z[k] = sum + (i*conj(tw))*diff ; Z[N-k] = conj(sum - (i*conj(tw))*diff)
    ar = twi * diffr - twr * diffi
    ai = twi * diffi + twr * diffr
    zr[:, ks] = sumr + ar
    zi[:, ks] = sumi + ai
    zr[:, N - ks] = sumr - ar
    zi[:, N - ks] = ai - sumi
    if N % 2 == 0:
        zr[:, N // 2] = F32(2.0) * sr[:, N // 2]
        zi[:, N // 2] = F32(-2.0) * si[:, N // 2]
    zr, zi = cifft(zr, zi, False)
    out = np.empty((B, n), F32)
    out[:, 0::2] = zr
    out[:, 1::2] = zi
    return out


def _cfft_f64(re, im, fwd: bool):
    """Perfect complex FFT computed in f64 on the f32 inputs, rounded to
    f32 — stage-isolation baseline for the ANOVA in rubato_fit.py."""
    x = re.astype(np.float64) + 1j * im.astype(np.float64)
    n = re.shape[1]
    y = np.fft.fft(x) if fwd else np.fft.ifft(x) * n
    return y.real.astype(F32), y.imag.astype(F32)


CFFT_F64 = False  # swap the complex FFTs inside the realfft wrappers


def rfft2880(x):
    return r2c_even(x, _cfft_f64 if CFFT_F64 else fft1440, 2880)


def irfft960(sr, si):
    return c2r_even(sr, si, _cfft_f64 if CFFT_F64 else fft480, 960)


# ------------------------------------------------------------- validation

def validate_structure(verbose: bool = False) -> dict:
    rng = np.random.default_rng(0)
    out = {}
    # complex blocks, forward and inverse, vs f64 DFT
    for name, fn, n in [
        ("bf9", bf9, 9), ("fft45", fft45, 45), ("fft1440", fft1440, 1440),
        ("fft480", fft480, 480),
    ]:
        x = rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n))
        re, im = x.real.astype(F32), x.imag.astype(F32)
        for fwd in (True, False):
            gr, gi = fn(re, im, fwd)
            xx = re.astype(np.float64) + 1j * im.astype(np.float64)
            ref = np.fft.fft(xx) if fwd else np.fft.ifft(xx) * n
            err = np.abs((gr + 1j * gi) - ref) / (np.abs(ref).max() + 1e-30)
            out[f"{name}_{'fwd' if fwd else 'inv'}"] = float(err.max())
    # realfft wrappers vs numpy rfft/irfft
    x = rng.normal(size=(3, 2880)).astype(F32)
    gr, gi = rfft2880(x)
    ref = np.fft.rfft(x.astype(np.float64))
    err = np.abs((gr + 1j * gi) - ref) / (np.abs(ref).max() + 1e-30)
    out["rfft2880"] = float(err.max())
    s = rng.normal(size=(3, 481)) + 1j * rng.normal(size=(3, 481))
    s[:, 0] = s[:, 0].real
    s[:, -1] = s[:, -1].real
    got = irfft960(s.real.astype(F32), s.imag.astype(F32))
    ref = np.fft.irfft(s, 960) * 960.0
    err = np.abs(got - ref) / (np.abs(ref).max() + 1e-30)
    out["irfft960"] = float(err.max())
    if verbose:
        for k, v in out.items():
            print(f"{k:14s} max rel err {v:.3e}")
    return out


# --------------------------------------------------- rubato resample loop

class RubatoOracle:
    """rubato 0.14.1 FftFixedInOut<f32> for 1440 -> 480, f32 op-for-op,
    given the frequency-domain filter table (filter_f re/im, (1441,) f32).

    resample_unit (synchro.rs): copy chunk into the zero-padded scratch,
    forward real FFT (2880), per-bin complex multiply with filter_f,
    spectrum truncation to 481 bins, inverse real FFT (960), overlap-add
    the first 480, stash the last 480 as the next overlap."""

    def __init__(self, filter_fr: np.ndarray, filter_fi: np.ndarray):
        self.fr = filter_fr.astype(F32)
        self.fi = filter_fi.astype(F32)
        self.overlap = np.zeros(480, F32)

    def reset(self):
        self.overlap[:] = 0

    def process(self, chunk: np.ndarray) -> np.ndarray:
        assert chunk.shape == (1440,)
        buf = np.zeros((1, 2880), F32)
        buf[0, :1440] = chunk
        sr, si = rfft2880(buf)
        mr, mi = cmul(sr[0], si[0], self.fr, self.fi)
        tr = mr[:481][None].astype(F32)
        ti = mi[:481][None].astype(F32)
        y = irfft960(tr, ti)[0]
        out = y[:480] + self.overlap
        self.overlap = y[480:].copy()
        return out


def rubato_resample_batch(chunks: np.ndarray, fr: np.ndarray,
                          fi: np.ndarray,
                          nyquist_override: bool = False,
                          fwd_f64: bool = False,
                          inv_f64: bool = False) -> np.ndarray:
    """All chunks' FFT work batched (bit-identical to RubatoOracle chunk by
    chunk — the only cross-chunk dependence is the overlap ADD, applied
    sequentially after). chunks (nc, 1440) f32 -> (nc, 480) f32.

    nyquist_override: candidate rubato quirk — the output spectrum's last
    bin takes the filtered INPUT Nyquist bin (input_f[fft_size_in]) instead
    of truncated bin fft_size_out."""
    nc = chunks.shape[0]
    buf = np.zeros((nc, 2880), F32)
    buf[:, :1440] = chunks
    if fwd_f64:
        spec = np.fft.rfft(buf.astype(np.float64))
        sr = spec.real.astype(F32)
        si = spec.imag.astype(F32)
    else:
        sr, si = rfft2880(buf)
    mr, mi = cmul(sr, si, fr[None, :], fi[None, :])
    tr = mr[:, :481].astype(F32).copy()
    ti = mi[:, :481].astype(F32).copy()
    if nyquist_override:
        tr[:, 480] = mr[:, 1440]
        ti[:, 480] = mi[:, 1440]
    if inv_f64:
        y = (np.fft.irfft(
            tr.astype(np.float64) + 1j * ti.astype(np.float64), 960
        ) * 960.0).astype(F32)
    else:
        y = irfft960(tr, ti)
    out = np.empty((nc, 480), F32)
    overlap = np.zeros(480, F32)
    for c in range(nc):
        out[c] = y[c, :480] + overlap
        overlap = y[c, 480:]
    return out


if __name__ == "__main__":
    res = validate_structure(verbose=True)
    bad = {k: v for k, v in res.items() if v > 1e-4}
    print("STRUCTURE OK" if not bad else f"STRUCTURE BROKEN: {bad}")
