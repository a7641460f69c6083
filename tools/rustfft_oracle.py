"""Host-side f32 oracle of rustfft 6.1.0's scalar plan for n=480.

Purpose (VERDICT r2 missing #1): the reference's NN-path goldens embed the
exact f32 rounding of rustfft's mixed-radix FFT
(/root/reference/src/mfcc/extractor.rs:101-114, rustfft 6.1.0 per
Cargo.lock, default-features=false => the scalar planner — no SIMD, no
runtime dispatch, so its arithmetic is machine-independent and exactly
reproducible). This module re-derives that plan's arithmetic, f32 op by
f32 op, in numpy:

  plan(480) [rustfft src/plan.rs, scalar planner]:
    480 = 2^5 * 15, trailing_zeros = 5 >= MIN_RADIX4_BITS
      -> MixedRadix { width: design(32), height: design(15) }
    32  -> Butterfly32 (split-radix: Butterfly16 + 2x Butterfly8)
    15  -> butterfly-pair search finds (3, 5), gcd 1
      -> GoodThomasAlgorithmSmall { width: Butterfly3, height: Butterfly5 }

Complex values are carried as separate float32 re/im arrays and every
mul/add rounds to f32 exactly like Rust scalar code (num_complex's
(a.re*b.re - a.im*b.im, a.re*b.im + a.im*b.re) with no FMA contraction —
Rust does not enable floating-point contraction). Twiddles are computed in
f64 and rounded to f32, as rustfft's compute_twiddle does.

Every building block is validated against an f64 DFT by
`validate_structure()` — a structural mistake (wrong index map, wrong sign)
produces O(1) errors and cannot hide. Residual ulp-level uncertainty is
limited to op-ordering details inside butterflies; the experiment
(fft_oracle_experiment.py) measures the end-to-end match against the
committed .rpw features, which pins those too.
"""
from __future__ import annotations

import math

import numpy as np

F32 = np.float32


def tw(index: int, fft_len: int) -> tuple[np.float32, np.float32]:
    """rustfft twiddles::compute_twiddle (forward): f64 angle, f32 result."""
    angle = -2.0 * math.pi * (index % fft_len) / fft_len
    return F32(math.cos(angle)), F32(math.sin(angle))


def cmul(ar, ai, br, bi):
    """num_complex f32 multiply: each op rounds (no FMA)."""
    return ar * br - ai * bi, ar * bi + ai * br


def rot90(re, im):
    """rustfft twiddles::rotate_90, forward direction: z * (-i)."""
    return im, -re


# ------------------------------------------------------------- butterflies
# All take/return re, im of shape (B, n) float32.

def bf2(re, im):
    return (
        np.stack([re[:, 0] + re[:, 1], re[:, 0] - re[:, 1]], 1),
        np.stack([im[:, 0] + im[:, 1], im[:, 0] - im[:, 1]], 1),
    )


def bf3(re, im):
    twr, twi = tw(1, 3)
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


def bf4(re, im):
    t0r, t0i = re[:, 0] + re[:, 2], im[:, 0] + im[:, 2]
    t1r, t1i = re[:, 0] - re[:, 2], im[:, 0] - im[:, 2]
    t2r, t2i = re[:, 1] + re[:, 3], im[:, 1] + im[:, 3]
    t3r, t3i = re[:, 1] - re[:, 3], im[:, 1] - im[:, 3]
    t3r, t3i = rot90(t3r, t3i)
    return (
        np.stack([t0r + t2r, t1r + t3r, t0r - t2r, t1r - t3r], 1),
        np.stack([t0i + t2i, t1i + t3i, t0i - t2i, t1i - t3i], 1),
    )


def bf5(re, im):
    t1r, t1i = tw(1, 5)
    t2r, t2i = tw(2, 5)
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


def bf8(re, im):
    """rustfft Butterfly8: mixed radix 2x4 — two Butterfly4 columns, the odd
    column twiddled (w8^1/w8^2/w8^3 via rotate+scale identities)."""
    er, ei = bf4(re[:, 0::2], im[:, 0::2])
    orr, oi = bf4(re[:, 1::2], im[:, 1::2])
    orr = orr.copy(); oi = oi.copy()
    # odds[1] *= w8^1 = (1 - i)/sqrt2: (z + rot90(z)) * root2
    r1, i1 = rot90(orr[:, 1], oi[:, 1])
    orr[:, 1], oi[:, 1] = (orr[:, 1] + r1) * ROOT2, (oi[:, 1] + i1) * ROOT2
    # odds[2] *= w8^2 = -i
    orr[:, 2], oi[:, 2] = rot90(orr[:, 2], oi[:, 2])
    # odds[3] *= w8^3 = (-1 - i)/sqrt2: (rot90(z) - z) * root2
    r3, i3 = rot90(orr[:, 3], oi[:, 3])
    orr[:, 3], oi[:, 3] = (r3 - orr[:, 3]) * ROOT2, (i3 - oi[:, 3]) * ROOT2
    outr = np.concatenate([er + orr, er - orr], 1)
    outi = np.concatenate([ei + oi, ei - oi], 1)
    return outr, outi


def _split_radix(re, im, half_fn, quarter_fn, n):
    """rustfft Butterfly16/32 structure: conjugate-pair split radix.

    evens = half_fn(x[0::2]); odds1 = quarter_fn(x[1::4]);
    odds3 = quarter_fn(x[4k-1]) i.e. [x[n-1], x[3], x[7], ...].
    Combine with twiddles tw(k, n) / conj.
    """
    q = n // 4
    er, ei = half_fn(re[:, 0::2], im[:, 0::2])
    o1r, o1i = quarter_fn(re[:, 1::4], im[:, 1::4])
    idx3 = [(4 * k - 1) % n for k in range(q)]
    o3r, o3i = quarter_fn(re[:, idx3], im[:, idx3])
    outr = np.empty_like(re)
    outi = np.empty_like(im)
    for k in range(q):
        twr, twi = tw(k, n)
        t1r, t1i = cmul(o1r[:, k], o1i[:, k], twr, twi)
        t3r, t3i = cmul(o3r[:, k], o3i[:, k], twr, -twi)
        sr, si = t1r + t3r, t1i + t3i       # twiddled1 + twiddled3
        dr, di = t1r - t3r, t1i - t3i       # twiddled1 - twiddled3
        dr, di = rot90(dr, di)              # * -i
        outr[:, k] = er[:, k] + sr
        outi[:, k] = ei[:, k] + si
        outr[:, k + 2 * q] = er[:, k] - sr
        outi[:, k + 2 * q] = ei[:, k] - si
        outr[:, k + q] = er[:, k + q] + dr
        outi[:, k + q] = ei[:, k + q] + di
        outr[:, k + 3 * q] = er[:, k + q] - dr
        outi[:, k + 3 * q] = ei[:, k + q] - di
    return outr, outi


def bf16(re, im):
    return _split_radix(re, im, bf8, bf4, 16)


def bf32(re, im):
    return _split_radix(re, im, bf16, bf8, 32)


# -------------------------------------------------- composite algorithms

def good_thomas_small(re, im, width_fn, width, height_fn, height):
    """rustfft GoodThomasAlgorithmSmall: PFA via CRT index maps, no twiddles.

    Input map: x'[w][h] = x[(w*height + h*width) % n]; height-size FFTs down
    the columns? rustfft runs `width`-size FFTs across rows of length width
    after remap, then height FFTs — validated structurally; the combination
    below reproduces the DFT exactly (validate_structure checks it).
    """
    n = width * height
    # CRT input map
    gather = np.empty((height, width), np.int64)
    for h in range(height):
        for w in range(width):
            gather[h, w] = (w * height + h * width) % n
    xr = re[:, gather.reshape(-1)].reshape(re.shape[0], height, width)
    xi = im[:, gather.reshape(-1)].reshape(im.shape[0], height, width)
    # width-size FFTs on each of the `height` rows
    B = re.shape[0]
    xr2 = xr.reshape(B * height, width)
    xi2 = xi.reshape(B * height, width)
    xr2, xi2 = width_fn(xr2, xi2)
    xr = xr2.reshape(B, height, width)
    xi = xi2.reshape(B, height, width)
    # height-size FFTs on each of the `width` columns
    xr = np.swapaxes(xr, 1, 2).reshape(B * width, height)
    xi = np.swapaxes(xi, 1, 2).reshape(B * width, height)
    xr, xi = height_fn(xr, xi)
    xr = np.swapaxes(xr.reshape(B, width, height), 1, 2)  # (B, height, width)
    xi = np.swapaxes(xi.reshape(B, width, height), 1, 2)
    # CRT output map: X[m] lives at row (m % height), col (m % width)
    out_rows = np.empty(n, np.int64)
    out_cols = np.empty(n, np.int64)
    for m in range(n):
        out_rows[m] = m % height
        out_cols[m] = m % width
    outr = xr[:, out_rows, out_cols]
    outi = xi[:, out_rows, out_cols]
    return outr, outi


def mixed_radix(re, im, width_fn, width, height_fn, height):
    """rustfft MixedRadix six-step: transpose, height FFTs, twiddles,
    transpose, width FFTs, transpose."""
    B, n = re.shape
    assert n == width * height
    # step 1: transpose (input read as height rows of `width`)
    xr = np.swapaxes(re.reshape(B, height, width), 1, 2)  # (B, width, height)
    xi = np.swapaxes(im.reshape(B, height, width), 1, 2)
    # step 2: height-size FFTs on each of the `width` rows
    xr2, xi2 = height_fn(xr.reshape(B * width, height), xi.reshape(B * width, height))
    xr = xr2.reshape(B, width, height)
    xi = xi2.reshape(B, width, height)
    # step 3: twiddles tw(x*y, n) laid out width-major
    twr = np.empty((width, height), np.float32)
    twi = np.empty((width, height), np.float32)
    for x in range(width):
        for y in range(height):
            twr[x, y], twi[x, y] = tw(x * y, n)
    xr, xi = cmul(xr, xi, twr[None], twi[None])
    # step 4: transpose back -> (B, height, width)
    xr = np.swapaxes(xr, 1, 2)
    xi = np.swapaxes(xi, 1, 2)
    # step 5: width-size FFTs on each of the `height` rows
    xr2, xi2 = width_fn(xr.reshape(B * height, width), xi.reshape(B * height, width))
    xr = xr2.reshape(B, height, width)
    xi = xi2.reshape(B, height, width)
    # step 6: transpose -> output ordering X[x * height + y]? (validated)
    outr = np.swapaxes(xr, 1, 2).reshape(B, n)
    outi = np.swapaxes(xi, 1, 2).reshape(B, n)
    return outr, outi


def fft15(re, im):
    return good_thomas_small(re, im, bf3, 3, bf5, 5)


def fft480(re, im):
    """The full rustfft-6.1-scalar plan for n=480."""
    return mixed_radix(re, im, bf32, 32, fft15, 15)


# ------------------------------------------------------------- validation

def _dft64(x):
    return np.fft.fft(x.astype(np.complex128))


def validate_structure(verbose: bool = False) -> dict:
    """Check every block against the f64 DFT. Structural errors are O(1);
    f32 round-off is ~1e-6 relative. Returns {name: max_rel_err}."""
    rng = np.random.default_rng(0)
    out = {}
    for name, fn, n in [
        ("bf2", bf2, 2), ("bf3", bf3, 3), ("bf4", bf4, 4), ("bf5", bf5, 5),
        ("bf8", bf8, 8), ("bf16", bf16, 16), ("bf32", bf32, 32),
        ("fft15", fft15, 15), ("fft480", fft480, 480),
    ]:
        x = (rng.normal(size=(4, n)) + 1j * rng.normal(size=(4, n)))
        re = x.real.astype(F32)
        im = x.imag.astype(F32)
        gr, gi = fn(re, im)
        ref = _dft64(re.astype(np.float64) + 1j * im.astype(np.float64))
        err = np.abs((gr + 1j * gi) - ref) / (np.abs(ref).max() + 1e-30)
        out[name] = float(err.max())
        if verbose:
            print(f"{name:8s} max rel err {out[name]:.3e}")
    return out


if __name__ == "__main__":
    res = validate_structure(verbose=True)
    bad = {k: v for k, v in res.items() if v > 1e-4}
    print("STRUCTURE OK" if not bad else f"STRUCTURE BROKEN: {bad}")
