"""Offline WAV → MFCC extraction (wakeword building and training).

Parity: /root/reference/src/mfcc/wav_file_extractor.rs:18-91 — wav parse,
re-encode/resample in exact frame chunks, per-chunk RMS collected with the
median taken, MFCC extraction, cepstral mean normalization.

The MFCC math runs through the same JAX front-end ops as the streaming runtime
(ops/frontend.py), batched over all shifts of the file in one jit call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.encoder import AudioEncoder
from ..config import AudioFmt, Endianness, SampleFormat
from ..constants import SAMPLES_PER_SHIFT
from ..ops import frontend
from ..utils.wav import WavSpec, read_wav


def audio_fmt_from_spec(spec: WavSpec) -> AudioFmt:
    if spec.is_float and spec.bits_per_sample == 32:
        fmt = SampleFormat.F32
    else:
        fmt = SampleFormat.int_of_size(spec.bits_per_sample)
        if fmt is None:
            raise ValueError("Unsupported wav format")
    return AudioFmt(
        sample_rate=spec.sample_rate,
        sample_format=fmt,
        channels=spec.channels,
        endianness=Endianness.LITTLE,
    )


@jax.jit
def _mfcc_pipeline_n6(samples):
    return _mfcc_pipeline(samples, 6)


def _mfcc_pipeline(samples: jnp.ndarray, num_coefficients: int) -> jnp.ndarray:
    """samples: (n_shifts*160,) mono f32 @16k → (n_shifts-3, n-1) MFCCs + CMN."""
    shifts = samples.reshape(-1, SAMPLES_PER_SHIFT)
    pre = frontend.pre_emphasis(shifts)
    frames = frontend.frames_from_shifts(pre)
    consts = frontend.get_constants(num_coefficients)
    mfcc = frontend.mfcc_from_frames(frames, consts)
    return frontend.cmn(mfcc, axis=0)


_jitted = {}


def mfcc_pipeline(samples: np.ndarray, num_coefficients: int) -> np.ndarray:
    key = num_coefficients
    if key not in _jitted:
        _jitted[key] = jax.jit(lambda s: _mfcc_pipeline(s, key))
    return np.asarray(_jitted[key](jnp.asarray(samples, dtype=jnp.float32)))


def compute_mfccs(path_or_bytes, mfcc_size: int) -> tuple[np.ndarray, float]:
    """WAV → (CMN-normalized MFCC matrix (frames, mfcc_size), median RMS level).

    num_coefficients = mfcc_size + 1 since coefficient 0 is dropped
    (wav_file_extractor.rs:36-40).
    """
    raw, spec = read_wav(path_or_bytes)
    fmt = audio_fmt_from_spec(spec)
    encoder = AudioEncoder(fmt)
    in_len = encoder.get_input_frame_length()
    out_len = encoder.get_output_frame_length()
    n_chunks = len(raw) // in_len
    chunks_out = []
    rms_levels = []
    for c in range(n_chunks):
        out = encoder.rencode_and_resample(raw[c * in_len : (c + 1) * in_len])
        rms_levels.append(float(np.sqrt(np.mean(np.square(out.astype(np.float64))))))
        chunks_out.append(out)
    rms_level = 0.0
    if rms_levels:
        s = np.sort(np.array(rms_levels, dtype=np.float32))
        rms_level = float(s[len(s) // 2])
    samples = np.concatenate(chunks_out) if chunks_out else np.zeros(0, np.float32)
    # The reference feeds the extractor in output-frame chunks; sizes are exact
    # multiples of the shift so flattening is equivalent (wav_file_extractor.rs:59-66)
    n_shifts = len(samples) // SAMPLES_PER_SHIFT
    samples = samples[: n_shifts * SAMPLES_PER_SHIFT]
    del out_len
    mfccs = mfcc_pipeline(samples, mfcc_size + 1)
    return mfccs, rms_level
