"""Per-stream detector state as an explicit pytree.

All the reference's hidden mutability — sliding sample buffer, MFCC window,
VAD ring, gain window, IIR taps, partial detection, countdown
(/root/reference/src/detector.rs:34-91) — becomes carried state of a pure
`step` function, vmappable over a stream batch axis and shardable over a mesh.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..constants import SAMPLES_PER_FRAME
from .bundle import StepStatic

VAD_WINDOW = 50
VAD_VOICE_FRAMES = 500


class StreamState(NamedTuple):
    ext_buf: jnp.ndarray  # (480,) pre-emphasized sample buffer
    ext_count: jnp.ndarray  # i32: 0..480 (warm-up fill level)
    win: jnp.ndarray  # (F, C) live MFCC window
    win_count: jnp.ndarray  # i32
    vad_win: jnp.ndarray  # (50,) energy shift-register (NaN = unfilled)
    vad_countdown: jnp.ndarray  # i32
    rs_overlap: jnp.ndarray  # (480,) in-graph resampler overlap-add state
    gain_win: jnp.ndarray  # (Wg,) rolling rms window
    gain_count: jnp.ndarray  # i32
    gain: jnp.ndarray  # f32: gain applied to latest frame
    rms_level: jnp.ndarray  # f32: latest frame rms (pre-gain)
    bp: jnp.ndarray  # (4,) biquad taps x1 x2 y1 y2
    partial_active: jnp.ndarray  # bool
    partial_ww: jnp.ndarray  # i32 wakeword index
    partial_score: jnp.ndarray  # f32
    partial_avg: jnp.ndarray  # f32
    partial_counter: jnp.ndarray  # i32
    partial_gain: jnp.ndarray  # f32
    partial_scores: jnp.ndarray  # (Smax,)
    countdown: jnp.ndarray  # i32


class Event(NamedTuple):
    fired: jnp.ndarray  # bool
    ww: jnp.ndarray  # i32
    score: jnp.ndarray  # f32
    avg_score: jnp.ndarray  # f32
    counter: jnp.ndarray  # i32
    gain: jnp.ndarray  # f32
    scores: jnp.ndarray  # (Smax,)


def init_state(static: StepStatic, batch_shape: tuple = ()) -> StreamState:
    F, C = static.max_mfcc_frames, static.mfcc_size
    Wg = static.gain_window_size
    S = static.smax

    def z(shape, dtype=np.float32, fill=0):
        return jnp.full(batch_shape + shape, fill, dtype=dtype)

    return StreamState(
        ext_buf=z((SAMPLES_PER_FRAME,)),
        ext_count=z((), jnp.int32),
        win=z((F, C)),
        win_count=z((), jnp.int32),
        vad_win=z((VAD_WINDOW,), np.float32, np.nan),
        vad_countdown=z((), jnp.int32),
        rs_overlap=z((SAMPLES_PER_FRAME,)),
        gain_win=z((Wg,)),
        gain_count=z((), jnp.int32),
        gain=z((), np.float32, 1.0),
        rms_level=z(()),
        bp=z((4,)),
        partial_active=z((), bool, False),
        partial_ww=z((), jnp.int32),
        partial_score=z(()),
        partial_avg=z(()),
        partial_counter=z((), jnp.int32),
        partial_gain=z((), np.float32, np.nan),
        partial_scores=z((S,)),
        countdown=z((), jnp.int32),
    )
