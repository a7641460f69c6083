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
    win: jnp.ndarray  # (F, C) live MFCC window — CIRCULAR: see `rot`
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
    # GLOBAL circular-window write cursor — shape () even in a batched state
    # (every stream advances in lockstep; per-stream writes are masked, and
    # scoring is masked until win_count == F, so stale slots are never read).
    # rot = physical index of the NEWEST frame; logical frame i (0 = oldest)
    # lives at physical (rot + 1 + i) % F. Keeping it unbatched is what lets
    # the window update be a dynamic_update_slice at a shared index instead
    # of a per-stream scatter (which serializes on TPU), and lets the whole
    # (F, C) roll copy disappear from the hot step.
    rot: jnp.ndarray


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
        rot=jnp.asarray(F - 1, jnp.int32),  # global scalar, NOT batched
    )


def state_batch_axes() -> StreamState:
    """vmap in/out_axes pytree for a batched StreamState: every per-stream
    leaf on axis 0, the global `rot` cursor unbatched."""
    return StreamState(**{
        f: (None if f == "rot" else 0) for f in StreamState._fields
    })
