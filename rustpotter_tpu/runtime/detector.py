"""Rustpotter: the single-stream host API around the jitted stream step.

Public-API parity with /root/reference/src/detector.rs (Rustpotter struct):
new/add_wakeword*/remove_wakeword(s)/process_bytes/process_samples/
update_config/reset/getters, and RustpotterDetection (detector.rs:486-501).

The audio encoder (byte decode, downmix, resampling) runs host-side like the
reference's; everything from the 480-sample f32 frame onward runs inside the
jitted step (see stream_step.py). `process_audio_sequence` scans a whole
recording through the step in one XLA call — the fast path used by tests and
benchmarks.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.encoder import AudioEncoder
from ..config import RustpotterConfig
from ..wakewords.files import WakewordModel, WakewordRef, load_wakeword
from .bundle import StepParams, StepStatic, build_bundle
from .state import StreamState, init_state
from .stream_step import make_step


@dataclass
class RustpotterDetection:
    """Detection payload (parity: detector.rs:486-501)."""

    name: str
    avg_score: float
    score: float
    scores: Dict[str, float]
    counter: int
    gain: float


class Rustpotter:
    """Streaming wakeword spotter over one audio stream."""

    def __init__(self, config: Optional[RustpotterConfig] = None):
        self.config = config if config is not None else RustpotterConfig()
        self.wav_encoder = AudioEncoder(self.config.fmt)
        self.wakewords: List[tuple] = []  # (key, wakeword) insertion-ordered
        self._static: Optional[StepStatic] = None
        self._params: Optional[StepParams] = None
        self._step = None
        self._scan = None
        self._state: Optional[StreamState] = None

    # ---------------------------------------------------------- wakewords
    def add_wakeword_from_file(self, key: str, path: str) -> None:
        self.add_wakeword(key, load_wakeword(path))

    def add_wakeword_from_buffer(self, key: str, buffer: bytes) -> None:
        self.add_wakeword(key, load_wakeword(buffer))

    def add_wakeword_ref(self, key: str, wakeword: WakewordRef) -> None:
        self.add_wakeword(key, wakeword)

    def add_wakeword_model(self, key: str, wakeword: WakewordModel) -> None:
        self.add_wakeword(key, wakeword)

    def add_wakeword(self, key: str, wakeword: Union[WakewordRef, WakewordModel]) -> None:
        prev = list(self.wakewords)
        self.wakewords = [(k, w) for k, w in self.wakewords if k != key]
        self.wakewords.append((key, wakeword))
        try:
            self._rebuild()
        except ValueError:
            # e.g. mismatched mfcc size (detector.rs:308-320) — keep prior set
            self.wakewords = prev
            self._rebuild()
            raise

    def remove_wakeword(self, key: str) -> bool:
        n = len(self.wakewords)
        self.wakewords = [(k, w) for k, w in self.wakewords if k != key]
        if len(self.wakewords) != n:
            self._rebuild()
            return True
        return False

    def remove_wakewords(self) -> bool:
        if self.wakewords:
            self.wakewords = []
            self._rebuild()
            return True
        return False

    def _rebuild(self) -> None:
        if not self.wakewords:
            self._static = self._params = self._step = self._scan = self._state = None
            return
        self._static, self._params = build_bundle(self.wakewords, self.config)
        # keep params on-device: host numpy args would re-upload per dispatch
        self._params = jax.device_put(self._params)
        step = make_step(self._static)
        self._step = jax.jit(step)

        def scan_fn(params, state, frames):
            def body(s, frame):
                s, ev = step(params, s, frame)
                return s, ev

            return jax.lax.scan(body, state, frames)

        self._scan = jax.jit(scan_fn)
        self._state = init_state(self._static)

    # ------------------------------------------------------------- config
    def update_config(self, config: RustpotterConfig) -> None:
        self.config = config
        self.wav_encoder = AudioEncoder(config.fmt)
        self._rebuild()
        self.reset()

    def update_detector_config(self, detector_config) -> None:
        self.config.detector = detector_config
        self._rebuild()
        self.reset()

    def update_filters_config(self, filters_config) -> None:
        self.config.filters = filters_config
        self._rebuild()
        self.reset()

    def reset(self) -> None:
        """Clear stream state (detector.rs:290-302). Filters are rebuilt too —
        on the reference, update_*_config recreates them; plain reset keeps
        filter state, matching the masked reset inside the step."""
        if self._static is not None:
            self._state = init_state(self._static)
        self.wav_encoder.reset()

    # ------------------------------------------------------------ getters
    def get_samples_per_frame(self) -> int:
        return self.wav_encoder.get_input_frame_length()

    def get_bytes_per_frame(self) -> int:
        return self.wav_encoder.get_input_byte_length()

    def get_rms_level(self) -> float:
        return float(self._state.rms_level) if self._state is not None else 0.0

    def get_gain(self) -> float:
        return float(self._state.gain) if self._state is not None else 1.0

    def get_rms_level_ref(self) -> float:
        if self._params is None:
            return float("nan")
        return float(np.square(np.float32(self._params.gain_ref_sqrt)))

    def get_partial_detection(self) -> Optional[RustpotterDetection]:
        if self._state is None or not bool(self._state.partial_active):
            return None
        return self._decode_event_like(
            int(self._state.partial_ww),
            float(self._state.partial_score),
            float(self._state.partial_avg),
            int(self._state.partial_counter),
            float(self._state.partial_gain),
            np.asarray(self._state.partial_scores),
        )

    # ---------------------------------------------------------- processing
    def process_bytes(self, audio_bytes: bytes) -> Optional[RustpotterDetection]:
        if len(audio_bytes) != self.get_bytes_per_frame() or not self.wakewords:
            return None
        samples = self.wav_encoder.encode_and_resample(audio_bytes)
        return self.process_audio(samples)

    def process_samples(self, audio_samples) -> Optional[RustpotterDetection]:
        if len(audio_samples) != self.get_samples_per_frame() or not self.wakewords:
            return None
        samples = self.wav_encoder.rencode_and_resample(np.asarray(audio_samples))
        return self.process_audio(samples)

    def process_audio(self, samples: np.ndarray) -> Optional[RustpotterDetection]:
        """samples: 480 mono f32 @16 kHz."""
        record_path = self.config.detector.record_path
        prev_score = float(self._state.partial_score) if record_path else 0.0
        prev_active = bool(self._state.partial_active) if record_path else False
        self._state, event = self._step(
            self._params, self._state, jnp.asarray(samples, jnp.float32)
        )
        if record_path:
            self._record_window(np.asarray(samples, np.float32))
            # a new/improving partial triggers an audio dump
            # (parity: detector.rs:420-423,455-484, `record` cargo feature)
            if bool(self._state.partial_active) and (
                not prev_active or float(self._state.partial_score) > prev_score
            ):
                self._write_record(record_path, float(self._state.partial_score))
        if bool(event.fired):
            return self._decode_event(event)
        return None

    def _record_window(self, samples: np.ndarray) -> None:
        max_samples = (self._static.max_mfcc_frames // 3) * 480
        buf = getattr(self, "_audio_window", np.zeros(0, np.float32))
        buf = np.concatenate([buf, samples])
        if len(buf) > max_samples:
            buf = buf[len(samples):]
        self._audio_window = buf

    def _write_record(self, record_path: str, score: float) -> None:
        import os
        import time

        from ..utils.wav import write_wav

        if not os.path.isdir(record_path):
            return
        name = self._static.names[int(self._state.partial_ww)]
        ts = int(time.time() * 1000)
        fname = f"[{name}]{ts}-{str(score).replace('.', '_')}.wav"
        write_wav(
            os.path.join(record_path, fname), self._audio_window, 16000
        )

    def process_audio_sequence(self, samples: np.ndarray) -> List[RustpotterDetection]:
        """Bulk path: (n*480,) samples scanned in one XLA call."""
        frames = np.asarray(samples, np.float32)
        n = len(frames) // 480
        frames = frames[: n * 480].reshape(n, 480)
        self._state, events = self._scan(self._params, self._state, jnp.asarray(frames))
        out = []
        fired = np.asarray(events.fired)
        for i in np.nonzero(fired)[0]:
            out.append(
                self._decode_event_like(
                    int(events.ww[i]),
                    float(events.score[i]),
                    float(events.avg_score[i]),
                    int(events.counter[i]),
                    float(events.gain[i]),
                    np.asarray(events.scores[i]),
                )
            )
        return out

    # ------------------------------------------------------------- decode
    def _decode_event(self, event) -> RustpotterDetection:
        return self._decode_event_like(
            int(event.ww),
            float(event.score),
            float(event.avg_score),
            int(event.counter),
            float(event.gain),
            np.asarray(event.scores),
        )

    def _decode_event_like(self, ww, score, avg, counter, gain, scores_vec):
        st = self._static
        name_key = st.names[ww]
        wakeword = dict(self.wakewords)[name_key]
        if isinstance(wakeword, WakewordRef):
            labels = st.dtw_template_names[ww]
            display_name = wakeword.name
        else:
            labels = st.nn_meta[ww - st.n_dtw].labels
            # NN detections are named by the winning label; with the scores
            # payload the argmax label is recoverable
            display_name = labels[int(np.argmax(scores_vec[: len(labels)]))]
        scores = {k: float(scores_vec[i]) for i, k in enumerate(labels)}
        return RustpotterDetection(
            name=display_name,
            avg_score=avg,
            score=score,
            scores=scores,
            counter=counter,
            gain=gain,
        )
