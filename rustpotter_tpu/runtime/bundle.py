"""Detector bundle: static (compile-time) config + padded device arrays.

The reference keeps a `HashMap<String, Box<dyn WakewordDetector>>` and loops
over it per frame (/root/reference/src/detector.rs:433-447). TPU-native
equivalent: all DTW wakewords are padded into dense (W, K, L, C) arrays scored
in one batched pass; NN wakewords are statically unrolled (distinct
architectures). All shapes static, per-wakeword thresholds resolved at build
(wakeword overrides ride in the file — wakeword_ref.rs:16-17, applied at
wakeword_comp.rs:83,95).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import numpy as np

from ..audio.filters import band_pass_coefficients
from ..config import RustpotterConfig, ScoreMode
from ..constants import DETECTOR_INTERNAL_SAMPLE_RATE
from ..wakewords.files import WakewordModel, WakewordRef
from ..wakewords.nn import params_from_tensor_data


@dataclass(frozen=True)
class NNMeta:
    train_size: int
    labels: Tuple[str, ...]
    none_idx: int  # -1 if "none" not among labels
    m_type: str = "tiny"  # ModelType value; drives honest roofline sizes


@dataclass(frozen=True)
class StepStatic:
    """Hashable compile-time configuration for the stream step."""

    mfcc_size: int
    max_mfcc_frames: int  # F: live window length
    band_size: int
    score_mode: ScoreMode
    eager: bool
    min_scores: int
    score_ref: float
    vad_enabled: bool
    vad_factor: float
    gain_enabled: bool
    gain_min: float
    gain_max: float
    gain_window_size: int
    bp_enabled: bool
    bp_coeffs: Tuple[float, ...]
    n_dtw: int
    kmax: int
    lmax: int
    la_max: int
    nn_meta: Tuple[NNMeta, ...]
    # static per-pair DP lengths: all template lengths (padded with 1s to
    # kmax per wakeword, in order) followed by per-wakeword avg lengths
    dtw_pair_lens: Tuple[int, ...] = ()
    smax: int = 1  # width of the per-detection scores payload
    names: Tuple[str, ...] = ()  # wakeword keys, DTW first then NN
    dtw_template_names: Tuple[Tuple[str, ...], ...] = ()
    # in-graph resampling (batched runtime): 0 = stream is already 16 kHz and
    # the step takes 480-sample frames; else the step takes input_samples raw
    # samples at input_rate and resamples on-chip
    input_samples: int = 480
    input_rate: int = DETECTOR_INTERNAL_SAMPLE_RATE
    # DTW kernel selection, resolved at bundle build (NOT a trace-time env
    # read — part of the compile key): None = auto (fused kernel on TPU,
    # two-stage scan path elsewhere)
    dtw_fused: Optional[bool] = None
    # fused-kernel variant: 3 = gated SMEM-template kernel (default),
    # 2 = ungated two-phase kernel (RUSTPOTTER_FUSED_VARIANT=2)
    dtw_fused_variant: int = 3


import jax


@jax.tree_util.register_pytree_node_class
@dataclass
class StepParams:
    """Device arrays consumed by the jitted step (replicated across streams)."""

    dtw_templates: np.ndarray  # (D, K, L, C)
    dtw_lens: np.ndarray  # (D, K) i32
    dtw_kvalid: np.ndarray  # (D,) i32
    dtw_avg: np.ndarray  # (D, La, C)
    dtw_avg_len: np.ndarray  # (D,) i32
    dtw_has_avg: np.ndarray  # (D,) bool
    dtw_threshold: np.ndarray  # (D,) resolved
    dtw_avg_threshold: np.ndarray  # (D,) resolved
    nn_params: Tuple  # per NN wakeword: tuple of (W, b) pairs
    gain_ref_sqrt: np.ndarray  # scalar f32 (sqrt of target rms level; NaN if none)
    threshold: np.ndarray  # scalar f32 (global, used by NN)
    avg_threshold: np.ndarray  # scalar f32 (global, used by NN)

    _FIELDS = (
        "dtw_templates", "dtw_lens", "dtw_kvalid", "dtw_avg", "dtw_avg_len",
        "dtw_has_avg", "dtw_threshold", "dtw_avg_threshold", "nn_params",
        "gain_ref_sqrt", "threshold", "avg_threshold",
    )

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(cls._FIELDS, children)))


Wakeword = Union[WakewordRef, WakewordModel]


def rust_f32_max(a: float, b: float) -> float:
    """Rust f32::max ignores NaN operands (detector.rs:333)."""
    if np.isnan(a):
        return b
    if np.isnan(b):
        return a
    return max(a, b)


def build_bundle(
    wakewords: List[Tuple[str, Wakeword]],
    config: RustpotterConfig,
    in_graph_resample: bool = False,
    dtw_fused: Optional[bool] = None,
) -> Tuple[StepStatic, StepParams]:
    import os

    det = config.detector
    if dtw_fused is None:
        # env consulted ONCE here, at bundle build on the host — the traced
        # step reads only the static fields (compile-key-visible)
        env = os.environ.get("RUSTPOTTER_FUSED")
        dtw_fused = None if env is None else env == "1"
    fused_variant = int(os.environ.get("RUSTPOTTER_FUSED_VARIANT", "3"))
    input_samples, input_rate = 480, DETECTOR_INTERNAL_SAMPLE_RATE
    if in_graph_resample and config.fmt.sample_rate != DETECTOR_INTERNAL_SAMPLE_RATE:
        from ..audio.resampler import chunk_sizes

        input_samples, _ = chunk_sizes(
            config.fmt.sample_rate, DETECTOR_INTERNAL_SAMPLE_RATE, 480
        )
        input_rate = config.fmt.sample_rate
    refs = [(k, w) for k, w in wakewords if isinstance(w, WakewordRef)]
    models = [(k, w) for k, w in wakewords if isinstance(w, WakewordModel)]
    if not refs and not models:
        raise ValueError("no wakewords")
    mfcc_size = (refs + models)[0][1].mfcc_size
    for _, w in refs + models:
        if w.mfcc_size != mfcc_size:
            raise ValueError(
                "Usage of wakewords with different mfcc size is not supported"
            )

    # max window length and gain target (detector.rs:328-346)
    max_frames = 0
    target_rms = float("nan")
    for _, w in refs:
        max_frames = max(max_frames, max(len(m) for m in w.samples_features.values()))
        target_rms = rust_f32_max(target_rms, w.rms_level)
    for _, w in models:
        max_frames = max(max_frames, w.train_size)
        target_rms = rust_f32_max(target_rms, w.rms_level)

    D = len(refs)
    kmax = max((len(w.samples_features) for _, w in refs), default=1)
    lmax = max(
        (len(m) for _, w in refs for m in w.samples_features.values()), default=1
    )
    la_max = max(
        (len(w.avg_features) for _, w in refs if w.avg_features is not None), default=1
    )
    C = mfcc_size

    d_templates = np.zeros((max(D, 1), kmax, lmax, C), np.float32)
    d_lens = np.ones((max(D, 1), kmax), np.int32)
    d_kvalid = np.ones((max(D, 1),), np.int32)
    d_avg = np.zeros((max(D, 1), la_max, C), np.float32)
    d_avg_len = np.ones((max(D, 1),), np.int32)
    d_has_avg = np.zeros((max(D, 1),), bool)
    d_th = np.zeros((max(D, 1),), np.float32)
    d_avg_th = np.zeros((max(D, 1),), np.float32)
    template_names: List[Tuple[str, ...]] = []
    for i, (_, w) in enumerate(refs):
        items = sorted(w.samples_features.items())  # deterministic order
        template_names.append(tuple(k for k, _ in items))
        d_kvalid[i] = len(items)
        for j, (_, m) in enumerate(items):
            d_lens[i, j] = len(m)
            d_templates[i, j, : len(m)] = m
        if w.avg_features is not None:
            d_has_avg[i] = True
            d_avg_len[i] = len(w.avg_features)
            d_avg[i, : len(w.avg_features)] = w.avg_features
        d_th[i] = w.threshold if w.threshold is not None else det.threshold
        d_avg_th[i] = (
            w.avg_threshold if w.avg_threshold is not None else det.avg_threshold
        )

    nn_meta = []
    nn_params = []
    for _, w in models:
        labels = tuple(w.labels)
        none_idx = labels.index("none") if "none" in labels else -1
        nn_meta.append(NNMeta(
            train_size=w.train_size, labels=labels, none_idx=none_idx,
            m_type=w.m_type.value,
        ))
        nn_params.append(
            tuple(
                (np.asarray(p[0]), np.asarray(p[1]))
                for p in params_from_tensor_data(w.weights)
            )
        )

    smax = max(
        [d_kvalid.max() if D else 1] + [len(m.labels) for m in nn_meta] or [1]
    )
    static = StepStatic(
        mfcc_size=mfcc_size,
        max_mfcc_frames=max_frames,
        band_size=det.band_size,
        score_mode=det.score_mode,
        eager=det.eager,
        min_scores=det.min_scores,
        score_ref=det.score_ref,
        vad_enabled=det.vad_mode is not None,
        vad_factor=det.vad_mode.value_factor if det.vad_mode is not None else 2.0,
        gain_enabled=config.filters.gain_normalizer.enabled,
        gain_min=config.filters.gain_normalizer.min_gain,
        gain_max=config.filters.gain_normalizer.max_gain,
        gain_window_size=max(max_frames // 3, 1),
        bp_enabled=config.filters.band_pass.enabled,
        bp_coeffs=tuple(
            float(c)
            for c in band_pass_coefficients(
                float(DETECTOR_INTERNAL_SAMPLE_RATE),
                config.filters.band_pass.low_cutoff,
                config.filters.band_pass.high_cutoff,
            )
        ),
        n_dtw=D,
        kmax=int(kmax),
        lmax=int(lmax),
        la_max=int(la_max),
        nn_meta=tuple(nn_meta),
        dtw_pair_lens=tuple(int(x) for x in d_lens.reshape(-1)) + tuple(int(x) for x in d_avg_len),
        smax=int(smax),
        names=tuple([k for k, _ in refs] + [k for k, _ in models]),
        dtw_template_names=tuple(template_names),
        input_samples=input_samples,
        input_rate=input_rate,
        dtw_fused=dtw_fused,
        dtw_fused_variant=fused_variant,
    )
    fixed_gain_ref = config.filters.gain_normalizer.gain_ref
    gain_ref = fixed_gain_ref if fixed_gain_ref is not None else target_rms
    params = StepParams(
        dtw_templates=d_templates,
        dtw_lens=d_lens,
        dtw_kvalid=d_kvalid,
        dtw_avg=d_avg,
        dtw_avg_len=d_avg_len,
        dtw_has_avg=d_has_avg,
        dtw_threshold=d_th,
        dtw_avg_threshold=d_avg_th,
        nn_params=tuple(nn_params),
        gain_ref_sqrt=np.float32(np.sqrt(gain_ref) if gain_ref == gain_ref and gain_ref >= 0 else np.nan),
        threshold=np.float32(det.threshold),
        avg_threshold=np.float32(det.avg_threshold),
    )
    return static, params
