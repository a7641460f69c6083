"""Profiling and roofline accounting for the streaming pipeline.

The reference has no tracing/profiling at all (SURVEY.md §5). TPU-native
equivalents here:
  - `trace(...)`: context manager around jax.profiler for on-device traces
    (view with TensorBoard / xprof)
  - `step_roofline(...)`: analytic FLOP/byte model of one detector step per
    stream, and speed-of-light bounds on a given chip spec
"""
from __future__ import annotations

import contextlib
from dataclasses import dataclass

import jax

from ..runtime.bundle import StepStatic


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace of the enclosed computation."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ChipSpec:
    """Peak numbers for roofline bounds.

    vpu_f32_tflops is MEASURED, not nameplate: tools/vpu_probe.py sustains
    ~1511 (8,128)-tile scalar*tile FMAs/us on this v5e through the tunnel
    (= 1511e6 * 1024 lanes * 2 flops ~= 3.09 TFLOP/s). Rooflines computed
    against a larger assumed VPU rate are fiction — r2's '~0.4 ms kernel
    speed-of-light' collapsed to ~0.85 ms once the issue rate was measured."""

    name: str = "v5e"
    mxu_f32_tflops: float = 49.0  # bf16x6 ("highest") effective f32
    vpu_f32_tflops: float = 3.09  # measured (tools/vpu_probe.py fma32)
    hbm_gbps: float = 819.0


@dataclass
class StepCost:
    mxu_flops: float
    vpu_flops: float
    hbm_bytes: float

    def seconds_bound(self, chip: ChipSpec) -> float:
        return max(
            self.mxu_flops / (chip.mxu_f32_tflops * 1e12),
            self.vpu_flops / (chip.vpu_f32_tflops * 1e12),
            self.hbm_bytes / (chip.hbm_gbps * 1e9),
        )


def step_roofline(static: StepStatic) -> StepCost:
    """Per-stream cost of one 30 ms step (3 MFCC shifts + 3 detections),
    modeling the FUSED serving path (circular window + v3 kernel): the cost
    band and rwn live in VMEM (no HBM charge), CMN means and dot(T',m) are
    MXU einsums, and the window is written one row per shift (no roll)."""
    C = static.mfcc_size
    nc = C + 1
    F = static.max_mfcc_frames
    L = max(static.lmax, static.la_max)
    w = static.band_size
    pairs = static.n_dtw * static.kmax + static.n_dtw
    shifts = 3

    # MFCC: windowed DFT (480x240 x2) + mel (240 x nc) + DCT (nc x nc)
    mxu = shifts * 2 * (480 * 240 * 2 + 240 * nc + nc * nc)
    # CMN means (pairs x F over C) + dotm (pairs x L over C) einsums
    mxu += shifts * 2 * (pairs * F * C + pairs * L * C)
    # band costs: pairs x L x 2w dot products over C (+ epilogue)
    vpu = shifts * pairs * L * 2 * w * (2 * C + 4)
    # rwn pre-pass: pairs x L columns x ~3C ops
    vpu += shifts * pairs * L * 3 * C
    # DP: pairs x L rows x 2w lanes x ~6 ops
    vpu += shifts * pairs * L * 2 * w * 6
    # NN wakewords
    for meta in static.nn_meta:
        sizes = layer_sizes_from_meta(meta, C)
        mxu += shifts * 2 * sum(a * b for a, b in zip(sizes[:-1], sizes[1:]))
    # HBM: window read by the kernel + one-row write + dotm spill/reload;
    # cost band + rwn stay in VMEM scratch
    hbm = shifts * 4 * (
        F * C  # window read (once per shift, VMEM-blocked)
        + C  # circular one-row write
        + 2 * pairs * L  # dotm write + kernel read
    )
    return StepCost(mxu_flops=float(mxu), vpu_flops=float(vpu), hbm_bytes=float(hbm))


def layer_sizes_from_meta(meta, mfcc_size: int):
    from ..wakewords.files import ModelType
    from ..wakewords.nn import layer_sizes

    return layer_sizes(
        ModelType(meta.m_type), meta.train_size * mfcc_size, mfcc_size,
        len(meta.labels),
    )


def streams_speed_of_light(static: StepStatic, chip: ChipSpec | None = None) -> float:
    """Upper bound on real-time streams/chip for the current op structure."""
    chip = chip or ChipSpec()
    cost = step_roofline(static)
    return 0.03 / cost.seconds_bound(chip)
