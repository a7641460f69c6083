"""Analytic speed-of-light vs measured throughput, per bench scenario.

Usage: python tools/roofline_report.py [measured_json ...]

With no args, prints the analytic bounds only (runs anywhere, CPU included —
the model is analytic). Pass the JSON lines emitted by tools/bench_suite.py
(or paste `name=value` pairs) to get measured-%-of-SoL columns.

The VPU denominator is the MEASURED v5e issue rate (tools/vpu_probe.py), not
a nameplate number — see utils/profiling.ChipSpec.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    measured = {}
    for a in sys.argv[1:]:
        try:
            d = json.loads(a)
            name = d["metric"].split("[")[-1].rstrip("]")
            measured[name] = float(d["value"])
        except (json.JSONDecodeError, KeyError):
            k, v = a.split("=")
            measured[k] = float(v)

    from rustpotter_tpu import RustpotterConfig, ScoreMode
    from rustpotter_tpu.runtime.bundle import build_bundle
    from rustpotter_tpu.utils.profiling import (
        ChipSpec, step_roofline, streams_speed_of_light,
    )
    from bench_suite import _dtw_wakeword, _nn_wakeword

    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.avg_threshold = 0.2
    chip = ChipSpec()
    scenarios = {
        "dtw_max": [("w", _dtw_wakeword())],
        "nn_medium": [("m", _nn_wakeword())],
        "mixed": [("w", _dtw_wakeword()), ("m", _nn_wakeword())],
    }
    print(f"chip: {chip.name}  (VPU {chip.vpu_f32_tflops} TF/s MEASURED, "
          f"MXU {chip.mxu_f32_tflops} TF/s, HBM {chip.hbm_gbps} GB/s)")
    print(f"{'scenario':10s} {'SoL streams/chip':>16s} {'bound':>6s} "
          f"{'measured':>9s} {'% of SoL':>8s}")
    for name, wws in scenarios.items():
        static, _ = build_bundle(wws, cfg)
        cost = step_roofline(static)
        sol = streams_speed_of_light(static, chip)
        bounds = {
            "mxu": cost.mxu_flops / (chip.mxu_f32_tflops * 1e12),
            "vpu": cost.vpu_flops / (chip.vpu_f32_tflops * 1e12),
            "hbm": cost.hbm_bytes / (chip.hbm_gbps * 1e9),
        }
        binding = max(bounds, key=bounds.get)
        m = measured.get(name)
        ms = f"{m:9.0f}" if m else "        -"
        pct = f"{100*m/sol:7.1f}%" if m else "       -"
        print(f"{name:10s} {sol:16.0f} {binding:>6s} {ms} {pct}")


if __name__ == "__main__":
    main()
