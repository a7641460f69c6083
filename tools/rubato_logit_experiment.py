"""Does a resampler-arithmetic change at the f32 noise floor move the
ok_casa NN logits? (VERDICT r3 next #2 — the decisive follow-up to the
table identification in tools/rubato_fit.py.)

Runs the single-stream detector on ok_casa.wav (the reference's exact-logit
test, /root/reference/tests/detector.rs:225-230: ok_casa 3.7506533 /
none -16.83091 / counter 34) twice:
  A. production resampler (f64 FFT-OLA, round-1 identified cutoff)
  B. the f32 rustfft/realfft-emulation oracle with the LS-identified table
     (tools/rubato_fit.py --save), i.e. a resampler that differs from A by
     ~1 ulp per sample and from the true rubato output by the SIMD-vs-
     scalar FFT residual the fit experiment measured.

Reported: waveform delta A vs B on the resampled stream, per-variant
emitted logits/counters, and their distance to the reference's constants.
If the A-B logit spread is of the same order as the distance to the
reference values, the suite's counter +-1 / logit +-3 band is the floor
imposed by the unidentifiable resampler arithmetic — not slack.

Usage: python tools/rubato_fit.py --iters 4 --save /tmp/rubato_table.npz
       python tools/rubato_logit_experiment.py /tmp/rubato_table.npz
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

RES = "/root/reference/tests/resources"
F32 = np.float32


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    table = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rubato_table.npz"
    tab = np.load(table)
    fr, fi = tab["filter_re"], tab["filter_im"]

    from rustpotter_tpu.audio import rustfft_f32 as ro
    from rustpotter_tpu import RustpotterConfig
    from rustpotter_tpu.mfcc.offline import audio_fmt_from_spec
    from rustpotter_tpu.runtime.detector import Rustpotter
    from rustpotter_tpu.utils.wav import read_wav
    from rustpotter_tpu.audio import resampler as rs

    samples, spec = read_wav(os.path.join(RES, "ok_casa.wav"))
    stream = np.concatenate(
        [samples.astype(F32), np.zeros(spec.sample_rate * 5, F32)]
    )
    nch = len(stream) // 1440
    chunks = stream[: nch * 1440].reshape(nch, 1440).astype(F32)

    # waveform delta between the two resampler variants
    r64 = rs.FftResampler(1440, 480)
    ya = np.concatenate([r64.process(c) for c in chunks])
    orc = ro.RubatoOracle(fr, fi)
    yb = np.concatenate([orc.process(c) for c in chunks])
    d = np.abs(ya - yb)
    print(f"resampled ok_casa stream: max|A-B| {d.max():.3e}  "
          f"rms {np.sqrt((d.astype(np.float64)**2).mean()):.3e}  "
          f"(stream rms {np.sqrt((ya.astype(np.float64)**2).mean()):.3e})")

    def detect(frames16):
        cfg = RustpotterConfig()
        cfg.detector.avg_threshold = 0.0
        cfg.fmt = audio_fmt_from_spec(spec)
        rp = Rustpotter(cfg)
        rp.add_wakeword_from_file("w", os.path.join(RES, "ok_casa-tiny.rpw"))
        return rp.process_audio_sequence(frames16)

    ref = {"ok_casa": 3.7506533, "none": -16.83091, "counter": 34}
    for name, y in (("A f64-production", ya), ("B f32-oracle+LS-table", yb)):
        dets = detect(y)
        for det in dets:
            print(f"{name}: counter {det.counter} "
                  f"ok_casa {det.scores['ok_casa']:.6f} "
                  f"none {det.scores['none']:.6f} "
                  f"| Δref ok_casa {det.scores['ok_casa'] - ref['ok_casa']:+.3f} "
                  f"none {det.scores['none'] - ref['none']:+.3f} "
                  f"counter {det.counter - ref['counter']:+d}")


if __name__ == "__main__":
    main()
