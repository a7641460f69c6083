"""Train→detect end-to-end harness with loss/accuracy curve logging.

Trains a classifier-NN wakeword on the reference's committed train/test wavs
(the exact data `tests/wakeword.rs:87-98` smoke-trains on), logs the full-batch
SGD loss curve and test accuracy, then runs the freshly trained model through
the streaming detector on a held-out positive (`oye_casa_real_2.wav`, 48 kHz)
and a negative (`noise3.wav`) to confirm the trained artifact actually spots
the word. The reference prints the same loss/acc lines during training
(wakeword_model_train.rs:210-218) but publishes no curve; this records ours
for regression tracking.

Usage: python tools/train_curve.py [epochs] [lr]   (default 2000, 0.017)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RES = "/root/reference/tests/resources"


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.017

    from rustpotter_tpu import (
        ModelType,
        Rustpotter,
        RustpotterConfig,
        WakewordModelTrainOptions,
        train_from_dirs,
    )
    from rustpotter_tpu.utils.wav import read_wav

    opts = WakewordModelTrainOptions(
        m_type=ModelType.MEDIUM, learning_rate=lr, epochs=epochs, test_epochs=50,
        mfcc_size=16,
    )
    model = train_from_dirs(
        opts, os.path.join(RES, "train"), os.path.join(RES, "test"), verbose=True
    )
    print(
        json.dumps(
            {
                "labels": model.labels,
                "train_size": model.train_size,
                "n_weight_tensors": len(model.weights),
            }
        )
    )

    # detect on held-out audio: positive should fire, negative should not
    from rustpotter_tpu.mfcc.offline import audio_fmt_from_spec

    def stream(path):
        cfg = RustpotterConfig()
        cfg.detector.threshold = 0.5
        cfg.detector.min_scores = 5
        samples, spec = read_wav(path)
        cfg.fmt = audio_fmt_from_spec(spec)
        pot = Rustpotter(cfg)
        pot.add_wakeword_model("w", model)
        buf = np.concatenate(
            [samples.astype(np.float32), np.zeros(spec.sample_rate * 5, np.float32)]
        )
        in_len = pot.get_samples_per_frame()
        n = len(buf) // in_len
        frames16 = [
            pot.wav_encoder.rencode_and_resample(buf[i * in_len : (i + 1) * in_len])
            for i in range(n)
        ]
        dets = pot.process_audio_sequence(np.concatenate(frames16))
        return [(d.name, round(float(d.score), 5), int(d.counter)) for d in dets]

    pos = stream(os.path.join(RES, "oye_casa_real_2.wav"))
    neg = stream(os.path.join(RES, "test/noise3.wav"))
    print(json.dumps({"positive_detections": pos, "negative_detections": neg}))
    ok = len(pos) >= 1 and all(n == "oye casa" for n, _, _ in pos) and not neg
    print(json.dumps({"train_detect_e2e": "PASS" if ok else "FAIL"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
