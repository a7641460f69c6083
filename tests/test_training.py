"""Training smoke tests (parity: /root/reference/tests/wakeword.rs:87-98)."""
import os

import numpy as np

from rustpotter_tpu.wakewords.files import ModelType, load_wakeword, save_wakeword
from rustpotter_tpu.wakewords.trainer import (
    WakewordModelTrainOptions,
    train_from_dirs,
)


def test_train_medium_model(resources, tmp_path):
    opts = WakewordModelTrainOptions(
        m_type=ModelType.MEDIUM, learning_rate=0.027, epochs=10, test_epochs=3,
        mfcc_size=16,
    )
    model = train_from_dirs(
        opts,
        os.path.join(resources, "train"),
        os.path.join(resources, "test"),
        verbose=False,
    )
    # reference asserts: 2 labels, 6 weight tensors, train_size 168
    assert len(model.labels) == 2
    assert set(model.labels) == {"none", "oye casa"}
    assert len(model.weights) == 6
    assert model.train_size == 168
    # roundtrip through .rpw
    p = str(tmp_path / "trained.rpw")
    save_wakeword(model, p)
    back = load_wakeword(p)
    assert back.train_size == 168 and len(back.weights) == 6


def test_finetune_from_prior(resources):
    opts = WakewordModelTrainOptions(
        m_type=ModelType.TINY, learning_rate=0.017, epochs=4, test_epochs=2,
        mfcc_size=16,
    )
    first = train_from_dirs(
        opts, os.path.join(resources, "train"), os.path.join(resources, "test"),
        verbose=False,
    )
    tuned = train_from_dirs(
        opts, os.path.join(resources, "train"), os.path.join(resources, "test"),
        prior_model=first, verbose=False,
    )
    assert tuned.labels == first.labels
    assert tuned.train_size == first.train_size
    # weights actually moved
    w0 = first.weights["ln1.weight"].to_numpy()
    w1 = tuned.weights["ln1.weight"].to_numpy()
    assert not np.array_equal(w0, w1)


def test_training_converges_and_detects_held_out(resources):
    """Learning-dynamics harness (r1 STATUS gap #4): full-batch SGD at the
    reference's Medium/0.027 settings must drive the train NLL to ~0, and the
    self-trained model must detect the wakeword on a HELD-OUT recording
    (oye_casa_real_2.wav is not in tests/resources/train/)."""
    hist = {}
    opts = WakewordModelTrainOptions(
        m_type=ModelType.MEDIUM, learning_rate=0.027, epochs=60, test_epochs=20,
        mfcc_size=16,
    )
    model = train_from_dirs(
        opts, os.path.join(resources, "train"), os.path.join(resources, "test"),
        verbose=False, history_out=hist,
    )
    assert hist["loss"][0] > 0.5  # starts near ln(2)≈0.69 for 2 labels
    assert hist["loss"][-1] < 1e-3  # converged on the train set
    assert len(hist["loss"]) == 60

    from rustpotter_tpu import RustpotterConfig
    from rustpotter_tpu.mfcc.offline import audio_fmt_from_spec
    from rustpotter_tpu.runtime.detector import Rustpotter
    from rustpotter_tpu.utils.wav import read_wav

    cfg = RustpotterConfig()
    cfg.detector.avg_threshold = 0.0
    samples, spec = read_wav(os.path.join(resources, "oye_casa_real_2.wav"))
    cfg.fmt = audio_fmt_from_spec(spec)
    rp = Rustpotter(cfg)
    rp.add_wakeword_model("m", model)
    stream = np.concatenate([samples.astype(np.float32), np.zeros(48000 * 5, np.float32)])
    in_len = rp.get_samples_per_frame()
    enc = rp.wav_encoder
    f16 = np.concatenate(
        [enc.rencode_and_resample(stream[i * in_len : (i + 1) * in_len])
         for i in range(len(stream) // in_len)]
    )
    dets = rp.process_audio_sequence(f16)
    assert [d.name for d in dets] == ["oye casa"]
    assert dets[0].score > 0.9
