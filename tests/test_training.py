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
