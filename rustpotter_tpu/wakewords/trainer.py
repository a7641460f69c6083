"""Classifier-NN wakeword training.

Parity: /root/reference/src/wakewords/nn/wakeword_model_train.rs — labels
parsed from "[label]" in the file name else "none" (:289-339), input length =
longest training sample or the prior model's (:108-111), zero pad/truncate
(:117-120), full-batch SGD with NLL(log_softmax) loss (:197-208), periodic
test-set accuracy reporting (:210-218,252-273), fine-tuning from a prior model
with the label set frozen (:65-79,310-318).

TPU-native: the whole training loop is a jax.lax.scan of jitted SGD steps over
the full batch (the reference trains full-batch too); data prep is host-side.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NN_NONE_LABEL
from ..mfcc.offline import compute_mfccs
from .files import ModelType, WakewordModel
from .nn import forward, init_params, layer_sizes, params_from_tensor_data, params_to_tensor_data


@dataclass
class WakewordModelTrainOptions:
    m_type: ModelType = ModelType.MEDIUM
    learning_rate: float = 0.017
    epochs: int = 1000
    test_epochs: int = 10
    mfcc_size: int = 16


def _label_from_filename(name: str) -> str:
    start = name.find("[")
    end = name.find("]")
    if start != -1 and end != -1 and start < end:
        return name[start + 1 : end].lower()
    return NN_NONE_LABEL


def _get_mfccs_labeled(
    samples: Dict[str, bytes],
    labels: List[str],
    new_labels: bool,
    mfcc_size: int,
) -> Tuple[List[Tuple[np.ndarray, int]], float]:
    labeled = []
    rms_level = float("nan")
    for name, buffer in samples.items():
        label = _label_from_filename(name)
        if label not in labels:
            if new_labels:
                labels.append(label)
            else:
                raise ValueError(
                    f"Forbidden label '{label}', it doesn't exists on the training "
                    "data or in the model you are training from."
                )
        mfccs, rms = compute_mfccs(buffer, mfcc_size)
        if label != NN_NONE_LABEL:
            rms_level = rms if np.isnan(rms_level) else (rms_level + rms) / 2.0
        labeled.append((mfccs.reshape(-1).astype(np.float32), labels.index(label)))
    return labeled, rms_level


def _files_data_map(dir_path: str) -> Dict[str, bytes]:
    out = {}
    for fn in os.listdir(dir_path):
        if fn.endswith(".wav"):
            with open(os.path.join(dir_path, fn), "rb") as f:
                out[fn] = f.read()
    return out


def train_from_buffers(
    options: WakewordModelTrainOptions,
    samples: Dict[str, bytes],
    test_samples: Dict[str, bytes],
    prior_model: Optional[WakewordModel] = None,
    seed: int = 0,
    verbose: bool = True,
    history_out: Optional[dict] = None,
) -> WakewordModel:
    """history_out (optional dict) receives {'loss': [per-epoch train loss],
    'test_accuracy': final test-set accuracy} — the telemetry the reference
    prints during training (wakeword_model_train.rs:210-218)."""
    if not samples:
        raise ValueError("No training data provided")
    if not test_samples:
        raise ValueError("No test data provided")
    labels: List[str] = list(prior_model.labels) if prior_model else []
    m_type = prior_model.m_type if prior_model else options.m_type
    mfcc_size = prior_model.mfcc_size if prior_model else options.mfcc_size
    labeled, rms_level = _get_mfccs_labeled(samples, labels, prior_model is None, mfcc_size)
    test_labeled, _ = _get_mfccs_labeled(test_samples, labels, False, mfcc_size)
    if len(labels) < 2:
        raise ValueError("Your training data need to contain at least two labels")
    input_len = (
        prior_model.train_size * mfcc_size
        if prior_model
        else max(len(f) for f, _ in labeled)
    )

    def stack(rows):
        feats = np.zeros((len(rows), input_len), np.float32)
        labs = np.zeros((len(rows),), np.int32)
        for i, (f, l) in enumerate(rows):
            n = min(len(f), input_len)
            feats[i, :n] = f[:n]
            labs[i] = l
        return feats, labs

    x_train, y_train = stack(labeled)
    x_test, y_test = stack(test_labeled)

    if prior_model is not None:
        params = [
            (jnp.asarray(w), jnp.asarray(b))
            for w, b in params_from_tensor_data(prior_model.weights)
        ]
    else:
        params = [
            (jnp.asarray(w), jnp.asarray(b))
            for w, b in init_params(m_type, input_len, mfcc_size, len(labels), seed)
        ]

    lr = jnp.float32(options.learning_rate)
    xt, yt = jnp.asarray(x_train), jnp.asarray(y_train)

    def loss_fn(params, x, y):
        logits = forward(params, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # NLL over the batch (candle loss::nll averages)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    @jax.jit
    def sgd_step(params, _):
        loss, grads = jax.value_and_grad(loss_fn)(params, xt, yt)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    @jax.jit
    def test_acc(params):
        logits = forward(params, jnp.asarray(x_test))
        return jnp.mean(jnp.argmax(logits, axis=-1) == jnp.asarray(y_test))

    params_t = tuple(params)
    chunk = max(1, options.test_epochs)
    epoch = 0
    loss_history: List[float] = []
    while epoch < options.epochs:
        n = min(chunk, options.epochs - epoch)
        params_t, losses = jax.lax.scan(sgd_step, params_t, None, length=n)
        epoch += n
        loss_history.extend(float(x) for x in np.asarray(losses))
        if verbose:
            acc = float(test_acc(params_t))
            print(f"{epoch:4} train loss: {float(losses[-1]):8.5f} test acc: {100.0 * acc:5.2f}%")
    if history_out is not None:
        history_out["loss"] = loss_history
        history_out["test_accuracy"] = float(test_acc(params_t))

    weights = params_to_tensor_data([(np.asarray(w), np.asarray(b)) for w, b in params_t])
    return WakewordModel(
        labels=labels,
        m_type=m_type,
        train_size=input_len // mfcc_size,
        mfcc_size=mfcc_size,
        weights=weights,
        rms_level=rms_level,
    )


def train_from_dirs(
    options: WakewordModelTrainOptions,
    train_dir: str,
    test_dir: str,
    prior_model: Optional[WakewordModel] = None,
    **kw,
) -> WakewordModel:
    return train_from_buffers(
        options, _files_data_map(train_dir), _files_data_map(test_dir), prior_model, **kw
    )
