"""Trainer-math cross-check against an independent implementation.

The reference trains with candle (full-batch SGD, NLL(log_softmax), plain
lr*grad updates — wakeword_model_train.rs:197-208). Our trainer re-derives
that in JAX; this test replicates the exact same semantics in torch (CPU,
f32) from the SAME initial weights and data, and requires the two loss
trajectories and final weights to agree — an implementation-independent
pin of the training math (VERDICT r2/r3 'training parity extras' agenda).
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from rustpotter_tpu.wakewords.files import ModelType
from rustpotter_tpu.wakewords.nn import forward, init_params

EPOCHS = 60
LR = 0.02


def _data(n=24, input_len=960, n_labels=3, seed=9):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, input_len)).astype(np.float32)
    y = rng.integers(0, n_labels, n).astype(np.int64)
    # make the task learnable: shift features by label
    x += y[:, None] * 0.3
    return x, y


def _jax_trajectory(params0, x, y):
    params = tuple((jnp.asarray(w), jnp.asarray(b)) for w, b in params0)
    xt, yt = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
    lr = jnp.float32(LR)

    def loss_fn(params):
        logits = forward(params, xt)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, yt[:, None], axis=-1))

    losses = []
    for _ in range(EPOCHS):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        losses.append(float(loss))
    return np.array(losses), [(np.asarray(w), np.asarray(b)) for w, b in params]


def _torch_trajectory(params0, x, y):
    ws = [torch.nn.Parameter(torch.tensor(w)) for w, _ in params0]
    bs = [torch.nn.Parameter(torch.tensor(b)) for _, b in params0]
    xt = torch.tensor(x)
    yt = torch.tensor(y)
    opt = torch.optim.SGD(list(ws) + list(bs), lr=LR)
    losses = []
    for _ in range(EPOCHS):
        h = xt
        for i in range(len(ws)):
            h = h @ ws[i].T + bs[i]
            if i < len(ws) - 1:
                h = torch.relu(h)
        loss = torch.nn.functional.nll_loss(
            torch.log_softmax(h, dim=-1), yt
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return np.array(losses), [
        (w.detach().numpy(), b.detach().numpy()) for w, b in zip(ws, bs)
    ]


def test_sgd_trajectory_matches_torch():
    x, y = _data()
    params0 = init_params(ModelType.MEDIUM, 960, 16, 3, seed=5)
    jl, jp = _jax_trajectory(params0, x, y)
    tl, tp = _torch_trajectory(params0, x, y)
    # same math, different backends: early epochs near-identical, late
    # epochs bounded by f32 accumulation drift
    np.testing.assert_allclose(jl[:10], tl[:10], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(jl, tl, rtol=5e-3, atol=5e-4)
    assert jl[-1] < jl[0] * 0.5  # genuinely trained
    for (jw, jb), (tw, tb) in zip(jp, tp):
        np.testing.assert_allclose(jw, tw, rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(jb, tb, rtol=5e-3, atol=5e-4)
