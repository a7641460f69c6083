"""Ragged stream lifecycle at scale: random admit/retire churn over 1024
streams for ~2000 steps (VERDICT r1 #10).

Claims under test (runtime/batch.py reset_streams):
  - a retired slot (masked reset, then silence feed) never fires — including
    slots retired MID-PARTIAL;
  - a re-admitted slot (reset at admission) reproduces the fresh-stream
    detection exactly: same in-round fire step, same counter, same score;
  - never-churned slots keep the steady per-round pattern throughout.

The wakeword is a synthetic chirp through the real MFCC pipeline (template
length 22 keeps the 1024-stream CPU run tractable).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rustpotter_tpu import RustpotterConfig, ScoreMode
from rustpotter_tpu.mfcc.offline import mfcc_pipeline
from rustpotter_tpu.runtime.batch import BatchedDetector
from rustpotter_tpu.wakewords.files import WakewordRef

B = 1024
ROUNDS = 45  # x 45 frames/round = 2025 steps


def _word(n=4000):
    rng = np.random.default_rng(5)
    t = np.arange(n) / 16000.0
    f = 400 + 800 * (t / t[-1])
    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f) / 16000.0) + 0.02 * rng.normal(size=n)
    return sig.astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    w = _word()
    m = np.asarray(mfcc_pipeline(w[: len(w) // 160 * 160], 6))
    ww = WakewordRef("chirp", samples_features={"w.wav": m}, rms_level=0.05)
    cfg = RustpotterConfig()
    cfg.detector.score_mode = ScoreMode.MAX
    cfg.detector.threshold = 0.5
    cfg.detector.avg_threshold = 0.0
    seg = np.concatenate(
        [np.zeros(4800, np.float32), w, np.zeros(12800, np.float32)]
    )
    frames = seg.reshape(-1, 480)  # (45, 480)
    return ww, cfg, frames


def _round_pattern(det, states, frames, b):
    """Run one segment; return (states, fired(T,b), counter(T,b), score(T,b))."""
    batch = np.broadcast_to(frames[:, None, :], frames.shape[:1] + (b, 480))
    states, ev = det.process_sequence(det.params, states, jnp.asarray(batch))
    return states, np.asarray(ev.fired), np.asarray(ev.counter), np.asarray(ev.score)


def test_churn_at_scale(setup):
    ww, cfg, frames = setup
    T = frames.shape[0]

    # ---- control (B=4): fresh-round and steady-round expectations
    ctrl = BatchedDetector([("w", ww)], cfg, batch_size=4)
    st = ctrl.init_states()
    pats = []
    for _ in range(3):
        st, fired, counter, score = _round_pattern(ctrl, st, frames, 4)
        assert (fired.sum(axis=0) == 1).all()
        t = int(fired.argmax(axis=0)[0])
        pats.append((t, int(counter[t, 0]), float(score[t, 0])))
    fresh, steady = pats[0], pats[1]
    assert pats[2] == pats[1]  # steady state reached by round 2
    t_mid = steady[0] - 3  # a mid-partial step for steady streams
    assert t_mid > 0

    # ---- churn run (B=1024)
    rng = np.random.default_rng(42)
    det = BatchedDetector([("w", ww)], cfg, batch_size=B)
    states = det.init_states()

    # per-round activity schedule; streams 0..63 never churn; streams 64..127
    # (the mid-retire block) churn only via the forced mid-round retirement
    active = rng.random((ROUNDS, B)) > 0.25
    active[:, :128] = True
    active[0] = True  # everyone starts admitted
    mid_retire_rounds = {10, 25, 40}
    mid_block = slice(64, 128)

    was_active = np.ones(B, bool)
    stream_feed = np.broadcast_to(frames[:, None, :], (T, B, 480))

    for r in range(ROUNDS):
        act = active[r].copy()
        readmit = act & ~was_active
        if readmit.any():
            states = det.reset_streams(states, jnp.asarray(readmit))

        feed = np.where(act[None, :, None], stream_feed, np.float32(0.0))
        if r in mid_retire_rounds:
            # run to mid-partial, retire the block, silence-feed the rest
            states, ev1 = det.process_sequence(
                det.params, states, jnp.asarray(feed[:t_mid])
            )
            assert np.asarray(states.partial_active)[mid_block].all()
            kill = np.zeros(B, bool)
            kill[mid_block] = True
            states = det.reset_streams(states, jnp.asarray(kill))
            feed2 = feed[t_mid:].copy()
            feed2[:, mid_block] = 0.0
            states, ev2 = det.process_sequence(det.params, states, jnp.asarray(feed2))
            fired = np.concatenate([np.asarray(ev1.fired), np.asarray(ev2.fired)])
            counter = np.concatenate([np.asarray(ev1.counter), np.asarray(ev2.counter)])
            score = np.concatenate([np.asarray(ev1.score), np.asarray(ev2.score)])
            act[mid_block] = False  # retired (mid-round) for assertions below
        else:
            states, ev = det.process_sequence(det.params, states, jnp.asarray(feed))
            fired = np.asarray(ev.fired)
            counter = np.asarray(ev.counter)
            score = np.asarray(ev.score)

        # retired slots never fire (incl. the block retired mid-partial:
        # steady streams fire at steady[0] > t_mid, so any fire would be
        # post-reset leakage)
        assert not fired[:, ~act].any(), f"round {r}: retired slot fired"
        # active slots fire exactly once, at the expected pattern
        assert (fired[:, act].sum(axis=0) == 1).all(), f"round {r}"
        idx = np.nonzero(act)[0]
        t_hit = fired[:, idx].argmax(axis=0)
        is_fresh = (readmit | (r == 0))[idx]
        np.testing.assert_array_equal(
            t_hit, np.where(is_fresh, fresh[0], steady[0]), err_msg=f"round {r}"
        )
        np.testing.assert_array_equal(
            counter[t_hit, idx], np.where(is_fresh, fresh[1], steady[1])
        )
        np.testing.assert_allclose(
            score[t_hit, idx], np.where(is_fresh, fresh[2], steady[2]), rtol=1e-6
        )
        was_active = act

    # make sure the schedule actually exercised retirement broadly
    assert (~active).sum() > ROUNDS * B * 0.15
