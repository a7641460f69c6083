"""Batched runtime + sharding tests on a virtual 8-device CPU mesh.

Strategy per SURVEY.md §4: every batched stream must reproduce the
single-stream result exactly; then the same under pjit sharding + collectives.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustpotter_tpu import RustpotterConfig, ScoreMode
from rustpotter_tpu.parallel.collectives import fleet_detection_count, gather_detections
from rustpotter_tpu.parallel.mesh import StreamSharding, make_stream_mesh
from rustpotter_tpu.runtime.batch import BatchedDetector
from rustpotter_tpu.runtime.detector import Rustpotter
from rustpotter_tpu.wakewords.files import load_wakeword


def _stream_audio(resources):
    """16 kHz mono f32 stream: silence + oye_casa_g_1 + silence (shortened)."""
    raw = open(os.path.join(resources, "oye_casa_g_1.wav"), "rb").read()[44:]
    wav = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    sil = np.zeros(16000 * 2, np.float32)
    s = np.concatenate([sil, wav, sil])
    n = len(s) // 480
    return s[: n * 480]


@pytest.fixture(scope="module")
def cfg():
    c = RustpotterConfig()
    c.detector.avg_threshold = 0.2
    c.detector.threshold = 0.5
    c.detector.score_mode = ScoreMode.MAX
    return c


def test_batched_equals_single_stream(resources, cfg):
    ww = load_wakeword(os.path.join(resources, "oye_casa_g.rpw"))
    audio = _stream_audio(resources)
    frames = audio.reshape(-1, 480)

    single = Rustpotter(cfg)
    single.add_wakeword_ref("w", ww)
    dets = single.process_audio_sequence(audio)
    assert len(dets) == 1

    B = 4
    det = BatchedDetector([("w", ww)], cfg, batch_size=B)
    states = det.init_states()
    # stream 0 and 2 get the audio; streams 1,3 get silence
    batch = np.zeros((len(frames), B, 480), np.float32)
    batch[:, 0] = frames
    batch[:, 2] = frames
    states, events = det.process_sequence(det.params, states, jnp.asarray(batch))
    fired = np.asarray(events.fired)  # (T, B)
    assert fired[:, 0].sum() == 1 and fired[:, 2].sum() == 1
    assert fired[:, 1].sum() == 0 and fired[:, 3].sum() == 0
    t0 = np.nonzero(fired[:, 0])[0][0]
    # identical to the single-stream result, bit for bit
    # float identity up to 1 ulp (vmap may alter XLA fusion/reduction order)
    np.testing.assert_allclose(float(events.score[t0, 0]), dets[0].score, rtol=1e-6)
    np.testing.assert_allclose(float(events.avg_score[t0, 0]), dets[0].avg_score, rtol=1e-6)
    assert int(events.counter[t0, 0]) == dets[0].counter
    np.testing.assert_array_equal(events.score[:, 0], events.score[:, 2])


def test_sharded_batch_on_mesh(resources, cfg):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ww = load_wakeword(os.path.join(resources, "oye_casa_g.rpw"))
    audio = _stream_audio(resources)
    frames = audio.reshape(-1, 480)
    mesh = make_stream_mesh()
    sharding = StreamSharding(mesh)
    B = 16  # 2 streams per device
    det = BatchedDetector([("w", ww)], cfg, batch_size=B, sharding=sharding)
    states = det.init_states()
    batch = np.zeros((len(frames), B, 480), np.float32)
    batch[:, 3] = frames
    batch[:, 11] = frames  # on a different device
    states, events = det.process_sequence(
        det.params, states, jax.device_put(jnp.asarray(batch), sharding.time_batched)
    )
    fired = np.asarray(events.fired)
    assert fired[:, 3].sum() == 1 and fired[:, 11].sum() == 1
    assert fired.sum() == 2
    # unsharded oracle
    det2 = BatchedDetector([("w", ww)], cfg, batch_size=B)
    st2, ev2 = det2.process_sequence(det2.params, det2.init_states(), jnp.asarray(batch))
    np.testing.assert_array_equal(np.asarray(ev2.fired), fired)
    # compare scores at fired positions (non-fired payloads are don't-care)
    np.testing.assert_allclose(
        np.asarray(ev2.score)[fired], np.asarray(events.score)[fired], rtol=1e-6
    )


def test_collectives_merge(resources, cfg):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_stream_mesh()
    B = 16
    fired = jnp.zeros((B,), bool).at[5].set(True).at[12].set(True)
    payload = jnp.arange(B, dtype=jnp.float32)
    sharding = StreamSharding(mesh)
    fired = jax.device_put(fired, sharding.state)
    payload = jax.device_put(payload, sharding.state)
    count = fleet_detection_count(mesh, fired)
    assert int(count) == 2
    gf, gp = gather_detections(mesh, fired, payload)
    assert np.asarray(gf).sum() == 2
    np.testing.assert_array_equal(np.asarray(gp), np.arange(B, dtype=np.float32))


def test_stream_reset_mask(resources, cfg):
    ww = load_wakeword(os.path.join(resources, "oye_casa_g.rpw"))
    det = BatchedDetector([("w", ww)], cfg, batch_size=4)
    states = det.init_states()
    audio = _stream_audio(resources)
    frames = np.broadcast_to(
        audio.reshape(-1, 480)[:, None, :], (len(audio) // 480, 4, 480)
    )
    states, _ = det.process_sequence(det.params, states, jnp.asarray(frames[:40]))
    assert int(states.win_count[0]) > 0
    mask = jnp.array([True, False, False, False])
    states = det.reset_streams(states, mask)
    assert int(states.win_count[0]) == 0
    assert int(states.win_count[1]) > 0
