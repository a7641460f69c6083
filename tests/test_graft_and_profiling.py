"""Driver entry points and profiling utilities."""
import sys

import jax
import pytest


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_roofline_model():
    from rustpotter_tpu import RustpotterConfig
    from rustpotter_tpu.runtime.bundle import build_bundle
    from rustpotter_tpu.utils.profiling import step_roofline, streams_speed_of_light
    import numpy as np
    from rustpotter_tpu.wakewords.files import WakewordRef

    rng = np.random.default_rng(0)
    ww = WakewordRef(
        name="x",
        samples_features={
            f"s{i}": rng.normal(0, 1, (90, 16)).astype(np.float32) for i in range(5)
        },
        avg_features=rng.normal(0, 1, (90, 16)).astype(np.float32),
        rms_level=0.05,
    )
    static, _ = build_bundle([("w", ww)], RustpotterConfig())
    cost = step_roofline(static)
    assert cost.mxu_flops > 0 and cost.vpu_flops > 0 and cost.hbm_bytes > 0
    sol = streams_speed_of_light(static)
    assert sol > 1000  # the op structure allows >1k realtime streams/chip
