"""Real-Mosaic kernel parity: run the Pallas DTW kernels NON-interpreted on
the default (TPU) backend and compare against the lax.scan DP path.

Everything pytest proves about the fused kernels runs under interpret=True on
CPU; this script is the Mosaic-codegen tripwire (VERDICT r2 weak #6), invoked
by `RUSTPOTTER_TPU_TESTS=1 pytest -m tpu` (tests/test_tpu_mosaic.py) in the
bench environment and directly by hand:

    python tools/tpu_kernel_parity.py [B]

Uses the same shapes as tools/kernel_probe.py so the persistent compile cache
is shared between probing and parity checking.

Checks:
  1. banded_dtw_pallas (two-stage DP kernel) vs scan DP: BIT-exact
  2. fused v2 vs scan chain: rtol 3e-6 / atol 1e-4 (documented ulp band)
  3. fused v3, gate off: same tolerance
  4. fused v3, gating: a bound below every stream's avg sim must write +inf
     template sims; a bound at the max avg sim must reproduce the ungated sims
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rustpotter_tpu.ops.dtw import band_costs, banded_dtw_batch
    from rustpotter_tpu.ops.fused_dtw import fused_dtw_batch, fused_dtw_batch_v3
    from rustpotter_tpu.ops.pallas_dtw import banded_dtw_pallas

    assert jax.default_backend() != "cpu", (
        "this script must run on the TPU backend (no JAX_PLATFORMS=cpu)"
    )
    rng = np.random.default_rng(7)
    Lm, C, w = 100, 16, 5
    lens = (100, 98, 96, 94, 92, 97)
    P = len(lens)
    D, K = 1, P - 1
    win = jnp.asarray(rng.normal(0, 1, (B, Lm, C)).astype(np.float32))
    means = jnp.asarray(rng.normal(0, 0.2, (B, P, C)).astype(np.float32))
    templates = jnp.asarray(rng.normal(0, 1, (P, Lm, C)).astype(np.float32))
    tnorms = jnp.sum(templates * templates, axis=-1)

    # scan-path oracle over the same normalized-window chain
    normwin = win[:, None, :, :] - means[:, :, None, :]
    costs = band_costs(
        jnp.broadcast_to(templates, (B, P, Lm, C)).reshape(B * P, Lm, C),
        normwin.reshape(B * P, Lm, C),
        w,
    )
    lens_b = jnp.asarray(np.broadcast_to(np.asarray(lens, np.int32), (B, P)).reshape(-1))
    oracle = np.asarray(banded_dtw_batch(costs, lens_b, w)).reshape(B, P)

    # 1. two-stage Pallas DP kernel: bit-exact vs the scan DP
    pal = np.asarray(banded_dtw_pallas(costs, lens_b, w)).reshape(B, P)
    np.testing.assert_array_equal(pal, oracle)
    print("1. banded_dtw_pallas == scan DP (bit-exact) OK")

    # 2. fused v2
    v2 = np.asarray(
        jax.jit(lambda *a: fused_dtw_batch(*a, lens, w, variant=2))(
            win, means, templates, tnorms
        )
    )
    np.testing.assert_allclose(v2, oracle, rtol=3e-6, atol=1e-4)
    print("2. fused v2 vs scan chain (rtol 3e-6/atol 1e-4) OK,",
          "max |d| =", np.abs(v2 - oracle).max())

    # 3. fused v3, gate off
    inf_b = jnp.full((D,), np.inf, jnp.float32)
    v3 = np.asarray(
        jax.jit(lambda *a: fused_dtw_batch_v3(*a, inf_b, lens, w, D, K))(
            win, means, templates, tnorms
        )
    )
    np.testing.assert_allclose(v3, oracle, rtol=3e-6, atol=2e-4)
    print("3. fused v3 (gate off) vs scan chain OK,",
          "max |d| =", np.abs(v3 - oracle).max())

    # 4. gating on real Mosaic
    avg_sims = v3[:, D * K]
    low = jnp.asarray([float(avg_sims.min()) - 1.0], jnp.float32)
    g1 = np.asarray(
        jax.jit(lambda *a: fused_dtw_batch_v3(*a, low, lens, w, D, K))(
            win, means, templates, tnorms
        )
    )
    assert np.isinf(g1[:, : D * K]).all(), "gated-out templates must be +inf"
    np.testing.assert_allclose(g1[:, D * K :], v3[:, D * K :], rtol=3e-6, atol=2e-4)
    high = jnp.asarray([float(avg_sims.max()) + 1.0], jnp.float32)
    g2 = np.asarray(
        jax.jit(lambda *a: fused_dtw_batch_v3(*a, high, lens, w, D, K))(
            win, means, templates, tnorms
        )
    )
    np.testing.assert_array_equal(g2, v3)
    print("4. v3 gating semantics on Mosaic OK")

    # 5. whole-chunk v4 kernel (grid (tile, shift), virtual windows) at the
    # bench shape with a wrap-around cursor, vs the per-shift scan oracle
    from rustpotter_tpu.ops.fused_dtw import fused_dtw_chunk_v4

    F = Lm
    rot0 = F - 2
    win_t = jnp.asarray(rng.normal(0, 1, (F, C, B)).astype(np.float32))
    new_t = jnp.asarray(rng.normal(0, 1, (3, C, B)).astype(np.float32))
    means3 = jnp.asarray(rng.normal(0, 0.2, (3, P, C, B)).astype(np.float32))
    v4 = np.asarray(
        jax.jit(
            lambda w_, n_, m_: fused_dtw_chunk_v4(
                w_, n_, m_, templates, tnorms, inf_b, lens, w, D, K, rot0
            )
        )(win_t, new_t, means3)
    )  # (B, 3, P)
    virt = np.asarray(win_t).copy()
    for s in range(3):
        slot = (rot0 + 1 + s) % F
        virt[slot] = np.asarray(new_t)[s]
        rot_s = (rot0 + s + 1) % F
        order = [(rot_s + 1 + i) % F for i in range(Lm)]
        lin = np.transpose(virt[order], (2, 0, 1))  # (B, Lm, C)
        nw = lin[:, None, :, :] - np.transpose(np.asarray(means3)[s], (2, 0, 1))[:, :, None, :]
        cc = band_costs(
            jnp.asarray(np.broadcast_to(np.asarray(templates), (B, P, Lm, C))).reshape(B * P, Lm, C),
            jnp.asarray(nw).reshape(B * P, Lm, C),
            w,
        )
        osh = np.asarray(banded_dtw_batch(cc, lens_b, w)).reshape(B, P)
        np.testing.assert_allclose(v4[:, s], osh, rtol=3e-6, atol=2e-4)
    print("5. whole-chunk v4 vs per-shift scan oracle OK")

    # 6. v4 at the dtw_many group shape (one wakeword, K=10, B=4096 — the
    # chunked fallback the batched runtime takes past the SMEM guard)
    B6 = min(B, 4096)
    lens6 = tuple(100 - 2 * (i % 5) for i in range(10)) + (100,)
    P6, D6, K6 = 11, 1, 10
    t6 = jnp.asarray(rng.normal(0, 1, (P6, Lm, C)).astype(np.float32))
    n6 = jnp.sum(t6 * t6, axis=-1)
    w6 = jnp.asarray(rng.normal(0, 1, (F, C, B6)).astype(np.float32))
    nw6 = jnp.asarray(rng.normal(0, 1, (3, C, B6)).astype(np.float32))
    m6 = jnp.asarray(rng.normal(0, 0.2, (3, P6, C, B6)).astype(np.float32))
    v4b = np.asarray(
        jax.jit(
            lambda a, b_, c: fused_dtw_chunk_v4(
                a, b_, c, t6, n6, jnp.full((1,), np.inf, jnp.float32),
                lens6, w, D6, K6, rot0
            )
        )(w6, nw6, m6)
    )
    virt6 = np.asarray(w6).copy()
    lens6_b = jnp.asarray(
        np.broadcast_to(np.asarray(lens6, np.int32), (B6, P6)).reshape(-1)
    )
    for s in range(3):
        slot = (rot0 + 1 + s) % F
        virt6[slot] = np.asarray(nw6)[s]
        rot_s = (rot0 + s + 1) % F
        order = [(rot_s + 1 + i) % F for i in range(Lm)]
        lin = np.transpose(virt6[order], (2, 0, 1))
        nw_ = lin[:, None, :, :] - np.transpose(np.asarray(m6)[s], (2, 0, 1))[:, :, None, :]
        cc = band_costs(
            jnp.asarray(np.broadcast_to(np.asarray(t6), (B6, P6, Lm, C))).reshape(B6 * P6, Lm, C),
            jnp.asarray(nw_).reshape(B6 * P6, Lm, C),
            w,
        )
        osh = np.asarray(banded_dtw_batch(cc, lens6_b, w)).reshape(B6, P6)
        np.testing.assert_allclose(v4b[:, s], osh, rtol=3e-6, atol=2e-4)
    print("6. v4 at the dtw_many group shape (P=11) OK")

    # 7. v4 at the GROUPED fleet-launch shape (2 wakewords packed per
    # launch, D=2, K=8, P=18 = 28 800 SMEM template values — the largest
    # launch the r5 grouped packer emits under the MEASURED v5e SMEM cap of
    # ~32K padded scalar values; a P=33 attempt compile-fails with
    # "Allocation (size=1691648) would exceed memory (size=1048576)",
    # which is the 1 MiB SMEM / 32 B-per-element evidence the
    # fused_dtw.SMEM_TEMPLATE_VALUES budget is set from), gate disabled so
    # every pair computes
    B7 = min(B, 2048)
    D7, K7 = 2, 8
    P7 = D7 * K7 + D7
    lens7 = tuple(100 - 2 * (i % 5) for i in range(D7 * K7)) + (100,) * D7
    t7 = jnp.asarray(rng.normal(0, 1, (P7, Lm, C)).astype(np.float32))
    n7 = jnp.sum(t7 * t7, axis=-1)
    w7 = jnp.asarray(rng.normal(0, 1, (F, C, B7)).astype(np.float32))
    nw7 = jnp.asarray(rng.normal(0, 1, (3, C, B7)).astype(np.float32))
    m7 = jnp.asarray(rng.normal(0, 0.2, (3, P7, C, B7)).astype(np.float32))
    v4c = np.asarray(
        jax.jit(
            lambda a, b_, c: fused_dtw_chunk_v4(
                a, b_, c, t7, n7, jnp.full((D7,), np.inf, jnp.float32),
                lens7, w, D7, K7, rot0
            )
        )(w7, nw7, m7)
    )
    virt7 = np.asarray(w7).copy()
    lens7_b = jnp.asarray(
        np.broadcast_to(np.asarray(lens7, np.int32), (B7, P7)).reshape(-1)
    )
    for s in range(3):
        slot = (rot0 + 1 + s) % F
        virt7[slot] = np.asarray(nw7)[s]
        rot_s = (rot0 + s + 1) % F
        order = [(rot_s + 1 + i) % F for i in range(Lm)]
        lin = np.transpose(virt7[order], (2, 0, 1))
        nw_ = lin[:, None, :, :] - np.transpose(np.asarray(m7)[s], (2, 0, 1))[:, :, None, :]
        cc = band_costs(
            jnp.asarray(np.broadcast_to(np.asarray(t7), (B7, P7, Lm, C))).reshape(B7 * P7, Lm, C),
            jnp.asarray(nw_).reshape(B7 * P7, Lm, C),
            w,
        )
        osh = np.asarray(banded_dtw_batch(cc, lens7_b, w)).reshape(B7, P7)
        np.testing.assert_allclose(v4c[:, s], osh, rtol=3e-6, atol=2e-4)
    print("7. v4 at the grouped fleet-launch shape (D=2, K=8, P=18) OK")
    print(f"KERNEL PARITY OK on {jax.default_backend()} B={B}")


if __name__ == "__main__":
    main()
