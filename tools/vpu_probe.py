"""Microbenchmark the v5e VPU/load primitives used by the fused DTW kernel.

Measures, per (8,128)-tile op, the sustained rate of:
  fma      — independent scalar*tile FMA streams (the kernel's inner op)
  fma_dep  — one dependent FMA chain (latency-bound floor)
  dynload  — dynamic-major-index VMEM tile loads feeding FMAs
  sload    — scalar loads from a VMEM ref feeding FMAs

This pins the actual denominator of the kernel's "speed-of-light" claim
(docs/PERF.md): the roofline is only honest if the per-cycle issue rate is
measured, not assumed.

Usage: python tools/vpu_probe.py
"""
from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kernel_probe import trace_kernel_us

REPS = 2000  # inner unrolled iterations per kernel run
STREAMS = 8  # independent FMA chains


def k_fma(reps, streams, x_ref, o_ref):
    accs = [x_ref[i] * np.float32(1.0 + i) for i in range(streams)]
    wt = x_ref[streams]

    def body(r, accs):
        return tuple(a + np.float32(0.5) * wt for a in accs)

    accs = jax.lax.fori_loop(0, reps, body, tuple(accs))
    o_ref[0] = sum(accs)


def k_fma_dep(reps, streams, x_ref, o_ref):
    acc = x_ref[0]
    wt = x_ref[1]

    def body(r, acc):
        for _ in range(streams):  # same op count as k_fma, one chain
            acc = acc + np.float32(0.5) * wt
        return acc

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[0] = acc


def k_dynload(reps, streams, x_ref, o_ref):
    """rem-based index math per load (the original probe; kept to show how
    much the index computation itself costs vs k_dynload_cheap)."""
    acc = x_ref[0] * np.float32(0.0)

    def body(r, acc):
        for i in range(streams):
            idx = jax.lax.rem(r * streams + i, x_ref.shape[0])
            acc = acc + np.float32(0.5) * x_ref[idx]
        return acc

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[0] = acc


def k_dynload_cheap(reps, streams, x_ref, o_ref):
    """dynamic-major-index tile loads with one cheap AND per index — the
    fused kernel's W-load pattern (dynamic index, static nearby offsets)."""
    acc = x_ref[0] * np.float32(0.0)

    def body(r, acc):
        base = jax.lax.bitwise_and(r, np.int32(31))
        for i in range(streams):
            acc = acc + np.float32(0.5) * x_ref[base + i]
        return acc

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[0] = acc


def k_sload(reps, streams, s_ref, x_ref, o_ref):
    """(1x1) element load from a (rows, 16)-shaped VMEM ref at dynamic row /
    static lane, times a tile — the fused kernel's template-scalar pattern
    (templates_ref[k, r-1, c] * wtile)."""
    acc = x_ref[0] * np.float32(0.0)
    wt = x_ref[1]

    def body(r, acc):
        row = jax.lax.bitwise_and(r, np.int32(31))
        for i in range(streams):
            acc = acc + s_ref[row, i % 16] * wt
        return acc

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[0] = acc


def k_smemload(reps, streams, s_ref, x_ref, o_ref):
    """scalar load from SMEM at dynamic row / static col, times a tile —
    the v3 kernel's template pattern (scalar unit load + broadcast FMA)."""
    acc = x_ref[0] * np.float32(0.0)
    wt = x_ref[1]

    def body(r, acc):
        row = jax.lax.bitwise_and(r, np.int32(31))
        for i in range(streams):
            acc = acc + s_ref[row, i % 16] * wt
        return acc

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[0] = acc


def run(name, kern, n_in=64, smem=False, streams=STREAMS):
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (n_in, 8, 128)).astype(np.float32))
    s = jnp.asarray(np.arange(32 * 16, dtype=np.float32).reshape(32, 16))
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    args = (x,)
    if smem:
        space = pltpu.SMEM if smem == "smem" else pltpu.VMEM
        in_specs = [pl.BlockSpec(memory_space=space)] + in_specs
        args = (s, x)
    fn = jax.jit(
        lambda *a: pl.pallas_call(
            partial(kern, REPS, streams),
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    )
    res = trace_kernel_us(fn, args, 30)
    ops = REPS * streams
    for nm, us in res.items():
        if "copy" in nm or "profiler" in nm or "block" in nm or "Pjit" in nm or "api" in nm:
            continue
        print(f"{name:10s} {us:9.1f} us/call  {ops/us:8.1f} tile-ops/us  {nm[:50]}")
        break


if __name__ == "__main__":
    run("fma", k_fma)
    run("fma32", k_fma, streams=32)  # longer body: loop-overhead-free peak
    run("fma_dep", k_fma_dep)
    run("dynload", k_dynload)
    run("dynload_ch", k_dynload_cheap)
    run("sload", k_sload, smem=True)
    run("smemload", k_smemload, smem="smem")
