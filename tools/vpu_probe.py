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
    acc = x_ref[0] * np.float32(0.0)

    def body(r, acc):
        for i in range(streams):
            idx = jax.lax.rem(r * streams + i, x_ref.shape[0])
            acc = acc + np.float32(0.5) * x_ref[idx]
        return acc

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[0] = acc


def k_sload(reps, streams, s_ref, x_ref, o_ref):
    acc = x_ref[0] * np.float32(0.0)
    wt = x_ref[1]

    def body(r, acc):
        for i in range(streams):
            idx = jax.lax.rem(r * streams + i, np.int32(s_ref.shape[1]))
            acc = acc + s_ref[0, idx] * wt
        return acc

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[0] = acc


def run(name, kern, n_in=64, smem=False):
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (n_in, 8, 128)).astype(np.float32))
    s = jnp.asarray(np.arange(512, dtype=np.float32).reshape(1, 512))
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    args = (x,)
    if smem:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] + in_specs
        args = (s, x)
    fn = jax.jit(
        lambda *a: pl.pallas_call(
            partial(kern, REPS, STREAMS),
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    )
    res = trace_kernel_us(fn, args, 30)
    ops = REPS * STREAMS
    for nm, us in res.items():
        if "copy" in nm or "profiler" in nm or "block" in nm or "Pjit" in nm or "api" in nm:
            continue
        print(f"{name:10s} {us:9.1f} us/call  {ops/us:8.1f} tile-ops/us  {nm[:50]}")
        break


if __name__ == "__main__":
    run("fma", k_fma)
    run("fma_dep", k_fma_dep)
    run("dynload", k_dynload)
    run("sload", k_sload, smem=True)
