"""Batched streaming runtime: N concurrent audio streams, data-parallel.

The reference runs one `Rustpotter` per stream, single-threaded
(/root/reference — no parallelism anywhere; SURVEY.md §2.9). The TPU-native
runtime batches streams on a leading axis: one jitted step advances every
stream 30 ms, wakeword templates/NN weights are replicated, and the whole
thing shards over a `streams` mesh axis with pjit (see parallel/sharding.py).

Stream lifecycle is mask-based: `reset_streams` clears any subset of streams
(admit/retire) without recompilation.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RustpotterConfig
from .bundle import build_bundle
from .state import Event, StreamState, init_state
from .stream_step import make_step


class BatchedDetector:
    """Fixed-capacity batch of independent detector streams."""

    def __init__(
        self,
        wakewords: List[tuple],
        config: Optional[RustpotterConfig] = None,
        batch_size: int = 1024,
        sharding=None,
        in_graph_resample: bool = False,
    ):
        self.config = config if config is not None else RustpotterConfig()
        self.batch_size = batch_size
        self.static, self.params = build_bundle(
            wakewords, self.config, in_graph_resample=in_graph_resample
        )
        step = make_step(self.static)
        vstep = jax.vmap(step, in_axes=(None, 0, 0))
        self._sharding = sharding

        def chunk_fn(params, states, frames):
            """frames: (B, 480) — advance every stream by one 30 ms frame."""
            return vstep(params, states, frames)

        def seq_fn(params, states, frames):
            """frames: (T, B, 480) — scan a time range in one XLA call."""

            def body(s, f):
                s, ev = vstep(params, s, f)
                return s, ev

            return jax.lax.scan(body, states, frames)

        if sharding is not None:
            # shard_map (not bare pjit): each device runs the step on its local
            # stream block, so the Pallas kernels see local shapes directly
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import STREAMS_AXIS

            mesh = sharding.mesh
            st_spec = jax.tree_util.tree_map(
                lambda _: P(STREAMS_AXIS), init_state(self.static, (batch_size,))
            )
            pr_spec = jax.tree_util.tree_map(lambda _: P(), self.params)
            self.process_chunk = jax.jit(
                shard_map(
                    chunk_fn,
                    mesh=mesh,
                    in_specs=(pr_spec, st_spec, P(STREAMS_AXIS)),
                    out_specs=(st_spec, P(STREAMS_AXIS)),
                    check_vma=False,
                )
            )
            self.process_sequence = jax.jit(
                shard_map(
                    seq_fn,
                    mesh=mesh,
                    in_specs=(pr_spec, st_spec, P(None, STREAMS_AXIS)),
                    out_specs=(st_spec, P(None, STREAMS_AXIS)),
                    check_vma=False,
                )
            )
        else:
            self.process_chunk = jax.jit(chunk_fn)
            self.process_sequence = jax.jit(seq_fn)
        self._reset = jax.jit(_reset_streams)

    def init_states(self) -> StreamState:
        states = init_state(self.static, (self.batch_size,))
        if self._sharding is not None:
            states = jax.device_put(
                states,
                jax.tree_util.tree_map(lambda _: self._sharding.state, states),
            )
        return states

    def reset_streams(self, states: StreamState, mask: jnp.ndarray) -> StreamState:
        """Clear streams where mask is True (stream admit/retire)."""
        return self._reset(states, mask, init_state(self.static, (self.batch_size,)))


def _reset_streams(states: StreamState, mask: jnp.ndarray, fresh: StreamState) -> StreamState:
    def sel(a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim))
        return jnp.where(m, b, a)

    return jax.tree_util.tree_map(sel, states, fresh)
