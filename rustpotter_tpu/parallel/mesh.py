"""Device mesh construction for the stream-parallel runtime.

The workload is embarrassingly data-parallel over audio streams (templates and
NN weights are a few MB — always replicated; SURVEY.md §2.9). The mesh is
therefore 1-D over a `streams` axis spanning all chips; multi-host slices
extend the same axis over DCN. Tensor/pipeline/expert parallelism are
intentionally absent — nothing in the model is big enough to shard.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAMS_AXIS = "streams"


def make_stream_mesh(devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (STREAMS_AXIS,))


@dataclass
class StreamSharding:
    """Shardings for the batched detector: state/io sharded over streams,
    params replicated."""

    mesh: Mesh

    @property
    def state(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(STREAMS_AXIS))

    @property
    def time_batched(self) -> NamedSharding:
        # (T, B, ...) sequences: batch is the second axis
        return NamedSharding(self.mesh, P(None, STREAMS_AXIS))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def multihost_initialize(**kwargs) -> None:
    """Initialize the multi-host JAX runtime (jax.distributed). On a pod slice
    each host calls this before building the mesh; collectives then ride ICI
    within a slice and DCN across slices."""
    jax.distributed.initialize(**kwargs)
