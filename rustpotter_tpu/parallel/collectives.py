"""Cross-device detection merging and fleet metrics.

The reference has no distributed layer at all; these are the TPU-native
equivalents specified by the north star: per-host detection events merged via
all_gather, scalar fleet metrics via psum — collectives ride ICI inside a
slice, DCN across hosts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import STREAMS_AXIS


def gather_detections(mesh: Mesh, fired: jnp.ndarray, payload: jnp.ndarray):
    """All-gather per-stream detection flags + payloads to every device.

    fired: (B,) bool sharded over streams; payload: (B, ...) sharded likewise.
    Returns fully replicated (B,), (B, ...) so every host sees every detection.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(STREAMS_AXIS), P(STREAMS_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,  # all_gather output replication is not inferred
    )
    def _gather(f, p):
        return (
            jax.lax.all_gather(f, STREAMS_AXIS, tiled=True),
            jax.lax.all_gather(p, STREAMS_AXIS, tiled=True),
        )

    return _gather(fired, payload)


def fleet_detection_count(mesh: Mesh, fired: jnp.ndarray) -> jnp.ndarray:
    """Total detections across the fleet this step (psum over the mesh)."""

    @partial(
        shard_map, mesh=mesh, in_specs=P(STREAMS_AXIS), out_specs=P(),
        check_vma=False,
    )
    def _count(f):
        return jax.lax.psum(jnp.sum(f.astype(jnp.int32)), STREAMS_AXIS)

    return _count(fired)
