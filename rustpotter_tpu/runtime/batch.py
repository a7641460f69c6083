"""Batched streaming runtime: N concurrent audio streams, data-parallel.

The reference runs one `Rustpotter` per stream, single-threaded
(/root/reference — no parallelism anywhere; SURVEY.md §2.9). The TPU-native
runtime batches streams on a leading axis: one jitted step advances every
stream 30 ms, wakeword templates/NN weights are replicated, and the whole
thing shards over a `streams` mesh axis with pjit (see parallel/mesh.py).

Stream lifecycle is mask-based: `reset_streams` clears any subset of streams
(admit/retire) without recompilation.

Runtime management (parity: /root/reference/src/detector.rs:257-346):
  - `add_wakeword` / `remove_wakeword` rebuild the padded bundle and MIGRATE
    live stream state — the reference keeps its MFCC window, filters and
    partial detections across a wakeword change (add_wakeword never calls
    reset() except for the very first wakeword). Window/gain shapes that grow
    or shrink with max_mfcc_frames are padded/truncated keeping the newest
    entries; a partial detection pointing at a removed wakeword is dropped.
  - `update_detector_config` resets stream state (window/extractor/VAD/
    partial) but KEEPS filter state — reference update_detector_config calls
    reset(), which does not touch the filters (detector.rs:263-287).
  - `update_filters_config` additionally rebuilds the filters with fresh
    state (detector.rs:283-287).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig, FiltersConfig, RustpotterConfig
from .bundle import StepStatic, Wakeword, build_bundle
from .state import Event, StreamState, init_state
from .stream_step import make_batched_chunk


def _keep_newest(arr: jnp.ndarray, axis: int, new_len: int) -> jnp.ndarray:
    """Resize a shift-register axis (newest entries at the END): truncate the
    oldest entries or zero-pad in front."""
    old_len = arr.shape[axis]
    if new_len == old_len:
        return arr
    if new_len < old_len:
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(old_len - new_len, old_len)
        return arr[tuple(idx)]
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (new_len - old_len, 0)
    return jnp.pad(arr, pad)


def _pad_tail(arr: jnp.ndarray, axis: int, new_len: int) -> jnp.ndarray:
    """Resize a payload axis (entries at the FRONT): truncate or zero-pad."""
    old_len = arr.shape[axis]
    if new_len == old_len:
        return arr
    if new_len < old_len:
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(0, new_len)
        return arr[tuple(idx)]
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, new_len - old_len)
    return jnp.pad(arr, pad)


def migrate_states(
    old: StepStatic,
    new: StepStatic,
    states: StreamState,
    batch_shape: tuple,
    reset_stream: bool = False,
    reset_filters: bool = False,
) -> StreamState:
    """Carry live stream state across a bundle rebuild (see module docstring)."""
    fresh = init_state(new, batch_shape)
    if reset_stream:
        out = fresh
        if not reset_filters:
            out = out._replace(
                bp=states.bp,
                gain_win=_keep_newest(states.gain_win, -1, new.gain_window_size),
                gain_count=jnp.minimum(states.gain_count, new.gain_window_size),
                gain=states.gain,
            )
        # the encoder/resampler is not part of reset() (detector.rs:290-302)
        return out._replace(rs_overlap=states.rs_overlap, rms_level=states.rms_level)

    # wakeword add/remove: carry everything, resizing shape-bearing fields
    remap = np.full((max(len(old.names), 1),), -1, np.int32)
    for i, n in enumerate(old.names):
        if n in new.names:
            remap[i] = new.names.index(n)
    new_ww = jnp.asarray(remap)[states.partial_ww]
    drop = states.partial_active & (new_ww < 0)
    keep = ~drop
    # linearize the circular window (newest to the END) before resizing;
    # the migrated state restarts with a fresh cursor
    win_lin = jnp.roll(states.win, -(states.rot + 1), axis=-2)
    return states._replace(
        win=_keep_newest(win_lin, -2, new.max_mfcc_frames),
        rot=jnp.asarray(new.max_mfcc_frames - 1, jnp.int32),
        win_count=jnp.minimum(states.win_count, new.max_mfcc_frames),
        gain_win=_keep_newest(states.gain_win, -1, new.gain_window_size),
        gain_count=jnp.minimum(states.gain_count, new.gain_window_size),
        partial_scores=_pad_tail(states.partial_scores, -1, new.smax),
        partial_ww=jnp.where(keep, jnp.maximum(new_ww, 0), 0),
        partial_active=states.partial_active & keep,
        partial_counter=jnp.where(keep, states.partial_counter, 0),
        countdown=jnp.where(keep, states.countdown, 0),
    )


class BatchedDetector:
    """Fixed-capacity batch of independent detector streams."""

    def __init__(
        self,
        wakewords: List[Tuple[str, Wakeword]],
        config: Optional[RustpotterConfig] = None,
        batch_size: int = 1024,
        sharding=None,
        in_graph_resample: bool = False,
    ):
        self.config = config if config is not None else RustpotterConfig()
        self.batch_size = batch_size
        self._sharding = sharding
        self._in_graph_resample = in_graph_resample
        self._install(list(wakewords))

    # ------------------------------------------------------------- build

    def _install(self, wakewords: List[Tuple[str, Wakeword]]) -> None:
        static, params = build_bundle(
            wakewords, self.config, in_graph_resample=self._in_graph_resample
        )
        self._wakewords = wakewords
        # params live on-device (replicated under a mesh): passing host numpy
        # arrays into the jitted step re-uploads them on EVERY dispatch —
        # measured 3-20 ms/step of pure host/transfer overhead at B=8192
        if self._sharding is not None:
            params = jax.device_put(
                params,
                jax.tree_util.tree_map(lambda _: self._sharding.replicated, params),
            )
        else:
            params = jax.device_put(params)
        self.static, self.params = static, params
        # batch-aware chunk step: the window leaf lives stream-minor
        # (F, C, B) so the fused kernel gets its native layout with no
        # per-shift transpose (stream_step.make_batched_chunk)
        chunk_fn = make_batched_chunk(self.static)

        def seq_fn(params, states, frames):
            """frames: (T, B, 480) — scan a time range in one XLA call."""

            def body(s, f):
                s, ev = chunk_fn(params, s, f)
                return s, ev

            return jax.lax.scan(body, states, frames)

        if self._sharding is not None:
            # shard_map (not bare pjit): each device runs the step on its local
            # stream block, so the Pallas kernels see local shapes directly
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import STREAMS_AXIS

            mesh = self._sharding.mesh
            # per-stream leaves shard over streams (axis 0); the stream-minor
            # window shards over its LAST axis; the rank-0 rot cursor is
            # replicated
            st_spec = StreamState(**{
                f: (
                    P() if f == "rot"
                    else P(None, None, STREAMS_AXIS) if f == "win"
                    else P(STREAMS_AXIS)
                )
                for f in StreamState._fields
            })
            pr_spec = jax.tree_util.tree_map(lambda _: P(), self.params)
            self.process_chunk = jax.jit(
                shard_map(
                    chunk_fn,
                    mesh=mesh,
                    in_specs=(pr_spec, st_spec, P(STREAMS_AXIS)),
                    out_specs=(st_spec, P(STREAMS_AXIS)),
                    check_vma=False,
                ),
                donate_argnums=(1,),
            )
            self.process_sequence = jax.jit(
                shard_map(
                    seq_fn,
                    mesh=mesh,
                    in_specs=(pr_spec, st_spec, P(None, STREAMS_AXIS)),
                    out_specs=(st_spec, P(None, STREAMS_AXIS)),
                    check_vma=False,
                ),
                donate_argnums=(1,),
            )
        else:
            # donate the states pytree: without donation every dispatch
            # allocates (and copies into) a fresh (F, C, B) window buffer —
            # callers must rebind `states` from the return value (all
            # runtime/tests do; reusing a donated buffer raises)
            self.process_chunk = jax.jit(chunk_fn, donate_argnums=(1,))
            self.process_sequence = jax.jit(seq_fn, donate_argnums=(1,))
        self._reset = jax.jit(_reset_streams)

    def _shard_states(self, states: StreamState) -> StreamState:
        if self._sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import STREAMS_AXIS

            mesh = self._sharding.mesh
            shardings = StreamState(**{
                f: (
                    self._sharding.replicated if f == "rot"
                    else NamedSharding(mesh, P(None, None, STREAMS_AXIS))
                    if f == "win"
                    else self._sharding.state
                )
                for f in StreamState._fields
            })
            states = jax.device_put(states, shardings)
        return states

    def _migrate(
        self, old_static: StepStatic, states, reset_stream=False, reset_filters=False
    ):
        if states is None:
            return None
        # migrate_states works in stream-major (B, F, C) window layout;
        # convert from/to the serving stream-minor layout at the boundary
        states = states._replace(win=jnp.moveaxis(states.win, -1, 0))
        states = migrate_states(
            old_static,
            self.static,
            states,
            (self.batch_size,),
            reset_stream=reset_stream,
            reset_filters=reset_filters,
        )
        states = states._replace(win=jnp.moveaxis(states.win, 0, -1))
        return self._shard_states(states)

    # --------------------------------------------------- wakeword management

    @property
    def wakeword_names(self) -> Tuple[str, ...]:
        return self.static.names

    def add_wakeword(
        self, name: str, wakeword: Wakeword, states: Optional[StreamState] = None
    ) -> Optional[StreamState]:
        """Add (or replace) a wakeword on the live detector. Stream state is
        carried over (detector.rs:304-346: no reset on add); pass the current
        states to receive the migrated ones. Raises ValueError on mfcc_size
        mismatch, leaving the detector unchanged."""
        old_static, old_ww = self.static, self._wakewords
        ww = [(k, w) for k, w in old_ww if k != name] + [(name, wakeword)]
        try:
            self._install(ww)
        except Exception:
            self._install(old_ww)
            raise
        return self._migrate(old_static, states)

    def add_wakeword_from_file(
        self, name: str, path: str, states: Optional[StreamState] = None
    ) -> Optional[StreamState]:
        from ..wakewords.files import load_wakeword

        return self.add_wakeword(name, load_wakeword(path), states)

    def remove_wakeword(
        self, name: str, states: Optional[StreamState] = None
    ) -> Optional[StreamState]:
        """Remove a wakeword; stream state carries over, except partials that
        pointed at the removed wakeword (dropped). Raises KeyError if absent,
        ValueError when removing the last wakeword (the batched step has no
        empty configuration — retire the detector instead)."""
        if name not in dict(self._wakewords):
            raise KeyError(name)
        old_static, old_ww = self.static, self._wakewords
        ww = [(k, w) for k, w in old_ww if k != name]
        if not ww:
            raise ValueError("cannot remove the last wakeword of a BatchedDetector")
        try:
            self._install(ww)
        except Exception:
            self._install(old_ww)
            raise
        return self._migrate(old_static, states)

    # ------------------------------------------------------- config updates

    def update_detector_config(
        self, det_config: DetectorConfig, states: Optional[StreamState] = None
    ) -> Optional[StreamState]:
        """Reference parity (detector.rs:263-280): score params propagate to
        live detectors and stream state resets — filters keep their state."""
        old_static = self.static
        self.config.detector = det_config
        self._install(self._wakewords)
        return self._migrate(old_static, states, reset_stream=True)

    def update_filters_config(
        self, filters_config: FiltersConfig, states: Optional[StreamState] = None
    ) -> Optional[StreamState]:
        """Reference parity (detector.rs:283-287): filters rebuilt with fresh
        state, stream state resets."""
        old_static = self.static
        self.config.filters = filters_config
        self._install(self._wakewords)
        return self._migrate(old_static, states, reset_stream=True, reset_filters=True)

    def update_config(
        self, config: RustpotterConfig, states: Optional[StreamState] = None
    ) -> Optional[StreamState]:
        old_static = self.static
        self.config = config
        self._install(self._wakewords)
        return self._migrate(old_static, states, reset_stream=True, reset_filters=True)

    # ------------------------------------------------------------ lifecycle

    def init_states(self) -> StreamState:
        states = init_state(self.static, (self.batch_size,))
        # serving layout: the window leaf is stream-minor (F, C, B)
        states = states._replace(win=jnp.moveaxis(states.win, 0, -1))
        return self._shard_states(states)

    def reset_streams(self, states: StreamState, mask: jnp.ndarray) -> StreamState:
        """Clear streams where mask is True (stream admit/retire)."""
        return self._reset(states, mask, init_state(self.static, (self.batch_size,)))


# Leaves selected BY FIELD NAME (not by shape — a B == F == C config makes
# the stream-minor (F, C, B) window shape-collide with the fresh stream-major
# (B, F, C) state and a shape heuristic would mask the wrong axis):
#   rot — the global circular cursor is shared by all streams, never reset;
#   win — window content is left stale on purpose: win_count=0 masks scoring
#         until the window refills, exactly like the circular-buffer
#         semantics in state.py.
_RESET_SKIP_FIELDS = frozenset({"rot", "win"})


def _reset_streams(states: StreamState, mask: jnp.ndarray, fresh: StreamState) -> StreamState:
    out = {}
    for f in StreamState._fields:
        a = getattr(states, f)
        if f in _RESET_SKIP_FIELDS:
            out[f] = a
            continue
        b = getattr(fresh, f)
        m = mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim))
        out[f] = jnp.where(m, b, a)
    return StreamState(**out)
