"""Multi-sequence data parallelism (BASELINE config 5: N sequences in
parallel, sharded over the mesh 'seq' axis).

Because every pipeline stage is a pure function of pytrees (SURVEY.md §7.0),
DP is literally ``vmap`` over a leading sequence axis + shardings that place
each sequence's MapState/TrackState/frame on its own devices.  No
communication crosses the 'seq' axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from boslam_tpu.config import SlamConfig
from boslam_tpu.tracking.tracker import track_frame


def make_batched_tracker(cfg: SlamConfig, mesh: Mesh):
    """Jitted vmapped track_frame over a leading 'seq' axis.

    All pytree leaves of (map_states, track_states, feats) carry a leading
    [S] axis sharded over mesh axis 'seq'.
    """
    vmapped = jax.vmap(functools.partial(track_frame, cfg))
    shard = NamedSharding(mesh, P("seq"))

    @functools.partial(jax.jit, out_shardings=(shard, shard))
    def step(map_states, track_states, feats):
        return vmapped(map_states, track_states, feats)

    return step, shard


def device_put_batched(tree, sharding):
    """Place a [S, ...]-batched pytree with the given leading-axis sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def stack_trees(trees):
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
