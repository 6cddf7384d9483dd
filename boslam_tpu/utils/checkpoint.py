"""Checkpoint / resume: the whole engine state is one pytree (SURVEY.md §5.4).

The reference has no checkpointing (trajectory dump at exit only); here the
map, loop-closure state, tracker state and RNG key snapshot to disk via
orbax-checkpoint every N keyframes and a run can resume mid-sequence —
deterministic replay for crash recovery (SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save(path: str, slam) -> None:
    """Snapshot a SlamSystem's device state + host trajectory."""
    import orbax.checkpoint as ocp

    slam.flush()
    if hasattr(slam, "_merge_pending_ba"):
        slam._merge_pending_ba()  # land an in-flight async local BA
    if hasattr(slam, "_resolve_pending_verify"):
        slam._resolve_pending_verify()  # and any in-flight loop closure
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state = {
        "map": _tree_to_numpy(slam.map._asdict()),
        "loop": _tree_to_numpy(slam.loop._asdict()),
        "track": _tree_to_numpy(slam.track._asdict()),
        "key": np.asarray(jax.random.key_data(slam.key)),
        "timestamps": np.asarray(slam.timestamps, np.float64),
        "poses_twc": (
            np.stack(slam.poses_twc)
            if slam.poses_twc
            else np.zeros((0, 7), np.float32)
        ),
        "n_loops_closed": np.asarray(slam.n_loops_closed),
        "frame_ref_slot": np.asarray([r[0] for r in slam.frame_refs], np.int32),
        "frame_ref_seq": np.asarray([r[1] for r in slam.frame_refs], np.int32),
        "frame_ref_rel": (
            np.stack([r[2] for r in slam.frame_refs])
            if slam.frame_refs else np.zeros((0, 7), np.float32)
        ),
    }
    if slam.cull_chain:
        # Cull chain rows: victim_slot victim_seq parent_slot parent_seq
        # + T_victim_parent (the erased-keyframe anchor records).  Omitted
        # when empty: orbax refuses zero-size arrays.
        state["cull_chain"] = np.stack([
            np.concatenate([np.asarray([vs, vq, ps, pq], np.float32), rel])
            for (vs, vq), (ps, pq, rel) in slam.cull_chain.items()
        ])
    ckptr.save(path, state, force=True)


# Fields whose shape may legitimately differ between the snapshot and the
# running engine (transient trackers whose capacity is a code constant, e.g.
# the loop streak tracker growing from scalar to [N_STREAKS]).  On mismatch
# these silently reset to the template default; ANY OTHER field with a shape
# mismatch means the checkpoint was written under a different SlamConfig
# (different capacities) and must fail loudly, not restore a half-empty map.
_TRANSIENT_FIELDS = frozenset({"streak_kf", "streak_len"})


def restore(path: str, slam) -> None:
    """Restore a SlamSystem in place (cfg must match the snapshot's shapes)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(path)
    import jax.numpy as jnp

    def merge(template, saved: dict):
        """Rebuild a state NamedTuple from the snapshot, filling fields the
        snapshot predates with the template's defaults (version tolerance:
        an old checkpoint written before a MapState field was added must
        restore, not raise TypeError).  Unknown saved keys are ignored."""
        fields = template._fields
        vals = template._asdict()
        for k, v in saved.items():
            if k not in fields:
                continue
            if jnp.asarray(v).shape != jnp.shape(vals[k]):
                if k in _TRANSIENT_FIELDS:
                    continue  # transient tracker: reset to template default
                raise ValueError(
                    f"checkpoint field {type(template).__name__}.{k} has "
                    f"shape {jnp.asarray(v).shape}, engine expects "
                    f"{jnp.shape(vals[k])} — was the snapshot written under "
                    "a different SlamConfig (capacities)?"
                )
            vals[k] = jnp.asarray(v)
        return type(template)(**vals)

    slam.map = merge(slam.map, dict(state["map"]))
    slam.loop = merge(slam.loop, dict(state["loop"]))
    slam.track = merge(slam.track, dict(state["track"]))
    slam.key = jax.random.wrap_key_data(jnp.asarray(state["key"]))
    # Resume the vocabulary-refresh schedule from the restored map size.
    slam._vocab_trained_at = (
        int(np.asarray(state["map"]["n_kf"]))
        if bool(np.asarray(state["loop"]["vocab_ready"]))
        else -1
    )
    slam.timestamps = list(np.asarray(state["timestamps"]))
    slam.poses_twc = [p for p in np.asarray(state["poses_twc"])]
    slam.n_loops_closed = int(state["n_loops_closed"])
    if "frame_ref_slot" in state:
        slam.frame_refs = [
            (int(s), int(q), np.asarray(r))
            for s, q, r in zip(
                np.asarray(state["frame_ref_slot"]),
                np.asarray(state["frame_ref_seq"]),
                np.asarray(state["frame_ref_rel"]),
            )
        ]
    if "cull_chain" in state:
        slam.cull_chain = {
            (int(row[0]), int(row[1])): (int(row[2]), int(row[3]), row[4:11])
            for row in np.asarray(state["cull_chain"], np.float32)
        }
    # Rebuild the host-side slot->seq mirror from the restored map: loop
    # verification (_resolve_pending_verify) requires BOTH endpoints'
    # mirror entries to be non-None, so without this every closure against
    # a pre-resume keyframe would be silently dropped (ADVICE r4).
    slam._kf_seq_host = {
        i: int(s)
        for i, (v, s) in enumerate(
            zip(np.asarray(slam.map.kf_valid), np.asarray(slam.map.kf_seq))
        )
        if v
    }
