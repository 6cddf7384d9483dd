"""Keyframe-anchored trajectory resolution (reference trajectory-dump policy).

Every tracked frame records (reference keyframe slot, kf_seq, T_cur_ref);
at dump time it is re-anchored to the CURRENT pose of that keyframe, so
loop-closure / global-BA corrections applied after the frame passed still
correct its recorded pose.  Frames whose reference keyframe was CULLED chase
the cull chain (victim -> spanning parent -> ... -> live keyframe),
composing the relative poses recorded at cull time — the reference's
erased-keyframe Tcp mechanism; only an unresolvable chain falls back to the
raw pose.

Shared by the single-sequence engine (slam.SlamSystem.trajectory) and the
batched multi-sequence engine (parallel.multi.BatchedSlamSystem.trajectory)
so the 64-hop cap and resolution caching cannot drift between the two.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from boslam_tpu.geometry import se3

_MAX_HOPS = 64


def anchor_trajectory(raw, frame_refs, cull_chain, kf_pose, kf_valid, kf_seq):
    """Re-anchor raw frame poses to their (corrected) reference keyframes.

    Args:
      raw: [T, 7] f32 raw T_wc poses recorded at track time.
      frame_refs: list of (ref_slot, ref_seq, T_cur_ref [7]) per frame.
      cull_chain: {(victim_slot, victim_seq): (parent_slot, parent_seq,
        T_victim_parent [7])} — records written when keyframes were culled.
      kf_pose / kf_valid / kf_seq: the map's CURRENT keyframe arrays (numpy).

    Returns [T, 7] anchored poses; frames whose chain does not resolve to a
    live keyframe keep their raw pose.
    """
    refs = np.array([r[0] for r in frame_refs])
    seqs = np.array([r[1] for r in frame_refs])
    rels = np.stack([r[2] for r in frame_refs])

    def live(slot, seq):
        return kf_valid[slot] and kf_seq[slot] == seq

    # Chase culled references up the chain (host side, cached per
    # (slot, seq): chains are shared by all frames anchored to the same
    # victim).
    resolved: dict = {}
    for i in range(len(refs)):
        key = (int(refs[i]), int(seqs[i]))
        if live(*key):
            continue
        if key not in resolved:
            slot, seq = key
            acc = se3.pose_identity()
            hops = 0
            while (slot, seq) in cull_chain and hops < _MAX_HOPS:
                pslot, pseq, t_vp = cull_chain[(slot, seq)]
                acc = np.asarray(
                    se3.pose_compose(jnp.asarray(acc), jnp.asarray(t_vp))
                )
                slot, seq = pslot, pseq
                hops += 1
            resolved[key] = (slot, seq, acc) if live(slot, seq) else None
        hit = resolved[key]
        if hit is not None:
            slot, seq, acc = hit
            refs[i], seqs[i] = slot, seq
            rels[i] = np.asarray(
                se3.pose_compose(jnp.asarray(rels[i]), jnp.asarray(acc))
            )
    usable = kf_valid[refs] & (kf_seq[refs] == seqs)
    T_cw = se3.pose_compose(jnp.asarray(rels), jnp.asarray(kf_pose[refs]))
    anchored = np.asarray(se3.pose_inv(T_cw))
    return np.where(usable[:, None], anchored, raw)
