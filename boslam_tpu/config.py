"""Frozen configuration for the whole engine.

Replaces the reference's ``config.py`` constants module (SURVEY.md §2.1:
ORB feature count, pyramid levels/scale, FAST thresholds, Hamming match
thresholds, keyframe policy, TUM depth factor, camera intrinsics).

Every *capacity* constant lives here because XLA shapes depend on them
(SURVEY.md §5.6, §7.0): number of features per frame, max keyframes, max map
points, local-BA window sizes.  The dataclass is frozen + hashable so it can be
a static argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole RGBD camera model (TUM fr1 defaults)."""

    fx: float = 517.3
    fy: float = 516.5
    cx: float = 318.6
    cy: float = 255.3
    width: int = 640
    height: int = 480
    # TUM depth PNGs store depth * depth_factor as uint16 (SURVEY.md §2.1).
    depth_factor: float = 5000.0
    # Valid depth range in metres.
    depth_min: float = 0.1
    depth_max: float = 8.0
    # Host->device depth wire stride.  Depth is only ever sampled at
    # keypoint locations (<= n_features values per frame), but the H2D link
    # is byte-serialized with compute, so shipping the full 614 KB u16 map
    # costs ~4 ms/frame over a remote-device tunnel.  stride=s ships 1/s^2
    # of the bytes: one sample per s x s block via a boundary-aware medoid
    # reduction (slam.depth_wire) that never mixes depths across object
    # boundaries and averages same-surface sensor noise down ~sqrt(n).
    depth_wire_stride: int = 1

    @property
    def depth_wire_shape(self) -> tuple:
        s = self.depth_wire_stride
        return (-(-self.height // s), -(-self.width // s))


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB-style feature frontend (reference: cv2.ORB_create, SURVEY.md §2.2)."""

    n_features: int = 512          # fixed keypoint capacity per frame (masked)
    n_levels: int = 8              # pyramid levels
    scale_factor: float = 1.2      # pyramid scale
    fast_threshold: int = 20       # FAST-9 intensity threshold
    fast_threshold_min: int = 7    # fallback threshold for weak cells
    patch_size: int = 31           # orientation / descriptor patch
    border: int = 19               # keypoint exclusion border (patch half + margin)
    grid_rows: int = 8             # top-k bucketing grid for spatial spread
    grid_cols: int = 8
    # Frontend kernel backend: "auto" = Pallas kernels on TPU, jnp elsewhere;
    # "jnp" / "pallas" force one path (tests pin both).
    frontend_impl: str = "auto"


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Descriptor matching (reference: cv2.BFMatcher(NORM_HAMMING), SURVEY.md §2.1)."""

    hamming_low: int = 50          # strict threshold (tracking)
    hamming_high: int = 100        # loose threshold (wide searches)
    ratio: float = 0.9             # Lowe ratio (best/second-best)
    search_radius: float = 15.0    # projection-window radius, pixels, octave-scaled
    search_radius_wide: float = 45.0


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Frame-to-map tracking (reference tracking.py, SURVEY.md §2.1/§3.2)."""

    min_inliers: int = 12          # below this -> LOST
    # Projection-matching scope. "local" (reference policy, SURVEY.md §3.2
    # track_local_map): match only points observed by the reference
    # keyframe's covisibility neighborhood (2 rings) — O(local) aliasing,
    # scales to 50k+ maps, and revisits beyond the search window need a
    # LOOP CLOSURE exactly like the reference.  "global": project the whole
    # map every frame — self-relocalizing on small maps, but aliases and
    # costs more as the map grows.
    track_scope: str = "local"
    ba_rounds: int = 3             # motion-only BA outer rounds with chi2 gating
    ba_iters: int = 6              # GN iterations per round
    chi2_2d: float = 5.991         # 95% chi-square, 2 dof (reprojection)
    chi2_3d: float = 7.815         # 95% chi-square, 3 dof (depth-augmented)
    huber_delta: float = 2.4477    # sqrt(5.991)
    depth_weight: float = 20.0     # depth residual scale: 1/sigma_z with sigma_z=5cm, in pixel-sigma units
    # Keyframe policy (reference need_new_keyframe()).
    kf_min_interval: int = 3       # min frames between KFs
    kf_max_interval: int = 30      # force a KF after this many frames
    kf_tracked_ratio: float = 0.6  # insert KF if tracked/ref-visible drops below
    kf_min_tracked: int = 40
    # RANSAC PnP (init / relocalization).
    ransac_iters: int = 128        # hypotheses evaluated in parallel (vmap)
    ransac_threshold: float = 5.0  # pixel reprojection inlier bound
    # BoW relocalization candidate set size: the reference attempts PnP on
    # EVERY BoW candidate (SURVEY.md §3.2 relocalize), not just the top
    # score — one aliased top score must not sink the whole frame.  All
    # candidates are matched + solved in one vmapped dispatch.
    reloc_candidates: int = 4


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Fixed-capacity map state (SURVEY.md §7.0: static shapes + masks)."""

    max_keyframes: int = 256
    max_points: int = 16384
    covis_min_weight: int = 15     # covisibility edge kept above this weight
    covis_essential_weight: int = 100  # essential-graph high-weight edges
    # Point culling (reference local_mapping.py).
    cull_min_found_ratio: float = 0.25
    cull_min_obs: int = 3
    # Keyframe culling: redundant if this fraction of its points is seen >= 3x.
    kf_cull_redundancy: float = 0.9


@dataclasses.dataclass(frozen=True)
class LocalBaConfig:
    """Local bundle adjustment window (reference local_ba, SURVEY.md §3.3/§3.5)."""

    n_opt_kf: int = 8              # optimized camera poses (covisible window)
    n_fixed_kf: int = 8            # fixed second-ring poses
    max_local_points: int = 2048   # compacted active landmark capacity
    lm_iters: int = 6
    lm_lambda0: float = 1e-4
    huber_delta: float = 2.4477
    # Damping-step policy.  False (default) = damped Gauss-Newton: fixed
    # geometric lambda schedule, every step accepted — one linearization +
    # one Schur solve per iteration.  True = classic LM accept/reject,
    # which adds a trial-point residual pass per iteration (the reference's
    # g2o behavior); use for adversarial geometry.
    lm_accept_reject: bool = False
    lm_lambda_decay: float = 0.5   # GN-mode lambda schedule: lam *= decay


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Place recognition + loop closing (reference loop_closing.py / DBoW3)."""

    vocab_size: int = 1024         # flat binary vocabulary words
    min_score_matches: int = 30    # descriptor-level candidate score threshold
    consistency: int = 3           # consecutive-KF temporal consistency
    min_gap_kf: int = 20           # candidate must be this many KFs old
    # Refined-inlier acceptance bound: RANSAC SE3 then pixel-level GN chi2
    # regating; a weak (aliased-texture) candidate passes 3D RANSAC with
    # ~20 inliers but a genuine revisit yields 60+, so gate high.
    se3_inliers: int = 40
    # The refined-inlier gate scales with the keypoint budget: effective
    # gate = max(se3_inliers, se3_inlier_frac * n_features).  A genuine
    # revisit matches a roughly constant FRACTION of the extracted
    # keypoints, so a fixed count tuned at 256 features under-gates a
    # 512-feature configuration (r4 finding: borderline 40-50-inlier
    # closures at 512 features injected noisy edges, ATE 0.16 vs 0.10
    # with the fraction gate).
    se3_inlier_frac: float = 0.15
    se3_threshold: float = 0.10    # metres, 3D alignment inlier radius floor
    # Depth-adaptive inlier radius: RGBD depth noise grows with range, so a
    # fixed 10 cm radius excludes every far correspondence in hall-scale
    # scenes (at 2.5% sensor noise a 15 m point carries ~40 cm of 3D
    # noise) — RANSAC then starves below se3_inliers and genuine revisits
    # are rejected.  Effective radius per correspondence:
    # max(se3_threshold, se3_rel_threshold * depth).
    se3_rel_threshold: float = 0.04
    pg_iters: int = 12             # pose-graph GN iterations
    # Online vocabulary lifecycle: first trained once this many keyframes
    # exist, then retrained every vocab_refresh_kf NEW insertions so the
    # word table tracks the scene (kf_bow rows are recomputed each time).
    vocab_train_kf: int = 5
    vocab_refresh_kf: int = 32
    # Run full global BA after a successful loop correction (the reference's
    # optional side-thread global BA, SURVEY.md §3.4).
    run_global_ba: bool = False
    global_ba_iters: int = 6
    global_ba_cg_iters: int = 40


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Top-level engine configuration. Frozen + hashable => jit-static."""

    camera: CameraConfig = CameraConfig()
    orb: OrbConfig = OrbConfig()
    matcher: MatcherConfig = MatcherConfig()
    tracker: TrackerConfig = TrackerConfig()
    map: MapConfig = MapConfig()
    local_ba: LocalBaConfig = LocalBaConfig()
    loop: LoopConfig = LoopConfig()

    def replace(self, **kw: Any) -> "SlamConfig":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def from_dict(
        d: Mapping[str, Any], base: "SlamConfig | None" = None
    ) -> "SlamConfig":
        """Build from a nested dict (YAML/CLI loading path, SURVEY.md §5.6).

        Keys present in ``d`` override the corresponding field of ``base``
        (default ``SlamConfig()``); unknown section or field names raise
        (a typo must not silently produce a default-config run).
        """
        base = SlamConfig() if base is None else base
        sections = (
            "camera", "orb", "matcher", "tracker", "map", "local_ba", "loop",
        )
        unknown = set(d) - set(sections)
        if unknown:
            raise ValueError(f"unknown config sections: {sorted(unknown)}")
        kw = {}
        for key in sections:
            if key in d:
                kw[key] = dataclasses.replace(getattr(base, key), **dict(d[key]))
        return dataclasses.replace(base, **kw)

    @staticmethod
    def from_yaml(path: str, base: "SlamConfig | None" = None) -> "SlamConfig":
        """Load a nested-section YAML file over ``base`` (CLI ``--config``)."""
        import yaml

        with open(path) as f:
            d = yaml.safe_load(f) or {}
        return SlamConfig.from_dict(d, base=base)


# TUM camera presets (intrinsics from the TUM RGBD benchmark docs).
TUM_FR1 = CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3)
TUM_FR2 = CameraConfig(fx=520.9, fy=521.0, cx=325.1, cy=249.7)
TUM_FR3 = CameraConfig(fx=535.4, fy=539.2, cx=320.1, cy=247.6)
# ICL-NUIM synthetic living-room / office sequences (PNG exports fold the
# POV-Ray negative-fy convention out; depth factor 5000 like TUM).
ICL_NUIM = CameraConfig(fx=481.20, fy=480.00, cx=319.50, cy=239.50)
