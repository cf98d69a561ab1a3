"""Local mapping: triangulation of new landmarks, culling, local BA.

Host-side orchestration of the reference LocalMapping thread
(src/LocalMapping.cc Run/RunBoth): runs synchronously after each keyframe
insertion (the reference's 4-thread pipeline becomes sequential host
stages dispatching device kernels; async overlap is a later optimization
once parity is proven — SURVEY §7.1 "Host orchestration").

Stages per keyframe (reference RunBoth :127-267):
  1. MapPointCulling     (:408) — 3-strike policy on found/visible ratio
  2. CreateNewMapPoints  (:484) — epipolar search + batched DLT vs
                                   covisible neighbors
  3. SearchInNeighbors fuse (:1249)
  4. Local BA            (Optimizer.cc:2383) — Schur/GN window solve
  5. KeyFrameCulling     (:1577)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from splslam_tpu.slam import map as mapmod


class LocalMapper:
    def __init__(self, system):
        self.sys = system
        self.recent_pts: list[tuple[int, int]] = []  # (lm_id, birth_kf)
        self.big_change_idx = 0  # reference Map::mnBigChangeIdx

    def on_keyframe(self, kf_idx: int):
        sys = self.sys
        if not sys.settings.enable_local_mapping or sys.n_kfs < 2:
            return
        from splslam_tpu.slam import mapping_ops

        # 1. cull unreliable recent landmarks
        sys.map = mapping_ops.cull_points(sys.map, kf_idx)
        # 2. triangulate new landmarks against best covisible neighbors
        sys.map = mapping_ops.create_new_points(sys, kf_idx)
        # 3+4. fuse duplicates + local bundle adjustment over the
        # covisibility window
        sys.map = mapping_ops.local_ba(sys, kf_idx)

    def flush(self):
        pass
