"""Local mapping: triangulation of new landmarks, culling, local BA.

Host-side orchestration of the reference LocalMapping thread
(src/LocalMapping.cc Run :55-124 / RunBoth :127-267). The reference's
4-thread pipeline with mutex handshakes becomes ONE fused device program
per keyframe (slam/mapping_ops.mapping_step) dispatched asynchronously
right after keyframe insertion; the host fetches its small stats vector
lazily, so mapping overlaps the next frames' tracking on device.

Stages per keyframe (reference RunBoth :127-267):
  1. MapPointCulling     (:408) — probation policy on found/visible ratio
  2. CreateNewMapPoints  (:484) — epipolar search + batched DLT vs
                                   covisible neighbors
  3. SearchInNeighbors fuse (:1249)
  4. Local BA            (Optimizer.cc:2383) — Schur LM window solve
  5. KeyFrameCulling     (:1577)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class LocalMapper:
    def __init__(self, system):
        self.sys = system
        self.big_change_idx = 0  # reference Map::mnBigChangeIdx
        self._pending_stats = None
        self._pending_kf = None
        self.last_stats = np.zeros((4,), np.float32)
        self.ba_ms_total = 0.0
        self.n_steps = 0
        self.n_guarded = 0  # transient accepted-iteration camera-step
        #   zeroings (BAResult.n_guarded) — rate-bounded by e2e suites
        self.n_state_revert = 0  # non-finite end-state reverts
        #   (BAResult.n_state_revert) — e2e suites assert exactly 0
        self.n_lm_singular = 0  # benign single-landmark step zeroings
        #   (BAResult.n_lm_singular) — surfaced, not hard-gated
        self._pending_version = 0  # sys.map_version at dispatch time:
        #   flush() must NOT write this step's post-BA keyframe pose
        #   into kf_pose_host if a loop correction / GBA rewrote the
        #   map poses after the dispatch (the functional analog of the
        #   reference's RequestStop/mbAbortBA handshake,
        #   src/LoopClosing.cc:415-440 — a stale pre-correction pose
        #   must not overwrite the corrected one)

    def on_keyframe(self, kf_idx: int):
        sys = self.sys
        if not sys.settings.enable_local_mapping or sys.n_kfs < 2:
            return
        from splslam_tpu.slam import mapping_ops

        from splslam_tpu.slam.system import Sensor

        # Keyframe-axis bucket: next power of two >= the live count,
        # floor 32 (few compile-cache buckets; see _mapping_step).
        kb = min(
            sys.map.kfs.Tcw.shape[0],
            max(32, 1 << (max(int(sys.n_kfs), 1) - 1).bit_length()),
        )
        sys.map, stats = mapping_ops.mapping_step(
            sys.map, jnp.int32(kf_idx), sys.cam, sys.scales,
            scale_factor=sys.settings.scale_factor,
            n_levels=sys.settings.n_levels,
            ba_rounds=sys.settings.local_ba_rounds,
            ba_iters=sys.settings.local_ba_iters,
            # cnThObs: 2 mono / 3 stereo-RGBD (reference LocalMapping.cc:419)
            th_obs=2 if sys.sensor == Sensor.MONOCULAR else 3,
            with_lines=sys.settings.using_line,
            k_bucket=kb,
        )
        try:
            stats.copy_to_host_async()
        except AttributeError:
            pass
        self.flush()  # consume the PREVIOUS step's bookkeeping first
        self._pending_stats = stats
        self._pending_kf = kf_idx
        self._pending_version = sys.map_version
        self.big_change_idx += 1
        self.n_steps += 1
        # The mapping step may have adjusted landmark positions the live
        # tracker state caches; refresh the cached positions.
        if sys.step is not None:
            sys.step = sys.step._replace(
                lm_xyz=sys.map.pts.xyz[jnp.clip(sys.step.lm_gid, 0)]
            )

    def flush(self):
        if self._pending_stats is None:
            return
        from splslam_tpu.slam.mapping_ops import (
            MAX_KF_CULL, MSTAT_CULL, MSTAT_GUARD, MSTAT_LMSING,
            MSTAT_POSE, MSTAT_REVERT,
        )

        v = np.asarray(self._pending_stats)
        self._pending_stats = None
        self.last_stats = v[:MSTAT_POSE]
        if v.shape[0] <= MSTAT_POSE:   # legacy 4-float vector (tests)
            return
        pose = v[MSTAT_POSE:MSTAT_POSE + 16].reshape(4, 4)
        culled = []
        for i in range(MAX_KF_CULL):
            off = MSTAT_CULL + i * 17
            cid = int(v[off])
            if cid >= 0:
                culled.append((cid, v[off + 1:off + 17].reshape(4, 4)))
        if v.shape[0] > MSTAT_GUARD:
            self.n_guarded += int(v[MSTAT_GUARD])
        if v.shape[0] > MSTAT_REVERT:
            self.n_state_revert += int(v[MSTAT_REVERT])
        if v.shape[0] > MSTAT_LMSING:
            self.n_lm_singular += int(v[MSTAT_LMSING])
        # Version check (see _pending_version): when a correction landed
        # after this step's dispatch, its post-BA pose is pre-correction
        # and must not overwrite kf_pose_host — pass pose=None; the
        # culled-KF Tcp re-rooting is still applied (Tcp is a RELATIVE
        # transform captured at cull time, invariant to later
        # whole-trajectory corrections).
        stale = self._pending_version != self.sys.map_version
        self.sys._on_mapping_result(
            self._pending_kf, None if stale else pose, culled
        )
