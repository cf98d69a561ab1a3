"""Public API facade + host-side orchestration.

Mirrors the reference `System` class (include/System.h:64-128:
System(voc, settings, sensor) / TrackMonocular / TrackStereo / TrackRGBD /
SaveTrajectoryTUM / SaveTrajectoryKITTI / Reset / Shutdown /
Activate-DeactivateLocalizationMode / GetTrackingState) and the host half
of Tracking's state machine (src/Tracking.cc:419-683: NOT_INITIALIZED ->
OK -> LOST transitions, keyframe policy, velocity model, trajectory
bookkeeping).

Heavy work is all in jitted kernels; this layer only:
  - feeds images to the frame builders,
  - assembles the padded local-map window from covisibility,
  - applies keyframe decisions (NeedNewKeyFrame, reference
    src/Tracking.cc:2181-2336) and map updates,
  - records the per-frame relative-pose trajectory exactly as the
    reference does (Tcr relative to the reference KF, reconstructed
    against final keyframe poses on save — src/System.cc:369-395).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.slam import map as mapmod
from splslam_tpu.slam.frame import (
    FrameData,
    build_frame_mono,
    build_frame_rgbd,
    build_frame_stereo,
)
from splslam_tpu.slam.local_mapping import LocalMapper
from splslam_tpu.slam.tracking import (
    LocalWindow,
    bow_free_refkf_match,
    track_step,
)


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class TrackingState(enum.Enum):
    SYSTEM_NOT_READY = -1
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclass
class Settings:
    """Flat config mirroring the reference YAML keys (SURVEY §2.3)."""

    # Camera.*
    fx: float = 500.0
    fy: float = 500.0
    cx: float = 320.0
    cy: float = 240.0
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 0.0
    fps: float = 30.0
    width: int = 640
    height: int = 480
    rgb: int = 1
    th_depth: float = 35.0
    depth_map_factor: float = 1.0
    # ORBextractor.*
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    # Lineextractor.* (subset; see io/config.py for the full key map)
    using_line: bool = False
    line_features: int = 128
    # capacities
    max_points: int = 65536
    max_maplines: int = 4096
    max_keyframes: int = 1024
    local_window: int = 2048
    # mapping
    enable_local_mapping: bool = True
    local_ba_window: int = 8

    def camera(self) -> Camera:
        return Camera.create(
            self.fx, self.fy, self.cx, self.cy, self.k1, self.k2,
            self.p1, self.p2, self.k3, self.bf, self.width, self.height,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 1e-12 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


@dataclass
class _TrajEntry:
    ts: float
    Tcr: np.ndarray     # pose relative to reference keyframe
    ref_kf: int
    lost: bool
    Tcw: np.ndarray     # absolute (for online use / KITTI mono export)


class System:
    """TPU-native SPL-SLAM. One instance per sequence."""

    def __init__(self, settings: Settings, sensor: Sensor):
        self.settings = settings
        self.sensor = sensor
        self.cam = settings.camera()
        self.spec = PyramidSpec.create(
            settings.height, settings.width, settings.n_levels,
            settings.scale_factor, settings.n_features,
        )
        self.scales = jnp.array(self.spec.scales, jnp.float32)
        self.state = TrackingState.NO_IMAGES_YET
        self.localization_only = False
        self._reset_runtime()
        self.mapper = LocalMapper(self)

    # ------------------------------------------------------------------
    def _reset_runtime(self):
        s = self.settings
        n_feat = self.spec.total_capacity
        self.map = mapmod.MapState.empty(
            s.max_points, s.max_maplines, s.max_keyframes, n_feat,
            s.line_features,
        )
        self.n_kfs = 0
        self.n_pts = 0
        self.frame_id = 0
        self.ref_kf = -1
        self.ref_kf_matches = 0
        self.frames_since_kf = 0
        self.last: FrameData | None = None
        self.last_lm_gid = None    # [N] device
        self.last_lm_xyz = None    # [N,3] device
        self.last_Tcw = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.trajectory: list[_TrajEntry] = []
        self._local_ids_np = np.zeros((self.settings.local_window,), np.int32) - 1

    # ------------------------------------------------------------------
    # public API (reference System.h:84-128)
    # ------------------------------------------------------------------
    def track_stereo(self, img_left, img_right, timestamp: float) -> np.ndarray:
        frame = build_frame_stereo(
            jnp.asarray(img_left, jnp.float32),
            jnp.asarray(img_right, jnp.float32),
            self.cam, self.spec,
            line_capacity=self.settings.line_features,
        )
        return self._track(frame, timestamp)

    def track_rgbd(self, img, depth, timestamp: float) -> np.ndarray:
        frame = build_frame_rgbd(
            jnp.asarray(img, jnp.float32),
            jnp.asarray(depth, jnp.float32),
            self.cam, self.spec,
            depth_factor=self.settings.depth_map_factor,
            line_capacity=self.settings.line_features,
        )
        return self._track(frame, timestamp)

    def track_mono(self, img, timestamp: float) -> np.ndarray:
        frame = build_frame_mono(
            jnp.asarray(img, jnp.float32),
            self.cam, self.spec,
            undistort=self.settings.has_distortion,
            with_lines=self.settings.using_line,
            line_capacity=self.settings.line_features,
        )
        return self._track_mono(frame, timestamp)

    def activate_localization_mode(self):
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def get_tracking_state(self) -> TrackingState:
        return self.state

    def reset(self):
        self._reset_runtime()
        self.state = TrackingState.NO_IMAGES_YET

    def shutdown(self):
        self.mapper.flush()

    # ------------------------------------------------------------------
    # stereo / RGB-D path (point-only, like the reference)
    # ------------------------------------------------------------------
    def _track(self, frame: FrameData, ts: float) -> np.ndarray:
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            self._stereo_initialize(frame, ts)
            return np.array(self.last_Tcw)

        T_pred = self.velocity @ self.last_Tcw
        win = self._local_window()
        res = track_step(
            self.cam, self.scales, frame,
            self.last.feat.xy, self.last.feat.octave, self.last.feat.angle,
            self.last.feat.desc,
            self.last_lm_xyz, self.last_lm_gid,
            T_pred, win,
            scale_factor=self.settings.scale_factor,
            n_levels=self.settings.n_levels,
        )
        n_mm = int(res.n_mm_matches)
        n_in = int(res.n_inliers)

        if n_mm < 20 or n_in < 10:
            # Fallback: reference keyframe match (TrackReferenceKeyFrame).
            res = self._track_refkf(frame)
            n_in = int(res.n_inliers)

        if n_in < 10:
            self.state = TrackingState.LOST
            self._log_frame(ts, self.last_Tcw, lost=True)
            # Keep last pose; a relocalization module (BoW+EPnP) recovers
            # in later rounds of the build.
            self.frame_id += 1
            return np.array(self.last_Tcw)

        self.state = TrackingState.OK
        Tcw = res.Tcw
        # landmark stats
        self.map = mapmod.update_point_stats(
            self.map,
            res.visible_ids,
            jnp.ones_like(res.visible_ids, bool),
            jnp.zeros_like(res.visible_ids, bool),
        )
        self.map = mapmod.update_point_stats(
            self.map,
            res.found_ids,
            jnp.zeros_like(res.found_ids, bool),
            jnp.ones_like(res.found_ids, bool),
        )

        # keyframe policy
        if not self.localization_only and self._need_new_keyframe(frame, res, n_in):
            self._create_keyframe(frame, Tcw, res.lm_gid, ts)
        else:
            self.frames_since_kf += 1

        # velocity model + last-frame state
        self.velocity = Tcw @ jnp.linalg.inv(self.last_Tcw)
        self._finish_frame(frame, Tcw, res.lm_gid, ts)
        return np.array(Tcw)

    def _track_refkf(self, frame: FrameData):
        k = self.ref_kf
        kfs = self.map.kfs
        lm = kfs.lm_idx[k]
        xyz = self.map.pts.xyz[jnp.clip(lm, 0)]
        return bow_free_refkf_match(
            self.cam, frame,
            kfs.desc[k], kfs.angle[k], kfs.fvalid[k], lm, xyz,
            self.last_Tcw,
        )

    def _stereo_initialize(self, frame: FrameData, ts: float):
        """Reference Tracking::StereoInitialization (src/Tracking.cc:970)."""
        n_depth = int(jnp.sum((frame.depth > 0).astype(jnp.int32)))
        if n_depth < 100:
            self.state = TrackingState.NOT_INITIALIZED
            self.frame_id += 1
            return
        Tcw = jnp.eye(4)
        n = frame.feat.capacity
        no_lm = jnp.full((n,), -1, jnp.int32)
        no_ll = jnp.full((frame.lines.capacity,), -1, jnp.int32)
        self.map, kf = mapmod.insert_keyframe(
            self.map, frame, Tcw, no_lm, no_ll,
            jnp.int32(self.frame_id), jnp.float32(ts),
        )
        self.map, lm_gid = mapmod.create_stereo_points(
            self.map, kf, frame, Tcw, no_lm,
            self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
            jnp.float32(1e9),
            self.settings.scale_factor, self.settings.n_levels,
            max_new=1000,
        )
        self.n_kfs = 1
        self.n_pts = int(self.map.n_pts)
        self.ref_kf = int(kf)
        self.ref_kf_matches = self.n_pts
        self.frames_since_kf = 0
        self.state = TrackingState.OK
        self._finish_frame(frame, Tcw, lm_gid, ts)
        self.mapper.on_keyframe(int(kf))

    def _need_new_keyframe(self, frame: FrameData, res, n_in: int) -> bool:
        """Reference Tracking::NeedNewKeyFrame (src/Tracking.cc:2181)."""
        s = self.settings
        max_frames = int(s.fps)
        # close-point bookkeeping (stereo/RGBD only)
        th_depth_m = float(self.cam.bf) / s.fx * s.th_depth
        depth = np.asarray(frame.depth)
        inl = np.asarray(res.inlier)
        close = (depth > 0) & (depth < th_depth_m)
        n_tracked_close = int((close & inl).sum())
        n_untracked_close = int((close & ~inl).sum())
        need_close = (n_tracked_close < 100) and (n_untracked_close > 70)

        ref_matches = max(self.ref_kf_matches, 1)
        th_ratio = 0.75 if self.n_kfs > 2 else 0.4
        c1a = self.frames_since_kf >= max_frames
        c1b = self.frames_since_kf >= 0  # mapper is synchronous => idle
        c1c = (n_in < ref_matches * 0.25) or need_close
        c2 = (n_in < ref_matches * th_ratio or need_close) and n_in > 15
        return (c1a or (c1b and c1c)) and c2 or (c1a and c2)

    def _create_keyframe(self, frame: FrameData, Tcw, lm_gid, ts: float):
        no_ll = jnp.full((frame.lines.capacity,), -1, jnp.int32)
        self.map, kf = mapmod.insert_keyframe(
            self.map, frame, Tcw, lm_gid, no_ll,
            jnp.int32(self.frame_id), jnp.float32(ts),
        )
        if self.sensor in (Sensor.STEREO, Sensor.RGBD):
            th_depth_m = float(self.cam.bf) / self.settings.fx * self.settings.th_depth
            self.map, lm_gid = mapmod.create_stereo_points(
                self.map, kf, frame, Tcw, lm_gid,
                self.cam.fx, self.cam.fy, self.cam.cx, self.cam.cy,
                jnp.float32(th_depth_m),
                self.settings.scale_factor, self.settings.n_levels,
                max_new=200,
            )
        self.n_kfs = int(self.map.n_kfs)
        self.n_pts = int(self.map.n_pts)
        self.ref_kf = int(kf)
        self.ref_kf_matches = int(jnp.sum((lm_gid >= 0).astype(jnp.int32)))
        self.frames_since_kf = 0
        self.mapper.on_keyframe(int(kf))
        return lm_gid

    def _finish_frame(self, frame: FrameData, Tcw, lm_gid, ts: float):
        self.last = frame
        self.last_lm_gid = lm_gid
        self.last_lm_xyz = self.map.pts.xyz[jnp.clip(lm_gid, 0)]
        self.last_Tcw = Tcw
        self._log_frame(ts, Tcw, lost=False)
        self.frame_id += 1

    def _log_frame(self, ts: float, Tcw, lost: bool):
        Tcw_np = np.array(Tcw)
        ref = self.ref_kf
        if ref >= 0:
            Trw = np.array(self.map.kfs.Tcw[ref])
            Tcr = Tcw_np @ np.linalg.inv(Trw)
        else:
            Tcr = np.eye(4)
        self.trajectory.append(_TrajEntry(ts, Tcr, ref, lost, Tcw_np))

    # ------------------------------------------------------------------
    # local map window
    # ------------------------------------------------------------------
    def _local_window(self) -> LocalWindow:
        """Landmarks of the keyframes covisible with the last frame
        (reference Tracking::UpdateLocalMap, src/Tracking.cc:2595)."""
        M_ = self.settings.local_window
        cov = np.asarray(
            mapmod.covisibility_counts(self.map, self.last_lm_gid)
        )
        k_top = min(10, self.n_kfs)
        kf_ids = np.argsort(-cov)[:k_top]
        kf_ids = kf_ids[cov[kf_ids] > 0]
        if len(kf_ids) == 0:
            kf_ids = np.array([self.ref_kf])
        lm_rows = np.asarray(self.map.kfs.lm_idx[jnp.array(kf_ids)])
        ids = np.unique(lm_rows[lm_rows >= 0])
        if len(ids) > M_:
            ids = ids[:M_]
        padded = np.full((M_,), -1, np.int32)
        padded[: len(ids)] = ids
        self._local_ids_np = padded
        idx = jnp.asarray(padded)
        safe = jnp.clip(idx, 0)
        pts = self.map.pts
        return LocalWindow(
            ids=idx,
            xyz=pts.xyz[safe],
            desc=pts.desc[safe],
            normal=pts.normal[safe],
            dmin=pts.dmin[safe],
            dmax=pts.dmax[safe],
            ok=(idx >= 0) & pts.valid[safe],
        )

    # ------------------------------------------------------------------
    # monocular path (initialization added with the line pipeline round)
    # ------------------------------------------------------------------
    def _track_mono(self, frame: FrameData, ts: float) -> np.ndarray:
        from splslam_tpu.slam import mono

        return mono.track_mono(self, frame, ts)

    # ------------------------------------------------------------------
    # trajectory export (reference System.cc:340-540)
    # ------------------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        """TUM format: ts tx ty tz qx qy qz qw of Twc, reconstructed
        against final keyframe poses (reference System::SaveTrajectoryTUM,
        src/System.cc:340-395)."""
        kf_Tcw = np.asarray(self.map.kfs.Tcw)
        with open(path, "w") as f:
            for e in self.trajectory:
                if e.lost:
                    continue
                Trw = kf_Tcw[e.ref_kf] if e.ref_kf >= 0 else np.eye(4)
                Tcw = e.Tcr @ Trw
                Twc = np.linalg.inv(Tcw)
                t = Twc[:3, 3]
                q = _rot_to_quat(Twc[:3, :3])
                f.write(
                    f"{e.ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 12 entries of Twc per line (reference
        System::SaveTrajectoryKITTI, src/System.cc:440-490)."""
        kf_Tcw = np.asarray(self.map.kfs.Tcw)
        with open(path, "w") as f:
            for e in self.trajectory:
                Trw = kf_Tcw[e.ref_kf] if e.ref_kf >= 0 else np.eye(4)
                Tcw = e.Tcr @ Trw
                Twc = np.linalg.inv(Tcw)
                row = Twc[:3, :4].reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in row) + "\n")

    def poses(self) -> np.ndarray:
        """All per-frame camera-to-world poses [F,4,4] (online estimates)."""
        return np.stack(
            [np.linalg.inv(e.Tcw) for e in self.trajectory], axis=0
        )


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion [qx,qy,qz,qw]."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s, 0.25 * s]
        )
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.empty(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q
