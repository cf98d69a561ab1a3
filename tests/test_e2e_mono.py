"""End-to-end monocular SLAM on a synthetic sequence: two-view bootstrap
(unified RANSAC), tracking, keyframes + mapping, Sim3-aligned ATE."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from splslam_tpu.io.synthetic import ate_rmse, make_stereo_sequence
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState


def run_mono(motion="lateral", n_frames=30, mapping=True):
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=n_frames, motion=motion, width=320, height=240
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=0.0, width=320, height=240,
        n_features=600, n_levels=4, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=mapping,
    )
    sysm = System(st, Sensor.MONOCULAR)
    for i, (l, r) in enumerate(frames):
        sysm.track_mono(l, i * 0.1)
    sysm.drain()
    return sysm, gt


class TestMonoSLAM:
    def test_initializes_and_tracks(self):
        sysm, gt = run_mono()
        assert sysm.get_tracking_state() == TrackingState.OK
        assert sysm.n_kfs >= 2
        est = sysm.poses()
        assert est.shape[0] >= 25
        idx = [int(round(e.ts / 0.1)) for e in sysm.trajectory if not e.lost]
        err = ate_rmse(est, gt[idx], align_scale=True)
        # Mono scale is free; Sim3-aligned error over ~1.2 units of travel.
        assert err < 0.1, err

    def test_mono_mapping_creates_points(self):
        sysm, _ = run_mono()
        assert sysm.mapper.n_steps >= 1
        n_valid = int(np.asarray(sysm.map.pts.valid).sum())
        assert n_valid > 50


class TestMonoLines:
    def test_point_line_init_and_map(self):
        """usingLine path: line midpoints join the unified init RANSAC and
        MapLines are created (reference TrackBoth pipeline)."""
        from splslam_tpu.io.synthetic import make_stereo_sequence
        from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState

        K, bf, frames, gt = make_stereo_sequence(
            n_frames=20, motion="lateral", width=320, height=240,
            texture="grid",
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=0.0, width=320, height=240,
            n_features=600, n_levels=4, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            enable_local_mapping=True, using_line=True, line_features=128,
        )
        sysm = System(st, Sensor.MONOCULAR)
        for i, (l, r) in enumerate(frames):
            sysm.track_mono(l, i * 0.1)
        sysm.drain()
        assert sysm.get_tracking_state() == TrackingState.OK
        # Map-line PERSISTENCE floors (round-3 VERDICT #8: `>= 1` was
        # vacuous): several lines must survive as landmarks and each
        # must be re-observed across keyframes (measured on this scene:
        # 4 map-lines, median 4 observations over 5 KFs).
        lv = np.asarray(sysm.map.lns.valid)
        n_lines = int(lv.sum())
        assert n_lines >= 3, n_lines
        med_obs = float(np.median(np.asarray(sysm.map.lns.n_obs)[lv]))
        assert med_obs >= 3.0, med_obs
        idx = [int(round(e.ts / 0.1)) for e in sysm.trajectory if not e.lost]
        err = ate_rmse(sysm.poses(), gt[idx], align_scale=True)
        assert err < 0.15, err


class TestMonoCorridor:
    def test_fundamental_path_end_to_end(self):
        """Non-planar corridor scene: the two-view RH score must select
        the FUNDAMENTAL model (reference Initializer.cc:218-224 — planar
        scenes pick H, general scenes pick F) and the full mono pipeline
        (F init -> E decomposition -> tracking -> mapping) must hold a
        low Sim3-aligned ATE. Exercises the reconstruction path that the
        planar synthetic scenes never reach end-to-end."""
        # speed=2.5 gives 0.1 units/frame of lateral baseline: enough
        # parallax across the 0.5..8-unit depth range that the H model
        # cannot absorb the matches; 14 frames keeps the camera inside
        # the half_w=1.5 corridor.
        # fx=260 (narrower FOV) delays init past the tiny-baseline
        # frames where H fits everything; with ~0.5 units of baseline
        # the depth spread makes F win decisively.
        K, bf, frames, gt = make_stereo_sequence(
            n_frames=14, motion="lateral", speed=2.5, width=320,
            height=240, scene="corridor", seed=5, fx=260.0,
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=0.0, width=320, height=240,
            n_features=600, n_levels=4, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            enable_local_mapping=True,
        )
        sysm = System(st, Sensor.MONOCULAR)
        for i, (l, r) in enumerate(frames):
            sysm.track_mono(l, i * 0.1)
        sysm.drain()
        assert sysm.get_tracking_state() == TrackingState.OK
        assert sysm.init_used_h is False  # F model won on non-planar depth
        assert sysm.n_kfs >= 2
        idx = [int(round(e.ts / 0.1)) for e in sysm.trajectory if not e.lost]
        err = ate_rmse(sysm.poses(), gt[idx], align_scale=True)
        assert err < 0.1, err


class TestMonoBatched:
    def test_batched_close_to_sequential(self):
        """track_mono_batch (one dispatch per B frames, KF decisions at
        batch boundaries) must reproduce the sequential mono trajectory
        on an easy scene (same contract as the stereo batch test)."""
        K, bf, frames, gt = make_stereo_sequence(
            n_frames=24, motion="lateral", width=320, height=240, seed=3,
        )
        def make():
            st = Settings(
                fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
                cy=float(K[1, 2]), bf=0.0, width=320, height=240,
                n_features=600, n_levels=4, fps=10,
                max_points=8192, max_keyframes=64, local_window=1024,
                using_line=True, line_features=64,
                enable_local_mapping=False,
            )
            return System(st, Sensor.MONOCULAR)

        seq = make()
        for i, (l, r) in enumerate(frames):
            seq.track_mono(l, i * 0.1)
        seq.drain()

        bat = make()
        i = 0
        while i < len(frames):
            chunk = [l for (l, r) in frames[i:i + 6]]
            ts = [j * 0.1 for j in range(i, i + len(chunk))]
            bat.track_mono_batch(chunk, ts)
            i += len(chunk)
        bat.drain()

        assert bat.get_tracking_state() == TrackingState.OK
        ps, pb = seq.poses(), bat.poses()
        n = min(len(ps), len(pb))
        assert n >= 12
        err = np.linalg.norm(ps[:n, :3, 3] - pb[:n, :3, 3], axis=-1).max()
        assert err < 0.02, err
