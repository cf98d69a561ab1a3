"""End-to-end stereo visual odometry on a synthetic sequence.

The minimum end-to-end slice (SURVEY §7.2 step 3): stereo frames ->
tracking -> trajectory, ATE-RMSE against exact ground truth.
"""

import numpy as np
import pytest

from splslam_tpu.io.synthetic import ate_rmse, make_stereo_sequence
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState


def run_vo(motion, n_frames=20, mapping=False):
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=n_frames, motion=motion, width=320, height=240
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        bf=float(bf), width=320, height=240, n_features=600, n_levels=4,
        th_depth=40.0, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=mapping,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
    return sysm, gt


class TestStereoVO:
    @pytest.mark.parametrize(
        "motion",
        [pytest.param("lateral", marks=pytest.mark.slow), "forward"],
    )
    def test_tracks_and_low_ate(self, motion):
        sysm, gt = run_vo(motion)
        assert sysm.get_tracking_state() == TrackingState.OK
        est = sysm.poses()
        assert est.shape[0] == gt.shape[0]
        err = ate_rmse(est, gt)
        # Scene depth ~8m, motion ~0.8m total; a few cm is healthy VO.
        assert err < 0.05, err

    def test_trajectory_export(self, tmp_path):
        sysm, gt = run_vo("lateral", n_frames=8)
        tum = tmp_path / "traj_tum.txt"
        kitti = tmp_path / "traj_kitti.txt"
        sysm.save_trajectory_tum(str(tum))
        sysm.save_trajectory_kitti(str(kitti))
        tum_lines = tum.read_text().strip().split("\n")
        assert len(tum_lines) == 8
        assert len(tum_lines[0].split()) == 8
        kitti_lines = kitti.read_text().strip().split("\n")
        assert len(kitti_lines[0].split()) == 12

    def test_reset(self):
        sysm, _ = run_vo("lateral", n_frames=5)
        sysm.reset()
        assert sysm.get_tracking_state() == TrackingState.NO_IMAGES_YET
        assert sysm.n_kfs == 0
        assert len(sysm.trajectory) == 0

    @pytest.mark.slow
    def test_with_local_mapping(self):
        """Full pipeline incl. the fused mapping step (cull -> triangulate
        -> fuse -> local BA) after each keyframe. Forward motion decays
        the reference-KF match ratio so the keyframe policy triggers."""
        sysm, gt = run_vo("forward", n_frames=40, mapping=True)
        assert sysm.get_tracking_state() == TrackingState.OK
        assert sysm.n_kfs >= 2
        assert sysm.mapper.n_steps >= 1
        est = sysm.poses()
        err = ate_rmse(est, gt)
        assert err < 0.05, err

    def test_force_kf_every(self):
        """The forced-cadence bench knob: lateral motion on the easy
        synthetic scene never fires the faithful c2 (match decay), so
        every inserted keyframe here is attributable to force_kf_every."""
        from splslam_tpu.io.synthetic import make_stereo_sequence

        K, bf, frames, _ = make_stereo_sequence(
            n_frames=13, motion="lateral", width=320, height=240
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
            n_features=600, n_levels=4, th_depth=40.0, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            enable_local_mapping=False, force_kf_every=4,
        )
        sysm = System(st, Sensor.STEREO)
        for i, (l, r) in enumerate(frames):
            sysm.track_stereo(l, r, i * 0.1)
        sysm.drain()
        # init KF at frame 0, then one per ~4 frames; the async pipeline
        # (async_depth=1) consumes each frame's stats one frame late, so
        # insertions may land a frame after the exact cadence mark
        # (3 or 4 total over 13 frames). Without the knob: exactly 1.
        assert 3 <= sysm.n_kfs <= 4, sysm.n_kfs
        assert sysm.get_tracking_state() == TrackingState.OK

    @pytest.mark.slow
    def test_batched_equals_sequential(self):
        """vo_batch_step (B frames per dispatch) must produce the same
        trajectory as per-frame tracking. Keyframe insertion is blocked
        (min_kf_gap) so the comparison isolates the tracking math —
        KF DECISION timing legitimately differs (the batched path applies
        the policy at batch boundaries, vo_batch_step docstring)."""
        from splslam_tpu.io.synthetic import make_stereo_sequence

        K, bf, frames, gt = make_stereo_sequence(
            n_frames=12, motion="forward", width=320, height=240
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
            n_features=600, n_levels=4, th_depth=40.0, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            enable_local_mapping=False, min_kf_gap=100,
        )
        s1 = System(st, Sensor.STEREO)
        for i, (l, r) in enumerate(frames):
            s1.track_stereo(l, r, i * 0.1)
        s1.drain()
        s2 = System(st, Sensor.STEREO)
        i = 0
        while i < len(frames):
            chunk = frames[i:i + 4]
            s2.track_stereo_batch(
                chunk, [j * 0.1 for j in range(i, i + len(chunk))]
            )
            i += len(chunk)
        s2.drain()
        p1 = s1.poses()
        p2 = s2.poses()
        assert p1.shape == p2.shape
        np.testing.assert_allclose(p1, p2, atol=1e-4)

    @pytest.mark.slow
    def test_stereo_with_lines(self):
        """Point+line stereo (the capability the reference lists as 'not
        yet extended', include/Tracking.h:142 — enabled here for all
        sensors per SURVEY §1 note 1)."""
        from splslam_tpu.io.synthetic import make_stereo_sequence
        import numpy as np

        K, bf, frames, gt = make_stereo_sequence(
            n_frames=25, motion="lateral", width=320, height=240,
            texture="grid",
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
            n_features=600, n_levels=4, th_depth=40.0, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            enable_local_mapping=True, using_line=True, line_features=64,
        )
        sysm = System(st, Sensor.STEREO)
        for i, (l, r) in enumerate(frames):
            sysm.track_stereo(l, r, i * 0.1)
        sysm.drain()
        assert sysm.get_tracking_state() == TrackingState.OK
        err = ate_rmse(sysm.poses(), gt)
        assert err < 0.05, err
        # lines detected per frame
        n_det = int(np.asarray(sysm.step.frame.lines.valid).sum())
        assert n_det >= 3, n_det
        # Map-line PERSISTENCE floors (round-3 VERDICT #8: lines must
        # exist as map LANDMARKS re-observed across keyframes, not just
        # per-frame detections; measured on this scene: 13 map-lines,
        # median 2 observations over 7 KFs). Lateral motion: keyframe
        # pairs triangulate lines via the epipolar+LBD match
        # (mapping_ops.create_new_lines — forward motion leaves radial
        # lines nearly parallax-free).
        lv = np.asarray(sysm.map.lns.valid)
        assert int(lv.sum()) >= 5, int(lv.sum())
        med_obs = float(np.median(np.asarray(sysm.map.lns.n_obs)[lv]))
        assert med_obs >= 2.0, med_obs

    @pytest.mark.slow
    def test_localization_mode_temporal_points(self):
        """Localization-only mode keeps tracking via temporal VO points
        (reference mbVO / UpdateLastFrame, src/Tracking.cc:500-569,
        :1707-1771): no new keyframes, but pose tracking survives far
        beyond the frozen map's coverage."""
        from splslam_tpu.io.synthetic import make_stereo_sequence

        K, bf, frames, gt = make_stereo_sequence(
            n_frames=40, motion="forward", width=320, height=240
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
            n_features=600, n_levels=4, th_depth=40.0, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            enable_local_mapping=False,
        )
        sysm = System(st, Sensor.STEREO)
        sysm.track_stereo(frames[0][0], frames[0][1], 0.0)  # init KF
        sysm.activate_localization_mode()
        for i, (l, r) in enumerate(frames[1:], start=1):
            sysm.track_stereo(l, r, i * 0.1)
        sysm.drain()
        assert sysm.n_kfs == 1
        assert sysm.state == TrackingState.OK
        err = ate_rmse(sysm.poses(), gt)
        assert err < 0.08, err


class TestStereoCorridor:
    @pytest.mark.slow
    def test_corridor_tracks_with_mapping(self):
        """Stereo on the non-planar corridor: continuous depth range
        (0.5..24 units) through stereo match, triangulation, and local
        BA — the geometry class the fronto-parallel plane scenes miss."""
        K, bf, frames, gt = make_stereo_sequence(
            n_frames=30, motion="forward", width=320, height=240,
            scene="corridor", seed=5,
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
            n_features=600, n_levels=4, th_depth=40.0, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            enable_local_mapping=True,
        )
        sysm = System(st, Sensor.STEREO)
        for i, (l, r) in enumerate(frames):
            sysm.track_stereo(l, r, i * 0.1)
        sysm.drain()
        assert sysm.get_tracking_state() == TrackingState.OK
        assert sysm.n_kfs >= 2
        err = ate_rmse(sysm.poses(), gt)
        assert err < 0.05, err
