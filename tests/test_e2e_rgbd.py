"""End-to-end RGB-D visual odometry on a synthetic sequence.

The reference's headline accuracy table IS TUM RGB-D (report p.2,
Table 1; Examples/RGB-D/rgbd_tum.cc feeds (rgb, depth) pairs into
System::TrackRGBD, which builds the frame via ComputeStereoFromRGBD —
src/Frame.cc:157-210, 1057-1079). This exercises the same path here:
registered synthetic depth -> virtual right coordinates -> the stock
stereo-style tracking and mapping pipeline.
"""

import numpy as np
import pytest

from splslam_tpu.io.synthetic import ate_rmse, make_rgbd_sequence
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState


def run_rgbd(motion, n_frames=20, mapping=False, **seq_kw):
    K, bf, frames, gt = make_rgbd_sequence(
        n_frames=n_frames, motion=motion, width=320, height=240, **seq_kw
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=mapping,
    )
    sysm = System(st, Sensor.RGBD)
    for i, (img, depth) in enumerate(frames):
        sysm.track_rgbd(img, depth, i * 0.1)
    return sysm, gt


class TestRGBDVO:
    def test_tracks_and_low_ate(self):
        sysm, gt = run_rgbd("forward")
        assert sysm.get_tracking_state() == TrackingState.OK
        est = sysm.poses()
        assert est.shape[0] == gt.shape[0]
        err = ate_rmse(est, gt)
        assert err < 0.05, err

    @pytest.mark.slow
    def test_with_local_mapping(self):
        """Full pipeline through the RGB-D entry: keyframes insert and
        the fused mapping step runs, exactly as the stereo twin."""
        sysm, gt = run_rgbd("forward", n_frames=40, mapping=True)
        assert sysm.get_tracking_state() == TrackingState.OK
        assert sysm.n_kfs >= 2
        assert sysm.mapper.n_steps >= 1
        err = ate_rmse(sysm.poses(), gt)
        assert err < 0.05, err

    def test_sensor_holes_and_noise(self):
        """Structured-light realism: 25% depth dropout (holes) + 2%
        multiplicative noise. Keypoints landing in holes must degrade to
        depth-less (mono-like) rather than corrupt the estimate — the
        d>0 gate in depth_from_rgbd (reference Frame.cc:1066 checks
        d>0) — and tracking must stay converged."""
        sysm, gt = run_rgbd(
            "forward", depth_dropout=0.25, depth_noise=0.02
        )
        assert sysm.get_tracking_state() == TrackingState.OK
        err = ate_rmse(sysm.poses(), gt)
        # noisy depth: looser gate than the clean run, still ~cm-level
        assert err < 0.08, err

    def test_depth_map_factor(self):
        """TUM stores depth as uint16 millimetre-ish units with
        DepthMapFactor=5000 (Examples/RGB-D/TUM1.yaml); the factor must
        rescale raw depth before use (reference Frame ctor applies
        mDepthMapFactor, src/Tracking.cc:1560-1567)."""
        K, bf, frames, gt = make_rgbd_sequence(
            n_frames=10, motion="forward", width=320, height=240
        )
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
            n_features=600, n_levels=4, th_depth=40.0, fps=10,
            max_points=8192, max_keyframes=64, local_window=1024,
            depth_map_factor=1.0 / 5000.0,
        )
        sysm = System(st, Sensor.RGBD)
        for i, (img, depth) in enumerate(frames):
            sysm.track_rgbd(img, depth * 5000.0, i * 0.1)
        assert sysm.get_tracking_state() == TrackingState.OK
        err = ate_rmse(sysm.poses(), gt)
        assert err < 0.05, err
