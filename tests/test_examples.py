"""Dataset/live driver plumbing: cv::FileStorage config parsing and the
live stereo driver loop (reference Examples/Stereo/stereo_mynt.cc +
config/mynteye_stereo.yaml)."""

import numpy as np
import pytest

from splslam_tpu.examples.stereo_mynt import run_live
from splslam_tpu.io.config import load_settings
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.slam.system import TrackingState

W, H = 320, 240


def _write_yaml(tmp_path, K, bf, with_rect=False):
    """A cv::FileStorage-style settings file matching the synthetic scene
    (reference config/mynteye_stereo.yaml layout, incl. the %YAML:1.0
    directive and an !!opencv-matrix node when with_rect)."""
    lines = [
        "%YAML:1.0",
        "",
        f"Camera.fx: {K[0, 0]}",
        f"Camera.fy: {K[1, 1]}",
        f"Camera.cx: {K[0, 2]}",
        f"Camera.cy: {K[1, 2]}",
        "Camera.k1: 0.0",
        "Camera.k2: 0.0",
        "Camera.p1: 0.0",
        "Camera.p2: 0.0",
        f"Camera.width: {W}",
        f"Camera.height: {H}",
        "Camera.fps: 25.0",
        f"Camera.bf: {bf}",
        "Camera.RGB: 1",
        "ThDepth: 40",
        "ORBextractor.nFeatures: 600",
        "ORBextractor.scaleFactor: 1.2",
        "ORBextractor.nLevels: 4",
        "ORBextractor.iniThFAST: 20",
        "ORBextractor.minThFAST: 7",
    ]
    if with_rect:
        eye = ("   rows: 3\n   cols: 3\n   dt: d\n"
               "   data: [1.,0.,0., 0.,1.,0., 0.,0.,1.]")
        for side in ("LEFT", "RIGHT"):
            lines += [
                f"{side}.height: {H}",
                f"{side}.width: {W}",
                f"{side}.K: !!opencv-matrix",
                ("   rows: 3\n   cols: 3\n   dt: d\n"
                 f"   data: [{K[0,0]},0.,{K[0,2]}, "
                 f"0.,{K[1,1]},{K[1,2]}, 0.,0.,1.]"),
                f"{side}.D: !!opencv-matrix",
                "   rows: 1\n   cols: 5\n   dt: d\n"
                "   data: [0.,0.,0.,0.,0.]",
                f"{side}.R: !!opencv-matrix",
                eye,
                f"{side}.P: !!opencv-matrix",
                ("   rows: 3\n   cols: 4\n   dt: d\n"
                 f"   data: [{K[0,0]},0.,{K[0,2]},0., "
                 f"0.,{K[1,1]},{K[1,2]},0., 0.,0.,1.,0.]"),
            ]
    path = tmp_path / "mynteye_stereo.yaml"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def scene():
    return make_stereo_sequence(n_frames=8, motion="lateral",
                                width=W, height=H)


class TestConfig:
    def test_parses_scalars_and_matrices(self, tmp_path, scene):
        K, bf, _, _ = scene
        st, raw = load_settings(_write_yaml(tmp_path, K, bf,
                                            with_rect=True))
        assert st.fx == pytest.approx(float(K[0, 0]))
        assert st.bf == pytest.approx(float(bf))
        assert (st.width, st.height) == (W, H)
        assert st.n_features == 600 and st.n_levels == 4
        assert raw["LEFT.K"].shape == (3, 3)
        np.testing.assert_allclose(raw["LEFT.K"][0, 0], float(K[0, 0]))
        assert raw["RIGHT.P"].shape == (3, 4)

    def test_overrides_win(self, tmp_path, scene):
        K, bf, _, _ = scene
        st, _ = load_settings(_write_yaml(tmp_path, K, bf),
                              n_features=128, max_keyframes=16)
        assert st.n_features == 128 and st.max_keyframes == 16

    def test_bundled_configs_all_load(self):
        """Every bundled per-dataset config (scripts/gen_configs.py; the
        reference's 13-YAML set, SURVEY §2.3) parses into Settings."""
        import glob
        import os

        import splslam_tpu.examples as ex

        root = os.path.join(os.path.dirname(ex.__file__), "configs")
        paths = sorted(glob.glob(os.path.join(root, "**", "*.yaml"),
                                 recursive=True))
        assert len(paths) >= 16
        for p in paths:
            st, raw = load_settings(p)
            assert st.fx > 0 and st.width > 0 and st.height > 0, p
        # spot checks against the public calibrations
        st, _ = load_settings(os.path.join(root, "Stereo",
                                           "KITTI00-02.yaml"))
        assert st.fx == pytest.approx(718.856)
        assert st.bf == pytest.approx(386.1448)
        assert (st.width, st.height) == (1241, 376)
        assert st.n_features == 2000 and not st.using_line
        st, _ = load_settings(os.path.join(root, "Monocular", "TUM1.yaml"))
        assert st.using_line and st.fx == pytest.approx(517.306408)
        assert st.line_features == 600
        st, raw = load_settings(os.path.join(root, "Stereo", "EuRoC.yaml"))
        assert raw["LEFT.R"].shape == (3, 3)
        assert raw["RIGHT.P"].shape == (3, 4)
        assert raw["RIGHT.P"][0, 3] == pytest.approx(-47.90639384423901)


SMALL = dict(max_points=8192, max_keyframes=64, local_window=1024,
             max_maplines=256)


class TestLiveDriver:
    def _source(self, frames):
        for i, (l, r) in enumerate(frames):
            yield l, r, i * 0.04

    def test_runs_and_saves_kitti_trajectory(self, tmp_path, scene):
        K, bf, frames, _ = scene
        yaml_path = _write_yaml(tmp_path, K, bf)
        out = tmp_path / "CameraTrajectory.txt"
        sysm = run_live(yaml_path, self._source(frames),
                        do_rectify=False, out_path=str(out),
                        max_frames=6, **SMALL)
        assert sysm.get_tracking_state() == TrackingState.OK
        rows = out.read_text().strip().split("\n")
        assert len(rows) == 6
        assert len(rows[0].split()) == 12  # KITTI 3x4 row-major

    def test_rectify_path_identity_maps(self, tmp_path, scene):
        """With identity R and P==K the rectification remap is a no-op,
        so the rectified live run must still track (reference
        stereo_mynt.cc:94-131 builds the maps the same way)."""
        K, bf, frames, _ = scene
        yaml_path = _write_yaml(tmp_path, K, bf, with_rect=True)
        out = tmp_path / "traj.txt"
        sysm = run_live(yaml_path, self._source(frames),
                        do_rectify=True, out_path=str(out), max_frames=4,
                        **SMALL)
        assert sysm.get_tracking_state() == TrackingState.OK
        assert len(out.read_text().strip().split("\n")) == 4

    def test_missing_calibration_raises(self, tmp_path, scene):
        """Reference behavior: do_rectify without LEFT./RIGHT. calibration
        keys is a hard error (stereo_mynt.cc:121-126)."""
        K, bf, frames, _ = scene
        yaml_path = _write_yaml(tmp_path, K, bf, with_rect=False)
        with pytest.raises(ValueError, match="calibration"):
            run_live(yaml_path, self._source(frames), do_rectify=True)
