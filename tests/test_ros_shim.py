"""ROS grabber adapters: pairing/conversion logic without a ROS stack.

The reference's nodes (Examples/ROS/PL-SLAM/src/ros_*.cc) are message
glue around System::Track*; these tests drive the same glue with plain
numpy "messages" and a recording stub system.
"""

import numpy as np

from splslam_tpu.ros import MonoGrabber, RGBDGrabber, StereoGrabber


class _StubSystem:
    def __init__(self):
        self.calls = []

    def track_mono(self, img, ts):
        self.calls.append(("mono", img.shape, ts))
        return np.eye(4)

    def track_stereo(self, l, r, ts):
        self.calls.append(("stereo", l.shape, r.shape, ts))
        return np.eye(4)

    def track_rgbd(self, img, depth, ts):
        self.calls.append(("rgbd", img.shape, depth.shape, ts))
        return np.eye(4)


class _Stamp:
    """rospy.Time-like."""

    def __init__(self, t):
        self._t = t

    def to_sec(self):
        return self._t


def test_mono_grabber_converts_color_and_stamp():
    sysm = _StubSystem()
    g = MonoGrabber(sysm)
    rgb = np.zeros((8, 10, 3), np.uint8)
    g.grab(rgb, _Stamp(1.5))
    assert sysm.calls == [("mono", (8, 10), 1.5)]


def test_stereo_grabber_pairs_within_skew():
    sysm = _StubSystem()
    g = StereoGrabber(sysm, max_skew_s=0.02)
    img = np.zeros((6, 6), np.float32)
    g.push_left(img, 0.000)
    assert sysm.calls == []            # right not yet arrived
    g.push_right(img, 0.010)           # within skew -> fires
    assert len(sysm.calls) == 1 and g.n_tracked == 1
    assert sysm.calls[0][3] == 0.0     # min of the pair


def test_stereo_grabber_drops_stale_unmatched():
    sysm = _StubSystem()
    g = StereoGrabber(sysm, max_skew_s=0.02)
    img = np.zeros((6, 6), np.float32)
    g.push_left(img, 0.0)              # will become stale
    g.push_left(img, 0.50)
    g.push_right(img, 0.505)           # pairs with the SECOND left
    assert g.n_tracked == 1
    assert sysm.calls[0][3] == 0.50


def test_rgbd_grabber_pairs_image_and_depth():
    sysm = _StubSystem()
    g = RGBDGrabber(sysm)
    g.push_image(np.zeros((5, 7, 3), np.uint8), 2.0)
    g.push_depth(np.ones((5, 7), np.float32), 2.001)
    assert sysm.calls == [("rgbd", (5, 7), (5, 7), 2.0)]


def test_run_node_without_ros_raises():
    import pytest

    from splslam_tpu.ros import run_mono_node

    with pytest.raises(RuntimeError, match="ROS installation"):
        run_mono_node(_StubSystem())


def test_stereo_grabber_rectifies_before_tracking():
    """do_rectify parity (ros_stereo.cc:75-110 / ros_mynteye_stereo.cc):
    with rectify maps installed, frames reach TrackStereo remapped."""

    class _Capture(_StubSystem):
        def track_stereo(self, l, r, ts):
            self.left = l
            return super().track_stereo(l, r, ts)

    h, w = 8, 10
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    ident = (gx, gy)
    shift = (gx + 2.0, gy)             # sample 2 px to the right
    img = np.tile(np.arange(w, dtype=np.float32), (h, 1))

    sysm = _Capture()
    g = StereoGrabber(sysm, rectify_maps=(shift, ident))
    g.push_left(img, 0.0)
    g.push_right(img, 0.0)
    assert g.n_tracked == 1
    # interior columns shifted by 2 (border clamped by cv2.remap)
    assert np.allclose(sysm.left[:, :w - 2], img[:, 2:])
