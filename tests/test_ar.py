"""AR demo analog (reference Examples/ROS/PL-SLAM/src/AR/ViewerAR.cc):
plane RANSAC over tracked map points + virtual cube projection."""

import numpy as np

from splslam_tpu.viz.ar import ARState, detect_plane, draw_ar_cube


def _plane_points(n=200, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-1, 1, size=(n, 2))
    pts = np.stack([xy[:, 0], xy[:, 1], 3.0 + 0.002 * rng.standard_normal(n)],
                   axis=-1)
    return pts


def test_detect_plane_recovers_normal_with_outliers():
    pts = _plane_points()
    out = np.array([[0.3, -0.2, 1.0], [-0.5, 0.1, 5.5], [0.9, 0.9, 7.0]])
    fit = detect_plane(np.concatenate([pts, np.tile(out, (8, 1))]))
    assert fit is not None
    n, d = fit
    assert abs(abs(n[2]) - 1.0) < 0.02, n          # z-plane
    assert abs(abs(d) - 3.0) < 0.05, d


def test_detect_plane_rejects_degenerate_input():
    assert detect_plane(np.zeros((5, 3))) is None


class _Step:
    def __init__(self, xyz):
        self.lm_xyz = xyz
        self.lm_gid = np.arange(len(xyz))


class _Sys:
    def __init__(self, xyz):
        self.step = _Step(xyz)


def test_anchor_and_cube_projection():
    ar = ARState(cube_size=0.4)
    assert ar.try_anchor(_Sys(_plane_points()))
    v = ar.cube_vertices()
    assert v.shape == (8, 3)
    # base face on the plane (z ~ 3), top face one cube-size above along
    # the normal (either side: the RANSAC normal's sign is arbitrary)
    z = np.sort(v[:, 2])
    lo, hi = z[:4].mean(), z[4:].mean()
    assert abs((hi - lo) - 0.4) < 0.05, (lo, hi)   # extruded one cube-size
    assert min(abs(lo - 3.0), abs(hi - 3.0)) < 0.05  # one face on the plane

    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    img = np.zeros((96, 128, 3), np.uint8)
    out = draw_ar_cube(img.copy(), np.eye(4), K, v)
    assert (out != 0).any()                        # cube rendered in front

    # camera looking away: every vertex behind -> nothing drawn
    Tcw = np.eye(4)
    Tcw[2, 3] = -10.0
    Tcw[0, 0] = Tcw[2, 2] = -1.0                   # 180° about y
    out2 = draw_ar_cube(img.copy(), Tcw, K, v)
    assert not (out2 != 0).any()
