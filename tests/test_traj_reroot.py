"""Trajectory re-rooting past culled reference keyframes.

The reference reconstructs every frame pose at save time as
Tcw = Tcr * Tref * Two, walking the spanning tree past culled keyframes
via the mTcp relative pose captured in KeyFrame::SetBadFlag
(src/System.cc:369-374). Here the equivalent rewrite happens eagerly on
the host when the mapping stats report a cull: entries referencing the
culled keyframe are re-rooted onto the live anchor with the cull-time
relative Tcp, so later loop / GBA corrections of the anchor carry the
frames with it (a culled keyframe's stored pose never receives
corrections — slam/loop_closing.py pose-graph edges only connect live
keyframes).
"""

import numpy as np

from splslam_tpu.slam.system import System, _TrajEntry


def _se3(yaw=0.0, t=(0, 0, 0)):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T[:3, 3] = t
    return T


def _bare_system():
    sys = System.__new__(System)
    sys.trajectory = []
    sys.kf_pose_host = {}
    sys.ref_kf = -1
    return sys


def test_reroot_preserves_pose_and_follows_corrections():
    sys = _bare_system()
    T_culled = _se3(yaw=0.3, t=(1.0, 0.5, 0.0))   # kf 3 pose at cull time
    T_anchor = _se3(yaw=0.1, t=(2.0, 0.0, 0.1))   # kf 7 pose at cull time
    sys.kf_pose_host = {3: T_culled.copy(), 7: T_anchor.copy()}
    sys.ref_kf = 3

    # Three frames logged against kf 3, one against kf 7.
    frames = [_se3(yaw=0.3 + d, t=(1.0 + d, 0.5, 0.0)) for d in
              (0.01, 0.02, 0.03)]
    for i, Tcw in enumerate(frames):
        sys.trajectory.append(_TrajEntry(
            float(i), (Tcw @ np.linalg.inv(T_culled)).astype(np.float32),
            3, False, Tcw.copy()))
    sys.trajectory.append(_TrajEntry(
        9.0, np.eye(4, dtype=np.float32), 7, False, T_anchor.copy()))

    # kf 3 culled with anchor kf 7; mapping_step reports
    # Tcp = Tcw_culled @ inv(Tcw_anchor) captured at cull time.
    Tcp = (T_culled @ np.linalg.inv(T_anchor)).astype(np.float32)
    sys._on_mapping_result(7, T_anchor, [(3, Tcp)])

    assert all(e.ref_kf == 7 for e in sys.trajectory)
    assert 3 not in sys.kf_pose_host
    assert sys.ref_kf == 7  # live reference moved to the anchor

    # (a) With the anchor at its cull-time pose, reconstruction is
    # unchanged.
    for e, Tcw in zip(sys.trajectory[:3], frames):
        rec = e.Tcr @ T_anchor
        np.testing.assert_allclose(rec, Tcw, atol=1e-5)

    # (b) A later rigid correction of the ANCHOR (as a loop closure
    # would apply — the culled keyframe's stored pose would NOT move)
    # carries the re-rooted frames exactly.
    corr = _se3(yaw=-0.2, t=(0.0, -1.0, 0.3))
    T_anchor2 = T_anchor @ corr                    # corrected Tcw
    for e, Tcw in zip(sys.trajectory[:3], frames):
        rec = e.Tcr @ T_anchor2
        np.testing.assert_allclose(rec, Tcw @ corr, atol=1e-5)


def test_reroot_chains_through_second_cull():
    """kf3 re-rooted onto kf7; later kf7 itself is culled with anchor
    kf9 — entries must land on kf9 with the composed relative."""
    sys = _bare_system()
    T3, T7, T9 = (_se3(yaw=a, t=(a, 0, 0)) for a in (0.3, 0.5, 0.7))
    sys.kf_pose_host = {3: T3.copy(), 7: T7.copy(), 9: T9.copy()}
    sys.ref_kf = 9
    Tcw = _se3(yaw=0.31, t=(0.35, 0.1, 0.0))
    sys.trajectory.append(_TrajEntry(
        0.0, (Tcw @ np.linalg.inv(T3)).astype(np.float32), 3, False,
        Tcw.copy()))

    sys._on_mapping_result(7, T7, [(3, T3 @ np.linalg.inv(T7))])
    sys._on_mapping_result(9, T9, [(7, T7 @ np.linalg.inv(T9))])

    e = sys.trajectory[0]
    assert e.ref_kf == 9
    np.testing.assert_allclose(e.Tcr @ T9, Tcw, atol=1e-5)
