"""Loop closing end-to-end: detection + Sim3 verification on an
out-and-back revisit, and offline correction + GBA smoke."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from splslam_tpu.io.synthetic import PlaneScene, ate_rmse, make_texture
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState


def _circuit(n_long=30, n_short=14, step=0.15, W=320, H=240, FX=200.0,
             BASE=0.12):
    """Rectangular circuit over the textured plane: right, down, left,
    up — back to the start plus a short re-traverse of the first leg.

    Why not a simple out-and-back: on a straight retrace, accurate
    tracking re-finds the outbound landmarks frame by frame, so the
    revisited keyframes become genuinely COVISIBLE with the old ones and
    the detector correctly excludes them as loop candidates (reference
    DetectLoop, src/LoopClosing.cc:118-150 — connected keyframes are not
    loops). A circuit approaches the start through FRESH scenery: the
    local-map window on the final leg contains only return-leg
    landmarks, so re-entering the mapped start region is precisely the
    event loop DETECTION exists for."""
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)
    scene = PlaneScene(make_texture(seed=0), z0=2.0, z1=5.0)
    xy = []
    x = y = 0.0
    for _ in range(n_long):
        xy.append((x, y)); x += step
    for _ in range(n_short):
        xy.append((x, y)); y += step
    for _ in range(n_long):
        xy.append((x, y)); x -= step
    for _ in range(n_short):
        xy.append((x, y)); y -= step
    for _ in range(10):  # re-traverse the start of leg 1 (the revisit)
        xy.append((x, y)); x += step
    poses, frames = [], []
    for i, (px, py) in enumerate(xy):
        Twc = np.eye(4)
        Twc[0, 3] = px
        Twc[1, 3] = py + 0.01 * np.sin(i * 0.4)
        poses.append(Twc.copy())
        imgL = scene.render(K, Twc, H, W)
        Twc_r = Twc.copy()
        Twc_r[0, 3] += BASE
        frames.append((imgL, scene.render(K, Twc_r, H, W)))
    return K, FX * BASE, frames, np.stack(poses)


def test_loop_detect_verify_and_correct():
    K, bf, frames, gt = _circuit()
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=500, n_levels=4, th_depth=60.0, fps=5,
        max_points=16384, max_keyframes=64, local_window=1024,
        enable_local_mapping=True, enable_loop_correction=False,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.2)
    sysm.drain()
    assert sysm.state == TrackingState.OK
    # The revisit must be detected, temporally confirmed, and Sim3-verified
    # (with the reference's kill-switch default, it is only RECORDED).
    assert len(sysm.loop_closer.verified_loops) >= 1
    kf, cand = sysm.loop_closer.verified_loops[0]
    assert kf - cand >= 5  # a real loop, not a neighbor

    ate0 = ate_rmse(sysm.poses_reconstructed(), gt)

    # Offline correction (CorrectLoop + essential graph): poses move in
    # proportion to the measured loop discrepancy, trajectory stays sane.
    from splslam_tpu.slam.loop_closing import compute_sim3_attempt

    K3 = jnp.asarray(K)
    *_, S12 = compute_sim3_attempt(
        jax.random.PRNGKey(kf), sysm.map, jnp.int32(kf), jnp.int32(cand),
        K3, jnp.float32(1.0),
    )
    # Snapshot for the drift-injection phase below (all jitted map
    # updates in the correction path are non-donating, so holding the
    # old immutable pytree is a full snapshot).
    map_before = sysm.map
    kf_pose_host_before = {k: v.copy()
                           for k, v in sysm.kf_pose_host.items()}
    Tcw_before = np.asarray(sysm.map.kfs.Tcw[:sysm.n_kfs]).copy()
    n_valid_before = int(np.asarray(sysm.map.pts.valid).sum())
    sysm.loop_closer._correct(kf, cand, S12)
    # The solver guards must NEVER fire — a guarded (silently zeroed)
    # essential-graph or GBA solve is the round-3 failure mode this
    # counter exists to catch (optim/sim3.py pose_graph_sim3 n_guarded).
    assert sysm.loop_closer.n_guarded == 0
    Tcw_after = np.asarray(sysm.map.kfs.Tcw[:sysm.n_kfs])
    moved = np.abs(Tcw_after - Tcw_before).max()
    # "Moved" is gated against the measured loop discrepancy: on a
    # well-tracked circuit the verified S12 can agree with the current
    # relative pose to float precision, and a (near-)zero correction is
    # then CORRECT behavior, not a silent no-op (the no-op failure mode
    # is excluded by n_guarded == 0 above and the drift phase below).
    s12_s, s12_R, s12_t = (np.asarray(x) for x in S12)
    rel = Tcw_before[kf] @ np.linalg.inv(Tcw_before[cand])
    gap = (np.abs(s12_R - rel[:3, :3]).max()
           + np.abs(s12_t - rel[:3, 3]).max())
    if gap > 1e-3:
        assert moved > 1e-4, (gap, moved)
    # SearchAndFuse merged duplicate landmarks from the revisited area
    # (reference src/LoopClosing.cc:589-645), and the loop edge is kept
    # for future essential graphs (KeyFrame::AddLoopEdge).
    n_valid_after = int(np.asarray(sysm.map.pts.valid).sum())
    assert n_valid_after < n_valid_before, (n_valid_before, n_valid_after)
    assert sysm.loop_closer.loop_edges == [(kf, cand)]
    ate1 = ate_rmse(sysm.poses_reconstructed(), gt)
    assert ate1 < ate0 * 1.15, (ate0, ate1)  # no catastrophic distortion

    # Global BA smoke (matrix-free PCG over the whole map).
    sysm.loop_closer.run_global_ba(rounds=1)
    assert sysm.loop_closer.n_guarded == 0
    ate2 = ate_rmse(sysm.poses_reconstructed(), gt)
    assert ate2 < ate0 * 1.2, (ate0, ate2)

    # ------------------------------------------------------------------
    # DRIFT-INJECTION phase (round-3 VERDICT #1c): restore the
    # pre-correction map, inject synthetic accumulated drift into the
    # post-loop keyframes (poses AND their owned landmarks move together,
    # so the map stays locally consistent — exactly what odometry drift
    # looks like), re-measure the loop Sim3, correct, and require the
    # correction to REMOVE most of the drift: ATE strictly improves >=2x.
    # ------------------------------------------------------------------
    from splslam_tpu.geometry import se3

    sysm.map = map_before
    sysm.kf_pose_host = kf_pose_host_before
    sysm.loop_closer.loop_edges = []
    sysm.loop_closer.corrections = 0

    n = sysm.n_kfs
    Tcw_d = np.asarray(map_before.kfs.Tcw).copy()
    xyz_d = np.asarray(map_before.pts.xyz).copy()
    lxyz_d = np.asarray(map_before.lns.xyz).copy()
    first_pt = np.asarray(map_before.pts.first_kf)
    first_ln = np.asarray(map_before.lns.first_kf)
    ramp0 = cand + 2
    for k in range(ramp0, n):
        a = (k - ramp0) / max(n - 1 - ramp0, 1)
        xi = (0.25 * a * np.array([1.0, 0.4, 0.0, 0.0, 0.0, 0.0])
              ).astype(np.float32)
        W = np.asarray(se3.se3_exp(jnp.asarray(xi)))   # world-side drift
        # camera k now sees the world through W: Tcw' (W X) == Tcw X
        Tcw_d[k] = Tcw_d[k] @ np.linalg.inv(W)
        own = first_pt == k
        xyz_d[own] = xyz_d[own] @ W[:3, :3].T + W[:3, 3]
        ownl = first_ln == k
        lxyz_d[ownl] = (lxyz_d[ownl] @ W[:3, :3].T) + W[:3, 3]
        sysm.kf_pose_host[k] = Tcw_d[k].copy()
    sysm.map = map_before._replace(
        kfs=map_before.kfs._replace(Tcw=jnp.asarray(Tcw_d)),
        pts=map_before.pts._replace(xyz=jnp.asarray(xyz_d)),
        lns=map_before.lns._replace(xyz=jnp.asarray(lxyz_d)),
    )
    ate_drift = ate_rmse(sysm.poses_reconstructed(), gt)
    assert ate_drift > 2.0 * ate0, (ate0, ate_drift)  # drift injected

    *_, S12d = compute_sim3_attempt(
        jax.random.PRNGKey(kf), sysm.map, jnp.int32(kf), jnp.int32(cand),
        K3, jnp.float32(1.0),
    )
    sysm.loop_closer._correct(kf, cand, S12d)
    assert sysm.loop_closer.n_guarded == 0
    ate_corr = ate_rmse(sysm.poses_reconstructed(), gt)
    print(f"\ndrift injection: ate0 {ate0:.4f} -> drifted "
          f"{ate_drift:.4f} -> corrected {ate_corr:.4f}")
    assert ate_corr < 0.5 * ate_drift, (ate_drift, ate_corr)
