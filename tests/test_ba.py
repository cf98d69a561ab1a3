"""Tests for the Schur-complement BA engine (optim/ba.py) and the fused
mapping step (slam/mapping_ops.py) against synthetic geometry."""

import numpy as np
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.optim.ba import BAProblem, ba_solve


def _make_cam():
    return Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0,
                         width=640, height=480)


def _lookat_poses(n_cams, radius=6.0, seed=0):
    """Cameras on an arc around origin, all looking at the origin."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n_cams):
        ang = 0.25 * i / max(n_cams - 1, 1) - 0.125
        C = np.array([radius * np.sin(ang), 0.1 * rng.standard_normal(),
                      -radius * np.cos(ang)])
        fwd = -C / np.linalg.norm(C)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        Rwc = np.stack([right, upv, fwd], axis=1)
        Tcw = np.eye(4)
        Tcw[:3, :3] = Rwc.T
        Tcw[:3, 3] = -Rwc.T @ C
        poses.append(Tcw)
    return np.array(poses, np.float32)


def _project(cam, Tcw, X):
    pc = X @ Tcw[:3, :3].T + Tcw[:3, 3]
    u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
    v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
    return np.stack([u, v], -1), pc[:, 2]


def _make_problem(n_cams=6, n_pts=120, noise=0.3, perturb_pose=0.02,
                  perturb_pt=0.05, stereo=False, seed=1):
    cam = _make_cam()
    rng = np.random.default_rng(seed)
    Tcw_gt = _lookat_poses(n_cams, seed=seed)
    X_gt = rng.uniform([-2, -1.5, -1], [2, 1.5, 1], size=(n_pts, 3)).astype(np.float32)

    e_cam, e_lm, e_uv, e_ur = [], [], [], []
    for c in range(n_cams):
        uv, z = _project(cam, Tcw_gt[c], X_gt)
        uv = uv + rng.normal(0, noise, uv.shape)
        for l in range(n_pts):
            if z[l] > 0.1 and 0 <= uv[l, 0] < 640 and 0 <= uv[l, 1] < 480:
                e_cam.append(c); e_lm.append(l); e_uv.append(uv[l])
                if stereo:
                    e_ur.append(uv[l, 0] - float(cam.bf) / z[l]
                                + rng.normal(0, noise))
                else:
                    e_ur.append(-1.0)
    E = len(e_cam)
    # perturb initial states (first camera = gauge anchor stays exact)
    Tcw0 = Tcw_gt.copy()
    for c in range(1, n_cams):
        from splslam_tpu.geometry import se3
        xi = rng.normal(0, perturb_pose, 6).astype(np.float32)
        Tcw0[c] = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ Tcw0[c]
    X0 = X_gt + rng.normal(0, perturb_pt, X_gt.shape).astype(np.float32)

    prob = BAProblem(
        Tcw=jnp.asarray(Tcw0),
        cam_free=jnp.asarray([False] + [True] * (n_cams - 1)),
        xyz=jnp.asarray(X0),
        lm_ok=jnp.ones((n_pts,), bool),
        e_cam=jnp.asarray(e_cam, jnp.int32),
        e_lm=jnp.asarray(e_lm, jnp.int32),
        e_uv=jnp.asarray(np.array(e_uv, np.float32)),
        e_ur=jnp.asarray(np.array(e_ur, np.float32)),
        e_inv_sigma2=jnp.ones((E,)),
        e_ok=jnp.ones((E,), bool),
    )
    return cam, prob, Tcw_gt, X_gt


def test_ba_converges_mono():
    cam, prob, Tcw_gt, X_gt = _make_problem()
    res = ba_solve(cam, prob, rounds=2, iters=6, n_free=prob.Tcw.shape[0])
    # poses recovered
    for c in range(1, Tcw_gt.shape[0]):
        dt = np.asarray(res.Tcw[c])[:3, 3] - Tcw_gt[c][:3, 3]
        assert np.linalg.norm(dt) < 0.01, (c, dt)
    err = np.linalg.norm(np.asarray(res.xyz) - X_gt, axis=-1)
    assert np.median(err) < 0.02
    assert float(jnp.mean(res.e_inlier.astype(jnp.float32))) > 0.95


def test_ba_converges_stereo():
    cam, prob, Tcw_gt, X_gt = _make_problem(stereo=True)
    res = ba_solve(cam, prob, rounds=2, iters=6, n_free=prob.Tcw.shape[0])
    for c in range(1, Tcw_gt.shape[0]):
        dt = np.asarray(res.Tcw[c])[:3, 3] - Tcw_gt[c][:3, 3]
        assert np.linalg.norm(dt) < 0.01, (c, dt)
    err = np.linalg.norm(np.asarray(res.xyz) - X_gt, axis=-1)
    assert np.median(err) < 0.02


def test_ba_rejects_outliers():
    cam, prob, Tcw_gt, X_gt = _make_problem(noise=0.2)
    # corrupt 10% of observations grossly
    rng = np.random.default_rng(3)
    E = prob.e_uv.shape[0]
    bad = rng.choice(E, E // 10, replace=False)
    uv = np.array(prob.e_uv)
    uv[bad] += rng.uniform(30, 80, (len(bad), 2)) * rng.choice([-1, 1], (len(bad), 2))
    prob = prob._replace(e_uv=jnp.asarray(uv))
    res = ba_solve(cam, prob, rounds=4, iters=6, n_free=prob.Tcw.shape[0])
    inl = np.asarray(res.e_inlier)
    # corrupted edges classified as outliers; clean edges kept
    assert inl[bad].mean() < 0.1
    mask = np.ones(E, bool); mask[bad] = False
    assert inl[mask].mean() > 0.9
    for c in range(1, Tcw_gt.shape[0]):
        dt = np.asarray(res.Tcw[c])[:3, 3] - Tcw_gt[c][:3, 3]
        assert np.linalg.norm(dt) < 0.03, (c, dt)


def test_ba_fixed_cameras_anchor():
    """Fixed (non-free) cameras must not move."""
    cam, prob, Tcw_gt, X_gt = _make_problem(n_cams=6)
    n_free = 4  # last 2 cams fixed
    res = ba_solve(cam, prob, rounds=2, iters=5, n_free=n_free)
    np.testing.assert_allclose(
        np.asarray(res.Tcw[n_free:]), np.asarray(prob.Tcw[n_free:]), atol=0
    )
    # frozen-in-free-block camera (slot 0) also unchanged
    np.testing.assert_allclose(
        np.asarray(res.Tcw[0]), np.asarray(prob.Tcw[0]), atol=0
    )


def test_pcg_gba_matches_dense():
    """The matrix-free PCG solver must reach the same optimum as the
    dense-Schur local solver on a problem both can handle."""
    from splslam_tpu.optim.ba import ba_solve_pcg

    cam, prob, Tcw_gt, X_gt = _make_problem(n_cams=8, n_pts=200)
    res = ba_solve_pcg(cam, prob, rounds=2, gn_iters=4, cg_iters=30)
    for c in range(1, Tcw_gt.shape[0]):
        dt = np.asarray(res.Tcw[c])[:3, 3] - Tcw_gt[c][:3, 3]
        assert np.linalg.norm(dt) < 0.01, (c, dt)
    err = np.linalg.norm(np.asarray(res.xyz) - X_gt, axis=-1)
    assert np.median(err) < 0.02
    assert float(jnp.mean(res.e_inlier.astype(jnp.float32))) > 0.95


def test_keyframe_culling_marks_redundant():
    """A keyframe whose landmarks are all seen by 3+ other keyframes at
    the same scale must be culled (reference KeyFrameCulling)."""
    import jax.numpy as jnp
    from splslam_tpu.slam.map import MapState
    from splslam_tpu.slam.mapping_ops import cull_keyframes

    K, N, P = 8, 64, 256
    st = MapState.empty(P, 4, K, N, 1)
    kfs = st.kfs
    # 6 keyframes all observing the SAME 64 landmarks at octave 0
    lm_row = jnp.arange(N, dtype=jnp.int32)
    for k in range(6):
        kfs = kfs._replace(
            lm_idx=kfs.lm_idx.at[k].set(lm_row),
            fvalid=kfs.fvalid.at[k].set(True),
            valid=kfs.valid.at[k].set(True),
        )
    pts = st.pts._replace(
        valid=st.pts.valid.at[:N].set(True),
        n_obs=st.pts.n_obs.at[:N].set(6),
    )
    st = st._replace(kfs=kfs, pts=pts, n_kfs=jnp.int32(6))
    out = cull_keyframes(st, jnp.int32(5))
    v = np.asarray(out.kfs.valid)
    # kf0 (anchor), kf5 (current), kf4 (previous) protected; some of
    # kf1..kf3 culled (max 2 per call)
    assert v[0] and v[5] and v[4]
    assert (~v[1:4]).sum() == 2
    # culled keyframes' observations erased
    culled = [k for k in range(1, 4) if not v[k]]
    for k in culled:
        assert (np.asarray(out.kfs.lm_idx[k]) == -1).all()


def test_gba_sharded_matches_single_device():
    """Edge-sharded multi-device GBA must agree with the single-device
    PCG solver (same problem, 8 virtual devices)."""
    import jax
    from jax.sharding import Mesh
    from splslam_tpu.optim.ba import ba_solve_pcg
    from splslam_tpu.parallel.gba_sharded import gba_sharded

    cam, prob, Tcw_gt, X_gt = _make_problem(n_cams=6, n_pts=100)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    Tcw_s, xyz_s = gba_sharded(cam, prob, mesh, gn_iters=6, cg_iters=24)
    for c in range(1, Tcw_gt.shape[0]):
        dt = np.asarray(Tcw_s[c])[:3, 3] - Tcw_gt[c][:3, 3]
        assert np.linalg.norm(dt) < 0.01, (c, dt)
    err = np.linalg.norm(np.asarray(xyz_s) - X_gt, axis=-1)
    assert np.median(err) < 0.02
