"""Global BA with line-endpoint edges (run_global_ba with_lines=True).

Exceeds the reference: its stock GBA is points-only
(src/Optimizer.cc:219-408 has no line blocks). Map lines with >= 2
surviving observations enter the PCG global solve as paired 1-dof
endpoint edges (shared construction with local BA, add_line_edges);
under-observed lines fall back to the owning-keyframe carry transform.
"""

import numpy as np
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.slam.loop_closing import LoopCloser
from splslam_tpu.slam.map import MapState

FX, FY, CX, CY = 300.0, 300.0, 160.0, 120.0


def _gba_fixture(perturb=0.15, seed=5):
    """3 keyframes at GT poses, points at GT, 4 map lines: lines 0..2
    observed by all 3 KFs (constrained), line 3 by KF0 only (carried).
    Line WORLD endpoints are perturbed; 2D observations are exact GT
    projections, so GBA should pull the endpoints back."""
    K_CAP, N, Lf, P, Q = 4, 64, 8, 64, 8
    n_kf, n_pts, n_lns = 3, 36, 4
    rng = np.random.default_rng(seed)

    centers = np.array([[0.0, 0, 0], [0.4, 0.05, 0], [0.8, -0.05, 0]],
                       np.float32)
    Tcw = np.tile(np.eye(4, dtype=np.float32), (K_CAP, 1, 1))
    for k in range(n_kf):
        Tcw[k, :3, 3] = -centers[k]

    xyz = rng.uniform([-0.8, -0.8, 3.0], [1.6, 0.8, 5.0],
                      (n_pts, 3)).astype(np.float32)

    gt_lines = np.zeros((n_lns, 2, 3), np.float32)
    gt_lines[:, 0] = rng.uniform([-0.6, -0.6, 3.2], [1.2, 0.6, 4.6],
                                 (n_lns, 3))
    d = rng.normal(0, 1, (n_lns, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    gt_lines[:, 1] = gt_lines[:, 0] + 0.8 * d

    def proj(pts3, k):
        rel = pts3 - centers[k]
        u = FX * rel[:, 0] / rel[:, 2] + CX
        v = FY * rel[:, 1] / rel[:, 2] + CY
        return np.stack([u, v], -1)

    st = MapState.empty(P, Q, K_CAP, N, Lf)
    lm_idx = np.full((K_CAP, N), -1, np.int32)
    fvalid = np.zeros((K_CAP, N), bool)
    xy = np.zeros((K_CAP, N, 2), np.float32)
    sigma2 = np.ones((K_CAP, N), np.float32)
    u_right = np.full((K_CAP, N), -1.0, np.float32)
    lseg = np.zeros((K_CAP, Lf, 4), np.float32)
    lvalid = np.zeros((K_CAP, Lf), bool)
    ll_idx = np.full((K_CAP, Lf), -1, np.int32)
    for k in range(n_kf):
        lm_idx[k, :n_pts] = np.arange(n_pts)
        fvalid[k, :n_pts] = True
        xy[k, :n_pts] = proj(xyz, k)
        obs = n_lns if k == 0 else n_lns - 1  # line 3: KF0 only
        s2 = proj(gt_lines[:obs, 0], k)
        e2 = proj(gt_lines[:obs, 1], k)
        lseg[k, :obs] = np.concatenate([s2, e2], -1)
        lvalid[k, :obs] = True
        ll_idx[k, :obs] = np.arange(obs)

    pert = gt_lines + rng.normal(0, perturb, gt_lines.shape).astype(
        np.float32)
    lxyz = np.zeros((Q, 3, 3), np.float32)
    lxyz[:n_lns, 0] = pert[:, 0]
    lxyz[:n_lns, 2] = pert[:, 1]
    lxyz[:n_lns, 1] = 0.5 * (pert[:, 0] + pert[:, 1])

    st = st._replace(
        kfs=st.kfs._replace(
            Tcw=jnp.asarray(Tcw),
            lm_idx=jnp.asarray(lm_idx), fvalid=jnp.asarray(fvalid),
            xy=jnp.asarray(xy), sigma2=jnp.asarray(sigma2),
            u_right=jnp.asarray(u_right),
            lseg=jnp.asarray(lseg), lvalid=jnp.asarray(lvalid),
            ll_idx=jnp.asarray(ll_idx),
            valid=jnp.asarray(np.arange(K_CAP) < n_kf),
        ),
        pts=st.pts._replace(
            xyz=jnp.asarray(np.pad(xyz, ((0, P - n_pts), (0, 0)))),
            valid=jnp.asarray(np.arange(P) < n_pts),
        ),
        lns=st.lns._replace(
            xyz=jnp.asarray(lxyz),
            valid=jnp.asarray(np.arange(Q) < n_lns),
            first_kf=jnp.zeros((Q,), jnp.int32),
        ),
        n_kfs=jnp.int32(n_kf),
    )
    return st, gt_lines, n_kf, n_lns


class _FakeSys:
    pass


def _run(st, n_kf, with_lines):
    fs = _FakeSys()
    fs.map = st
    fs.cam = Camera.create(FX, FY, CX, CY, width=320, height=240)
    fs.n_kfs = n_kf
    fs.kf_pose_host = {}
    lc = LoopCloser.__new__(LoopCloser)
    lc.sys = fs
    lc.run_global_ba(rounds=1, with_lines=with_lines)
    return fs.map


def _perp_err(endpts, gt):
    """Distance from each endpoint to its GT infinite 3D line. The
    along-line component is pure gauge under the endpoint
    parametrization (every observed back-projected plane contains the
    GT line, so sliding along it is unobservable — the reference's
    EdgeSE3ProjectXYZLines has the identical freedom); only the
    perpendicular component is a correctable error."""
    d = gt[:, 1] - gt[:, 0]
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rel = endpts - gt[:, :1, :]
    par = np.sum(rel * d[:, None, :], -1, keepdims=True) * d[:, None, :]
    return np.linalg.norm(rel - par, axis=-1)


def test_gba_pulls_perturbed_line_endpoints_to_gt():
    st, gt, n_kf, n_lns = _gba_fixture()
    before = np.asarray(st.lns.xyz[:n_lns])
    err_b = _perp_err(before[:3, (0, 2), :], gt[:3]).mean()

    out = _run(st, n_kf, with_lines=True)
    after = np.asarray(out.lns.xyz[:n_lns])
    err_a = _perp_err(after[:3, (0, 2), :], gt[:3]).mean()
    assert err_b > 0.05, err_b  # the fixture really perturbed them
    assert err_a < 0.02 * err_b, (err_b, err_a)
    # Midpoint consistency: mid == mean of optimized endpoints.
    np.testing.assert_allclose(
        after[:3, 1], 0.5 * (after[:3, 0] + after[:3, 2]), atol=1e-5
    )
    # Poses start at GT and must stay there (points pin them).
    dT = np.asarray(out.kfs.Tcw[:n_kf]) - np.asarray(st.kfs.Tcw[:n_kf])
    assert np.abs(dT).max() < 0.02, np.abs(dT).max()


def test_gba_single_observation_line_is_carried_not_snapped():
    st, gt, n_kf, n_lns = _gba_fixture()
    before = np.asarray(st.lns.xyz[n_lns - 1])
    out = _run(st, n_kf, with_lines=True)
    after = np.asarray(out.lns.xyz[n_lns - 1])
    # One observation -> under-constrained -> owning-KF carry; poses
    # barely move, so the line stays (approximately) where it was.
    assert np.abs(after - before).max() < 0.05, np.abs(after - before).max()


def test_gba_with_lines_false_matches_carry_path():
    st, gt, n_kf, n_lns = _gba_fixture()
    out = _run(st, n_kf, with_lines=False)
    # Points-only GBA with GT-consistent points: map unchanged within tol.
    dp = np.asarray(out.pts.xyz) - np.asarray(st.pts.xyz)
    assert np.abs(dp).max() < 0.02, np.abs(dp).max()
