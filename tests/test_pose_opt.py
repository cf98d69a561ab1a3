"""Pose-only optimizer tests: recover a known pose from synthetic
observations, with noise, outliers, and line-midpoint constraints."""

import jax.numpy as jnp
import numpy as np

from splslam_tpu.geometry import se3
from splslam_tpu.geometry.camera import Camera
from splslam_tpu.optim.pose_gn import (
    LineObs,
    PointObs,
    line_coefficients,
    pose_optimize,
    pose_optimize_main,
)

rng = np.random.default_rng(1)
CAM = Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0,
                    width=640, height=480)


def make_scene(n=120, seed=2):
    r = np.random.default_rng(seed)
    X = np.stack(
        [r.uniform(-3, 3, n), r.uniform(-2, 2, n), r.uniform(4, 12, n)], axis=1
    ).astype(np.float32)
    return X


def project_np(Tcw, X):
    pc = X @ np.array(Tcw)[:3, :3].T + np.array(Tcw)[:3, 3]
    u = 500.0 * pc[:, 0] / pc[:, 2] + 320.0
    v = 500.0 * pc[:, 1] / pc[:, 2] + 240.0
    return np.stack([u, v], axis=1).astype(np.float32)


def pose_err(Ta, Tb):
    d = np.array(se3.se3_log(jnp.array(Ta) @ jnp.linalg.inv(jnp.array(Tb))))
    return np.linalg.norm(d)


class TestPoseOptimize:
    def test_points_exact(self):
        X = make_scene()
        T_true = np.array(se3.se3_exp(jnp.array([0.2, -0.1, 0.05, 0.03, -0.02, 0.01])))
        uv = project_np(T_true, X)
        pts = PointObs(jnp.array(X), jnp.array(uv), jnp.ones(len(X)), jnp.ones(len(X), bool))
        T0 = jnp.eye(4)
        res = pose_optimize(T0, CAM, pts, LineObs.empty(4))
        assert pose_err(res.Tcw, T_true) < 1e-3
        assert int(res.n_inlier_pt) == len(X)

    def test_points_with_noise_and_outliers(self):
        X = make_scene(200, seed=5)
        T_true = np.array(se3.se3_exp(jnp.array([0.1, 0.2, -0.1, -0.05, 0.04, 0.08])))
        uv = project_np(T_true, X)
        uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
        n_out = 40
        uv[:n_out] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)
        pts = PointObs(jnp.array(X), jnp.array(uv), jnp.ones(len(X)), jnp.ones(len(X), bool))
        res = pose_optimize(jnp.eye(4), CAM, pts, LineObs.empty(4))
        assert pose_err(res.Tcw, T_true) < 0.01
        inl = np.array(res.inlier_pt)
        assert inl[n_out:].mean() > 0.95     # inliers kept
        assert inl[:n_out].mean() < 0.2      # outliers rejected

    def test_lines_only(self):
        # Lines through 3D midpoints; observed 2D lines from projected
        # endpoint pairs. Use many lines with diverse directions.
        r = np.random.default_rng(7)
        M = make_scene(150, seed=8)
        D = r.normal(size=(150, 3)).astype(np.float32)
        D /= np.linalg.norm(D, axis=1, keepdims=True)
        T_true = np.array(se3.se3_exp(jnp.array([0.05, -0.08, 0.02, 0.02, 0.03, -0.01])))
        P1 = project_np(T_true, M - 0.5 * D)
        P2 = project_np(T_true, M + 0.5 * D)
        seg = np.concatenate([P1, P2], axis=1)
        coef = line_coefficients(jnp.array(seg))
        lines = LineObs(jnp.array(M), coef, jnp.ones(150), jnp.ones(150, bool))
        res = pose_optimize(jnp.eye(4), CAM, PointObs.empty(4), lines,
                            rounds=4, iters=15)
        assert pose_err(res.Tcw, T_true) < 5e-3
        assert int(res.n_inlier_ln) > 140

    def test_both_better_than_far_init(self):
        X = make_scene(100, seed=11)
        M = make_scene(60, seed=12)
        D = np.tile(np.array([[1.0, 0, 0]], np.float32), (60, 1))
        T_true = np.array(se3.se3_exp(jnp.array([0.3, 0.1, -0.2, 0.05, -0.1, 0.04])))
        uv = project_np(T_true, X)
        P1 = project_np(T_true, M - 0.4 * D)
        P2 = project_np(T_true, M + 0.4 * D)
        coef = line_coefficients(jnp.array(np.concatenate([P1, P2], axis=1)))
        pts = PointObs(jnp.array(X), jnp.array(uv), jnp.ones(100), jnp.ones(100, bool))
        lines = LineObs(jnp.array(M), coef, jnp.ones(60), jnp.ones(60, bool))
        res = pose_optimize_main(jnp.eye(4), CAM, pts, lines)
        assert pose_err(res.Tcw, T_true) < 1e-3

    def test_empty_observations_no_nan(self):
        res = pose_optimize(jnp.eye(4), CAM, PointObs.empty(8), LineObs.empty(8))
        assert np.isfinite(np.array(res.Tcw)).all()
        np.testing.assert_allclose(np.array(res.Tcw), np.eye(4), atol=1e-6)

    def test_vmap_over_frames(self):
        import jax

        X = make_scene(80, seed=20)
        xis = rng.normal(0, 0.1, (4, 6)).astype(np.float32)
        T_batch = se3.se3_exp(jnp.array(xis))
        uvs = np.stack([project_np(np.array(T), X) for T in T_batch])
        pts_b = PointObs(
            jnp.broadcast_to(jnp.array(X), (4, 80, 3)),
            jnp.array(uvs),
            jnp.ones((4, 80)),
            jnp.ones((4, 80), bool),
        )
        T0 = jnp.broadcast_to(jnp.eye(4), (4, 4, 4))
        empty = LineObs(
            jnp.zeros((4, 2, 3)), jnp.zeros((4, 2, 3)), jnp.ones((4, 2)),
            jnp.zeros((4, 2), bool),
        )
        fn = jax.vmap(lambda T, p, l: pose_optimize(T, CAM, p, l))
        res = fn(T0, pts_b, empty)
        for i in range(4):
            assert pose_err(np.array(res.Tcw[i]), np.array(T_batch[i])) < 1e-3
