"""Unit tests for the SE3/Sim3 math core and camera model vs NumPy refs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splslam_tpu.geometry import se3
from splslam_tpu.geometry.camera import (
    Camera,
    backproject,
    distort_normalized,
    in_image,
    project,
    undistort_points,
)
from splslam_tpu.geometry.triangulate import (
    projection_matrix,
    triangulate_dlt,
    triangulate_lines,
    triangulation_checks,
)

rng = np.random.default_rng(0)


def np_rodrigues(phi):
    theta = np.linalg.norm(phi)
    if theta < 1e-12:
        return np.eye(3)
    k = phi / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class TestSO3:
    def test_exp_matches_rodrigues(self):
        for _ in range(20):
            phi = rng.normal(size=3) * 2.0
            R = np.array(se3.so3_exp(jnp.array(phi, jnp.float32)))
            np.testing.assert_allclose(R, np_rodrigues(phi), atol=1e-5)

    def test_exp_log_roundtrip(self):
        phis = rng.normal(size=(50, 3)).astype(np.float32)
        phis *= (rng.uniform(0.01, 3.0, size=(50, 1)) / np.linalg.norm(phis, axis=1, keepdims=True)).astype(np.float32)
        R = se3.so3_exp(jnp.array(phis))
        back = np.array(se3.so3_log(R))
        np.testing.assert_allclose(back, phis, atol=2e-4)

    def test_exp_identity(self):
        R = np.array(se3.so3_exp(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_log_near_pi(self):
        phi = np.array([0.0, 0.0, np.pi - 1e-4], dtype=np.float32)
        R = se3.so3_exp(jnp.array(phi))
        back = np.array(se3.so3_log(R))
        np.testing.assert_allclose(np.abs(back), np.abs(phi), atol=1e-2)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rng.normal(size=(30, 6)).astype(np.float32) * 0.8
        T = se3.se3_exp(jnp.array(xi))
        back = np.array(se3.se3_log(T))
        np.testing.assert_allclose(back, xi, atol=1e-3)

    def test_inverse(self):
        xi = jnp.array(rng.normal(size=(10, 6)).astype(np.float32))
        T = se3.se3_exp(xi)
        eye = T @ se3.se3_inverse(T)
        np.testing.assert_allclose(
            np.array(eye), np.broadcast_to(np.eye(4), (10, 4, 4)), atol=1e-5
        )

    def test_transform_points(self):
        xi = jnp.array(rng.normal(size=6).astype(np.float32))
        T = se3.se3_exp(xi)
        pts = jnp.array(rng.normal(size=(17, 3)).astype(np.float32))
        out = se3.transform_points(T, pts)
        expect = np.array(pts) @ np.array(T[:3, :3]).T + np.array(T[:3, 3])
        np.testing.assert_allclose(np.array(out), expect, atol=1e-5)

    def test_retract_small_step_moves_pose(self):
        T = se3.se3_exp(jnp.array([0.1, 0.2, -0.1, 0.05, 0.0, 0.02], jnp.float32))
        xi = jnp.array([1e-3] * 6, jnp.float32)
        T2 = se3.se3_retract(T, xi)
        assert not np.allclose(np.array(T), np.array(T2))
        # Retracting back with -xi approximately restores (first order).
        T3 = se3.se3_retract(T2, -xi)
        np.testing.assert_allclose(np.array(T3), np.array(T), atol=1e-5)


class TestSim3:
    def test_exp_zero_is_identity(self):
        s, R, t = se3.sim3_exp(jnp.zeros(7))
        assert np.allclose(float(s), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.array(R), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.array(t), np.zeros(3), atol=1e-5)

    def test_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0, 0, 0, 0], jnp.float32)
        s, R, t = se3.sim3_exp(xi)
        np.testing.assert_allclose(np.array(t), [1, 2, 3], atol=1e-4)

    def test_pure_scale(self):
        xi = jnp.array([0, 0, 0, 0, 0, 0, 0.5], jnp.float32)
        s, _, _ = se3.sim3_exp(xi)
        np.testing.assert_allclose(float(s), np.exp(0.5), atol=1e-5)

    def test_se3_limit(self):
        # sigma=0 => translation part equals SE3's left-Jacobian action.
        xi6 = rng.normal(size=6).astype(np.float32)
        T = se3.se3_exp(jnp.array(xi6))
        xi7 = jnp.array(np.concatenate([xi6, [0.0]]).astype(np.float32))
        s, R, t = se3.sim3_exp(xi7)
        np.testing.assert_allclose(np.array(R), np.array(T[:3, :3]), atol=1e-5)
        np.testing.assert_allclose(np.array(t), np.array(T[:3, 3]), atol=1e-4)

    def test_compose_inverse(self):
        a = se3.sim3_exp(jnp.array(rng.normal(size=7).astype(np.float32) * 0.5))
        inv = se3.sim3_inverse(*a)
        s, R, t = se3.sim3_compose(a, inv)
        assert np.allclose(float(s), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.array(R), np.eye(3), atol=1e-4)
        np.testing.assert_allclose(np.array(t), np.zeros(3), atol=1e-4)

    def test_apply(self):
        s, R, t = se3.sim3_exp(jnp.array(rng.normal(size=7).astype(np.float32) * 0.3))
        pts = jnp.array(rng.normal(size=(5, 3)).astype(np.float32))
        out = se3.sim3_apply(s, R, t, pts)
        expect = float(s) * np.array(pts) @ np.array(R).T + np.array(t)
        np.testing.assert_allclose(np.array(out), expect, atol=1e-4)


class TestCamera:
    cam = Camera.create(fx=520.9, fy=521.0, cx=325.1, cy=249.7,
                        k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026,
                        k3=1.1633, bf=40.0, width=640, height=480)

    def test_project_backproject(self):
        pts = jnp.array(rng.uniform(-2, 2, size=(40, 3)).astype(np.float32))
        pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 1.0)
        uv, z = project(self.cam, pts)
        back = backproject(self.cam, uv, z)
        np.testing.assert_allclose(np.array(back), np.array(pts), atol=1e-4)

    def test_undistort_roundtrip(self):
        # distort normalized points, then undistort pixels -> original
        xy = jnp.array(rng.uniform(-0.3, 0.3, size=(30, 2)).astype(np.float32))
        xyd = distort_normalized(self.cam, xy)
        uv_dist = jnp.stack(
            [xyd[:, 0] * self.cam.fx + self.cam.cx, xyd[:, 1] * self.cam.fy + self.cam.cy],
            axis=-1,
        )
        uv_undist = undistort_points(self.cam, uv_dist, iters=10)
        expect = np.stack(
            [np.array(xy)[:, 0] * float(self.cam.fx) + float(self.cam.cx),
             np.array(xy)[:, 1] * float(self.cam.fy) + float(self.cam.cy)],
            axis=-1,
        )
        np.testing.assert_allclose(np.array(uv_undist), expect, atol=0.05)

    def test_in_image(self):
        uv = jnp.array([[0, 0], [639.5, 479.5], [-1, 5], [320, 480]], jnp.float32)
        mask = np.array(in_image(self.cam, uv))
        assert list(mask) == [True, True, False, False]


class TestTriangulation:
    def setup_method(self):
        self.K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], dtype=np.float32)
        self.T1 = np.eye(4, dtype=np.float32)
        self.T2 = np.eye(4, dtype=np.float32)
        self.T2[:3, 3] = [-0.5, 0.02, 0.01]  # baseline
        phi = np.array([0.01, -0.03, 0.005])
        self.T2[:3, :3] = np_rodrigues(phi)

    def _proj(self, T, X):
        pc = X @ T[:3, :3].T + T[:3, 3]
        uv = pc @ self.K.T
        return uv[:, :2] / uv[:, 2:3]

    def test_points_roundtrip(self):
        X = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
        X[:, 2] = rng.uniform(4, 12, size=100)
        uv1 = self._proj(self.T1, X)
        uv2 = self._proj(self.T2, X)
        P1 = projection_matrix(jnp.array(self.K), jnp.array(self.T1))
        P2 = projection_matrix(jnp.array(self.K), jnp.array(self.T2))
        Xr = np.array(triangulate_dlt(P1, P2, jnp.array(uv1), jnp.array(uv2)))
        np.testing.assert_allclose(Xr, X, atol=5e-2)

    def test_checks_accept_good_reject_behind(self):
        X = rng.uniform(-2, 2, size=(50, 3)).astype(np.float32)
        X[:25, 2] = rng.uniform(4, 10, size=25)
        X[25:, 2] = rng.uniform(-10, -4, size=25)  # behind camera
        uv1 = self._proj(self.T1, X)
        uv2 = self._proj(self.T2, X)
        ones = jnp.ones(50)
        mask = np.array(
            triangulation_checks(
                jnp.array(X), jnp.array(self.T1), jnp.array(self.T2),
                jnp.array(uv1), jnp.array(uv2), jnp.array(self.K), ones, ones,
            )
        )
        assert mask[:25].all()
        assert not mask[25:].any()

    def test_lines(self):
        S = rng.uniform(-2, 2, size=(20, 3)).astype(np.float32)
        S[:, 2] = rng.uniform(4, 8, size=20)
        E = S + rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
        s1, e1 = self._proj(self.T1, S), self._proj(self.T1, E)
        s2, e2 = self._proj(self.T2, S), self._proj(self.T2, E)
        seg1 = np.concatenate([s1, e1], axis=1)
        seg2 = np.concatenate([s2, e2], axis=1)
        P1 = projection_matrix(jnp.array(self.K), jnp.array(self.T1))
        P2 = projection_matrix(jnp.array(self.K), jnp.array(self.T2))
        out = np.array(triangulate_lines(P1, P2, jnp.array(seg1), jnp.array(seg2)))
        np.testing.assert_allclose(out[:, 0], S, atol=0.1)
        np.testing.assert_allclose(out[:, 2], E, atol=0.1)
        np.testing.assert_allclose(out[:, 1], 0.5 * (S + E), atol=0.1)
