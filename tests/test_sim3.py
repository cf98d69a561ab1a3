"""Sim3 solver / optimizer / pose-graph tests (reference Sim3Solver,
OptimizeSim3, OptimizeEssentialGraph)."""

import numpy as np
import jax
import jax.numpy as jnp

from splslam_tpu.geometry import se3
from splslam_tpu.optim.sim3 import (
    PoseGraphEdges,
    optimize_sim3,
    pose_graph_sim3,
    sim3_horn,
    sim3_ransac,
)

K3 = jnp.asarray(
    np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
)


def _make_sim3_problem(n=80, outliers=10, s_gt=1.3, seed=0):
    rng = np.random.default_rng(seed)
    ang = 0.3
    R_gt = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    t_gt = np.array([0.4, -0.2, 0.1], np.float32)
    X2 = rng.uniform([-1, -1, 3], [1, 1, 6], (n, 3)).astype(np.float32)
    X1 = s_gt * X2 @ R_gt.T + t_gt
    X1 += rng.normal(0, 0.005, X1.shape)
    bad = rng.choice(n, outliers, replace=False)
    X1[bad] += rng.uniform(0.5, 1.0, (outliers, 3))

    def proj(X):
        return (X[:, :2] / X[:, 2:]) * 400.0 + [320.0, 240.0]

    uv1 = proj(X1).astype(np.float32)
    uv2 = proj(X2).astype(np.float32)
    return (R_gt, t_gt, s_gt, jnp.asarray(X1), jnp.asarray(X2),
            jnp.asarray(uv1), jnp.asarray(uv2), bad)


def test_sim3_horn_exact():
    R_gt, t_gt, s_gt, X1, X2, uv1, uv2, bad = _make_sim3_problem(outliers=0)
    s, R, t = sim3_horn(X1, X2)
    assert abs(float(s) - s_gt) < 0.01
    assert np.linalg.norm(np.asarray(R) - R_gt) < 0.02
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.02


def test_sim3_ransac_rejects_outliers():
    R_gt, t_gt, s_gt, X1, X2, uv1, uv2, bad = _make_sim3_problem()
    n = X1.shape[0]
    ones = jnp.ones((n,))
    (s, R, t), n_in, inl = sim3_ransac(
        jax.random.PRNGKey(0), X1, X2, uv1, uv2, ones, ones,
        jnp.ones((n,), bool), K3,
    )
    assert int(n_in) >= n - len(bad) - 5
    assert np.asarray(inl)[bad].mean() < 0.2
    assert abs(float(s) - s_gt) < 0.02
    # GN refinement tightens it
    (s2, R2, t2), n2, _, n_grd = optimize_sim3(
        s, R, t, X1, X2, uv1, uv2, ones, ones, inl, K3,
    )
    assert int(n_grd) == 0
    assert abs(float(s2) - s_gt) < 0.01
    assert np.linalg.norm(np.asarray(R2) - R_gt) < 0.01


def test_sim3_fix_scale():
    R_gt, t_gt, s_gt, X1, X2, uv1, uv2, bad = _make_sim3_problem(
        s_gt=1.0, outliers=0
    )
    s, R, t = sim3_horn(X1, X2, fix_scale=True)
    assert float(s) == 1.0


def test_pose_graph_distributes_loop_error():
    """Chain of keyframes with odometry drift; a loop edge to the anchor
    redistributes the error (reference OptimizeEssentialGraph)."""
    Kn = 12
    # ground truth: poses along a circle so the loop closes
    gt = []
    for k in range(Kn):
        a = 2 * np.pi * k / Kn
        Twc = np.eye(4, dtype=np.float32)
        Twc[:3, :3] = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
        )
        Twc[:3, 3] = [np.sin(a), 0.0, 1.0 - np.cos(a)]
        gt.append(np.linalg.inv(Twc))  # Tcw
    gt = np.array(gt, np.float32)

    # drifted estimates: accumulate noisy odometry
    rng = np.random.default_rng(0)
    est = [gt[0]]
    for k in range(1, Kn):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        xi = rng.normal(0, 0.01, 6).astype(np.float32)
        noisy = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ rel
        est.append(noisy @ est[-1])
    est = np.array(est, np.float32)

    drift0 = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])

    # edges: sequential odometry (the measured noisy rel) + loop edge
    # (true relative between last and first)
    ei, ej, ss, Rs, ts, w = [], [], [], [], [], []
    for k in range(1, Kn):
        rel = est[k] @ np.linalg.inv(est[k - 1])  # S_ji with i=k, j=k-1
        ei.append(k); ej.append(k - 1)
        ss.append(1.0); Rs.append(rel[:3, :3]); ts.append(rel[:3, 3])
        w.append(1.0)
    loop_rel = gt[-1] @ np.linalg.inv(gt[0])
    ei.append(Kn - 1); ej.append(0)
    ss.append(1.0); Rs.append(loop_rel[:3, :3]); ts.append(loop_rel[:3, 3])
    w.append(1.0)

    edges = PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        s=jnp.asarray(ss), R=jnp.asarray(np.array(Rs)),
        t=jnp.asarray(np.array(ts)), weight=jnp.asarray(w),
    )
    free = jnp.asarray([False] + [True] * (Kn - 1))
    s_all = jnp.ones((Kn,))
    s_f, R_f, t_f, n_grd = pose_graph_sim3(
        s_all, jnp.asarray(gt[:, :3, :3] * 0 + est[:, :3, :3]),
        jnp.asarray(est[:, :3, 3]), free, edges, iters=15,
    )
    assert int(n_grd) == 0
    t_last = np.asarray(t_f[-1])
    drift1 = np.linalg.norm(t_last - gt[-1][:3, 3])
    assert drift1 < 0.6 * drift0, (drift0, drift1)
    # scales stay near 1 (no scale excitation in this graph)
    assert np.allclose(np.asarray(s_f), 1.0, atol=0.05)
