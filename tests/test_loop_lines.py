"""Loop-correction consistency for map-LINES + vectorized essential
graph.

Round-3 additions (VERDICT items 7 and 8): `_apply_pose_graph` must move
map-line start/mid/end points through the owning keyframe's Sim3
correction exactly like map points, and `_build_pose_graph_edges` must
assemble the same edge set as the reference's O(K^2) description
(chain + dual spanning trees + covisibility >= th + loop edges) from
pure array ops."""

import numpy as np
import jax.numpy as jnp

from splslam_tpu.slam import loop_closing as LC
from splslam_tpu.slam.map import MapState


def _small_map(n_kf=6, n_pts=40, n_lns=10):
    K_CAP, N, L, P, Q = 8, 64, 16, 128, 32
    st = MapState.empty(P, Q, K_CAP, N, L)
    rng = np.random.default_rng(7)

    Tcw = np.tile(np.eye(4, dtype=np.float32), (K_CAP, 1, 1))
    for k in range(n_kf):
        Tcw[k, 0, 3] = -0.5 * k  # camera at x = 0.5k looking down +z

    xyz = rng.uniform([-2, -2, 2], [2 + 0.5 * n_kf, 2, 6],
                      (n_pts, 3)).astype(np.float32)
    pvalid = np.zeros((P,), bool)
    pvalid[:n_pts] = True
    first_kf = rng.integers(0, n_kf, n_pts).astype(np.int32)

    lxyz = np.zeros((Q, 3, 3), np.float32)
    lxyz[:n_lns, 0] = rng.uniform([-2, -2, 2], [2, 2, 6], (n_lns, 3))
    lxyz[:n_lns, 2] = lxyz[:n_lns, 0] + rng.normal(0, 0.5, (n_lns, 3))
    lxyz[:n_lns, 1] = 0.5 * (lxyz[:n_lns, 0] + lxyz[:n_lns, 2])
    lvalid = np.zeros((Q,), bool)
    lvalid[:n_lns] = True
    lfirst = rng.integers(0, n_kf, n_lns).astype(np.int32)

    # observations: each KF sees a window of points (for covisibility)
    lm_idx = np.full((K_CAP, N), -1, np.int32)
    fvalid = np.zeros((K_CAP, N), bool)
    for k in range(n_kf):
        ids = np.arange(5 * k, min(5 * k + 20, n_pts))
        lm_idx[k, : len(ids)] = ids
        fvalid[k, : len(ids)] = True

    kfs = st.kfs._replace(
        Tcw=jnp.asarray(Tcw),
        lm_idx=jnp.asarray(lm_idx),
        fvalid=jnp.asarray(fvalid),
        valid=jnp.asarray(np.arange(K_CAP) < n_kf),
    )
    pts = st.pts._replace(
        xyz=jnp.asarray(np.pad(xyz, ((0, P - n_pts), (0, 0)))),
        valid=jnp.asarray(pvalid),
        first_kf=jnp.asarray(np.pad(first_kf, (0, P - n_pts))),
    )
    lns = st.lns._replace(
        xyz=jnp.asarray(lxyz),
        valid=jnp.asarray(lvalid),
        first_kf=jnp.asarray(np.pad(lfirst, (0, Q - n_lns))),
    )
    return st._replace(kfs=kfs, pts=pts, lns=lns,
                       n_kfs=jnp.int32(n_kf)), n_kf, n_pts, n_lns


def test_apply_pose_graph_moves_lines_like_points():
    st, n_kf, n_pts, n_lns = _small_map()
    K = st.kfs.Tcw.shape[0]
    rng = np.random.default_rng(3)

    # A synthetic optimized Sim3 per keyframe: small rotation + shift +
    # per-KF scale.
    s_f = np.ones((K,), np.float32)
    R_f = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t_f = np.asarray(st.kfs.Tcw)[:, :3, 3].copy()
    for k in range(n_kf):
        th = 0.05 * k
        c, s_ = np.cos(th), np.sin(th)
        R_f[k] = np.array([[c, 0, s_], [0, 1, 0], [-s_, 0, c]], np.float32)
        t_f[k] += np.array([0.1 * k, -0.05 * k, 0.02], np.float32)
        s_f[k] = 1.0 + 0.03 * k

    out = LC._apply_pose_graph(
        st, jnp.asarray(s_f), jnp.asarray(R_f), jnp.asarray(t_f),
        jnp.asarray(np.arange(K) < n_kf),
    )

    # For every map-line, a phantom point placed at each of its 3 control
    # points with the same owning keyframe must land at the same place.
    old_Tcw = np.asarray(st.kfs.Tcw)
    new_Tcw = np.asarray(out.kfs.Tcw)
    lxyz_old = np.asarray(st.lns.xyz)[:n_lns]
    lxyz_new = np.asarray(out.lns.xyz)[:n_lns]
    lref = np.asarray(st.lns.first_kf)[:n_lns]
    for q in range(n_lns):
        k = int(lref[q])
        To, Tn = old_Tcw[k], new_Tcw[k]
        for r in range(3):
            pc = To[:3, :3] @ lxyz_old[q, r] + To[:3, 3]
            expect = Tn[:3, :3].T @ (pc / s_f[k] - Tn[:3, 3])
            np.testing.assert_allclose(
                lxyz_new[q, r], expect, rtol=1e-4, atol=1e-5
            )
    # lines actually moved
    assert np.abs(lxyz_new - lxyz_old).max() > 1e-3


def test_pose_graph_edges_vectorized_structure():
    st, n_kf, *_ = _small_map()
    S_loop = (1.1, np.eye(3, dtype=np.float32),
              np.array([0.2, 0.0, 0.0], np.float32))
    edges = LC._build_pose_graph_edges(
        st, n_kf, n_kf - 1, 0, S_loop, past_loops=[(4, 1)], covis_min=10
    )
    ei = np.asarray(edges.i)
    ej = np.asarray(edges.j)
    w = np.asarray(edges.weight)
    ss = np.asarray(edges.s)

    # chain edges all present
    pairs = set(zip(ei.tolist(), ej.tolist()))
    for k in range(1, n_kf):
        assert (k, k - 1) in pairs
    # base edges deduplicated and strictly lower-triangular
    base = [(a, b) for (a, b, wt) in zip(ei, ej, w) if wt == 1.0]
    assert len(base) == len(set(base))
    assert all(a > b for a, b in base)
    # the loop edge is LAST, carries the measured Sim3 and weight n_kf
    assert (ei[-1], ej[-1]) == (n_kf - 1, 0)
    assert ss[-1] == np.float32(1.1)
    assert w[-1] == float(n_kf)
    # past loop edge present with loop weight
    past = [(a, b) for (a, b, wt) in zip(ei, ej, w)
            if wt == float(n_kf) and (a, b) == (4, 1)]
    assert past == [(4, 1)]
    # relative measurements of non-loop edges reproduce current poses
    Tcw = np.asarray(st.kfs.Tcw)
    R = np.asarray(edges.R)
    t = np.asarray(edges.t)
    for e in range(len(ei) - 1):
        rel = Tcw[ei[e]] @ np.linalg.inv(Tcw[ej[e]])
        np.testing.assert_allclose(R[e], rel[:3, :3], atol=1e-5)
        np.testing.assert_allclose(t[e], rel[:3, 3], atol=1e-5)


def test_pose_graph_edges_scale():
    """512-KF essential-graph assembly in < 1 s host time (VERDICT #8)."""
    import time

    K_CAP, N = 512, 64
    P = 4096
    st = MapState.empty(P, 4, K_CAP, N, 4)
    rng = np.random.default_rng(0)
    Tcw = np.tile(np.eye(4, dtype=np.float32), (K_CAP, 1, 1))
    Tcw[:, 0, 3] = -0.1 * np.arange(K_CAP)
    lm_idx = np.full((K_CAP, N), -1, np.int32)
    fvalid = np.zeros((K_CAP, N), bool)
    for k in range(K_CAP):
        ids = np.arange(4 * k, 4 * k + 40) % P
        lm_idx[k] = np.pad(ids, (0, N - 40), constant_values=-1)
        fvalid[k, :40] = True
    st = st._replace(
        kfs=st.kfs._replace(
            Tcw=jnp.asarray(Tcw), lm_idx=jnp.asarray(lm_idx),
            fvalid=jnp.asarray(fvalid),
            valid=jnp.ones((K_CAP,), bool),
        ),
        pts=st.pts._replace(valid=jnp.ones((P,), bool)),
        n_kfs=jnp.int32(K_CAP),
    )
    # warm the jitted covis matmuls once
    LC._covis_matrix(st).block_until_ready()
    LC._covis_matrix_lines(st).block_until_ready()
    S_loop = (1.0, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    # Best of 3: the gate measures the vectorized assembly's intrinsic
    # cost, not transient CPU contention from parallel test processes
    # (observed 3.9 s for a 0.3 s op under a concurrent full-suite run).
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        edges = LC._build_pose_graph_edges(st, K_CAP, K_CAP - 1, 0, S_loop)
        dt = min(dt, time.perf_counter() - t0)
    assert len(np.asarray(edges.i)) >= K_CAP - 1
    assert dt < 1.0, f"essential graph assembly took {dt:.2f}s"
