"""Loop closing: detection, Sim3 verification, correction, global BA.

Re-expresses the reference LoopClosing thread (src/LoopClosing.cc):

- `DetectLoop` (:103-229): BoW score of the new keyframe against the
  database, min-score gate from its covisible group, and the
  covisibility-group TEMPORAL CONSISTENCY check (a candidate's group must
  be re-detected in >= 3 consecutive keyframes,
  mnCovisibilityConsistencyTh=3).
- `ComputeSim3` (:231-402): descriptor match between the keyframes ->
  Sim3 RANSAC -> GN refinement -> projection-count verification.
  NOTE the reference DISABLES the correction: ComputeSim3 returns false
  even after full verification (kill-switch :390-392, "取消回环检测").
  The same envelope is the default here (`enable_loop_correction=False`
  records verified loops without acting); the correction machinery below
  is fully built and one flag away, like the reference is one `return`
  away.
- `CorrectLoop` (:404-587): Sim3 propagation to the covisible group,
  loop-point fusion, `OptimizeEssentialGraph` over odometry/covisibility/
  loop edges, and global BA (`RunGlobalBundleAdjustment` :647 — here the
  matrix-free PCG solver optim/ba.ba_solve_pcg).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from splslam_tpu.ops import match as M
from splslam_tpu.optim import sim3 as S3
from splslam_tpu.slam import map as mapmod

MIN_MATCHES = 20        # reference :262 nmatches>=20
MIN_SIM3_INLIERS = 20   # reference :345 OptimizeSim3 >= 20
MIN_PROJ_MATCHES = 40   # reference :388 >= 40 after Scw projection
CONSISTENCY_TH = 3      # reference mnCovisibilityConsistencyTh


@jax.jit
def _covisible_mask(st: mapmod.MapState, kf: jax.Array) -> jax.Array:
    """[K] bool: keyframes sharing >= 15 landmarks with `kf` (its
    covisibility group, used to exclude neighbors from candidates and to
    derive the min BoW score)."""
    lm = st.kfs.lm_idx[kf]
    P = st.pts.xyz.shape[0]
    member = jnp.zeros((P,), bool).at[jnp.clip(lm, 0)].set(lm >= 0)
    hit = member[jnp.clip(st.kfs.lm_idx, 0)] & (st.kfs.lm_idx >= 0)
    counts = jnp.sum(hit.astype(jnp.int32), axis=1)
    return (counts >= 15) & st.kfs.valid


@jax.jit
def compute_sim3_attempt(
    key: jax.Array,
    st: mapmod.MapState,
    kf: jax.Array,
    cand: jax.Array,
    K3: jax.Array,
    fix_scale_f: jax.Array,  # 1.0 for stereo/RGBD, 0.0 mono — traced;
    #                          RANSAC runs free-scale, the flag clamps after
):
    """Match landmarks of `kf` vs `cand`, Sim3 RANSAC + GN, then the
    projection-count verification. Returns (n_matches, n_sim3_inliers,
    n_proj, (s,R,t) S12 cam_kf <- cam_cand)."""
    kfs = st.kfs
    d1 = kfs.desc[kf]
    d2 = kfs.desc[cand]
    lm1 = kfs.lm_idx[kf]
    lm2 = kfs.lm_idx[cand]
    ok1 = kfs.fvalid[kf] & (lm1 >= 0) & st.pts.valid[jnp.clip(lm1, 0)]
    ok2 = kfs.fvalid[cand] & (lm2 >= 0) & st.pts.valid[jnp.clip(lm2, 0)]
    dist = M.hamming_matrix(d1, d2)
    dist = M.masked_distances(dist, ok1, ok2)
    mt, _ = M.nn_match(dist, max_dist=M.TH_LOW, ratio=0.75, mutual=True)
    matched = mt >= 0
    n_matches = jnp.sum(matched.astype(jnp.int32))
    col = jnp.clip(mt, 0)

    T1 = kfs.Tcw[kf]
    T2 = kfs.Tcw[cand]
    X1w = st.pts.xyz[jnp.clip(lm1, 0)]
    X2w = st.pts.xyz[jnp.clip(lm2[col], 0)]
    X1 = X1w @ T1[:3, :3].T + T1[:3, 3]          # kf cam frame
    X2 = X2w @ T2[:3, :3].T + T2[:3, 3]          # cand cam frame
    uv1 = kfs.xy[kf]
    uv2 = kfs.xy[cand][col]
    is1 = 1.0 / kfs.sigma2[kf]
    is2 = 1.0 / kfs.sigma2[cand][col]

    (s, R, t), n_r, inl = S3.sim3_ransac(
        key, X1, X2, uv1, uv2, is1, is2, matched, K3,
    )
    (s, R, t), n_opt, inl2 = S3.optimize_sim3(
        s, R, t, X1, X2, uv1, uv2, is1, is2, inl, K3,
    )
    s = jnp.where(fix_scale_f > 0.5, 1.0, s)

    # Verification: project ALL of cand's covisibility-area landmarks
    # (approximated by cand's own landmarks — the densest part of that
    # area) into kf via S12 and count descriptor-gated hits
    # (reference SearchByProjection with Scw, :365-388).
    Xc = st.pts.xyz[jnp.clip(lm2, 0)] @ T2[:3, :3].T + T2[:3, 3]
    p1 = s * (Xc @ R.T) + t
    zs = jnp.maximum(p1[:, 2], 1e-6)
    u = K3[0, 0] * p1[:, 0] / zs + K3[0, 2]
    v = K3[1, 1] * p1[:, 1] / zs + K3[1, 2]
    uvp = jnp.stack([u, v], axis=-1)
    win = M.window_mask(uvp, kfs.xy[kf], 8.0)
    dist2 = M.hamming_matrix(d2, d1)
    dist2 = M.masked_distances(dist2, ok2 & (p1[:, 2] > 0), ok1, win)
    mt2, _ = M.nn_match(dist2, max_dist=M.TH_LOW)
    n_proj = jnp.sum((mt2 >= 0).astype(jnp.int32))
    return n_matches, n_opt, n_proj, (s, R, t)


def _build_pose_graph_edges(st: mapmod.MapState, n_kfs: int,
                            loop_i: int, loop_j: int, S_loop):
    """Odometry (sequential) + loop edges with relative Sim3 measurements
    from the CURRENT poses (reference uses spanning-tree + covisibility
    edges; sequential keyframes are the spanning tree's backbone)."""
    Tcw = np.asarray(st.kfs.Tcw[:n_kfs])
    ei, ej, ss, Rs, ts, w = [], [], [], [], [], []
    for k in range(1, n_kfs):
        rel = Tcw[k] @ np.linalg.inv(Tcw[k - 1])
        ei.append(k); ej.append(k - 1)
        ss.append(1.0); Rs.append(rel[:3, :3]); ts.append(rel[:3, 3])
        w.append(1.0)
    s, R, t = S_loop
    ei.append(loop_i); ej.append(loop_j)
    ss.append(float(s)); Rs.append(np.asarray(R)); ts.append(np.asarray(t))
    w.append(float(n_kfs))  # loop edge dominates (reference gives loop
    #                         edges full weight in the essential graph)
    return S3.PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        s=jnp.asarray(ss, jnp.float32), R=jnp.asarray(np.array(Rs), jnp.float32),
        t=jnp.asarray(np.array(ts), jnp.float32),
        weight=jnp.asarray(w, jnp.float32),
    )


@jax.jit
def _apply_pose_graph(st: mapmod.MapState, s_f, R_f, t_f, valid_k):
    """Write optimized Sim3 poses back: Tcw' = [R | t/s] (the reference
    converts the corrected Sim3 back to SE3 dividing translation by
    scale, LoopClosing.cc:560-566) and move each landmark with its
    reference keyframe's correction."""
    kfs = st.kfs
    old_Tcw = kfs.Tcw
    K = s_f.shape[0]
    new_Tcw = jnp.tile(jnp.eye(4), (K, 1, 1))
    new_Tcw = new_Tcw.at[:, :3, :3].set(R_f)
    new_Tcw = new_Tcw.at[:, :3, 3].set(t_f / s_f[:, None])
    new_Tcw = jnp.where(valid_k[:, None, None], new_Tcw, old_Tcw[:K])

    # Landmark correction via the owning keyframe (first_kf), reference
    # LoopClosing.cc:520-556: map the point into the OLD camera frame
    # (SE3), then back out through the CORRECTED similarity:
    # X' = (1/s) R_f^T (pc - t_f). With the stored SE3 translation
    # tn = t_f / s this is X' = R_f^T (pc/s - tn).
    pts = st.pts
    ref = jnp.clip(pts.first_kf, 0, K - 1)
    To = old_Tcw[ref]
    pc = jnp.einsum("pij,pj->pi", To[:, :3, :3], pts.xyz) + To[:, :3, 3]
    Tn = new_Tcw[ref]
    Rn = Tn[:, :3, :3]
    tn = Tn[:, :3, 3]
    inv_s = (1.0 / s_f[ref])[:, None]
    xw = jnp.einsum("pji,pj->pi", Rn, pc * inv_s - tn)
    new_xyz = jnp.where(
        (pts.valid & valid_k[ref])[:, None], xw, pts.xyz
    )
    return st._replace(
        kfs=kfs._replace(Tcw=new_Tcw),
        pts=pts._replace(xyz=new_xyz),
    )


class LoopCloser:
    """Host orchestration of the loop-closing pipeline."""

    def __init__(self, system):
        self.sys = system
        self.consistent: list[tuple[set, int]] = []
        self.last_loop_kf = -100
        self.verified_loops: list[tuple[int, int]] = []
        self.corrections = 0

    # ------------------------------------------------------------------
    def on_keyframe(self, kf: int):
        sys = self.sys
        if sys.vocab is None or sys.n_kfs < 6:
            return
        if kf < self.last_loop_kf + 10:  # reference :117 mLastLoopKFid+10
            return
        from splslam_tpu.slam import reloc

        cov = np.array(_covisible_mask(sys.map, jnp.int32(kf)))
        cov[kf] = True
        query = sys.kf_bow[kf]
        # minScore: lowest BoW similarity within the covisible group
        # (reference :121-135).
        cov_idx = [c for c in range(sys.n_kfs) if cov[c] and c != kf]
        if not cov_idx:
            return
        from splslam_tpu.bow.vocabulary import score_l1

        cov_scores = np.asarray(score_l1(query, sys.kf_bow[jnp.asarray(cov_idx)]))
        min_score = float(cov_scores.min())
        scores = np.asarray(
            reloc.reloc_scores(
                sys.kf_bow, sys.map.kfs.valid, query, jnp.asarray(cov)
            )
        )[: sys.n_kfs]
        cands = [c for c in np.argsort(scores)[::-1]
                 if scores[c] >= max(min_score, 1e-3)]
        if not cands:
            self.consistent = []
            return

        # Temporal consistency over covisibility groups (reference
        # :152-211): a candidate survives when its group intersects a
        # group detected in each of the last CONSISTENCY_TH keyframes.
        new_groups: list[tuple[set, int]] = []
        ready: list[int] = []
        for c in cands[:5]:
            grp = set(np.nonzero(
                np.asarray(_covisible_mask(sys.map, jnp.int32(int(c))))
            )[0].tolist()) | {int(c)}
            best = 0
            for prev_grp, cnt in self.consistent:
                if grp & prev_grp:
                    best = max(best, cnt + 1)
            new_groups.append((grp, best))
            if best + 1 >= CONSISTENCY_TH:
                ready.append(int(c))
        self.consistent = new_groups

        for c in ready[:2]:
            if self._verify_and_close(kf, c):
                break

    # ------------------------------------------------------------------
    def _verify_and_close(self, kf: int, cand: int) -> bool:
        sys = self.sys
        from splslam_tpu.slam.system import Sensor

        K3 = jnp.asarray(
            np.array(
                [[sys.cam.fx, 0, sys.cam.cx],
                 [0, sys.cam.fy, sys.cam.cy], [0, 0, 1.0]], np.float32,
            )
        )
        fix_scale = sys.sensor in (Sensor.STEREO, Sensor.RGBD)
        n_m, n_opt, n_proj, (s, R, t) = compute_sim3_attempt(
            jax.random.PRNGKey(kf), sys.map, jnp.int32(kf), jnp.int32(cand),
            K3, jnp.float32(1.0 if fix_scale else 0.0),
        )
        if (int(n_m) < MIN_MATCHES or int(n_opt) < MIN_SIM3_INLIERS
                or int(n_proj) < MIN_PROJ_MATCHES):
            return False
        self.verified_loops.append((kf, cand))
        self.last_loop_kf = kf
        # The reference KILLS the pipeline here (ComputeSim3 returns false
        # after verification, src/LoopClosing.cc:390-392). Correction only
        # runs when explicitly enabled.
        if not sys.settings.enable_loop_correction:
            return True
        self._correct(kf, cand, (s, R, t))
        return True

    # ------------------------------------------------------------------
    def _correct(self, kf: int, cand: int, S12):
        """CorrectLoop: pose-graph optimization + landmark correction +
        global BA (reference :404-587, :647-751)."""
        sys = self.sys
        n = sys.n_kfs
        # loop edge measures S_kf,cand: relative similarity current<-loop.
        # Our pose-graph residual uses S_ji with i=kf, j=cand in CAMERA
        # frames: S12 maps cand-cam -> kf-cam, which IS S_ij relative.
        edges = _build_pose_graph_edges(sys.map, n, kf, cand, S12)
        K = sys.map.kfs.Tcw.shape[0]
        Tcw = sys.map.kfs.Tcw
        free = jnp.arange(K) < n
        free = free & (jnp.arange(K) != 0)
        s_all = jnp.ones((K,))
        s_f, R_f, t_f = S3.pose_graph_sim3(
            s_all, Tcw[:, :3, :3], Tcw[:, :3, 3],
            free, edges, iters=15,
            fix_scale=sys.sensor.name != "MONOCULAR",
        )
        sys.map = _apply_pose_graph(
            sys.map, s_f, R_f, t_f, jnp.arange(K) < n
        )
        self.corrections += 1
        sys.mapper.big_change_idx += 1
        # refresh host-side pose log for subsequent Tcr reconstruction
        kf_Tcw = np.asarray(sys.map.kfs.Tcw[:n])
        for k in range(n):
            sys.kf_pose_host[k] = kf_Tcw[k]
        if sys.step is not None:
            sys.step = sys.step._replace(
                lm_xyz=sys.map.pts.xyz[jnp.clip(sys.step.lm_gid, 0)],
                ll_mid=sys.map.lns.xyz[jnp.clip(sys.step.ll_gid, 0), 1],
            )

    # ------------------------------------------------------------------
    def run_global_ba(self, rounds: int = 2):
        """Full-map bundle adjustment (reference RunGlobalBundleAdjustment)
        with the matrix-free PCG solver."""
        sys = self.sys
        from splslam_tpu.optim.ba import BAProblem, ba_solve_pcg

        st = sys.map
        K = st.kfs.Tcw.shape[0]
        N = st.kfs.lm_idx.shape[1]
        lm_rows = st.kfs.lm_idx
        e_ok = (
            (lm_rows >= 0)
            & st.kfs.fvalid
            & st.pts.valid[jnp.clip(lm_rows, 0)]
            & st.kfs.valid[:, None]
        )
        prob = BAProblem(
            Tcw=st.kfs.Tcw,
            cam_free=st.kfs.valid & (jnp.arange(K) != 0),
            xyz=st.pts.xyz,
            lm_ok=st.pts.valid,
            e_cam=jnp.broadcast_to(
                jnp.arange(K, dtype=jnp.int32)[:, None], (K, N)
            ).reshape(-1),
            e_lm=jnp.clip(lm_rows, 0).reshape(-1),
            e_uv=st.kfs.xy.reshape(-1, 2),
            e_ur=jnp.where(e_ok, st.kfs.u_right, -1.0).reshape(-1),
            e_inv_sigma2=(1.0 / st.kfs.sigma2).reshape(-1),
            e_ok=e_ok.reshape(-1),
        )
        res = ba_solve_pcg(sys.cam, prob, rounds=rounds)
        sys.map = sys.map._replace(
            kfs=st.kfs._replace(Tcw=res.Tcw),
            pts=st.pts._replace(xyz=res.xyz),
        )
        n = sys.n_kfs
        kf_Tcw = np.asarray(sys.map.kfs.Tcw[:n])
        for k in range(n):
            sys.kf_pose_host[k] = kf_Tcw[k]
