"""Relocalization: BoW candidate retrieval + batched PnP RANSAC.

Re-expresses the reference's LOST recovery (Tracking::Relocalization,
src/Tracking.cc:2895-3062, and RelocalizationBoth :3064-3312 with EPnL):

- candidates from the keyframe database: dense BoW score of the query
  frame against every keyframe's BoW row (KeyFrameDatabase::
  DetectRelocalizationCandidates, src/KeyFrameDatabase.cc:171-233 —
  the share-words/0.8*maxCommon/covisibility-accumulation staging
  collapses into one masked score pass over the dense [K,W] matrix);
- per candidate: global descriptor match against the keyframe's
  landmarks (the reference's SearchByBoW restricts to shared tree nodes
  as a CPU optimization; the MXU distance matrix needs no restriction);
- pose from a vmapped minimal-DLT PnP RANSAC (the reference uses EPnP
  control points, src/PnPsolver.cc:367-447 — hypotheses here are 6-point
  DLT solves, hundreds scored in one batched pass) + GN refinement with
  the matched landmarks (and line midpoints when usingLine — the
  EPnL-style line residuals enter the refinement stage);
- accept at >= 50 inliers (reference :3049).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.ops import match as M
from splslam_tpu.optim.pose_gn import LineObs, PointObs, pose_optimize
from splslam_tpu.slam.frame import FrameData


@jax.jit
def reloc_scores(
    bow_ids: jax.Array,   # [K,S] sparse keyframe word ids (BowTable)
    bow_vals: jax.Array,  # [K,S] tf-idf values
    kf_valid: jax.Array,  # [K]
    query: jax.Array,     # [W] dense L1-normalized query
    exclude: jax.Array,   # [K] bool — e.g. covisible KFs for loop queries
) -> jax.Array:
    from splslam_tpu.bow.vocabulary import score_rows

    s = score_rows(bow_ids, bow_vals, query)
    return jnp.where(kf_valid & ~exclude, s, -1.0)


def _dlt_pnp(uvn: jax.Array, X: jax.Array) -> jax.Array:
    """Minimal DLT pose from 6 normalized-image points ([6,2],[6,3]) ->
    Tcw (4,4). Orthonormalizes the rotation and fixes cheirality."""
    x, y = uvn[:, 0], uvn[:, 1]
    Xh = jnp.concatenate([X, jnp.ones((6, 1))], axis=-1)  # [6,4]
    z = jnp.zeros((6, 4))
    r1 = jnp.concatenate([Xh, z, -x[:, None] * Xh], axis=-1)
    r2 = jnp.concatenate([z, Xh, -y[:, None] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [12,12]
    _, _, vt = jnp.linalg.svd(A)
    P = vt[-1].reshape(3, 4)
    # The nullspace vector is defined up to sign; pick the sign that
    # makes det(M) > 0 so the polar factor is a proper rotation. With
    # that fixed, cheirality is determined — a sample with points behind
    # the camera is simply a bad hypothesis and scores 0 inliers.
    P = P * jnp.sign(jnp.linalg.det(P[:, :3]))
    U, s, Vt = jnp.linalg.svd(P[:, :3])
    R = U @ Vt
    t = P[:, 3] / jnp.maximum(jnp.mean(s), 1e-12)
    return jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)


@partial(jax.jit, static_argnames=("n_hyp",))
def pnp_ransac(
    key: jax.Array,
    cam: Camera,
    uv: jax.Array,          # [N,2] observed pixels
    xyz: jax.Array,         # [N,3] matched landmark positions
    inv_sigma2: jax.Array,  # [N]
    mask: jax.Array,        # [N] bool — correspondence exists
    n_hyp: int = 192,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Vmapped minimal PnP RANSAC. Returns (Tcw, n_inliers, inlier_mask)."""
    N = uv.shape[0]
    uvn = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], axis=-1
    )
    logits = jnp.where(mask, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, N)) + logits[None]
    _, samples = jax.lax.top_k(g, 6)  # [n_hyp, 6]

    def per_hyp(idx):
        T = _dlt_pnp(uvn[idx], xyz[idx])
        R = T[:3, :3]
        t = T[:3, 3]
        pc = xyz @ R.T + t
        zs = jnp.where(pc[:, 2] > 1e-6, pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        chi2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
        inl = mask & (pc[:, 2] > 1e-6) & (chi2 <= 5.991)
        return T, jnp.sum(inl.astype(jnp.int32))

    Ts, counts = jax.vmap(per_hyp)(samples)
    best = jnp.argmax(counts)
    T = Ts[best]
    # final inlier set of the winning hypothesis
    R = T[:3, :3]
    t = T[:3, 3]
    pc = xyz @ R.T + t
    zs = jnp.where(pc[:, 2] > 1e-6, pc[:, 2], 1e-6)
    u = cam.fx * pc[:, 0] / zs + cam.cx
    v = cam.fy * pc[:, 1] / zs + cam.cy
    chi2 = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) * inv_sigma2
    inl = mask & (pc[:, 2] > 1e-6) & (chi2 <= 5.991)
    return T, counts[best], inl


def _dlt_pose_from_lines(coef_n: jax.Array, X3: jax.Array) -> jax.Array:
    """Minimal pose from 6 line correspondences, start+end 3D points each
    ([6,3] normalized line coefs, [6,2,3] start/end world points) ->
    Tcw (4,4). Each 3D point on the observed 2D line contributes one
    linear constraint l'·(P X_h) = 0; collinear points only give 2
    independent constraints per line, so 6 lines supply the 12 (>= 11
    needed) equations for the DLT on the 12 P entries (the TPU-native
    equivalent of the reference's EPnL control-point solve,
    src/PnPsolver.cc:960 compute_pose_Lines)."""
    Xf = X3.reshape(12, 3)
    lf = jnp.repeat(coef_n, 2, axis=0)                 # [12,3]
    Xh = jnp.concatenate([Xf, jnp.ones((12, 1))], -1)  # [12,4]
    A = jnp.concatenate(
        [lf[:, 0:1] * Xh, lf[:, 1:2] * Xh, lf[:, 2:3] * Xh], axis=-1
    )                                                   # [12,12]
    _, _, vt = jnp.linalg.svd(A)
    P = vt[-1].reshape(3, 4)
    P = P * jnp.sign(jnp.linalg.det(P[:, :3]))
    U, s, Vt = jnp.linalg.svd(P[:, :3])
    R = U @ Vt
    t = P[:, 3] / jnp.maximum(jnp.mean(s), 1e-12)
    return jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)


@partial(jax.jit, static_argnames=("n_hyp",))
def epnl_ransac(
    key: jax.Array,
    cam: Camera,
    coef: jax.Array,         # [L,3] observed normalized line coefficients
    xyz3: jax.Array,         # [L,3,3] matched map-line start/mid/end (world)
    mask: jax.Array,         # [L] bool — correspondence exists
    n_hyp: int = 128,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Line-only minimal RANSAC (the reference's EPnL,
    PnPsolver::iterateLines src/PnPsolver.cc:367-447): 6-line hypotheses
    (each line contributes 2 DLT rows via its endpoints, so 6 lines give
    a comfortably overdetermined 12x12 system; the reference samples 4
    with its control-point parameterization), scored by the midpoint
    line-coefficient residual at
    the 1-dof chi2 3.841 gate (SetRansacParametersLines :70-71,
    CheckInlierLines :610). Returns (Tcw, n_inliers, inlier_mask)."""
    L = coef.shape[0]
    # lines in normalized image coords: l' = K^T l (so l'·[xn,yn,1] ∝
    # l·[u,v,1]); renormalize to lx'^2+ly'^2=1 for pixel-comparable
    # residual scoring.
    lp = jnp.stack(
        [coef[:, 0] * cam.fx, coef[:, 1] * cam.fy,
         coef[:, 0] * cam.cx + coef[:, 1] * cam.cy + coef[:, 2]], axis=-1
    )
    logits = jnp.where(mask, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, L)) + logits[None]
    _, samples = jax.lax.top_k(g, 6)  # [n_hyp, 6]

    def resid(T):
        mid = xyz3[:, 1]
        pc = mid @ T[:3, :3].T + T[:3, 3]
        zs = jnp.where(pc[:, 2] > 1e-6, pc[:, 2], 1e-6)
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        r = coef[:, 0] * u + coef[:, 1] * v + coef[:, 2]
        # sigma ~2 px on line-midpoint residuals
        return (r * r) * 0.25, pc[:, 2] > 1e-6

    def per_hyp(idx):
        T = _dlt_pose_from_lines(lp[idx], xyz3[idx][:, (0, 2), :])
        chi2, z_ok = resid(T)
        inl = mask & z_ok & (chi2 <= 3.841)
        return T, jnp.sum(inl.astype(jnp.int32))

    Ts, counts = jax.vmap(per_hyp)(samples)
    best = jnp.argmax(counts)
    T = Ts[best]
    chi2, z_ok = resid(T)
    inl = mask & z_ok & (chi2 <= 3.841)
    return T, counts[best], inl


@jax.jit
def reloc_attempt(
    key: jax.Array,
    cam: Camera,
    frame: FrameData,
    kf_desc: jax.Array,     # [N,8] candidate keyframe descriptors
    kf_fvalid: jax.Array,   # [N]
    kf_lm: jax.Array,       # [N] landmark ids (-1 none)
    kf_lm_xyz: jax.Array,   # [N,3]
    kf_ldesc: jax.Array,    # [Lk,8] candidate keyframe LBD descriptors
    kf_ll: jax.Array,       # [Lk] map-line ids (-1 none)
    kf_ll_xyz3: jax.Array,  # [Lk,3,3] their start/mid/end (world)
):
    """One relocalization attempt against one candidate keyframe — the
    reference's RelocalizationBoth staging (src/Tracking.cc:3064-3314):
    point EPnP RANSAC ∥ line EPnL RANSAC (the better seed wins), joint
    point+line GN, then a staged projection-search escalation that
    re-matches the candidate's landmarks by projection when the inlier
    count lands between 10 and 50 (:3236-3297, the wider second window
    is RelocalizationBothTwiceSearch :3314).
    Returns (Tcw, n_inliers, lm_gid [N], ll_gid [Lc])."""
    N = frame.feat.capacity
    Lc = frame.lines.capacity
    # Global descriptor match (SearchByBoW equivalent).
    dist = M.hamming_mixed(frame.feat.bits, kf_desc).T  # [N_kf, N_cur]
    dist = M.masked_distances(dist, kf_fvalid & (kf_lm >= 0), frame.feat.valid)
    mt, md = M.nn_match(dist, max_dist=M.TH_LOW, ratio=0.75, mutual=True)
    rows_ok = mt >= 0
    cols = jnp.where(rows_ok, mt, N)
    assoc_gid = jnp.full((N,), -1, jnp.int32).at[cols].set(
        jnp.where(rows_ok, kf_lm, -1), mode="drop"
    )
    assoc_xyz = jnp.zeros((N, 3)).at[cols].set(kf_lm_xyz, mode="drop")
    has = assoc_gid >= 0

    # Line KNN match vs the candidate's map-lines (the reference's
    # SearchByKNNLines thread pair, src/Tracking.cc:3115-3121).
    ldist = M.hamming_matrix(kf_ldesc, frame.lines.desc)
    ldist = M.masked_distances(ldist, kf_ll >= 0, frame.lines.valid)
    lmt, _ = M.nn_match(ldist, max_dist=M.TH_HIGH, mutual=True)
    lrows = lmt >= 0
    lcols = jnp.where(lrows, lmt, Lc)
    ll_gid = jnp.full((Lc,), -1, jnp.int32).at[lcols].set(
        jnp.where(lrows, kf_ll, -1), mode="drop"
    )
    ll_xyz3 = jnp.zeros((Lc, 3, 3)).at[lcols].set(kf_ll_xyz3, mode="drop")
    ll_mid = ll_xyz3[:, 1]

    from splslam_tpu.optim.pose_gn import line_coefficients

    coef = line_coefficients(frame.lines.seg)

    # --- seed A: point EPnP-style RANSAC ---
    T0, n0, inl0 = pnp_ransac(
        key, cam, frame.feat.xy, assoc_xyz, 1.0 / frame.feat.sigma2, has
    )
    # --- seed B: line EPnL RANSAC (only meaningful with line tables) ---
    if Lc > 1:
        TL, nL, inlL = epnl_ransac(
            jax.random.fold_in(key, 1), cam, coef, ll_xyz3,
            (ll_gid >= 0) & frame.lines.valid,
        )
        # The point seed anchors 2-dof per inlier vs 1-dof for lines;
        # prefer points unless they are weak (reference escalates to
        # EPnL when EPnP fails, :3160-3235).
        use_lines = (n0 < 12) & (nL >= 6) & (2 * nL > n0)
        T0 = jnp.where(use_lines, TL, T0)
        # Under a line seed, points re-enter the joint GN only if they
        # REPROJECT consistently under that seed (loose 3x chi2 gate) — a
        # blanket reset to all-inliers would let a bad line seed plus a
        # permissive point set drag the GN to a wrong basin; a wrong seed
        # now keeps ~zero point support and the attempt dies at the >= 50
        # acceptance gate instead of relocalizing confidently wrong.
        uvL, zL = _project_pts(TL, cam, assoc_xyz)
        chiL = (
            jnp.sum((uvL - frame.feat.xy) ** 2, axis=-1)
            / frame.feat.sigma2
        )
        pts_ok_under_L = has & (zL > 0.1) & (chiL <= 3.0 * 5.991)
        inl0 = jnp.where(use_lines, pts_ok_under_L, inl0)

    # --- joint GN (PoseOptimizationmain after EPnP/EPnL) ---
    pts_obs = PointObs(
        xyz_w=assoc_xyz, uv=frame.feat.xy,
        inv_sigma2=1.0 / frame.feat.sigma2, mask=has & inl0,
        ur=frame.u_right,
    )
    ln_obs = LineObs(
        mid_w=ll_mid,
        coef=coef,
        inv_sigma2=jnp.full((Lc,), 0.25),
        mask=(ll_gid >= 0) & frame.lines.valid,
    )
    res = pose_optimize(T0, cam, pts_obs, ln_obs)
    inlier = res.inlier_pt & has
    n_in = jnp.sum(inlier.astype(jnp.int32))

    # --- staged projection-search escalation (:3236-3314) ---
    def proj_round(Tcw, assoc_gid_c, assoc_xyz_c, window):
        uv, z = _project_pts(Tcw, cam, kf_lm_xyz)
        row_ok = (kf_lm >= 0) & kf_fvalid & (z > 0.1)
        already_col = assoc_gid_c >= 0
        wmask = M.window_mask(uv, frame.feat.xy, window)
        d2 = M.hamming_mixed(frame.feat.bits, kf_desc).T
        d2 = M.masked_distances(
            d2, row_ok, frame.feat.valid & ~already_col, wmask
        )
        mt2, _ = M.nn_match(d2, max_dist=M.TH_HIGH)
        ok2 = mt2 >= 0
        c2 = jnp.where(ok2, mt2, N)
        gid = assoc_gid_c.at[c2].set(
            jnp.where(ok2, kf_lm, -1), mode="drop"
        )
        xyz = assoc_xyz_c.at[c2].set(kf_lm_xyz, mode="drop")
        obs = PointObs(
            xyz_w=xyz, uv=frame.feat.xy,
            inv_sigma2=1.0 / frame.feat.sigma2, mask=gid >= 0,
            ur=frame.u_right,
        )
        r = pose_optimize(Tcw, cam, obs, ln_obs)
        return r, gid, xyz

    short = (n_in < 50) & (n_in >= 8)
    res2, gid2, xyz2 = proj_round(res.Tcw, assoc_gid, assoc_xyz, 10.0)
    n2 = jnp.sum((res2.inlier_pt & (gid2 >= 0)).astype(jnp.int32))
    # TwiceSearch: wider window when still short
    res3, gid3, xyz3b = proj_round(res2.Tcw, gid2, xyz2, 16.0)
    n3 = jnp.sum((res3.inlier_pt & (gid3 >= 0)).astype(jnp.int32))
    use3 = short & (n2 < 50) & (n3 > n2)
    use2 = short & ~use3 & (n2 > n_in)

    def pick(a, b, c):
        return jnp.where(use3, c, jnp.where(use2, b, a))

    T_f = pick(res.Tcw, res2.Tcw, res3.Tcw)
    gid_f = pick(jnp.where(inlier, assoc_gid, -1),
                 jnp.where(res2.inlier_pt & (gid2 >= 0), gid2, -1),
                 jnp.where(res3.inlier_pt & (gid3 >= 0), gid3, -1))
    n_f = pick(n_in, n2, n3)
    ln_f = pick(res.inlier_ln, res2.inlier_ln, res3.inlier_ln)
    ln_in = ln_f & (ll_gid >= 0)
    return (
        T_f,
        n_f,
        gid_f,
        jnp.where(ln_in, ll_gid, -1),
    )


def _project_pts(Tcw, cam: Camera, xyz):
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = xyz @ R.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pc[:, 0] / zs + cam.cx
    v = cam.fy * pc[:, 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1), z
