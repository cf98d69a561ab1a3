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
    bow_mat: jax.Array,   # [K,W] keyframe BoW rows
    kf_valid: jax.Array,  # [K]
    query: jax.Array,     # [W]
    exclude: jax.Array,   # [K] bool — e.g. covisible KFs for loop queries
) -> jax.Array:
    s = jnp.sum(jnp.minimum(bow_mat, query[None, :]), axis=-1)
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
    kf_ll_mid: jax.Array,   # [Lk,3] their midpoints (world)
):
    """One relocalization attempt against one candidate keyframe.
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
    ll_mid = jnp.zeros((Lc, 3)).at[lcols].set(kf_ll_mid, mode="drop")

    T0, n0, inl0 = pnp_ransac(
        key, cam, frame.feat.xy, assoc_xyz, 1.0 / frame.feat.sigma2, has
    )
    # GN refinement with points + line midpoints — the reference's
    # PoseOptimizationmain after EPnP/EPnL.
    from splslam_tpu.optim.pose_gn import line_coefficients

    pts_obs = PointObs(
        xyz_w=assoc_xyz, uv=frame.feat.xy,
        inv_sigma2=1.0 / frame.feat.sigma2, mask=has & inl0,
    )
    ln_obs = LineObs(
        mid_w=ll_mid,
        coef=line_coefficients(frame.lines.seg),
        inv_sigma2=jnp.full((Lc,), 0.25),
        mask=(ll_gid >= 0) & frame.lines.valid,
    )
    res = pose_optimize(T0, cam, pts_obs, ln_obs)
    inlier = res.inlier_pt & has
    ln_in = res.inlier_ln & (ll_gid >= 0)
    return (
        res.Tcw,
        jnp.sum(inlier.astype(jnp.int32)),
        jnp.where(inlier, assoc_gid, -1),
        jnp.where(ln_in, ll_gid, -1),
    )
