"""Front-end tracking kernels: one jitted step per frame.

Re-expresses Tracking::TrackWithMotionModel + TrackLocalMap (reference:
src/Tracking.cc:1773-2108) as a single fused XLA program per frame:

  motion-model projection match (vs last frame's landmarks)
    -> pose GN (4x10, Huber, chi2 gates)
    -> local-map frustum cull + projection match (vs a padded window of
       covisible landmarks)
    -> pose GN again
    -> inlier counts + per-feature landmark associations.

The reference's per-cell candidate loops and point/line thread pairs
become masked distance matrices; its grid lookup becomes window masks.
Host code (slam/system.py) only consumes a handful of scalars per frame.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.ops import match as M
from splslam_tpu.optim.pose_gn import LineObs, PointObs, pose_optimize
from splslam_tpu.slam.frame import FrameData
from splslam_tpu.slam.map import predict_octave


class LocalWindow(NamedTuple):
    """Padded slice of the landmark table visible to the tracker."""

    ids: jax.Array     # [M] i32 global landmark ids (-1 pad)
    xyz: jax.Array     # [M,3]
    desc: jax.Array    # [M,8] u32
    normal: jax.Array  # [M,3]
    dmin: jax.Array    # [M]
    dmax: jax.Array    # [M]
    ok: jax.Array      # [M] bool


class TrackResult(NamedTuple):
    Tcw: jax.Array           # (4,4) final pose
    lm_gid: jax.Array        # [N] global landmark id per cur keypoint (-1)
    inlier: jax.Array        # [N] bool (has landmark & survived final GN)
    n_mm_matches: jax.Array  # matches from the motion model stage
    n_inliers: jax.Array     # final inlier count (mnMatchesInliers)
    visible_ids: jax.Array   # [M] local ids seen in frustum (-1 where not)
    found_ids: jax.Array     # [M] local ids actually matched (-1 where not)


def _resolve_columns(matches: jax.Array, dists: jax.Array, n_cols: int):
    """Row->col matches may collide on a column; keep the best row per col.

    Returns row->col matches with losers set to -1. Uses a composite
    integer key (dist * R + row) scatter-min so ties break deterministically.
    """
    rows = jnp.arange(matches.shape[0], dtype=jnp.int32)
    R = matches.shape[0]
    ok = matches >= 0
    key = dists.astype(jnp.int32) * R + rows
    col_key = jnp.full((n_cols,), jnp.iinfo(jnp.int32).max, jnp.int32)
    col_key = col_key.at[jnp.where(ok, matches, n_cols)].min(
        jnp.where(ok, key, jnp.iinfo(jnp.int32).max), mode="drop"
    )
    win = ok & (col_key[jnp.clip(matches, 0)] == key)
    return jnp.where(win, matches, -1)


def _project(Tcw, cam: Camera, xyz):
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = xyz @ R.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * pc[:, 0] / zs + cam.cx
    v = cam.fy * pc[:, 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1), z


def _in_img(cam: Camera, uv, border=0.0):
    return (
        (uv[:, 0] >= border)
        & (uv[:, 0] < cam.width - border)
        & (uv[:, 1] >= border)
        & (uv[:, 1] < cam.height - border)
    )


def motion_model_match(
    cam: Camera,
    scales: jax.Array,
    T_pred: jax.Array,
    cur: FrameData,
    last_xy: jax.Array,
    last_octave: jax.Array,
    last_angle: jax.Array,
    last_desc: jax.Array,
    last_lm_xyz: jax.Array,
    last_lm_ok: jax.Array,
    th: float,
) -> tuple[jax.Array, jax.Array]:
    """SearchByProjection(cur, last, th) (reference ORBmatcher.cc): project
    last frame's landmarks with the predicted pose, window-search in the
    current frame. Returns (row->col matches [N_last], dists)."""
    uv_pred, z = _project(T_pred, cam, last_lm_xyz)
    row_ok = last_lm_ok & (z > 0.1) & _in_img(cam, uv_pred)
    radius = th * scales[last_octave]
    win = M.window_mask(uv_pred, cur.feat.xy, radius)
    oct_ok = M.octave_mask(last_octave, cur.feat.octave, -1, 1)
    dist = M.hamming_matrix(last_desc, cur.feat.desc)
    dist = M.masked_distances(dist, row_ok, cur.feat.valid, win & oct_ok)
    mt, md = M.nn_match(dist, max_dist=M.TH_HIGH)
    mt = M.rotation_consistency(last_angle, cur.feat.angle, mt)
    mt = _resolve_columns(mt, md, cur.feat.capacity)
    return mt, md


def local_map_match(
    cam: Camera,
    scales: jax.Array,
    Tcw: jax.Array,
    cur: FrameData,
    win: LocalWindow,
    already: jax.Array,
    scale_factor: float,
    n_levels: int,
    th: float = 4.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SearchLocalPoints + SearchByProjection(F, vpMapPoints)
    (reference Tracking.cc:2438-2520, ORBmatcher.cc:54): frustum cull the
    window, project, window-search unmatched keypoints.

    Returns (matches [M] row->cur-col, visible [M], dists [M])."""
    uv, z = _project(Tcw, cam, win.xyz)
    Twc_t = -Tcw[:3, :3].T @ Tcw[:3, 3]
    view = win.xyz - Twc_t
    dist3 = jnp.linalg.norm(view, axis=-1)
    viewcos = jnp.sum(view * win.normal, axis=-1) / jnp.maximum(dist3, 1e-9)
    visible = (
        win.ok
        & (z > 0.1)
        & _in_img(cam, uv)
        & (dist3 > 0.8 * win.dmin)
        & (dist3 < 1.2 * win.dmax)
        & (viewcos > 0.5)
    )
    pred_oct = predict_octave(dist3, win.dmax, scale_factor, n_levels)
    radius = jnp.where(viewcos > 0.998, 2.5, th) * scales[pred_oct]
    wmask = M.window_mask(uv, cur.feat.xy, radius)
    omask = M.octave_mask(pred_oct, cur.feat.octave, -1, 1)
    dist = M.hamming_matrix(win.desc, cur.feat.desc)
    dist = M.masked_distances(
        dist, visible, cur.feat.valid & ~already, wmask & omask
    )
    mt, md = M.nn_match(dist, max_dist=M.TH_HIGH, ratio=0.8)
    mt = _resolve_columns(mt, md, cur.feat.capacity)
    return mt, visible, md


@partial(
    jax.jit,
    static_argnames=("scale_factor", "n_levels", "th_motion", "th_local"),
)
def track_step(
    cam: Camera,
    scales: jax.Array,
    cur: FrameData,
    last_xy: jax.Array,
    last_octave: jax.Array,
    last_angle: jax.Array,
    last_desc: jax.Array,
    last_lm_xyz: jax.Array,
    last_lm_gid: jax.Array,
    T_pred: jax.Array,
    win: LocalWindow,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th_motion: float = 7.0,
    th_local: float = 4.0,
) -> TrackResult:
    """One full tracking step (motion-model + local map). Point-only path
    (the stereo/RGB-D behavior envelope of the reference)."""
    N = cur.feat.capacity
    inv_sig2 = 1.0 / cur.feat.sigma2

    # ---- stage 1: motion model ----
    last_lm_ok = last_lm_gid >= 0
    mm, mm_d = motion_model_match(
        cam, scales, T_pred, cur, last_xy, last_octave, last_angle,
        last_desc, last_lm_xyz, last_lm_ok, th_motion,
    )
    # Per-cur-feature association from stage 1.
    assoc_gid = jnp.full((N,), -1, jnp.int32)
    assoc_xyz = jnp.zeros((N, 3))
    rows_ok = mm >= 0
    cols = jnp.where(rows_ok, mm, N)
    assoc_gid = assoc_gid.at[cols].set(
        jnp.where(rows_ok, last_lm_gid, -1), mode="drop"
    )
    assoc_xyz = assoc_xyz.at[cols].set(last_lm_xyz, mode="drop")
    n_mm = jnp.sum(rows_ok.astype(jnp.int32))

    pts_obs = PointObs(
        xyz_w=assoc_xyz,
        uv=cur.feat.xy,
        inv_sigma2=inv_sig2,
        mask=assoc_gid >= 0,
    )
    no_lines = LineObs.empty(1)
    res1 = pose_optimize(T_pred, cam, pts_obs, no_lines)
    # Drop stage-1 outliers (reference discards chi2 outliers after the
    # motion-model optimization before local-map search).
    assoc_gid = jnp.where(res1.inlier_pt, assoc_gid, -1)

    # ---- stage 2: local map ----
    lm_mt, lm_visible, lm_d = local_map_match(
        cam, scales, res1.Tcw, cur, win, assoc_gid >= 0,
        scale_factor, n_levels, th_local,
    )
    lrows_ok = lm_mt >= 0
    lcols = jnp.where(lrows_ok, lm_mt, N)
    assoc_gid2 = assoc_gid.at[lcols].set(
        jnp.where(lrows_ok, win.ids, -1), mode="drop"
    )
    assoc_xyz2 = assoc_xyz.at[lcols].set(win.xyz, mode="drop")

    pts_obs2 = PointObs(
        xyz_w=assoc_xyz2,
        uv=cur.feat.xy,
        inv_sigma2=inv_sig2,
        mask=assoc_gid2 >= 0,
    )
    res2 = pose_optimize(res1.Tcw, cam, pts_obs2, no_lines)
    inlier = res2.inlier_pt & (assoc_gid2 >= 0)
    lm_gid = jnp.where(inlier, assoc_gid2, -1)

    found_local = lrows_ok & (res2.inlier_pt[jnp.clip(lm_mt, 0)])
    return TrackResult(
        Tcw=res2.Tcw,
        lm_gid=lm_gid,
        inlier=inlier,
        n_mm_matches=n_mm,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        visible_ids=jnp.where(lm_visible, win.ids, -1),
        found_ids=jnp.where(found_local, win.ids, -1),
    )


@jax.jit
def bow_free_refkf_match(
    cam: Camera,
    cur: FrameData,
    kf_desc: jax.Array,
    kf_angle: jax.Array,
    kf_valid: jax.Array,
    kf_lm_gid: jax.Array,
    kf_lm_xyz: jax.Array,
    T_init: jax.Array,
) -> TrackResult:
    """TrackReferenceKeyFrame fallback (reference Tracking.cc:1570-1614):
    global descriptor match against the reference keyframe (mutual NN +
    ratio + rotation consistency; the reference restricts candidates by
    shared BoW nodes — here the full MXU distance matrix is cheap enough
    to skip the restriction) followed by pose optimization."""
    N = cur.feat.capacity
    row_ok = kf_valid & (kf_lm_gid >= 0)
    dist = M.hamming_matrix(kf_desc, cur.feat.desc)
    dist = M.masked_distances(dist, row_ok, cur.feat.valid)
    mt, md = M.nn_match(dist, max_dist=M.TH_LOW, ratio=0.7, mutual=True)
    mt = M.rotation_consistency(kf_angle, cur.feat.angle, mt)
    mt = _resolve_columns(mt, md, N)
    rows_ok = mt >= 0
    cols = jnp.where(rows_ok, mt, N)
    assoc_gid = jnp.full((N,), -1, jnp.int32).at[cols].set(
        jnp.where(rows_ok, kf_lm_gid, -1), mode="drop"
    )
    assoc_xyz = jnp.zeros((N, 3)).at[cols].set(kf_lm_xyz, mode="drop")
    pts_obs = PointObs(
        xyz_w=assoc_xyz,
        uv=cur.feat.xy,
        inv_sigma2=1.0 / cur.feat.sigma2,
        mask=assoc_gid >= 0,
    )
    res = pose_optimize(T_init, cam, pts_obs, LineObs.empty(1))
    inlier = res.inlier_pt & (assoc_gid >= 0)
    e = jnp.full((1,), -1, jnp.int32)
    return TrackResult(
        Tcw=res.Tcw,
        lm_gid=jnp.where(inlier, assoc_gid, -1),
        inlier=inlier,
        n_mm_matches=jnp.sum(rows_ok.astype(jnp.int32)),
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        visible_ids=e,
        found_ids=e,
    )
