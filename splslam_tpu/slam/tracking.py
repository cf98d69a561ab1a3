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


class LineWindow(NamedTuple):
    """Padded slice of the MAP-LINE table visible to the tracker
    (reference UpdateLocalMapLines, src/Tracking.cc:2012-2022)."""

    ids: jax.Array      # [Q] i32 global map-line ids (-1 pad)
    xyz: jax.Array      # [Q,3,3] start/mid/end world points
    desc: jax.Array     # [Q,8] u32 LBD
    avg_len: jax.Array  # [Q] average observed 2D length (match gate,
    #                     reference MapLine::m2DLineLengthAverage)
    ok: jax.Array       # [Q] bool

    @staticmethod
    def empty(q: int) -> "LineWindow":
        return LineWindow(
            ids=jnp.full((q,), -1, jnp.int32),
            xyz=jnp.zeros((q, 3, 3)),
            desc=jnp.zeros((q, 8), jnp.uint32),
            avg_len=jnp.zeros((q,)),
            ok=jnp.zeros((q,), bool),
        )


class TrackResult(NamedTuple):
    Tcw: jax.Array           # (4,4) final pose
    lm_gid: jax.Array        # [N] global landmark id per cur keypoint (-1)
    inlier: jax.Array        # [N] bool (has landmark & survived final GN)
    n_mm_matches: jax.Array  # matches from the motion model stage
    n_inliers: jax.Array     # final inlier count (mnMatchesInliers)
    visible_ids: jax.Array   # [M] local ids seen in frustum (-1 where not)
    found_ids: jax.Array     # [M] local ids actually matched (-1 where not)
    # line modality (capacity-1 placeholders when lines are off)
    ll_gid: jax.Array        # [L] map-line id per cur line feature (-1)
    ln_inlier: jax.Array     # [L] bool
    n_ln_inliers: jax.Array  # final line inlier count


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


def _ur_gate(cam: Camera, uv_pred, z, cur_ur, radius):
    """Stereo right-coordinate candidate gate (reference
    SearchByProjection, src/ORBmatcher.cc: for keypoints with
    mvuRight > 0, require |u_pred - bf/z - mvuRight| <= radius).
    Candidates whose OWN stereo depth contradicts the projected map
    point's depth are wrong matches regardless of descriptor distance —
    on self-similar texture this gate removes most of the wrong-match
    drag on the pose solve. Mono keypoints (ur < 0) are exempt."""
    ur_pred = uv_pred[:, 0] - cam.bf / jnp.maximum(z, 1e-6)
    err = jnp.abs(ur_pred[:, None] - cur_ur[None, :])
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    return (cur_ur[None, :] < 0) | (err <= r)


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
    last_bits: jax.Array,
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
    ur_ok = _ur_gate(cam, uv_pred, z, cur.u_right, radius)
    dist = M.hamming_from_bits(last_bits, cur.feat.bits)
    dist = M.masked_distances(dist, row_ok, cur.feat.valid,
                              win & oct_ok & ur_ok)
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
    ur_ok = _ur_gate(cam, uv, z, cur.u_right, radius)
    dist = M.hamming_mixed(cur.feat.bits, win.desc).T
    dist = M.masked_distances(
        dist, visible, cur.feat.valid & ~already, wmask & omask & ur_ok
    )
    mt, md = M.nn_match(dist, max_dist=M.TH_HIGH, ratio=0.8)
    mt = _resolve_columns(mt, md, cur.feat.capacity)
    return mt, visible, md


def line_projection_match(
    cam: Camera,
    Tcw: jax.Array,
    cur_lines,                # LineFeatures of the current frame
    xyz3_w: jax.Array,        # [Q,3,3] map-line start/mid/end (world)
    desc: jax.Array,          # [Q,8]
    avg_len: jax.Array,       # [Q] average observed 2D length
    row_ok: jax.Array,        # [Q] candidate mask
    already: jax.Array,       # [Lc] cur line features already matched
    perp_r: float = 8.0,
    ang_tol: float = 0.2,
    along_slack: float = 48.0,
    len_err: float = 1.5,
) -> tuple[jax.Array, jax.Array]:
    """Line matcher keyed on LINE GEOMETRY (behavior contract: reference
    Linematcher::SearchByProjection, src/Linematcher.cc:289-435, which
    windows on projected MIDPOINTS). Our detector recovers fragments of
    long edges whose extent — and therefore midpoint — wobbles along the
    line between frames while the line's perpendicular position and
    direction stay put, so the candidate window here is: current-line
    midpoint within `perp_r` px of the PROJECTED 3D LINE, direction
    agreement within `ang_tol`, spans within `along_slack` of
    overlapping (measured matcher recall 0.29 -> 0.8+ on grid scenes).
    The reference's average-2D-length consistency gate (mflengtherr,
    m2DLineLengthAverage) is kept but loosened for the same reason.
    Returns (row->cur matches [Q], dists)."""
    uv_m, z_m = _project(Tcw, cam, xyz3_w[:, 1])
    uv_s, z_s = _project(Tcw, cam, xyz3_w[:, 0])
    uv_e, z_e = _project(Tcw, cam, xyz3_w[:, 2])
    ok = row_ok & (z_m > 0.1) & _in_img(cam, uv_m)
    d2 = uv_e - uv_s
    L2d = jnp.linalg.norm(d2, axis=-1)
    safe = jnp.maximum(L2d, 1e-6)[:, None]
    dv = d2 / safe                                   # [Q,2] unit direction
    nv = jnp.stack([-dv[:, 1], dv[:, 0]], axis=-1)   # unit normal
    rel = cur_lines.midpoint[None, :, :] - uv_m[:, None, :]  # [Q,Lc,2]
    perp = jnp.abs(jnp.sum(rel * nv[:, None, :], axis=-1))
    along = jnp.abs(jnp.sum(rel * dv[:, None, :], axis=-1))
    proj_ang = jnp.arctan2(d2[:, 1], d2[:, 0])
    dang = jnp.mod(proj_ang[:, None] - cur_lines.angle[None, :], jnp.pi)
    ang_ok = jnp.minimum(dang, jnp.pi - dang) < ang_tol
    along_ok = along < 0.5 * (L2d[:, None] + cur_lines.length[None, :]) \
        + along_slack
    line_win = (perp < perp_r) & ang_ok & along_ok
    # Degenerate projection (line points into the camera): fall back to
    # a plain midpoint window.
    degen = (L2d < 8.0) | (z_s <= 0.1) | (z_e <= 0.1)
    mid_win = M.window_mask(uv_m, cur_lines.midpoint, 15.0)
    win = jnp.where(degen[:, None], mid_win, line_win)
    # Relative length-consistency gate (reference mflengtherr), loosened.
    rel_len = jnp.abs(cur_lines.length[None, :] - avg_len[:, None]) \
        / jnp.maximum(avg_len[:, None], 1e-6)
    len_ok = rel_len < len_err
    dist = M.hamming_matrix(desc, cur_lines.desc)
    d = M.masked_distances(
        dist, ok, cur_lines.valid & ~already, win & len_ok
    )
    mt, md = M.nn_match(d, max_dist=M.TH_HIGH)
    mt = _resolve_columns(mt, md, cur_lines.capacity)
    return mt, md


def _line_obs_from_assoc(cur_lines, ll_gid, ll_mid_xyz):
    """Build the pose-opt LineObs table from per-feature associations.
    Line midpoint residuals get a 2 px sigma (the detector's endpoints
    are less repeatable than corner keypoints)."""
    coef = _line_coefs(cur_lines.seg)
    return LineObs(
        mid_w=ll_mid_xyz,
        coef=coef,
        inv_sigma2=jnp.full_like(cur_lines.length, 0.25),
        mask=(ll_gid >= 0) & cur_lines.valid,
    )


def _line_coefs(seg: jax.Array) -> jax.Array:
    from splslam_tpu.optim.pose_gn import line_coefficients

    return line_coefficients(seg)


@partial(
    jax.jit,
    static_argnames=("scale_factor", "n_levels", "th_motion", "th_local",
                     "gn_rounds", "gn_iters"),
)
def track_step(
    cam: Camera,
    scales: jax.Array,
    cur: FrameData,
    last_xy: jax.Array,
    last_octave: jax.Array,
    last_angle: jax.Array,
    last_bits: jax.Array,
    last_lm_xyz: jax.Array,
    last_lm_gid: jax.Array,
    T_pred: jax.Array,
    win: LocalWindow,
    last_lines,               # LineFeatures of the previous frame
    last_ll_gid: jax.Array,   # [Lc] map-line ids of last frame's lines
    last_ll_xyz3: jax.Array,  # [Lc,3,3] their start/mid/end world points
    last_ll_len: jax.Array,   # [Lc] their average 2D lengths
    lwin: LineWindow,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th_motion: float = 7.0,
    th_local: float = 4.0,
    gn_rounds: int = 4,
    gn_iters: int = 6,
) -> TrackResult:
    """One full tracking step: the reference's TrackWithMotionModel(Both) +
    TrackLocalMap(Both) (src/Tracking.cc:1773-2108, :1836-1899, :2009-2053)
    as one fused program. Line stages run on the same arrays; with empty
    line tables they are no-ops, which reproduces the reference's
    point-only stereo envelope.

    The reference's 3-branch optimizer selection (main / double-points /
    low-feature, Tracking.cc:1884-1899) is expressed as data-dependent
    edge weights on a fixed two-solve schedule: solve A uses lines only
    when points are scarce (the low-feature branch); solve B adds lines
    when they are plentiful (main) and degenerates to points-only when
    they are not (double-points — duplicating every point edge does not
    move the optimum, so weight-1 points-only is the same solution)."""
    N = cur.feat.capacity
    Lc = cur.lines.capacity
    inv_sig2 = 1.0 / cur.feat.sigma2

    # ---- stage 1: motion model (points) ----
    # gid -2 marks TEMPORAL visual-odometry points (localization mode,
    # reference UpdateLastFrame src/Tracking.cc:1707-1771: last-frame
    # stereo depth unprojected into throwaway landmarks); they anchor the
    # pose solve but never enter the map.
    last_lm_ok = last_lm_gid != -1
    mm, mm_d = motion_model_match(
        cam, scales, T_pred, cur, last_xy, last_octave, last_angle,
        last_bits, last_lm_xyz, last_lm_ok, th_motion,
    )
    assoc_gid = jnp.full((N,), -1, jnp.int32)
    assoc_xyz = jnp.zeros((N, 3))
    rows_ok = mm >= 0
    cols = jnp.where(rows_ok, mm, N)
    assoc_gid = assoc_gid.at[cols].set(
        jnp.where(rows_ok, last_lm_gid, -1), mode="drop"
    )
    assoc_xyz = assoc_xyz.at[cols].set(last_lm_xyz, mode="drop")
    n_mm = jnp.sum(rows_ok.astype(jnp.int32))

    # ---- stage 1: motion model (lines, SearchByProjectionLinesMotion) ----
    no_already = jnp.zeros((Lc,), bool)
    lmm, lmm_d = line_projection_match(
        cam, T_pred, cur.lines, last_ll_xyz3, last_lines.desc,
        last_ll_len, last_ll_gid >= 0, no_already,
    )
    ll_gid = jnp.full((Lc,), -1, jnp.int32)
    ll_xyz3 = jnp.zeros((Lc, 3, 3))
    lrows = lmm >= 0
    lc = jnp.where(lrows, lmm, Lc)
    ll_gid = ll_gid.at[lc].set(jnp.where(lrows, last_ll_gid, -1), mode="drop")
    ll_xyz3 = ll_xyz3.at[lc].set(last_ll_xyz3, mode="drop")
    n_lmm = jnp.sum(lrows.astype(jnp.int32))

    pts_obs = PointObs(
        xyz_w=assoc_xyz, uv=cur.feat.xy, inv_sigma2=inv_sig2,
        mask=assoc_gid != -1, ur=cur.u_right,
    )
    ln_obs = _line_obs_from_assoc(cur.lines, ll_gid, ll_xyz3[:, 1])
    with_lines = Lc > 1  # static: line tables collapse to 1 slot when off
    # 3-branch weights (reference Tracking.cc:1884-1899): points-first
    # unless points are scarce (low-feature: lines join solve A).
    few_pts = n_mm < 20
    wB = jnp.where(few_pts | (n_lmm >= 10), 1.0, 0.0)
    gn = dict(rounds=gn_rounds, iters=gn_iters)
    # The first solve of each stage only SEEDS the second (reference
    # PoseOptimizationmain: points-first, then both — the second solve
    # re-classifies and polishes); a short schedule suffices for the
    # seed and halves the with-lines GN cost (4 full solves -> 2 full
    # + 2 short; measured on-chip, see bench_mono.py).
    gn_seed = dict(rounds=2, iters=4)
    if with_lines:
        wA = jnp.where(few_pts, 1.0, 0.0)
        resA = pose_optimize(T_pred, cam, pts_obs, ln_obs, line_weight=wA,
                             **gn_seed)
        res1 = pose_optimize(resA.Tcw, cam, pts_obs, ln_obs, line_weight=wB,
                             **gn)
    else:
        # Stereo/points-only: stage 1 only SEEDS stage 2 (which re-runs
        # the full schedule from this pose against the richer local-map
        # association set), so the short seed schedule suffices — the
        # same measured trick as the with-lines path (round-5: recovers
        # the ~0.2 ms/frame the 3-dof stereo residual rows added; tour
        # ATE re-validated at the pinned-cadence gate).
        res1 = pose_optimize(T_pred, cam, pts_obs, ln_obs, line_weight=0.0,
                             **gn_seed)
    assoc_gid = jnp.where(res1.inlier_pt, assoc_gid, -1)
    ll_gid = jnp.where(res1.inlier_ln, ll_gid, -1)

    # ---- stage 2: local map (points) ----
    lm_mt, lm_visible, lm_d = local_map_match(
        cam, scales, res1.Tcw, cur, win, assoc_gid != -1,
        scale_factor, n_levels, th_local,
    )
    lrows_ok = lm_mt >= 0
    lcols = jnp.where(lrows_ok, lm_mt, N)
    assoc_gid2 = assoc_gid.at[lcols].set(
        jnp.where(lrows_ok, win.ids, -1), mode="drop"
    )
    assoc_xyz2 = assoc_xyz.at[lcols].set(win.xyz, mode="drop")

    # ---- stage 2: local map (lines, SearchLocalLines) ----
    lwin_mt, lwin_d = line_projection_match(
        cam, res1.Tcw, cur.lines, lwin.xyz, lwin.desc,
        lwin.avg_len, lwin.ok, ll_gid >= 0, perp_r=6.0,
    )
    lw_ok = lwin_mt >= 0
    lwc = jnp.where(lw_ok, lwin_mt, Lc)
    ll_gid2 = ll_gid.at[lwc].set(jnp.where(lw_ok, lwin.ids, -1), mode="drop")
    ll_xyz3_2 = ll_xyz3.at[lwc].set(lwin.xyz, mode="drop")

    pts_obs2 = PointObs(
        xyz_w=assoc_xyz2, uv=cur.feat.xy, inv_sigma2=inv_sig2,
        mask=assoc_gid2 != -1, ur=cur.u_right,
    )
    ln_obs2 = _line_obs_from_assoc(cur.lines, ll_gid2, ll_xyz3_2[:, 1])
    n_pt2 = jnp.sum((assoc_gid2 != -1).astype(jnp.int32))
    n_ln2 = jnp.sum((ll_gid2 >= 0).astype(jnp.int32))
    few2 = n_pt2 < 20
    wB2 = jnp.where(few2 | (n_ln2 >= 10), 1.0, 0.0)
    if with_lines:
        wA2 = jnp.where(few2, 1.0, 0.0)
        resC = pose_optimize(res1.Tcw, cam, pts_obs2, ln_obs2,
                             line_weight=wA2, **gn_seed)
        res2 = pose_optimize(resC.Tcw, cam, pts_obs2, ln_obs2,
                             line_weight=wB2, **gn)
    else:
        res2 = pose_optimize(res1.Tcw, cam, pts_obs2, ln_obs2,
                             line_weight=0.0, **gn)

    inlier = res2.inlier_pt & (assoc_gid2 != -1)
    # map-landmark associations only (temporal -2 points stay out)
    lm_gid = jnp.where(inlier & (assoc_gid2 >= 0), assoc_gid2, -1)
    ln_inlier = res2.inlier_ln & (ll_gid2 >= 0)
    ll_out = jnp.where(ln_inlier, ll_gid2, -1)

    found_local = lrows_ok & (res2.inlier_pt[jnp.clip(lm_mt, 0)])
    return TrackResult(
        Tcw=res2.Tcw,
        lm_gid=lm_gid,
        inlier=inlier,
        n_mm_matches=n_mm,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        visible_ids=jnp.where(lm_visible, win.ids, -1),
        found_ids=jnp.where(found_local, win.ids, -1),
        ll_gid=ll_out,
        ln_inlier=ln_inlier,
        n_ln_inliers=jnp.sum(ln_inlier.astype(jnp.int32)),
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
    dist = M.hamming_mixed(cur.feat.bits, kf_desc).T
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
        ur=cur.u_right,
    )
    res = pose_optimize(T_init, cam, pts_obs, LineObs.empty(1))
    inlier = res.inlier_pt & (assoc_gid >= 0)
    e = jnp.full((1,), -1, jnp.int32)
    Lc = cur.lines.capacity
    return TrackResult(
        Tcw=res.Tcw,
        lm_gid=jnp.where(inlier, assoc_gid, -1),
        inlier=inlier,
        n_mm_matches=jnp.sum(rows_ok.astype(jnp.int32)),
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        visible_ids=e,
        found_ids=e,
        ll_gid=jnp.full((Lc,), -1, jnp.int32),
        ln_inlier=jnp.zeros((Lc,), bool),
        n_ln_inliers=jnp.int32(0),
    )
