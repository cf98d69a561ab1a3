"""Monocular tracking path: two-view bootstrap + per-frame tracking.

Implements the reference's monocular branch (src/Tracking.cc:360-417
GrabImageMonocular -> Track/TrackBoth):

- `MonocularInitialization(Both)` (src/Tracking.cc:1010-1157, :1159-1377):
  hold a reference frame, match level-0 ORB features (100 px window,
  0.9 ratio, rotation histogram — reference ORBmatcher::
  SearchForInitialization), run the unified two-view RANSAC
  (slam/initializer.py), and on success build the initial map
  (`CreateInitialMapMonocular(Both)` :1379: two keyframes, landmarks from
  the triangulated inliers, init BA, median-depth normalization).
- After init, per-frame tracking reuses the same fused device step as
  stereo (motion-model + local-map + pose GN), with no depth channel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.ops import match as M
from splslam_tpu.optim.ba import BAProblem, ba_solve
from splslam_tpu.slam import map as mapmod
from splslam_tpu.slam import pipeline
from splslam_tpu.slam.frame import FrameData
from splslam_tpu.slam.map import MapState, scale_band
from splslam_tpu.slam.pipeline import StepState


# ----------------------------------------------------------------------
# initialization matching (reference ORBmatcher::SearchForInitialization)
# ----------------------------------------------------------------------
@jax.jit
def match_for_initialization(f1: FrameData, f2: FrameData):
    """Level-0 windowed match: 100 px window, ratio 0.9, mutual NN,
    rotation-histogram consistency. Returns (m12 [N] col-in-f2 or -1)."""
    lvl1 = f1.feat.octave == 0
    lvl2 = f2.feat.octave == 0
    win = M.window_mask(f1.feat.xy, f2.feat.xy, 100.0)
    dist = M.hamming_from_bits(f1.feat.bits, f2.feat.bits)
    d = M.masked_distances(
        dist, f1.feat.valid & lvl1, f2.feat.valid & lvl2, win
    )
    mt, md = M.nn_match(d, max_dist=M.TH_LOW, ratio=0.9, mutual=True)
    mt = M.rotation_consistency(f1.feat.angle, f2.feat.angle, mt)
    return mt, jnp.sum((mt >= 0).astype(jnp.int32))


@jax.jit
def match_lines_for_initialization(f1: FrameData, f2: FrameData):
    """Line-midpoint init matching (reference Linematcher::
    SearchForInitialization, src/Linematcher.cc:146-286): midpoint window,
    LBD Hamming, relative length-consistency gate, rotation histogram on
    the LINE angle. Returns (m12L [L] or -1, count)."""
    l1, l2 = f1.lines, f2.lines
    win = M.window_mask(l1.midpoint, l2.midpoint, 100.0)
    rel = jnp.abs(l2.length[None, :] - l1.length[:, None]) / jnp.maximum(
        l1.length[:, None], 1e-6
    )
    dist = M.hamming_matrix(l1.desc, l2.desc)
    d = M.masked_distances(dist, l1.valid, l2.valid, win & (rel < 0.35))
    mt, md = M.nn_match(d, max_dist=M.TH_HIGH, ratio=0.9, mutual=True)
    mt = M.rotation_consistency_lines(l1.angle, l2.angle, mt)
    return mt, jnp.sum((mt >= 0).astype(jnp.int32))


# ----------------------------------------------------------------------
# initial map creation (reference CreateInitialMapMonocular :1379)
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("scale_factor", "n_levels"),
         donate_argnames=("st",))
def create_initial_map(
    st: MapState,
    f1: FrameData,
    f2: FrameData,
    m12: jax.Array,       # [N] f1-feature -> f2-feature match
    R21: jax.Array,
    t21: jax.Array,
    xyz_c1: jax.Array,    # [N,3] triangulated per f1 feature (cam-1 frame)
    good: jax.Array,      # [N] bool
    m12L: jax.Array,      # [Lc] f1-line -> f2-line match
    lmid_c1: jax.Array,   # [Lc,3] triangulated line midpoints (cam-1)
    lgood: jax.Array,     # [Lc] bool
    ts1: jax.Array,
    ts2: jax.Array,
    frame_id1: jax.Array,
    frame_id2: jax.Array,
    cam: Camera,
    scale_factor: float = 1.2,
    n_levels: int = 8,
) -> tuple[MapState, StepState, jax.Array]:
    """Builds KF0 (identity) + KF1 ([R21|t21] / median-depth) and the
    initial landmarks — points AND map-lines (the reference's
    CreateInitialMapMonocularBoth, src/Tracking.cc:1379: line endpoints
    triangulated with the recovered pose, scene median depth over both
    modalities); runs the 2-camera init BA (GlobalBundleAdjustemntIni,
    src/Optimizer.cc:4339). Returns (map, tracker state for frame 2,
    stats [n_pts, med_depth, chi2, pose])."""
    N = f1.feat.capacity
    Lc = f1.lines.capacity

    # Median-depth normalization over points AND line midpoints
    # (reference ComputeSceneMedianDepthBoth).
    z = jnp.concatenate([xyz_c1[:, 2], lmid_c1[:, 2]])
    both_good = jnp.concatenate([good, lgood])
    zs = jnp.sort(jnp.where(both_good, z, jnp.inf))
    n_good = jnp.sum(both_good.astype(jnp.int32))
    med = zs[jnp.clip(n_good // 2, 0, N + Lc - 1)]
    inv_med = 1.0 / jnp.maximum(med, 1e-6)
    xyz_n = xyz_c1 * inv_med
    T1 = jnp.eye(4)
    T2 = jnp.eye(4).at[:3, :3].set(R21).at[:3, 3].set(t21 * inv_med)

    # Allocate landmark slots per good f1 feature.
    slot = jnp.cumsum(good.astype(jnp.int32)) - 1
    cap = st.pts.xyz.shape[0]
    create = good & (slot < cap)
    sl = jnp.where(create, slot, cap)

    # Normals/bands from the second view (the reference updates normal &
    # depth from pKFcur observations).
    O2 = -R21.T @ (t21 * inv_med)
    view = xyz_n - O2
    dist2 = jnp.linalg.norm(view, axis=-1)
    normal = view / jnp.maximum(dist2[:, None], 1e-9)
    oct2 = f2.feat.octave[jnp.clip(m12, 0)]
    dmin, dmax = scale_band(dist2, oct2, scale_factor, n_levels)
    desc2 = f2.feat.desc[jnp.clip(m12, 0)]

    pts = st.pts._replace(
        xyz=st.pts.xyz.at[sl].set(xyz_n, mode="drop"),
        desc=st.pts.desc.at[sl].set(desc2, mode="drop"),
        normal=st.pts.normal.at[sl].set(normal, mode="drop"),
        dmin=st.pts.dmin.at[sl].set(dmin, mode="drop"),
        dmax=st.pts.dmax.at[sl].set(dmax, mode="drop"),
        n_obs=st.pts.n_obs.at[sl].set(2, mode="drop"),
        n_visible=st.pts.n_visible.at[sl].set(2, mode="drop"),
        n_found=st.pts.n_found.at[sl].set(2, mode="drop"),
        first_kf=st.pts.first_kf.at[sl].set(0, mode="drop"),
        valid=st.pts.valid.at[sl].set(True, mode="drop"),
    )
    st = st._replace(pts=pts, n_pts=jnp.sum(create.astype(jnp.int32)))

    lm1 = jnp.where(create, slot, -1)
    # f2 feature j <- landmark of the f1 feature that matched it.
    lm2 = jnp.full((N,), -1, jnp.int32)
    lm2 = lm2.at[jnp.where(create, m12, N)].set(
        jnp.where(create, slot, -1), mode="drop"
    )

    # ---- map-lines: endpoint triangulation with the recovered pose
    # (reference TriangulateLine, Initializer.cc:1763) ----
    Km = jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]]
    )
    P1 = Km @ T1[:3, :4]
    P2 = Km @ T2[:3, :4]

    def dlt(uv_a, uv_b):
        A = jnp.stack(
            [
                uv_a[0] * P1[2] - P1[0],
                uv_a[1] * P1[2] - P1[1],
                uv_b[0] * P2[2] - P2[0],
                uv_b[1] * P2[2] - P2[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    seg1 = f1.lines.seg
    seg2m = f2.lines.seg[jnp.clip(m12L, 0)]
    Xs = jax.vmap(dlt)(seg1[:, :2], seg2m[:, :2])
    Xe = jax.vmap(dlt)(seg1[:, 2:4], seg2m[:, 2:4])
    Xm = lmid_c1 * inv_med
    ep_ok = (
        jnp.all(jnp.isfinite(Xs), -1) & jnp.all(jnp.isfinite(Xe), -1)
        & (Xs[:, 2] > 1e-3) & (Xe[:, 2] > 1e-3)
    )
    lcreate = lgood & ep_ok
    lslot = jnp.cumsum(lcreate.astype(jnp.int32)) - 1
    lcap = st.lns.xyz.shape[0]
    lcreate = lcreate & (lslot < lcap)
    lsl = jnp.where(lcreate, lslot, lcap)
    xyz3 = jnp.stack([Xs, Xm, Xe], axis=1)
    avg_len = 0.5 * (
        f1.lines.length + f2.lines.length[jnp.clip(m12L, 0)]
    )
    lns = st.lns._replace(
        xyz=st.lns.xyz.at[lsl].set(xyz3, mode="drop"),
        desc=st.lns.desc.at[lsl].set(
            f2.lines.desc[jnp.clip(m12L, 0)], mode="drop"
        ),
        avg_len2d=st.lns.avg_len2d.at[lsl].set(avg_len, mode="drop"),
        n_obs=st.lns.n_obs.at[lsl].set(2, mode="drop"),
        n_visible=st.lns.n_visible.at[lsl].set(2, mode="drop"),
        n_found=st.lns.n_found.at[lsl].set(2, mode="drop"),
        first_kf=st.lns.first_kf.at[lsl].set(0, mode="drop"),
        valid=st.lns.valid.at[lsl].set(True, mode="drop"),
    )
    st = st._replace(lns=lns, n_lns=jnp.sum(lcreate.astype(jnp.int32)))
    ll1 = jnp.where(lcreate, lslot, -1)
    ll2 = jnp.full((Lc,), -1, jnp.int32)
    ll2 = ll2.at[jnp.where(lcreate, m12L, Lc)].set(
        jnp.where(lcreate, lslot, -1), mode="drop"
    )

    st, kf0 = mapmod.insert_keyframe(st, f1, T1, lm1, ll1, frame_id1, ts1)
    st, kf1 = mapmod.insert_keyframe(st, f2, T2, lm2, ll2, frame_id2, ts2)

    # ---- init BA: 2 cameras (cam0 frozen), all landmarks ----
    L = cap
    e_cam = jnp.concatenate(
        [jnp.zeros((N,), jnp.int32), jnp.ones((N,), jnp.int32)]
    )
    lm_rows = jnp.concatenate([lm1, lm2])
    e_uv = jnp.concatenate([f1.feat.xy, f2.feat.xy], axis=0)
    e_sig = jnp.concatenate([1.0 / f1.feat.sigma2, 1.0 / f2.feat.sigma2])
    e_ok = lm_rows >= 0
    prob = BAProblem(
        Tcw=jnp.stack([T1, T2]),
        cam_free=jnp.array([False, True]),
        xyz=st.pts.xyz,
        lm_ok=st.pts.valid,
        e_cam=e_cam,
        e_lm=jnp.clip(lm_rows, 0),
        e_uv=e_uv,
        e_ur=jnp.full((2 * N,), -1.0),
        e_inv_sigma2=e_sig,
        e_ok=e_ok,
    )
    if Lc > 1:
        # Init BA with line edges + dual point/line arbitration
        # (reference GlobalBundleAdjustemntIni, src/Optimizer.cc:
        # 4339-4381: point-BA ∥ line-BA threads -> per-unit-error pose
        # pick -> joint BA). Line endpoints ride as landmark slots
        # appended after the point table.
        from splslam_tpu.optim.ba import ba_solve_arbitrated
        from splslam_tpu.optim.pose_gn import line_coefficients

        lcap_t = st.lns.xyz.shape[0]
        coef1 = line_coefficients(f1.lines.seg)
        coef2 = line_coefficients(f2.lines.seg)
        Ep = 2 * N

        def line_edges(ll, coefs, cam_id, e0):
            ok = ll >= 0
            sl_s = L + 2 * jnp.clip(ll, 0)
            rows = jnp.arange(Lc, dtype=jnp.int32)
            base = e0 + rows * 2
            return (
                jnp.full((2 * Lc,), cam_id, jnp.int32),
                jnp.stack([sl_s, sl_s + 1], 1).reshape(-1),
                jnp.stack([coefs, coefs], 1).reshape(-1, 3),
                jnp.repeat(ok, 2),
                jnp.stack([base + 1, base], 1).reshape(-1),
            )

        c1, l1_, co1, o1, p1_ = line_edges(ll1, coef1, 0, Ep)
        c2, l2_, co2, o2, p2_ = line_edges(ll2, coef2, 1, Ep + 2 * Lc)
        El = 4 * Lc
        prob = prob._replace(
            xyz=jnp.concatenate(
                [st.pts.xyz, st.lns.xyz[:, (0, 2), :].reshape(-1, 3)]
            ),
            lm_ok=jnp.concatenate(
                [st.pts.valid, jnp.repeat(st.lns.valid, 2)]
            ),
            e_cam=jnp.concatenate([e_cam, c1, c2]),
            e_lm=jnp.concatenate([jnp.clip(lm_rows, 0), l1_, l2_]),
            e_uv=jnp.concatenate([e_uv, jnp.zeros((El, 2))]),
            e_ur=jnp.concatenate(
                [jnp.full((Ep,), -1.0), jnp.full((El,), -1.0)]
            ),
            e_inv_sigma2=jnp.concatenate([e_sig, jnp.full((El,), 0.25)]),
            e_ok=jnp.concatenate([e_ok, o1, o2]),
            e_coef=jnp.concatenate([jnp.zeros((Ep, 3)), co1, co2]),
            e_line=jnp.concatenate(
                [jnp.zeros((Ep,), bool), jnp.ones((El,), bool)]
            ),
            e_pair=jnp.concatenate(
                [jnp.full((Ep,), -1, jnp.int32), p1_, p2_]
            ),
        )
        res = ba_solve_arbitrated(cam, prob, rounds=2, iters=8, n_free=2)
        ends = res.xyz[L:L + 2 * lcap_t].reshape(lcap_t, 2, 3)
        xyz3_opt = jnp.stack(
            [ends[:, 0], 0.5 * (ends[:, 0] + ends[:, 1]), ends[:, 1]], 1
        )
        st = st._replace(
            lns=st.lns._replace(
                xyz=jnp.where(st.lns.valid[:, None, None], xyz3_opt,
                              st.lns.xyz)
            )
        )
    else:
        res = ba_solve(cam, prob, rounds=2, iters=8, n_free=2)
    T2_opt = res.Tcw[1]
    st = st._replace(
        pts=st.pts._replace(xyz=res.xyz[:L]),
        kfs=st.kfs._replace(Tcw=st.kfs.Tcw.at[1].set(T2_opt)),
    )
    # Drop landmarks whose edges became outliers in both views.
    bad2 = (prob.e_ok & ~res.e_inlier)[N:2 * N]
    lm2_f = jnp.where(bad2, -1, lm2)
    st = st._replace(kfs=st.kfs._replace(
        lm_idx=st.kfs.lm_idx.at[1].set(lm2_f)
    ))

    lsafe = jnp.clip(ll2, 0)
    step = StepState.fresh(f2, T2_opt)._replace(
        lm_gid=lm2_f,
        lm_xyz=st.pts.xyz[jnp.clip(lm2_f, 0)],
        ll_gid=ll2,
        ll_xyz3=st.lns.xyz[lsafe],
        ll_len=st.lns.avg_len2d[lsafe],
    )
    stats = jnp.stack([
        st.n_pts.astype(jnp.float32),
        med,
        res.total_chi2,
    ])
    out_pose = T2_opt.reshape(-1)
    return st, step, jnp.concatenate([stats, out_pose])


# ----------------------------------------------------------------------
# host-side mono state machine
# ----------------------------------------------------------------------
class _MonoInit(NamedTuple):
    frame: FrameData
    ts: float
    frame_id: int


def track_mono_impl(system, image: jax.Array, ts: float) -> np.ndarray:
    from splslam_tpu.slam.frame import build_frame_mono
    from splslam_tpu.slam.system import TrackingState

    s = system
    if s.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
        frame = build_frame_mono(
            image.astype(jnp.float32), s.cam, s.spec,
            undistort=s.settings.has_distortion,
            with_lines=s.settings.using_line,
            line_capacity=s.line_cap, line_cfg=s.line_cfg,
        )
        n_feat = int(jnp.sum(frame.feat.valid.astype(jnp.int32)))
        n_line = int(jnp.sum(frame.lines.valid.astype(jnp.int32)))
        use_lines = s.settings.using_line
        # The line gates are OR'd with the point gates (reference
        # MonocularInitializationBoth, src/Tracking.cc:1164 seeds on
        # keys>100 || lines>80 and :1214 proceeds unless
        # matches<=100 && lineMatches<=80): on texture-poor scenes lines
        # ALONE carry initialization — the fr1_floor claim of the
        # reference's Tables 5-6. Gates scaled to this detector's
        # capacity (<=128 merged segments vs LSD's several hundred raw).
        enough_feat = n_feat > 100 or (use_lines and n_line > 16)
        if s.mono_state is None:
            if enough_feat:
                s.mono_state = _MonoInit(frame, ts, s.frame_id)
                s.state = TrackingState.NOT_INITIALIZED
            s.frame_id += 1
            return s.last_Tcw_np.copy()

        if not enough_feat:
            # Lost the reference (reference :1032 deletes initializer).
            s.mono_state = None
            s.state = TrackingState.NO_IMAGES_YET
            s.frame_id += 1
            return s.last_Tcw_np.copy()

        ref = s.mono_state
        m12, n_m = match_for_initialization(ref.frame, frame)
        if use_lines:
            m12L, n_ml = match_lines_for_initialization(ref.frame, frame)
        else:
            m12L = jnp.full((frame.lines.capacity,), -1, jnp.int32)
            n_ml = 0
        if int(n_m) < 70 and not (use_lines and int(n_ml) >= 14):
            # Too few matches: the current frame becomes the new reference
            # (reference :1049 re-seeds the initializer).
            s.mono_state = _MonoInit(frame, ts, s.frame_id)
            s.frame_id += 1
            return s.last_Tcw_np.copy()

        # Unified correspondence table: points FOLLOWED BY line midpoints
        # (the reference's merged index space, Initializer.cc:169-203).
        ok_p = m12 >= 0
        ok_l = m12L >= 0
        xy1 = jnp.concatenate(
            [ref.frame.feat.xy, ref.frame.lines.midpoint], axis=0
        )
        xy2 = jnp.concatenate(
            [
                frame.feat.xy[jnp.clip(m12, 0)],
                frame.lines.midpoint[jnp.clip(m12L, 0)],
            ],
            axis=0,
        )
        ok = jnp.concatenate([ok_p, ok_l])
        from splslam_tpu.slam.initializer import two_view_init

        K = jnp.array(
            [[s.cam.fx, 0.0, s.cam.cx],
             [0.0, s.cam.fy, s.cam.cy],
             [0.0, 0.0, 1.0]]
        )
        # Line midpoints are noisier than corners: give them a 3 px sigma
        # band in the RANSAC scoring.
        inv_s2 = jnp.concatenate([
            jnp.ones((ref.frame.feat.capacity,)),
            jnp.full((frame.lines.capacity,), 1.0 / 9.0),
        ])
        res = two_view_init(
            jax.random.PRNGKey(0), xy1, xy2, ok, K, inv_sigma2=inv_s2
        )
        if not bool(res.ok):
            s.frame_id += 1
            return s.last_Tcw_np.copy()
        # Which two-view model won the RH score (reference :218-224) —
        # exposed for diagnostics/tests (H for planar, F for general).
        s.init_used_h = bool(res.used_h)

        N = ref.frame.feat.capacity
        s.map, s.step, out = create_initial_map(
            s.map, ref.frame, frame, m12, res.R21, res.t21,
            res.xyz[:N], res.good[:N] & ok_p,
            m12L, res.xyz[N:], res.good[N:] & ok_l,
            jnp.float32(ref.ts), jnp.float32(ts),
            jnp.int32(ref.frame_id), jnp.int32(s.frame_id),
            s.cam,
            scale_factor=s.settings.scale_factor,
            n_levels=s.settings.n_levels,
        )
        out = np.asarray(out)
        s.n_kfs = 2
        s.n_pts = int(out[0])
        s.ref_kf = 1
        s.ref_kf_matches = int(out[0])
        s.frames_since_kf = 0
        T2 = out[3:].reshape(4, 4).astype(np.float32)
        s.kf_pose_host[0] = np.eye(4, dtype=np.float32)
        s.kf_pose_host[1] = T2
        s.state = TrackingState.OK
        s.last_Tcw_np = T2
        # Log both bootstrap frames.
        s._log_frame(ref.ts, np.eye(4, dtype=np.float32), lost=False)
        s._log_frame(ts, T2, lost=False)
        s._register_kf_bow(0, ref.frame)
        s._register_kf_bow(1, frame)
        s.mono_state = None
        s.frame_id += 1
        s.mapper.big_change_idx += 1
        return T2.copy()

    # ---- initialized: fused tracking step on the mono image ----
    s.map, new_step, stats_dev = pipeline.vo_frame_step_mono(
        image, s.map, s.step, s._th_depth_dev, jnp.int32(s.ref_kf),
        s.cam, s.spec, s.scales,
        m_local=s.settings.local_window,
        scale_factor=s.settings.scale_factor,
        n_levels=s.settings.n_levels,
        with_lines=s.settings.using_line,
        line_capacity=s.line_cap, line_cfg=s.line_cfg,
        undistort=s.settings.has_distortion,
        loc_mode=jnp.bool_(s.localization_only),
    )
    return s._enqueue_step(new_step, stats_dev, ts)
