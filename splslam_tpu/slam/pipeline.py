"""The fused per-frame pipeline: one device dispatch per tracked frame.

Latency engineering for the tunnel-attached TPU: the naive orchestration
(separate calls for frame build, covisibility, window gathers, tracking,
stat updates + several blocking host fetches) pays a network round trip
per call. This module fuses EVERYTHING the tracker needs per frame into a
single jitted program:

    images -> frame build -> covisibility top-k -> local window dedupe ->
    motion-model match -> pose GN -> local-map match -> pose GN ->
    landmark stat updates -> packed scalar stats

The host receives one small packed stats vector (pose + counters) per
frame — a single D2H transfer — and keeps all large state (map tables,
frame features) resident on device. Keyframe insertion is a second fused
program at keyframe rate (~1/10 frames).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.slam import map as mapmod
from splslam_tpu.slam.frame import FrameData, build_frame_stereo
from splslam_tpu.slam.tracking import LocalWindow, track_step
from splslam_tpu.slam.map import MapState

# packed stats layout
S_POSE = slice(0, 16)
S_N_MM = 16
S_N_IN = 17
S_CLOSE_TRACKED = 18
S_CLOSE_UNTRACKED = 19
S_N_DEPTH = 20
S_REF_MATCHES = 21
S_N_LN_IN = 22
S_REF_LN_MATCHES = 23
STATS_LEN = 24


class StepState(NamedTuple):
    """Device-resident tracker state carried frame to frame.

    Pose AND velocity live on device so the motion-model prediction
    T_pred = velocity @ Tcw needs no host round trip (the tunnel-attached
    TPU pays ~50 ms per blocking host sync)."""

    frame: FrameData
    lm_gid: jax.Array    # [N]
    lm_xyz: jax.Array    # [N,3]
    Tcw: jax.Array       # (4,4)
    velocity: jax.Array  # (4,4) Tcw_i @ inv(Tcw_{i-1})
    ll_gid: jax.Array    # [L] map-line id per line feature (-1 none)
    ll_xyz3: jax.Array   # [L,3,3] cached map-line start/mid/end (world)
    ll_len: jax.Array    # [L] map-line average 2D lengths

    @staticmethod
    def fresh(frame: FrameData, Tcw: jax.Array) -> "StepState":
        n = frame.feat.capacity
        l = frame.lines.capacity
        return StepState(
            frame=frame,
            lm_gid=jnp.full((n,), -1, jnp.int32),
            lm_xyz=jnp.zeros((n, 3)),
            Tcw=Tcw,
            velocity=jnp.eye(4),
            ll_gid=jnp.full((l,), -1, jnp.int32),
            ll_xyz3=jnp.zeros((l, 3, 3)),
            ll_len=jnp.zeros((l,)),
        )


def assemble_local_window(
    st: MapState, last_lm_gid: jax.Array, m_local: int, k_top: int = 10
) -> LocalWindow:
    """Device-side UpdateLocalMap (reference Tracking.cc:2595): keyframes
    ranked by shared-landmark count with the last frame; their landmark
    ids deduplicated into a fixed M-slot window."""
    cov = mapmod.covisibility_counts(st, last_lm_gid)  # [K]
    k_top = min(k_top, cov.shape[0])
    top_cov, top_kf = jax.lax.top_k(cov, k_top)
    rows = st.kfs.lm_idx[top_kf]                        # [k_top, N]
    rows = jnp.where((top_cov > 0)[:, None], rows, -1)
    flat = rows.reshape(-1)
    F = flat.shape[0]
    s = jnp.sort(flat)
    first = jnp.concatenate(
        [s[:1] >= 0, (s[1:] != s[:-1]) & (s[1:] >= 0)]
    )
    key = jnp.where(first, jnp.arange(F, dtype=jnp.int32), F)
    neg_sel = jax.lax.top_k(-key, m_local)[0]
    sel = -neg_sel
    ids = jnp.where(sel < F, s[jnp.clip(sel, 0, F - 1)], -1)
    safe = jnp.clip(ids, 0)
    pts = st.pts
    return LocalWindow(
        ids=ids,
        xyz=pts.xyz[safe],
        desc=pts.desc[safe],
        normal=pts.normal[safe],
        dmin=pts.dmin[safe],
        dmax=pts.dmax[safe],
        ok=(ids >= 0) & pts.valid[safe],
    )


def assemble_line_window(
    st: MapState, last_ll_gid: jax.Array, last_lm_gid_for_lines: jax.Array,
    q_local: int, k_top: int = 10
) -> "LineWindow":
    """Device-side UpdateLocalMapLines (reference Tracking.cc:2012-2022):
    keyframes ranked by shared MAP-LINE count with the last frame (the
    line covisibility graph), their line ids deduplicated into a fixed
    Q-slot window."""
    from splslam_tpu.slam.tracking import LineWindow

    Q = st.lns.xyz.shape[0]
    member = jnp.zeros((Q,), bool).at[jnp.clip(last_ll_gid, 0)].set(
        last_ll_gid >= 0
    )
    kf_ll = st.kfs.ll_idx
    hit = member[jnp.clip(kf_ll, 0)] & (kf_ll >= 0)
    cov = jnp.sum(hit.astype(jnp.int32), axis=1) * st.kfs.valid.astype(jnp.int32)
    # MapLineRenewing (reference Tracking.cc:2112-2179): when line
    # tracking decays, lines are re-sourced from the POINT covisibility
    # graph. A small point-covisibility term keeps point-covisible
    # keyframes' lines in the window even when no line is being tracked.
    n_line_cov = jnp.sum(cov)
    pt_cov = mapmod.covisibility_counts(st, last_lm_gid_for_lines)
    cov = cov + jnp.where(n_line_cov < 16, pt_cov // 4, 0)
    k_top = min(k_top, cov.shape[0])
    top_cov, top_kf = jax.lax.top_k(cov, k_top)
    rows = st.kfs.ll_idx[top_kf]
    rows = jnp.where((top_cov > 0)[:, None], rows, -1)
    flat = rows.reshape(-1)
    F = flat.shape[0]
    s = jnp.sort(flat)
    first = jnp.concatenate([s[:1] >= 0, (s[1:] != s[:-1]) & (s[1:] >= 0)])
    key = jnp.where(first, jnp.arange(F, dtype=jnp.int32), F)
    sel = -jax.lax.top_k(-key, min(q_local, F))[0]
    ids = jnp.where(sel < F, s[jnp.clip(sel, 0, F - 1)], -1)
    safe = jnp.clip(ids, 0)
    lns = st.lns
    return LineWindow(
        ids=ids,
        xyz=lns.xyz[safe],
        desc=lns.desc[safe],
        avg_len=lns.avg_len2d[safe],
        ok=(ids >= 0) & lns.valid[safe],
    )


@partial(
    jax.jit,
    static_argnames=("spec", "line_capacity", "line_cfg"),
)
def build_frames_batch(
    imgs: jax.Array,   # [B,2,H,W] uint8 stereo pairs
    cam: Camera,
    spec: PyramidSpec,
    line_capacity: int = 1,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> FrameData:
    """Batched stereo frame construction, sequential inside a lax.scan.

    A separate program from tracking ON PURPOSE — fusing frame build and
    tracking into one XLA computation sends the TPU compiler into a
    multi-minute fusion/layout search (measured: the pieces compile in
    7-60 s, the fusion hangs for 30+ min). scan rather than vmap: the
    extractor's patch gathers lower to slow batched general-gathers under
    vmap (measured 89 ms/frame vmapped vs ~16 ms sequential)."""

    def one(_, pair):
        f = build_frame_stereo(
            pair[0].astype(jnp.float32), pair[1].astype(jnp.float32),
            cam, spec, line_capacity=line_capacity, line_cfg=line_cfg,
        )
        return None, f

    _, frames = jax.lax.scan(one, None, imgs)
    return frames


@partial(
    jax.jit,
    static_argnames=("m_local", "scale_factor", "n_levels"),
    donate_argnames=("map_state",),
)
def track_frames_batch(
    frames: FrameData,   # batched [B, ...] tables from build_frames_batch
    map_state: MapState,
    prev: StepState,
    th_depth_m: jax.Array,
    ref_kf: jax.Array,
    cam: Camera,
    scales: jax.Array,
    m_local: int = 2048,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    loc_mode: jax.Array | bool = False,
) -> tuple[MapState, StepState, jax.Array]:
    """Sequential tracking over a batch of prebuilt frames inside one
    lax.scan: the ~30 ms tunnel dispatch amortizes over the batch.

    The local landmark window is assembled ONCE per batch (the map is
    immutable inside the batch — keyframe insertion and mapping run at
    batch boundaries, see vo_batch_step) and the per-landmark
    visible/found counters are accumulated across the scan and applied
    as one scatter — both were ~1 ms/frame of redundant per-frame work
    on v5e. The reference's per-frame UpdateLocalMap is equivalent here
    up to within-batch drift of the covisible set."""
    win = assemble_local_window(map_state, prev.lm_gid, m_local)
    lcap = frames.lines.seg.shape[1]
    if lcap > 1:
        lwin = assemble_line_window(
            map_state, prev.ll_gid, prev.lm_gid, min(1024, 4 * lcap)
        )
    else:
        from splslam_tpu.slam.tracking import LineWindow

        lwin = LineWindow.empty(1)

    def body(carry, frame):
        mst, st = carry
        mst, st, out = _track_body(
            frame, mst, st, th_depth_m, ref_kf, cam, scales,
            m_local, scale_factor, n_levels, loc_mode,
            win=win, lwin=lwin,
        )
        return (mst, st), out

    (map_state, state), (stats, vis_ids, found_ids) = jax.lax.scan(
        body, (map_state, prev), frames
    )
    map_state = mapmod.update_point_stats2(
        map_state, vis_ids.reshape(-1), found_ids.reshape(-1)
    )
    return map_state, state, stats


def vo_frame_step(
    imgs: jax.Array,
    map_state: MapState,
    prev: StepState,
    th_depth_m: jax.Array,
    ref_kf: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    scales: jax.Array,
    m_local: int = 2048,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    line_capacity: int = 8,
    loc_mode: jax.Array | bool = False,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> tuple[MapState, StepState, jax.Array]:
    """One stereo frame: two async device dispatches (build, track).
    Returns (map_state, new_step_state, packed_stats[STATS_LEN])."""
    frame = build_frames_batch(
        imgs[None], cam, spec, line_capacity=line_capacity,
        line_cfg=line_cfg,
    )
    mst, state, stats = track_frames_batch(
        frame, map_state, prev, th_depth_m, ref_kf, cam, scales,
        m_local, scale_factor, n_levels, loc_mode,
    )
    return mst, state, stats[0]


def _track_body(frame, map_state, prev, th_depth_m, ref_kf, cam, scales,
                m_local, scale_factor, n_levels, loc_mode=False,
                win=None, lwin=None):
    from splslam_tpu.slam.tracking import LineWindow

    T_pred = prev.velocity @ prev.Tcw
    # Localization-mode temporal VO points (reference UpdateLastFrame,
    # src/Tracking.cc:1707): unproject the previous frame's depth for
    # features without landmarks; gid -2 = pose-only anchor.
    f = prev.frame
    synth = loc_mode & (f.depth > 0) & (prev.lm_gid == -1) & f.feat.valid
    Twc_prev = jnp.linalg.inv(prev.Tcw)
    zp = jnp.maximum(f.depth, 1e-6)
    xc = (f.feat.xy[:, 0] - cam.cx) / cam.fx * zp
    yc = (f.feat.xy[:, 1] - cam.cy) / cam.fy * zp
    pw = jnp.stack([xc, yc, zp], -1) @ Twc_prev[:3, :3].T + Twc_prev[:3, 3]
    last_gid = jnp.where(synth, -2, prev.lm_gid)
    last_xyz = jnp.where(synth[:, None], pw, prev.lm_xyz)
    lcap = frame.lines.capacity
    if win is None:
        win = assemble_local_window(map_state, prev.lm_gid, m_local)
    if lwin is None:
        if lcap > 1:
            lwin = assemble_line_window(
                map_state, prev.ll_gid, prev.lm_gid, min(1024, 4 * lcap)
            )
        else:
            # line pipeline off (capacity-1 tables) — stages are no-ops
            lwin = LineWindow.empty(1)
    res = track_step(
        cam, scales, frame,
        prev.frame.feat.xy, prev.frame.feat.octave, prev.frame.feat.angle,
        prev.frame.feat.bits,
        last_xyz, last_gid,
        T_pred, win,
        prev.frame.lines, prev.ll_gid, prev.ll_xyz3, prev.ll_len,
        lwin,
        scale_factor=scale_factor, n_levels=n_levels,
    )
    # landmark visibility/found statistics: RETURNED to the caller and
    # applied as one batched scatter after the scan (saves ~1 ms/frame).
    if frame.lines.capacity > 1:
        map_state = mapmod.update_line_stats(
            map_state,
            jnp.where(lwin.ok, lwin.ids, -1),
            res.ll_gid,
            frame.lines.length,
        )
    # keyframe-policy stats
    close = (frame.depth > 0) & (frame.depth < th_depth_m)
    n_close_tracked = jnp.sum((close & res.inlier).astype(jnp.int32))
    n_close_untracked = jnp.sum((close & ~res.inlier).astype(jnp.int32))
    n_depth = jnp.sum((frame.depth > 0).astype(jnp.int32))

    # Reference-KF tracked map points with >= minObs observations
    # (reference KeyFrame::TrackedMapPoints used by NeedNewKeyFrame,
    # src/Tracking.cc:2206: nMinObs = 3 unless the map has <= 2 KFs).
    min_obs = jnp.where(map_state.n_kfs <= 2, 2, 3)
    ref_row = map_state.kfs.lm_idx[ref_kf]
    ref_safe = jnp.clip(ref_row, 0)
    ref_tracked = (
        (ref_row >= 0)
        & map_state.pts.valid[ref_safe]
        & (map_state.pts.n_obs[ref_safe] >= min_obs)
    )
    n_ref_matches = jnp.sum(ref_tracked.astype(jnp.int32))
    # Reference-KF tracked map LINES (TrackedMapLines, used by
    # NeedNewKeyFrameBoth's c2, src/Tracking.cc:2288).
    ref_ll = map_state.kfs.ll_idx[ref_kf]
    ref_lsafe = jnp.clip(ref_ll, 0)
    ref_ln_tracked = (
        (ref_ll >= 0)
        & map_state.lns.valid[ref_lsafe]
        & (map_state.lns.n_obs[ref_lsafe] >= min_obs)
    )
    n_ref_ln = jnp.sum(ref_ln_tracked.astype(jnp.int32))

    stats = jnp.zeros((STATS_LEN,), jnp.float32)
    stats = stats.at[S_POSE].set(res.Tcw.reshape(-1))
    stats = stats.at[S_N_MM].set(res.n_mm_matches.astype(jnp.float32))
    stats = stats.at[S_N_IN].set(res.n_inliers.astype(jnp.float32))
    stats = stats.at[S_CLOSE_TRACKED].set(n_close_tracked.astype(jnp.float32))
    stats = stats.at[S_CLOSE_UNTRACKED].set(n_close_untracked.astype(jnp.float32))
    stats = stats.at[S_N_DEPTH].set(n_depth.astype(jnp.float32))
    stats = stats.at[S_REF_MATCHES].set(n_ref_matches.astype(jnp.float32))
    stats = stats.at[S_N_LN_IN].set(res.n_ln_inliers.astype(jnp.float32))
    stats = stats.at[S_REF_LN_MATCHES].set(n_ref_ln.astype(jnp.float32))

    # Velocity model on device (reference Tracking.cc:652 mVelocity).
    velocity = res.Tcw @ jnp.linalg.inv(prev.Tcw)
    lsafe = jnp.clip(res.ll_gid, 0)
    new_state = StepState(
        frame=frame,
        lm_gid=res.lm_gid,
        lm_xyz=map_state.pts.xyz[jnp.clip(res.lm_gid, 0)],
        Tcw=res.Tcw,
        velocity=velocity,
        ll_gid=res.ll_gid,
        ll_xyz3=map_state.lns.xyz[lsafe],
        ll_len=map_state.lns.avg_len2d[lsafe],
    )
    return map_state, new_state, (stats, res.visible_ids, res.found_ids)


def vo_batch_step(
    imgs: jax.Array,
    map_state: MapState,
    prev: StepState,
    th_depth_m: jax.Array,
    ref_kf: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    scales: jax.Array,
    m_local: int = 2048,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    line_capacity: int = 1,
    loc_mode: jax.Array | bool = False,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> tuple[MapState, StepState, jax.Array]:
    """B stereo frames in TWO device dispatches (reference has no analog —
    this is the TPU answer to per-frame RPC latency on a tunnel-attached
    chip): a scanned frame build, then sequential tracking in a lax.scan.

    `imgs`: [B,2,H,W] uint8. Keyframe decisions happen between batches on
    the host (stats for every frame come back as [B, STATS_LEN])."""
    frames = build_frames_batch(imgs, cam, spec, line_capacity=line_capacity,
                                line_cfg=line_cfg)
    return track_frames_batch(
        frames, map_state, prev, th_depth_m, ref_kf, cam, scales,
        m_local, scale_factor, n_levels, loc_mode,
    )


def vo_frame_step_mono(
    image: jax.Array,
    map_state: MapState,
    prev: StepState,
    th_depth_m: jax.Array,
    ref_kf: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    scales: jax.Array,
    m_local: int = 2048,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    with_lines: bool = False,
    line_capacity: int = 128,
    undistort: bool = False,
    loc_mode: jax.Array | bool = False,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> tuple[MapState, StepState, jax.Array]:
    """Monocular step (reference GrabImageMonocular -> Track / TrackBoth,
    src/Tracking.cc:360-417): frame build + tracking as two async
    dispatches (fusing them hangs the TPU compiler; see
    build_frames_batch)."""
    from splslam_tpu.slam.frame import build_frame_mono

    frame = build_frame_mono(
        image.astype(jnp.float32), cam, spec,
        undistort=undistort, with_lines=with_lines,
        line_capacity=line_capacity, line_cfg=line_cfg,
    )
    frame_b = jax.tree.map(lambda x: x[None], frame)
    mst, state, stats = track_frames_batch(
        frame_b, map_state, prev, th_depth_m, ref_kf, cam, scales,
        m_local, scale_factor, n_levels, loc_mode,
    )
    return mst, state, stats[0]


@partial(
    jax.jit,
    static_argnames=("spec", "line_capacity", "undistort", "line_cfg"),
)
def build_frames_batch_mono(
    imgs: jax.Array,   # [B,H,W] uint8
    cam: Camera,
    spec: PyramidSpec,
    line_capacity: int = 128,
    undistort: bool = False,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> FrameData:
    """Batched monocular frame construction (see build_frames_batch for
    why a scan and why a separate program from tracking)."""
    from splslam_tpu.slam.frame import build_frame_mono

    def one(_, im):
        f = build_frame_mono(
            im.astype(jnp.float32), cam, spec,
            undistort=undistort, with_lines=line_capacity > 1,
            line_capacity=line_capacity, line_cfg=line_cfg,
        )
        return None, f

    return jax.lax.scan(one, None, imgs)[1]


def vo_batch_step_mono(
    imgs: jax.Array,
    map_state: MapState,
    prev: StepState,
    th_depth_m: jax.Array,
    ref_kf: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    scales: jax.Array,
    m_local: int = 2048,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    line_capacity: int = 128,
    undistort: bool = False,
    loc_mode: jax.Array | bool = False,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> tuple[MapState, StepState, jax.Array]:
    """B monocular frames in TWO device dispatches (the mono analog of
    vo_batch_step — the reference's per-frame GrabImageMonocular loop
    has no batching; this is the TPU answer to per-frame RPC latency).
    Only valid AFTER map initialization (keyframe decisions run between
    batches on the host)."""
    frames = build_frames_batch_mono(
        imgs, cam, spec, line_capacity=line_capacity, undistort=undistort,
        line_cfg=line_cfg,
    )
    return track_frames_batch(
        frames, map_state, prev, th_depth_m, ref_kf, cam, scales,
        m_local, scale_factor, n_levels, loc_mode,
    )


@partial(
    jax.jit,
    static_argnames=("spec", "scale_factor", "n_levels", "max_new", "is_stereo"),
    donate_argnames=("map_state",),
)
def _add_keyframe_step(
    map_state: MapState,
    state: StepState,
    frame_id: jax.Array,
    ts: jax.Array,
    depth_limit: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    max_new: int = 200,
    is_stereo: bool = True,
) -> tuple[MapState, StepState, jax.Array]:
    """Fused keyframe insertion + stereo landmark creation (reference
    CreateNewKeyFrame, src/Tracking.cc:2337-2416). Returns
    (map, state-with-updated-associations, [kf_idx, n_matches, n_pts])."""
    frame = state.frame
    map_state, kf = mapmod.insert_keyframe(
        map_state, frame, state.Tcw, state.lm_gid, state.ll_gid, frame_id, ts
    )
    lm_gid = state.lm_gid
    if is_stereo:
        map_state, lm_gid = mapmod.create_stereo_points(
            map_state, kf, frame, state.Tcw, lm_gid,
            cam.fx, cam.fy, cam.cx, cam.cy, depth_limit,
            scale_factor, n_levels, max_new=max_new,
        )
    out = jnp.stack(
        [
            kf.astype(jnp.float32),
            jnp.sum((lm_gid >= 0).astype(jnp.int32)).astype(jnp.float32),
            map_state.n_pts.astype(jnp.float32),
        ]
    )
    new_state = state._replace(
        lm_gid=lm_gid,
        lm_xyz=map_state.pts.xyz[jnp.clip(lm_gid, 0)],
    )
    return map_state, new_state, out


def add_keyframe_step(map_state, state, frame_id, ts, depth_limit, cam,
                      spec, **kw):
    """Liveness-guarded entry for fused keyframe insertion (see
    _add_keyframe_step); the map argument is DONATED."""
    from splslam_tpu.slam.mapping_ops import assert_map_live

    assert_map_live(map_state, "add_keyframe_step")
    return _add_keyframe_step(map_state, state, frame_id, ts, depth_limit,
                              cam, spec, **kw)


def vo_frame_step_rgbd(
    image: jax.Array,
    depth_map: jax.Array,
    map_state: MapState,
    prev: StepState,
    th_depth_m: jax.Array,
    ref_kf: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    scales: jax.Array,
    m_local: int = 2048,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    depth_factor: float = 1.0,
    line_capacity: int = 8,
    loc_mode: jax.Array | bool = False,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> tuple[MapState, StepState, jax.Array]:
    """RGB-D step (reference GrabImageRGBD -> point-only Track,
    src/Tracking.cc:327-358): two async dispatches."""
    from splslam_tpu.slam.frame import build_frame_rgbd

    frame = build_frame_rgbd(
        image.astype(jnp.float32), depth_map.astype(jnp.float32), cam, spec,
        depth_factor=depth_factor, line_capacity=line_capacity,
        line_cfg=line_cfg,
    )
    frame_b = jax.tree.map(lambda x: x[None], frame)
    mst, state, stats = track_frames_batch(
        frame_b, map_state, prev, th_depth_m, ref_kf, cam, scales,
        m_local, scale_factor, n_levels, loc_mode,
    )
    return mst, state, stats[0]
