"""The map as fixed-capacity struct-of-arrays device tables.

Replaces the reference's pointer-graph map (src/Map.cc, MapPoint.cc,
MapLine.cc, KeyFrame.cc — mutex-guarded sets of heap objects) with
functional JAX arrays:

- landmarks and keyframes live in pre-allocated tables with validity masks;
- `MapPoint*` pointers -> integer indices; `isBad` -> mask bit;
- per-keyframe feature tables double as the OBSERVATION tables: keyframe
  row k observing landmark lm_idx[k, i] with keypoint i *is* the BA edge
  (k, i, lm), so bundle-adjustment windows are pure gathers;
- all mutation happens in jitted update functions returning new states —
  the mutex web (Map.h:74-96, KeyFrame.h:313-317) has no equivalent
  because every consumer sees an immutable snapshot.

Lines (MapLine: 3 points start/mid/end + LBD descriptor + average 2D
length, reference include/MapLine.h:121-127) get a parallel table.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splslam_tpu.slam.frame import FrameData

NO_LM = jnp.int32(-1)


class MapPoints(NamedTuple):
    xyz: jax.Array        # [P,3]
    desc: jax.Array       # [P,8] u32 distinctive descriptor
    normal: jax.Array     # [P,3] mean viewing direction
    dmin: jax.Array       # [P] scale-invariance band (reference
    dmax: jax.Array       # [P]  MapPoint::mfMinDistance/mfMaxDistance)
    n_visible: jax.Array  # [P] i32 (reference mnVisible)
    n_found: jax.Array    # [P] i32 (reference mnFound)
    n_obs: jax.Array      # [P] i32 keyframe observation count
    first_kf: jax.Array   # [P] i32
    valid: jax.Array      # [P] bool
    recent: jax.Array     # [P] bool — in the culling probation window
    #                       (reference mlpRecentAddedMapPoints: only
    #                       triangulation-born points are probationed,
    #                       src/LocalMapping.cc:408-444)

    @staticmethod
    def empty(p: int) -> "MapPoints":
        return MapPoints(
            xyz=jnp.zeros((p, 3)),
            desc=jnp.zeros((p, 8), jnp.uint32),
            normal=jnp.zeros((p, 3)),
            dmin=jnp.zeros((p,)),
            dmax=jnp.full((p,), 1e9),
            n_visible=jnp.zeros((p,), jnp.int32),
            n_found=jnp.zeros((p,), jnp.int32),
            n_obs=jnp.zeros((p,), jnp.int32),
            first_kf=jnp.zeros((p,), jnp.int32),
            valid=jnp.zeros((p,), bool),
            recent=jnp.zeros((p,), bool),
        )


class MapLines(NamedTuple):
    """3D line landmarks: start/mid/end points (reference MapLine)."""

    xyz: jax.Array        # [Q,3,3] rows: start, mid, end (world)
    desc: jax.Array       # [Q,8] u32 LBD
    avg_len2d: jax.Array  # [Q] running average of observed 2D length
    n_visible: jax.Array  # [Q] i32
    n_found: jax.Array    # [Q] i32
    n_obs: jax.Array      # [Q] i32
    first_kf: jax.Array   # [Q] i32
    valid: jax.Array      # [Q] bool
    # NOTE: detection octaves live per OBSERVATION (KeyFrames.loctave),
    # not here — the reference's line keyframe-culling scale gate
    # compares the octaves of the observing keyframes' keylines
    # (src/LocalMapping.cc:1577-1625), so a single per-landmark octave
    # would be both redundant and stale after fusion.

    @staticmethod
    def empty(q: int) -> "MapLines":
        return MapLines(
            xyz=jnp.zeros((q, 3, 3)),
            desc=jnp.zeros((q, 8), jnp.uint32),
            avg_len2d=jnp.zeros((q,)),
            n_visible=jnp.zeros((q,), jnp.int32),
            n_found=jnp.zeros((q,), jnp.int32),
            n_obs=jnp.zeros((q,), jnp.int32),
            first_kf=jnp.zeros((q,), jnp.int32),
            valid=jnp.zeros((q,), bool),
        )


class KeyFrames(NamedTuple):
    """Keyframe table; feature rows double as observation edges."""

    Tcw: jax.Array       # [K,4,4]
    xy: jax.Array        # [K,N,2]
    octave: jax.Array    # [K,N] i32
    sigma2: jax.Array    # [K,N]
    angle: jax.Array     # [K,N]
    desc: jax.Array      # [K,N,8] u32
    fvalid: jax.Array    # [K,N] bool
    u_right: jax.Array   # [K,N]
    depth: jax.Array     # [K,N]
    lm_idx: jax.Array    # [K,N] i32 landmark per keypoint, -1 none
    # line observations
    lseg: jax.Array      # [K,L,4]
    ldesc: jax.Array     # [K,L,8] u32
    langle: jax.Array    # [K,L]
    llen: jax.Array      # [K,L]
    lvalid: jax.Array    # [K,L] bool
    ll_idx: jax.Array    # [K,L] i32 map-line per line feature, -1 none
    loctave: jax.Array   # [K,L] i32 line detection octave
    valid: jax.Array     # [K] bool
    frame_id: jax.Array  # [K] i32
    ts: jax.Array        # [K] f64-as-f32 timestamp

    @staticmethod
    def empty(k: int, n: int, l: int) -> "KeyFrames":
        return KeyFrames(
            Tcw=jnp.tile(jnp.eye(4)[None], (k, 1, 1)),
            xy=jnp.zeros((k, n, 2)),
            octave=jnp.zeros((k, n), jnp.int32),
            sigma2=jnp.ones((k, n)),
            angle=jnp.zeros((k, n)),
            desc=jnp.zeros((k, n, 8), jnp.uint32),
            fvalid=jnp.zeros((k, n), bool),
            u_right=jnp.full((k, n), -1.0),
            depth=jnp.full((k, n), -1.0),
            lm_idx=jnp.full((k, n), NO_LM),
            lseg=jnp.zeros((k, l, 4)),
            ldesc=jnp.zeros((k, l, 8), jnp.uint32),
            langle=jnp.zeros((k, l)),
            llen=jnp.zeros((k, l)),
            lvalid=jnp.zeros((k, l), bool),
            ll_idx=jnp.full((k, l), NO_LM),
            loctave=jnp.zeros((k, l), jnp.int32),
            valid=jnp.zeros((k,), bool),
            frame_id=jnp.zeros((k,), jnp.int32),
            ts=jnp.zeros((k,)),
        )


class MapState(NamedTuple):
    pts: MapPoints
    lns: MapLines
    kfs: KeyFrames
    n_pts: jax.Array  # scalar i32 allocation high-water mark
    n_lns: jax.Array
    n_kfs: jax.Array

    @staticmethod
    def empty(p: int, q: int, k: int, n: int, l: int) -> "MapState":
        return MapState(
            pts=MapPoints.empty(p),
            lns=MapLines.empty(q),
            kfs=KeyFrames.empty(k, n, l),
            n_pts=jnp.int32(0),
            n_lns=jnp.int32(0),
            n_kfs=jnp.int32(0),
        )

    @property
    def capacity_pts(self) -> int:
        return self.pts.xyz.shape[0]


def scale_band(depth: jax.Array, octave: jax.Array, scale_factor: float,
               n_levels: int) -> tuple[jax.Array, jax.Array]:
    """Scale-invariance distance band of a new landmark (reference
    MapPoint::UpdateNormalAndDepth, src/MapPoint.cc)."""
    level_scale = scale_factor ** octave.astype(jnp.float32)
    dmax = depth * level_scale
    dmin = dmax / (scale_factor ** (n_levels - 1))
    return dmin, dmax


def predict_octave(dist: jax.Array, dmax: jax.Array, scale_factor: float,
                   n_levels: int) -> jax.Array:
    """Predicted detection octave from distance (reference
    MapPoint::PredictScale)."""
    ratio = jnp.maximum(dmax / jnp.maximum(dist, 1e-6), 1e-6)
    lv = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor))
    return jnp.clip(lv, 0, n_levels - 1).astype(jnp.int32)


@jax.jit
def insert_keyframe(
    st: MapState,
    frame: FrameData,
    Tcw: jax.Array,
    lm_idx: jax.Array,
    ll_idx: jax.Array,
    frame_id: jax.Array,
    ts: jax.Array,
) -> tuple[MapState, jax.Array]:
    """Append a keyframe row; bump n_obs of its observed landmarks.

    Returns (new_state, kf_index)."""
    k = st.n_kfs
    kfs = st.kfs
    f = frame.feat
    kfs = kfs._replace(
        Tcw=kfs.Tcw.at[k].set(Tcw),
        xy=kfs.xy.at[k].set(f.xy),
        octave=kfs.octave.at[k].set(f.octave),
        sigma2=kfs.sigma2.at[k].set(f.sigma2),
        angle=kfs.angle.at[k].set(f.angle),
        desc=kfs.desc.at[k].set(f.desc),
        fvalid=kfs.fvalid.at[k].set(f.valid),
        u_right=kfs.u_right.at[k].set(frame.u_right),
        depth=kfs.depth.at[k].set(frame.depth),
        lm_idx=kfs.lm_idx.at[k].set(lm_idx),
        lseg=kfs.lseg.at[k].set(frame.lines.seg),
        ldesc=kfs.ldesc.at[k].set(frame.lines.desc),
        langle=kfs.langle.at[k].set(frame.lines.angle),
        llen=kfs.llen.at[k].set(frame.lines.length),
        lvalid=kfs.lvalid.at[k].set(frame.lines.valid),
        ll_idx=kfs.ll_idx.at[k].set(ll_idx),
        loctave=kfs.loctave.at[k].set(frame.lines.octave),
        valid=kfs.valid.at[k].set(True),
        frame_id=kfs.frame_id.at[k].set(frame_id),
        ts=kfs.ts.at[k].set(ts),
    )
    # Stereo observations count double (reference MapPoint::AddObservation:
    # nObs += 2 when mvuRight[idx] >= 0, src/MapPoint.cc).
    obs_w = jnp.where(frame.u_right >= 0, 2, 1)
    obs_inc = jnp.zeros_like(st.pts.n_obs).at[jnp.clip(lm_idx, 0)].add(
        jnp.where(lm_idx >= 0, obs_w, 0)
    )
    pts = st.pts._replace(n_obs=st.pts.n_obs + obs_inc)
    lobs_inc = jnp.zeros_like(st.lns.n_obs).at[jnp.clip(ll_idx, 0)].add(
        (ll_idx >= 0).astype(jnp.int32)
    )
    lns = st.lns._replace(n_obs=st.lns.n_obs + lobs_inc)
    return st._replace(kfs=kfs, pts=pts, lns=lns, n_kfs=k + 1), k


@partial(jax.jit, static_argnames=("scale_factor", "n_levels", "max_new"))
def create_stereo_points(
    st: MapState,
    kf_idx: jax.Array,
    frame: FrameData,
    Tcw: jax.Array,
    lm_idx: jax.Array,
    cam_fx: jax.Array,
    cam_fy: jax.Array,
    cam_cx: jax.Array,
    cam_cy: jax.Array,
    depth_limit: jax.Array,
    scale_factor: float,
    n_levels: int,
    max_new: int = 200,
) -> tuple[MapState, jax.Array]:
    """Create landmarks from stereo/RGBD depth for unmatched keypoints.

    Mirrors StereoInitialization + CreateNewKeyFrame's close-point
    creation (reference src/Tracking.cc:970-1040, 2337-2416): keypoints
    with valid depth and no landmark, closest-first, capped at `max_new`.
    Returns (new_state, lm_idx updated with the new landmarks)."""
    f = frame.feat
    can = f.valid & (frame.depth > 0) & (lm_idx < 0) & (frame.depth < depth_limit)
    # closest-first ranking, cap at max_new
    order_key = jnp.where(can, frame.depth, jnp.inf)
    order = jnp.argsort(order_key)
    rank = jnp.zeros_like(lm_idx).at[order].set(jnp.arange(lm_idx.shape[0], dtype=jnp.int32))
    create = can & (rank < max_new)
    # allocate slots
    slot_off = jnp.cumsum(create.astype(jnp.int32)) - 1
    slots = jnp.where(create, st.n_pts + slot_off, 0)
    n_new = jnp.sum(create.astype(jnp.int32))
    cap = st.pts.xyz.shape[0]
    create = create & (slots < cap)

    # unproject
    Twc = jnp.linalg.inv(Tcw)
    z = frame.depth
    x = (f.xy[:, 0] - cam_cx) / cam_fx * z
    y = (f.xy[:, 1] - cam_cy) / cam_fy * z
    pc = jnp.stack([x, y, z], axis=-1)
    pw = pc @ Twc[:3, :3].T + Twc[:3, 3]

    cam_center = Twc[:3, 3]
    view = pw - cam_center
    dist = jnp.linalg.norm(view, axis=-1)
    normal = view / jnp.maximum(dist[:, None], 1e-9)
    dmin, dmax = scale_band(dist, f.octave, scale_factor, n_levels)

    pts = st.pts
    sl = jnp.where(create, slots, cap)  # out-of-range index drops the write
    pts = pts._replace(
        xyz=pts.xyz.at[sl].set(pw, mode="drop"),
        desc=pts.desc.at[sl].set(f.desc, mode="drop"),
        normal=pts.normal.at[sl].set(normal, mode="drop"),
        dmin=pts.dmin.at[sl].set(dmin, mode="drop"),
        dmax=pts.dmax.at[sl].set(dmax, mode="drop"),
        n_obs=pts.n_obs.at[sl].set(2, mode="drop"),  # stereo obs weight 2
        n_visible=pts.n_visible.at[sl].set(1, mode="drop"),
        n_found=pts.n_found.at[sl].set(1, mode="drop"),
        first_kf=pts.first_kf.at[sl].set(kf_idx, mode="drop"),
        valid=pts.valid.at[sl].set(True, mode="drop"),
    )
    new_lm_idx = jnp.where(create, slots.astype(jnp.int32), lm_idx)
    # write updated associations into the KF row as well
    kfs = st.kfs._replace(lm_idx=st.kfs.lm_idx.at[kf_idx].set(new_lm_idx))
    return (
        st._replace(pts=pts, kfs=kfs, n_pts=st.n_pts + n_new),
        new_lm_idx,
    )


@jax.jit
def update_point_stats(
    st: MapState, idx: jax.Array, visible: jax.Array, found: jax.Array
) -> MapState:
    """Bump mnVisible/mnFound counters for tracked landmarks
    (reference Tracking::SearchLocalPoints / TrackLocalMap)."""
    safe = jnp.clip(idx, 0)
    ok = idx >= 0
    pts = st.pts._replace(
        n_visible=st.pts.n_visible.at[safe].add(jnp.where(ok & visible, 1, 0)),
        n_found=st.pts.n_found.at[safe].add(jnp.where(ok & found, 1, 0)),
    )
    return st._replace(pts=pts)


@jax.jit
def update_point_stats2(
    st: MapState, visible_ids: jax.Array, found_ids: jax.Array
) -> MapState:
    """Fused visible+found counter bump (one pass over the point table —
    the hot tracking loop calls this every frame)."""
    vsafe = jnp.clip(visible_ids, 0)
    fsafe = jnp.clip(found_ids, 0)
    pts = st.pts._replace(
        n_visible=st.pts.n_visible.at[vsafe].add(
            (visible_ids >= 0).astype(jnp.int32)
        ),
        n_found=st.pts.n_found.at[fsafe].add(
            (found_ids >= 0).astype(jnp.int32)
        ),
    )
    return st._replace(pts=pts)


@jax.jit
def update_line_stats(
    st: MapState, visible_ids: jax.Array, found_ids: jax.Array,
    found_len: jax.Array,
) -> MapState:
    """Bump map-line visible/found counters and fold the observed 2D
    length into the running average (reference MapLine::IncreaseVisible/
    IncreaseFound + Update2DLineLength, include/MapLine.h:83)."""
    lns = st.lns
    vsafe = jnp.clip(visible_ids, 0)
    n_visible = lns.n_visible.at[vsafe].add(
        jnp.where(visible_ids >= 0, 1, 0)
    )
    fsafe = jnp.clip(found_ids, 0)
    n_found = lns.n_found.at[fsafe].add(jnp.where(found_ids >= 0, 1, 0))
    # Exponential running average of the observed length (the reference
    # keeps an exact running mean; EMA avoids storing the sample count).
    old = lns.avg_len2d[fsafe]
    new = jnp.where(found_ids >= 0, 0.7 * old + 0.3 * found_len, old)
    avg = lns.avg_len2d.at[fsafe].set(new)
    return st._replace(
        lns=lns._replace(n_visible=n_visible, n_found=n_found, avg_len2d=avg)
    )


@jax.jit
def covisibility_counts(st: MapState, lm_idx_query: jax.Array) -> jax.Array:
    """Shared-landmark counts between a query observation set and every
    keyframe (the covisibility weights of reference
    KeyFrame::UpdateConnections). Returns [K] i32."""
    P = st.pts.xyz.shape[0]
    member = jnp.zeros((P,), bool).at[jnp.clip(lm_idx_query, 0)].set(
        lm_idx_query >= 0
    )
    kf_lm = st.kfs.lm_idx  # [K,N]
    hit = member[jnp.clip(kf_lm, 0)] & (kf_lm >= 0)
    return jnp.sum(hit.astype(jnp.int32), axis=1) * st.kfs.valid.astype(jnp.int32)
