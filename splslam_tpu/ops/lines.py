"""Line-segment detection + LBD-style descriptors, fully vectorized.

TPU-native replacement for the reference's Lineextractor
(src/Lineextractor.cc: LSD via the vendored LSDDetectorC, or its own
FLD-style Canny+point-chaining `lineDetection`/`extractSegments`) and the
vendored LBD BinaryDescriptor (Thirdparty/line_descriptor/src/
binary_descriptor_custom.cpp).

Point-chaining is inherently sequential, so the detector is re-designed for
the VPU as *grid-seeded oriented growth*:
  1. Sobel gradients -> per-pixel edge magnitude + orientation.
  2. The strongest edge pixel in each SxS cell becomes a seed (fixed count).
  3. From each seed, march up to MAX_STEPS in both directions along the
     level-line direction (perpendicular to the gradient), bilinearly
     sampling magnitude + orientation; a step is alive while magnitude and
     angle agreement hold. Run length = index of first dead step
     (computed with a cumulative product — no data-dependent loops).
  4. Segments shorter than min_length are masked; top-K by length are kept
     (the reference keeps top-K per octave by response,
     src/Lineextractor.cc:162-181).

The descriptor is an LBD-like banded gradient signature: gradients are
sampled on a rotated line-support grid (bands parallel to the segment),
per-band mean/std of the 4 directional components are compared pairwise
and binarized to 256 bits, packed as 8 uint32 — Hamming-matchable with the
same MXU kernels as ORB (reference matches LBD with cv::BFMatcher too,
src/Linematcher.cc:454).

Like the reference, each line also carries its MIDPOINT — the midpoint is
the point-proxy used for grids/matching/initialization everywhere
(reference emits a midpoint KeyPoint per line, src/Lineextractor.cc:195-199).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

N_WORDS = 8
SEED_CAP = 512          # strongest seeds marched per octave (see
#                         _detect_level: the march is the dominant cost)
MAX_STEPS = 64          # max half-length of a segment, pixels
#                         (longer structure is recovered at coarser octaves)
# Per-octave march budgets (index = pyramid level, last entry repeats).
# The march is the detector's dominant cost (5 gathers per seed-step,
# paid whether or not the seed is alive), so each level gets the
# smallest budget its role needs:
#   L0: seeds sit in every 24-px cell along an edge, so capped 48-step
#       runs from neighboring seeds overlap and the collinear-union
#       merge recovers the full extent — marching 64 steps per seed
#       re-discovers pixels neighboring seeds already covered.
#   L1: half resolution, so 64 steps span 256 level-0 px (the long-
#       structure octave) and there are only ~260 cells to seed from.
# Border-ring seeds are excluded BEFORE the cap (see _detect_level), so
# the magnitude ranking spends the whole budget on scene edges.
LEVEL_SEED_CAP = (512, 512)
LEVEL_MAX_STEPS = (64, 64)
ANGLE_TOL = 0.35        # rad, level-line angle agreement (covers
#                         nearest-pixel angle sampling jitter)
MAG_FRAC = 0.02         # min gradient magnitude as a fraction of max
CANON_BRIDGE = 10       # canonical-extent re-march gap tolerance, px
K_SEED = 2              # seed pixels per grid cell (top-k by magnitude).
#   Seeding granularity is a measured repeatability lever (grid-scene
#   frame-to-frame re-detection): cell=16/k=2 scores 0.72 @320x240 and
#   0.68 @640x480 vs 0.62/0.65 at the old cell=24/k=2 — finer cells keep
#   a marginal short line's seed from losing its cell's top-k to a
#   stronger neighbor as cell boundaries slide across the image with
#   camera motion ("truly undetected" was 25% of all misses, the largest
#   class, scripts/diag_line_repeat.py). Denser isn't monotonic:
#   cell=12/k=2 floods the magnitude-ranked SEED_CAP crop and scores
#   0.56; cell=24/k=3 only 0.67. March cost is unchanged at >=640x480
#   (lanes are SEED_CAP-bound either way).


class LineFeatures(NamedTuple):
    """Fixed-capacity line table (one frame)."""

    seg: jax.Array       # [L,4] endpoints [sx,sy,ex,ey] (level-0 px)
    midpoint: jax.Array  # [L,2]
    angle: jax.Array     # [L] segment direction, radians in [-pi,pi]
    length: jax.Array    # [L] 2D length in px
    response: jax.Array  # [L] mean gradient magnitude along the segment
    desc: jax.Array      # [L,8] uint32 packed LBD-like descriptor
    valid: jax.Array     # [L] bool
    octave: jax.Array    # [L] i32 detection pyramid level (the reference
    #                      KeyLine.octave, used by the same-or-finer
    #                      scale gate in keyframe culling)

    @property
    def capacity(self) -> int:
        return self.seg.shape[0]

    @staticmethod
    def empty(capacity: int) -> "LineFeatures":
        return LineFeatures(
            seg=jnp.zeros((capacity, 4)),
            midpoint=jnp.zeros((capacity, 2)),
            angle=jnp.zeros((capacity,)),
            length=jnp.zeros((capacity,)),
            response=jnp.zeros((capacity,)),
            desc=jnp.zeros((capacity, N_WORDS), jnp.uint32),
            valid=jnp.zeros((capacity,), bool),
            octave=jnp.zeros((capacity,), jnp.int32),
        )

    def with_segments(self, seg: jax.Array) -> "LineFeatures":
        """Replace endpoints (e.g. after undistortion), refresh derived."""
        mid = 0.5 * (seg[:, :2] + seg[:, 2:4])
        d = seg[:, 2:4] - seg[:, :2]
        return self._replace(
            seg=seg,
            midpoint=mid,
            angle=jnp.arctan2(d[:, 1], d[:, 0]),
            length=jnp.linalg.norm(d, axis=-1),
        )


def sobel_gradients(image: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(H,W) -> (gx, gy) via 3x3 Sobel.

    Zero padding is deliberate: the implicit dark border makes the image
    boundary the strongest gradient in the frame, which inflates the
    global magnitude threshold (mag_th = MAG_FRAC * max) into an
    effective noise floor. An edge-replicate pad was measured WORSE on
    every repeatability metric (matcher re-association 0.50 -> 0.43,
    geometric 0.52 -> 0.25 on the grid-scene regression suite): without
    the border-driven floor, weak noise seeds pass MAG_FRAC and fragment
    the segment table. Border runs themselves lose the duplicate-
    suppression/top-K ranking to real lines."""
    # Shift-and-add instead of conv_general_dilated: a 1-channel 3x3
    # conv lowers to a degenerate MXU program on TPU (~2.7 ms at
    # 640x480); the separable shift form is pure VPU adds (~1.2 ms)
    # and bit-identical.
    p = jnp.pad(image, 1)
    sx = p[:, 2:] - p[:, :-2]            # [H+2, W] central dx
    sy = p[2:, :] - p[:-2, :]            # [H, W+2] central dy
    gx = sx[:-2] + 2.0 * sx[1:-1] + sx[2:]
    gy = sy[:, :-2] + 2.0 * sy[:, 1:-1] + sy[:, 2:]
    return gx, gy


def _bilinear(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    flat = img.reshape(-1)
    base = y0 * W + x0
    shp = base.shape
    take = lambda i: jnp.take(flat, i.reshape(-1)).reshape(shp)
    return (
        take(base) * (1 - fx) * (1 - fy)
        + take(base + 1) * fx * (1 - fy)
        + take(base + W) * (1 - fx) * fy
        + take(base + W + 1) * fx * fy
    )


def _pack4(img: jax.Array) -> jax.Array:
    """[H,W] -> [H*W,4] corner table: row (y*W+x) holds (img[y,x],
    img[y,x+1], img[y+1,x], img[y+1,x+1]), edge-padded (the pad rows are
    never sampled — `_bilinear_p` clips like `_bilinear`, so x0<=W-2).

    ONE row gather then fetches all four bilinear corners: measured
    2.36x faster than four separate flat takes at the march's shape
    (1024 lanes x 64 steps over 640x480, scripts/microbench_gather.py —
    TPU general gathers cost per gather OP, not per byte; a 4-wide row
    is one op). Bit-exact with `_bilinear`: same corner values, same
    multiply-add order."""
    H, W = img.shape
    p = jnp.pad(img, ((0, 1), (0, 1)), mode="edge")
    return jnp.stack(
        [p[:H, :W], p[:H, 1:], p[1:, :W], p[1:, 1:]], axis=-1
    ).reshape(H * W, 4)


def _bilinear_p(tbl: jax.Array, H: int, W: int, x: jax.Array,
                y: jax.Array) -> jax.Array:
    """Bilinear sample from a `_pack4` corner table (see `_pack4`)."""
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    shp = x0.shape
    rows = jnp.take(tbl, (y0 * W + x0).reshape(-1), axis=0).reshape(*shp, 4)
    return (
        rows[..., 0] * (1 - fx) * (1 - fy)
        + rows[..., 1] * fx * (1 - fy)
        + rows[..., 2] * (1 - fx) * fy
        + rows[..., 3] * fx * fy
    )


def _angle_diff(a: jax.Array, b: jax.Array) -> jax.Array:
    """Smallest difference between undirected line orientations (mod pi)."""
    d = jnp.mod(a - b, jnp.pi)
    return jnp.minimum(d, jnp.pi - d)


def _smooth121(g: jax.Array) -> jax.Array:
    """One separable [1,2,1]/4 smoothing pass (edge-replicate pad)."""
    p = jnp.pad(g, 1, mode="edge")
    h = 0.25 * (p[1:-1, :-2] + 2.0 * p[1:-1, 1:-1] + p[1:-1, 2:])
    p = jnp.pad(h, 1, mode="edge")
    return 0.25 * (p[:-2, 1:-1] + 2.0 * p[1:-1, 1:-1] + p[2:, 1:-1])


def _grow(seeds_xy, seed_angle, ang_map, mag_tbl, mag_th, direction,
          max_steps: int = MAX_STEPS, stride: float = 1.0,
          bridge: int = 1, angle_tol: float = ANGLE_TOL):
    """March from seeds along +-(cos a, sin a); return run lengths [C].

    Robustness: continuation uses a hysteresis magnitude threshold
    (0.5x the seed threshold) and single-sample dropouts are bridged
    (a dead sample flanked by two live ones stays live) — texture noise
    on top of an otherwise clean edge must not truncate the run.

    Sampling: BILINEAR magnitude from a `_pack4` corner table (endpoint
    stability across frames needs the smooth field; the packed row
    gather is one op for all 4 corners) + NEAREST level-line angle from
    a precomputed dense map: 2 gather ops per (seed, step) instead of
    the 12 bilinear taps of sampling (mag, gx, gy) — TPU general
    gathers are the whole cost of this detector (measured 59 ms/img at
    640x480 with the triple-map form, 19.1 with 5 flat takes, 2.36x
    less march-gather time packed). Angle jitter <=0.5 px is absorbed
    by ANGLE_TOL and the gap bridging."""
    H, W = ang_map.shape
    steps = jnp.arange(1, max_steps + 1, dtype=jnp.float32) * stride
    dx = jnp.cos(seed_angle)[:, None] * steps[None, :] * direction
    dy = jnp.sin(seed_angle)[:, None] * steps[None, :] * direction
    xs = seeds_xy[:, 0:1] + dx
    ys = seeds_xy[:, 1:2] + dy
    m = _bilinear_p(mag_tbl, H, W, xs, ys)
    xi = jnp.clip(jnp.round(xs), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(ys), 0, H - 1).astype(jnp.int32)
    ang = jnp.take(ang_map.reshape(-1), (yi * W + xi).reshape(-1)).reshape(
        xs.shape
    )
    alive = (m > 0.5 * mag_th) & (
        _angle_diff(ang, seed_angle[:, None]) < angle_tol
    )
    # Bridge gaps up to `bridge` consecutive dead samples: a dead sample
    # stays live when a live sample exists within `bridge` steps on BOTH
    # sides (bridge=1 reduces to the classic flanked-single-dropout
    # rule). The canonical-extent re-march uses a wider bridge so one
    # march can cross the crossing-line / texture-dropout gaps that the
    # collinear-union merge bridges during detection (<= 8 px).
    before = alive
    after = alive
    for k in range(1, bridge + 1):
        pad = jnp.zeros_like(alive[:, :k])
        one = jnp.ones_like(alive[:, :k])
        before = before | jnp.concatenate([one, alive[:, :-k]], 1)
        after = after | jnp.concatenate([alive[:, k:], pad], 1)
    alive = alive | (before & after)
    run = jnp.cumprod(alive.astype(jnp.int32), axis=1)
    # run length in PIXELS (steps alive x stride)
    return jnp.sum(run, axis=1).astype(jnp.float32) * stride


def _grow_fb(seeds_xy, seed_angle, ang_map, mag_tbl, mag_th,
             max_steps: int = MAX_STEPS, stride: float = 1.0,
             bridge: int = 1, angle_tol: float = ANGLE_TOL):
    """Forward + backward march as ONE `_grow` dispatch.

    The backward run equals the forward run at seed_angle + pi (the
    direction only flips cos/sin, and orientation agreement in `_grow`
    is mod pi via `_angle_diff`, so the alive mask is unchanged).
    Stacking [forward-rows; backward-rows] halves the number of march
    dispatches. Measured NEUTRAL standalone on the real chip (19.2 ms
    both ways at 640x480 — XLA already overlaps the two directions'
    latency-bound gathers); kept because it is bit-exact (verified),
    shrinks the traced program, and costs nothing.
    Returns (fwd, bwd) run lengths, each [C]."""
    C = seeds_xy.shape[0]
    s2 = jnp.concatenate([seeds_xy, seeds_xy], axis=0)
    a2 = jnp.concatenate([seed_angle, seed_angle + jnp.pi], axis=0)
    th = jnp.asarray(mag_th)
    if th.ndim >= 1 and th.shape[0] == C:
        th = jnp.concatenate([th, th], axis=0)
    run = _grow(s2, a2, ang_map, mag_tbl, th, +1.0, max_steps, stride,
                bridge, angle_tol)
    return run[:C], run[C:]


def _refine_direction(seeds_xy, seed_angle, gx_tbl, gy_tbl, H, W):
    """Re-estimate the level-line direction from the mean gradient over a
    short +-3-step probe along the seed direction (grid-cell argmax seeds
    often land on corners/junctions where the pointwise gradient is
    diagonal; the local average recovers the dominant edge).
    gx_tbl/gy_tbl are `_pack4` corner tables of the gradient fields."""
    steps = jnp.arange(-3, 4, dtype=jnp.float32)
    dx = jnp.cos(seed_angle)[:, None] * steps[None, :]
    dy = jnp.sin(seed_angle)[:, None] * steps[None, :]
    xs = seeds_xy[:, 0:1] + dx
    ys = seeds_xy[:, 1:2] + dy
    sgx = _bilinear_p(gx_tbl, H, W, xs, ys)
    sgy = _bilinear_p(gy_tbl, H, W, xs, ys)
    # Average in double-angle space (gradients on opposite edge sides
    # point opposite ways; orientation is mod pi).
    th = jnp.arctan2(sgy, sgx)
    w = jnp.sqrt(sgx * sgx + sgy * sgy)
    c2 = jnp.sum(w * jnp.cos(2 * th), axis=1)
    s2 = jnp.sum(w * jnp.sin(2 * th), axis=1)
    grad_dir = 0.5 * jnp.arctan2(s2, c2)
    return grad_dir + 0.5 * jnp.pi


def _refine_segment(p_start, p_end, mag_tbl, H, W,
                    n_samp: int = 16, probe: int = 2):
    """Sub-pixel segment refinement: for n_samp points along the segment,
    probe +-probe px along the normal, take the magnitude-weighted
    centroid, then total-least-squares refit and re-project endpoints.
    `mag_tbl` is a `_pack4` corner table of the magnitude field."""
    t = jnp.linspace(0.0, 1.0, n_samp)
    px = p_start[:, 0, None] + (p_end[:, 0] - p_start[:, 0])[:, None] * t
    py = p_start[:, 1, None] + (p_end[:, 1] - p_start[:, 1])[:, None] * t
    d = p_end - p_start
    ln = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-6)
    nx = (-d[:, 1] / ln)[:, None, None]
    ny = (d[:, 0] / ln)[:, None, None]
    off = jnp.arange(-probe, probe + 1, dtype=jnp.float32)[None, None, :]
    sx = px[:, :, None] + nx * off
    sy = py[:, :, None] + ny * off
    m = _bilinear_p(mag_tbl, H, W, sx, sy)         # [C, n_samp, 2p+1]
    w = m / jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1e-6)
    sh = jnp.sum(w * off, axis=-1)                 # [C, n_samp] normal shift
    cx = px + sh * nx[:, :, 0]
    cy = py + sh * ny[:, :, 0]
    # TLS fit through the corrected samples, weighted by magnitude.
    wm = jnp.sum(m, axis=-1)
    wsum = jnp.maximum(jnp.sum(wm, axis=-1, keepdims=True), 1e-6)
    mx = jnp.sum(wm * cx, axis=-1, keepdims=True) / wsum
    my = jnp.sum(wm * cy, axis=-1, keepdims=True) / wsum
    ux = cx - mx
    uy = cy - my
    sxx = jnp.sum(wm * ux * ux, axis=-1)
    syy = jnp.sum(wm * uy * uy, axis=-1)
    sxy = jnp.sum(wm * ux * uy, axis=-1)
    theta = 0.5 * jnp.arctan2(2 * sxy, sxx - syy)  # principal direction
    dvx = jnp.cos(theta)
    dvy = jnp.sin(theta)
    # Project original endpoints onto the fitted line.
    def proj(p):
        rx = p[:, 0] - mx[:, 0]
        ry = p[:, 1] - my[:, 0]
        s = rx * dvx + ry * dvy
        return jnp.stack([mx[:, 0] + s * dvx, my[:, 0] + s * dvy], axis=-1)

    return proj(p_start), proj(p_end)


def _detect_level(
    image: jax.Array,
    cell: int,
    min_length: float,
    backend: str = "grow",
    level_cap: int = 256,
    grads: tuple[jax.Array, jax.Array] | None = None,
    seed_cap: int | None = None,
    max_steps: int = MAX_STEPS,
):
    """One detection octave: seeds -> growth -> refinement. Returns
    (a [C,2], b [C,2], length [C], ok [C], cmax [C]) in THIS level's
    pixel coordinates.

    `backend` selects the seeding front-end, mirroring the reference's
    dual LSD/FLD constructors (include/Lineextractor.h:48-57,
    busingLSD): "grow" seeds from raw per-cell gradient maxima (the
    LSD-analog level-line path); "fld" seeds from a Canny-style
    non-maximum-suppressed edge map (FLD runs on cv::Canny edges,
    src/Lineextractor.cc:69-118) — thinner, better-localized seeds that
    favor step edges over texture."""
    H, W = image.shape
    gx, gy = grads if grads is not None else sobel_gradients(image)
    mag = jnp.sqrt(gx * gx + gy * gy)
    mag_th = jnp.maximum(jnp.max(mag) * MAG_FRAC, 1e-3)

    seed_map = mag
    if backend == "fld":
        # Canny-lite: suppress pixels that are not local maxima along
        # their gradient direction (bilinear taps at +-(cos,sin)).
        inv = 1.0 / jnp.maximum(mag, 1e-6)
        ux, uy = gx * inv, gy * inv
        ys_g, xs_g = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                                  jnp.arange(W, dtype=jnp.float32),
                                  indexing="ij")
        m1 = _bilinear(mag, xs_g + ux, ys_g + uy)
        m2 = _bilinear(mag, xs_g - ux, ys_g - uy)
        seed_map = jnp.where((mag >= m1) & (mag >= m2), mag, 0.0)

    # --- seeds: top-SEEDS_PER_CELL edge pixels per cell ---
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    pm = jnp.pad(seed_map, ((0, Hp - H), (0, Wp - W)))
    ncy, ncx = Hp // cell, Wp // cell
    cells = pm.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(
        ncy * ncx, cell * cell
    )
    k_seed = K_SEED
    cmaxs, idxs = jax.lax.top_k(cells, k_seed)       # [ncells, k]
    cyc = (jnp.arange(ncy * ncx) // ncx)[:, None] * cell + idxs // cell
    cxc = (jnp.arange(ncy * ncx) % ncx)[:, None] * cell + idxs % cell
    cy = cyc.reshape(-1)
    cx = cxc.reshape(-1)
    cmax = cmaxs.reshape(-1)
    seeds = jnp.stack([cx, cy], axis=-1).astype(jnp.float32)  # [C,2]
    seed_ok = cmax > mag_th
    # Border seeds are the zero-pad Sobel artifact (see sobel_gradients):
    # maximal-magnitude ring pixels that can only ever grow the phantom
    # frame segments suppressed later. They must not enter the magnitude-
    # ranked SEED_CAP compaction below — at 640x480 the ring contributes
    # ~270 of the highest-magnitude candidates, which would crowd every
    # real edge out of a tight cap (measured: cap 256 without this mask
    # detects 16 lines where cap 512 detects 77).
    border = (
        (cx < 3) | (cx >= W - 3) | (cy < 3) | (cy >= H - 3)
    )
    seed_ok = seed_ok & ~border

    # Pack the sampled fields once per level: every march/refine below
    # gathers from these (see `_pack4` — one row gather = 4 corners).
    mag_tbl = _pack4(mag)
    gx_tbl = _pack4(gx)
    gy_tbl = _pack4(gy)

    sgx = gx[cy, cx]
    sgy = gy[cy, cx]
    seed_angle = jnp.arctan2(sgy, sgx) + 0.5 * jnp.pi  # level-line direction
    # One refinement pass: local-mean gradient orientation is far more
    # stable than the pointwise gradient at the seed.
    seed_angle = _refine_direction(seeds, seed_angle, gx_tbl, gy_tbl, H, W)

    # Compact to the strongest SEED_CAP seeds BEFORE the march: the
    # growth passes are the detector's dominant cost (gather-bound, paid
    # per seed lane whether or not the seed is alive), and at L0 the
    # per-cell grid yields ~1080 candidates of which the sub-threshold
    # majority can only ever produce min_length failures. Top-by-
    # magnitude keeps 4x the post-merge level cap and 8x the final
    # table capacity — a scene would need >512 cells with genuinely
    # strong edges before this cap could cost a real line.
    cap = SEED_CAP if seed_cap is None else seed_cap
    if seeds.shape[0] > cap:
        _, si = jax.lax.top_k(jnp.where(seed_ok, cmax, -1.0), cap)
        seeds = seeds[si]
        cmax = cmax[si]
        seed_ok = seed_ok[si]
        seed_angle = seed_angle[si]

    # --- bidirectional growth, twice: the second pass re-marches from the
    # first run's CENTER with a direction refit there, so the recovered
    # span depends on the physical line, not on where in it the seed
    # happened to land (stabilizes endpoints/midpoints across frames) ---
    ang_map = jnp.arctan2(gy, gx) + 0.5 * jnp.pi  # dense level-line angle
    fwd, bwd = _grow_fb(seeds, seed_angle, ang_map, mag_tbl, mag_th,
                        max_steps)
    dirv = jnp.stack([jnp.cos(seed_angle), jnp.sin(seed_angle)], axis=-1)
    center = seeds + dirv * (0.5 * (fwd - bwd))[:, None]
    ang2 = _refine_direction(center, seed_angle, gx_tbl, gy_tbl, H, W)
    fwd, bwd = _grow_fb(center, ang2, ang_map, mag_tbl, mag_th, max_steps)
    dirv = jnp.stack([jnp.cos(ang2), jnp.sin(ang2)], axis=-1)
    p_end = center + dirv * fwd[:, None]
    p_start = center - dirv * bwd[:, None]
    length = fwd + bwd
    ok = seed_ok & (length >= min_length)

    # --- compact to the longest level_cap candidates BEFORE subpixel
    # refinement: the ~1080 per-cell candidates at L0 are mostly
    # min_length failures and short noise scraps; refining all of them
    # was ~3.6 ms/frame of pure gather cost on TPU, and the downstream
    # O(C^2) merge matrices another ~9 ms. Top-by-length keeps every
    # fragment the merge could extend a survivor with. ---
    if length.shape[0] > level_cap:
        pre = jnp.where(ok, length, -1.0)
        _, pi = jax.lax.top_k(pre, level_cap)
        p_start, p_end = p_start[pi], p_end[pi]
        length, ok, cmax = length[pi], ok[pi], cmax[pi]

    # --- subpixel refinement: pull sample points to the perpendicular
    # magnitude centroid, then refit the segment by total least squares
    # (stabilizes midpoints to sub-pixel across frames, which the
    # unified point+midpoint RANSAC needs) ---
    p_start, p_end = _refine_segment(p_start, p_end, mag_tbl, H, W)
    length = jnp.linalg.norm(p_end - p_start, axis=-1)

    # Canonical orientation: angle in (-pi/2, pi/2] so matching is
    # direction-agnostic. Decide the flip from the dominant axis with a
    # tolerance band (near-vertical lines must not flip on x-jitter).
    d0 = p_end - p_start
    near_vert = jnp.abs(d0[:, 0]) < 0.05 * jnp.maximum(length, 1.0)
    swap = jnp.where(near_vert, d0[:, 1] < 0, d0[:, 0] < 0)
    a = jnp.where(swap[:, None], p_end, p_start)
    b = jnp.where(swap[:, None], p_start, p_end)
    return a, b, length, ok, cmax


def _canonical_support(a, b, gx, gy, W_img, H_img, min_length):
    """Ridge re-registration + content-derived descriptor support.

    (1) Final level-0 lateral re-registration: a merged segment inherits
    the LATERAL offset of whichever collinear fragment survived the
    dedup, and octave-1 survivors carry a half-resolution refit; across
    frames the same physical edge can sit ~1.5 px off its own ridge in
    different directions. The LBD samples 8 bands at 2 px spacing, so a
    1.5 px perpendicular registration error decorrelates every
    off-stroke band's statistics (measured: ~70/256 bits flip between
    two detections of the same edge whose extents agree to a pixel).
    One subpixel TLS refit of the final top-K against the LEVEL-0
    magnitude field pins all survivors — whatever octave or fragment
    they came from — to the same physical ridge (true-pair cross-frame
    Hamming 66-124 -> 4-33 on the shifted-crop fixture).

    (2) Canonical extent: re-march the refined line until the edge
    actually dies. The merged extent is a union over whichever
    fragments happened to be seeded this frame, so it wobbles 5-20 px
    with the seeding grid; the descriptor samples in extent-normalized
    coordinates, so extent wobble alone flips ~50 bits. Marching
    outward from the refined midpoint makes the endpoints a function of
    the IMAGE CONTENT (where the gradient run ends), not of the seed
    census. Two level-tolerance choices matter: (a) the march runs on
    the SMOOTHED level-0 field (an L1 detection's edge is blurry at L0
    and dies instantly against raw-gradient sampling); (b) the
    continuation threshold is PER-LINE — a fraction of the line's own
    median on-line magnitude — not the global MAG_FRAC floor, which an
    L1-octave low-contrast edge never clears at L0.

    The canonical extent serves the DESCRIPTOR only. As the feature's
    geometry it was measured WORSE (grid-scene geometric repeatability
    0.72 -> 0.44): a marginal gap that the bridge crosses in one frame
    and not the next slides the midpoint 12-29 px along the line, while
    the merge-union midpoint wobbles only a few px. So the reported
    seg/midpoint/length keep the refit merge-union extent, and the
    descriptor samples the content-derived canonical support. When the
    re-march collapses (refit landed off-ridge, or the line is mostly
    gap), fall back to the union extent.

    Returns (a, b, a_d, b_d, use_c): refit geometry extents, descriptor
    support extents, and the canonical-accepted mask."""
    H, W = gx.shape
    mag0 = jnp.sqrt(gx * gx + gy * gy)
    a0, b0 = a, b
    a, b = _refine_segment(a, b, _pack4(mag0), H, W, n_samp=32, probe=3)

    gx_s = _smooth121(_smooth121(gx))
    gy_s = _smooth121(_smooth121(gy))
    mag_s = jnp.sqrt(gx_s * gx_s + gy_s * gy_s)
    mag_s_tbl = _pack4(mag_s)
    ang_map_s = jnp.arctan2(gy_s, gx_s) + 0.5 * jnp.pi
    # March from BOTH the refit and the PRE-refit geometry and keep the
    # longer extent per line. Detection seeds lie on a gradient RIDGE,
    # but the TLS refit of a THICK stroke centers on the magnitude
    # VALLEY between its two edge ridges, where the smoothed gradient
    # cancels and the angle map is noise — a march along the refit line
    # dies instantly on axis-aligned thick strokes (diagonals survive
    # only because the sampling lattice keeps them off-center). On THIN
    # strokes the refit line is the better-registered track. Each
    # marched extent is expressed on the refit line, which carries the
    # lateral registration.
    ang_r = jnp.arctan2((b - a)[:, 1], (b - a)[:, 0])
    mid_r = 0.5 * (a + b)
    dirv = jnp.stack([jnp.cos(ang_r), jnp.sin(ang_r)], axis=-1)
    t_on = jnp.linspace(0.15, 0.85, 16)

    def _span_inputs(p, q):
        """Per-geometry march inputs: midpoint, direction, and the
        PER-LINE continuation threshold (a fraction of the line's own
        median on-line smoothed magnitude — see the docstring)."""
        ang = jnp.arctan2((q - p)[:, 1], (q - p)[:, 0])
        mid = 0.5 * (p + q)
        on_x = p[:, 0, None] + (q[:, 0] - p[:, 0])[:, None] * t_on[None, :]
        on_y = p[:, 1, None] + (q[:, 1] - p[:, 1])[:, None] * t_on[None, :]
        m_ref = jnp.median(
            _bilinear_p(mag_s_tbl, H, W, on_x, on_y), axis=-1)      # [C]
        return mid, ang, (0.8 * m_ref)[:, None]  # _grow continues at 0.5x

    # All FOUR marches (fwd/bwd x refit/union geometry) as ONE `_grow`
    # dispatch: the march is a sequential chain of latency-bound local
    # gathers, so 4 separate 192-step marches cost ~4x one 192-step
    # march over 4x the lanes (the same mod-pi stacking as _grow_fb —
    # backward at `ang` is bit-exact forward at `ang + pi`).
    mid1, ang1, th1 = _span_inputs(a, b)
    mid2, ang2, th2 = _span_inputs(a0, b0)
    C = a.shape[0]
    run = _grow(
        jnp.concatenate([mid1, mid1, mid2, mid2], axis=0),
        jnp.concatenate([ang1, ang1 + jnp.pi, ang2, ang2 + jnp.pi]),
        ang_map_s, mag_s_tbl,
        jnp.concatenate([th1, th1, th2, th2], axis=0), +1.0,
        max_steps=192, stride=1.0, bridge=CANON_BRIDGE, angle_tol=0.55,
    )
    fwd1, bwd1 = run[0:C], run[C:2 * C]
    fwd2, bwd2 = run[2 * C:3 * C], run[3 * C:4 * C]

    def _span(mid, ang, fwd, bwd):
        """(lo, hi) signed extent along the REFIT line direction,
        measured from mid_r."""
        off = jnp.sum((mid - mid_r) * dirv, axis=-1)
        sgn = jnp.sign(jnp.sum(
            jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1) * dirv, axis=-1))
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        lo = off - jnp.where(sgn > 0, bwd, fwd)
        hi = off + jnp.where(sgn > 0, fwd, bwd)
        return lo, hi

    lo_r, hi_r = _span(mid1, ang1, fwd1, bwd1)
    lo_u, hi_u = _span(mid2, ang2, fwd2, bwd2)
    pick_u = (hi_u - lo_u) > (hi_r - lo_r)
    lo = jnp.where(pick_u, lo_u, lo_r)
    hi = jnp.where(pick_u, hi_u, hi_r)
    a_c = mid_r + dirv * lo[:, None]
    b_c = mid_r + dirv * hi[:, None]
    a_c = jnp.clip(a_c, 0.0, jnp.asarray([W_img - 1.0, H_img - 1.0]))
    b_c = jnp.clip(b_c, 0.0, jnp.asarray([W_img - 1.0, H_img - 1.0]))

    ln_c = jnp.linalg.norm(b_c - a_c, axis=-1)
    ln_u = jnp.linalg.norm(b - a, axis=-1)
    use_c = (ln_c >= 0.5 * min_length) & (ln_c >= 0.35 * ln_u)
    a_d = jnp.where(use_c[:, None], a_c, a)
    b_d = jnp.where(use_c[:, None], b_c, b)
    return a, b, a_d, b_d, use_c


@partial(jax.jit, static_argnames=("capacity", "cell", "min_length",
                                   "n_octaves", "backend", "base_octave"))
def extract_lines(
    image: jax.Array,
    capacity: int = 128,
    cell: int = 16,
    min_length: float = 24.0,
    n_octaves: int = 2,
    backend: str = "grow",
    base_octave: int = 0,
) -> LineFeatures:
    """Detect up to `capacity` line segments in a grayscale (H,W) image.

    Multi-octave: the detector runs on `n_octaves` half-resolution levels
    (the reference detects per pyramid octave with per-octave top-K,
    src/Lineextractor.cc:119-181, 413-441); coarser octaves recover long
    low-contrast structures whose per-pixel gradients are too noisy at
    full resolution. Candidates are mapped to level-0 coordinates and
    deduplicated jointly (collinear-overlap suppression), then the global
    top-K by length is kept and described against level-0 gradients.

    `base_octave`: first level the MARCH runs on. base_octave=1 skips the
    full-resolution march entirely (the dominant detector cost — its
    latency-bound gathers touch 4x the pixels of L1): detection happens
    on the half-res (and coarser) levels and endpoint geometry is still
    recovered at LEVEL 0 by the canonical-support re-march below
    (_canonical_support re-marches the merged extents against the
    full-res gradients), which is also what the LBD describes against.
    """
    H, W = image.shape
    # Level-0 gradients, computed ONCE and shared by L0 detection and
    # the dedup/describe tail below (they were computed twice before).
    gx, gy = sobel_gradients(image)

    cand_a, cand_b, cand_len, cand_ok, cand_resp = [], [], [], [], []
    cand_oct = []
    lv_img = image
    for lv in range(base_octave + n_octaves):
        if lv > 0:
            # 2x2 mean-pool octave downsample (the reference detects on
            # cv pyramid levels, src/Lineextractor.cc:119-181): a
            # reshape-reduce, ~6x cheaper than bilinear-gather resize on
            # TPU and an anti-aliasing filter at exactly scale 0.5.
            Hc = (lv_img.shape[0] // 2) * 2
            Wc = (lv_img.shape[1] // 2) * 2
            lv_img = lv_img[:Hc, :Wc].reshape(
                Hc // 2, 2, Wc // 2, 2).mean(axis=(1, 3))
        if lv < base_octave:
            continue  # downsample only; no march at this level
        s = 2.0 ** lv
        a, b, ln, ok, cm = _detect_level(
            lv_img, cell, max(min_length / s, 12.0), backend=backend,
            level_cap=max(192, 2 * capacity),
            grads=(gx, gy) if lv == 0 else None,
            seed_cap=LEVEL_SEED_CAP[min(lv, len(LEVEL_SEED_CAP) - 1)],
            max_steps=LEVEL_MAX_STEPS[min(lv, len(LEVEL_MAX_STEPS) - 1)],
        )
        cand_a.append(a * s)
        cand_b.append(b * s)
        cand_len.append(ln * s)
        cand_ok.append(ok)
        cand_resp.append(cm)
        cand_oct.append(jnp.full(ok.shape, lv, jnp.int32))
    a = jnp.concatenate(cand_a)
    b = jnp.concatenate(cand_b)
    length = jnp.concatenate(cand_len)
    ok = jnp.concatenate(cand_ok)
    cmax = jnp.concatenate(cand_resp)
    octv = jnp.concatenate(cand_oct)

    # Mean gradient magnitude along the kept run as the response.
    response = jnp.where(ok, length * 0.0 + cmax, 0.0)

    # --- MERGE collinear overlapping runs, then suppress duplicates ---
    # Many seeds on one physical edge grow into overlapping capped runs
    # whose fragment boundaries shift with the grid as the camera moves —
    # the dominant frame-to-frame repeatability failure. Discarding all
    # but the longest (round-2 behavior) kept a fragment of the edge;
    # merging extends the survivor to the UNION extent of its collinear
    # group (the reference's mergeSegments, src/Lineextractor.cc:545-615),
    # so the recovered segment covers the whole edge regardless of where
    # individual seeds landed. Two rounds handle chains (A~B, B~C).
    H_img, W_img = image.shape
    for _merge_round in range(2):
        mid = 0.5 * (a + b)
        ang = jnp.arctan2(b[:, 1] - a[:, 1], b[:, 0] - a[:, 0])
        dv = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # unit dir
        nv = jnp.stack([-dv[:, 1], dv[:, 0]], axis=-1)         # unit normal
        dm = mid[None, :, :] - mid[:, None, :]                 # j rel. to i
        perp = jnp.abs(jnp.sum(dm * nv[:, None, :], axis=-1))
        along = jnp.abs(jnp.sum(dm * dv[:, None, :], axis=-1))
        # gap bridge: disjoint capped runs along one edge merge when
        # their spans come within 8 px (the reference bridges gaps in
        # mergeSegments too; seeds in different grid cells grow runs
        # that need not touch). A marginal bridge is a repeatability
        # hazard: the same physical line then merges in one frame and
        # stays split in the next (observed on crossing lines, where
        # growth stops at the junction).
        half_span = 0.5 * (length[:, None] + length[None, :]) + 4.0
        same_line = (
            (_angle_diff(ang[:, None], ang[None, :]) < 0.1)
            & (perp < 4.0)
            & (along < half_span)
            & ok[:, None] & ok[None, :]
        )
        # Union extent along segment i's axis over its collinear group.
        ta = jnp.sum((a[None, :, :] - mid[:, None, :]) * dv[:, None, :], -1)
        tb = jnp.sum((b[None, :, :] - mid[:, None, :]) * dv[:, None, :], -1)
        t_lo = jnp.minimum(ta, tb)
        t_hi = jnp.maximum(ta, tb)
        tmin = jnp.min(jnp.where(same_line, t_lo, jnp.inf), axis=1)
        tmax = jnp.max(jnp.where(same_line, t_hi, -jnp.inf), axis=1)
        grew = ok & jnp.isfinite(tmin) & jnp.isfinite(tmax)
        a_new = mid + tmin[:, None] * dv
        b_new = mid + tmax[:, None] * dv
        a = jnp.where(grew[:, None], a_new, a)
        b = jnp.where(grew[:, None], b_new, b)
        a = jnp.clip(a, 0.0, jnp.asarray([W_img - 1.0, H_img - 1.0]))
        b = jnp.clip(b, 0.0, jnp.asarray([W_img - 1.0, H_img - 1.0]))
        length = jnp.linalg.norm(b - a, axis=-1)
        # A merged extent that left the image collapses under the clip;
        # re-apply the length gate on the MERGED extent so degenerate
        # scraps can't reach top-K (their pre-merge ok was earned at a
        # different extent).
        ok = ok & (length >= 0.5 * min_length)
    # After merging, group members share (nearly) the same extent: keep
    # only the longest per group (ties break by index). Group membership
    # recomputed on the MERGED extents (the loop's same_line predates the
    # final extent update).
    mid = 0.5 * (a + b)
    ang = jnp.arctan2(b[:, 1] - a[:, 1], b[:, 0] - a[:, 0])
    dv = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    nv = jnp.stack([-dv[:, 1], dv[:, 0]], axis=-1)
    dm = mid[None, :, :] - mid[:, None, :]
    perp = jnp.abs(jnp.sum(dm * nv[:, None, :], axis=-1))
    along = jnp.abs(jnp.sum(dm * dv[:, None, :], axis=-1))
    half_span = 0.5 * (length[:, None] + length[None, :]) + 4.0
    same_line = (
        (_angle_diff(ang[:, None], ang[None, :]) < 0.1)
        & (perp < 4.0)
        & (along < half_span)
    )
    score = jnp.where(ok, length, -1.0)
    better = (score[None, :] > score[:, None]) | (
        (score[None, :] == score[:, None])
        & (jnp.arange(score.shape[0])[None, :] < jnp.arange(score.shape[0])[:, None])
    )
    dominated = jnp.any(same_line & better & ok[None, :], axis=1)
    ok = ok & ~dominated

    # --- suppress the border ring ---
    # The zero-pad Sobel (see sobel_gradients) makes the image boundary a
    # maximal gradient, so four phantom full-edge segments hug the frame
    # in EVERY image. They carry no scene information, their descriptors
    # collide with each other across frames (the border doesn't move with
    # content), and they eat 4 top-K slots. A segment whose BOTH endpoints
    # lie within 3 px of the same image edge is the artifact.
    margin = 3.0
    for k_ax, lim in ((0, W_img - 1.0), (1, H_img - 1.0)):
        on_low = (a[:, k_ax] < margin) & (b[:, k_ax] < margin)
        on_high = (a[:, k_ax] > lim - margin) & (b[:, k_ax] > lim - margin)
        ok = ok & ~on_low & ~on_high

    # --- top-K by length ---
    sel_score = jnp.where(ok, length, -1.0)
    top_val, top_i = jax.lax.top_k(sel_score, capacity)
    a = a[top_i]
    b = b[top_i]
    valid = top_val > 0

    a, b, a_d, b_d, use_c = _canonical_support(
        a, b, gx, gy, W_img, H_img, min_length
    )

    seg = jnp.concatenate([a, b], axis=-1)
    mid = 0.5 * (a + b)
    d = b - a
    ang = jnp.arctan2(d[:, 1], d[:, 0])
    ln = jnp.linalg.norm(d, axis=-1)

    seg_d = jnp.concatenate([a_d, b_d], axis=-1)
    d_d = b_d - a_d
    desc = lbd_descriptor(image, gx, gy, seg_d,
                          jnp.arctan2(d_d[:, 1], d_d[:, 0]),
                          jnp.linalg.norm(d_d, axis=-1))
    return LineFeatures(
        seg=seg,
        midpoint=mid,
        angle=ang,
        length=jnp.where(valid, ln, 0.0),
        response=response[top_i],
        desc=desc,
        valid=valid,
        octave=jnp.where(valid, octv[top_i], 0),
    )


N_BANDS = 8          # bands across the line support region
BAND_SAMPLES = 16    # samples along the line per band
BAND_WIDTH = 7.0     # support region half-width in px
LBD_SMOOTH = 2       # [1,2,1]/4 separable passes on (gx, gy) pre-sampling
#   Swept on the grid-scene matcher re-association + shared-texture
#   true/false Hamming separation: 1 pass 0.522/0.595 (sep 49|70),
#   2 passes 0.557/0.637 (sep 36|68) <- best, 3 passes ~tied, 4 passes
#   over-smooths (0.535/0.614, false floor drops to 58).
#   MEASURED-WORSE (don't re-try): a per-line noise floor that
#   soft-thresholds samples below a fraction of the line's peak
#   magnitude (zeroing off-support noise bands) collapses true/false
#   separation on textured scenes — at frac=0.1 true-pair median
#   Hamming 47 vs false 5th-percentile 51 — because weak surrounding
#   texture is exactly what distinguishes parallel same-stroke lines
#   (grid scenes). The smoothing passes already de-noise the samples.


def lbd_descriptor(
    image: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    seg: jax.Array,
    angle: jax.Array,
    length: jax.Array,
) -> jax.Array:
    """LBD-like 256-bit banded gradient descriptor for segments [L,4].

    Gradients are rotated into the line frame (d_parallel, d_perp), pooled
    per band into (mean+, mean-, std+, std-) statistics over both axes;
    adjacent-band statistic comparisons binarize to 256 bits.

    Extent robustness: each sample COLUMN (one position along the line,
    all bands) is weighted by the on-line gradient magnitude at that
    position. The detector's collinear merge recovers the union extent of
    a fragment group, which wobbles by a few px with image noise; with
    uniform pooling every band statistic shifts with the endpoints
    (measured: a 10-15 px extent change flips ~40% of bits — worse than
    the matching budget), while magnitude weighting zeroes the overhang
    columns (off the physical edge there is no on-line gradient) and
    re-centers the statistics on the edge's actual support."""
    L = seg.shape[0]
    # Smooth the gradient fields before sampling (separable [1,2,1]/4,
    # LBD_SMOOTH passes ~ Gaussian sigma ~1 px each): each band sample
    # then represents a local AREA average, approximating the dense
    # Gaussian-weighted band integral of the real LBD
    # (binary_descriptor_custom.cpp) instead of a point lattice of raw
    # pixel noise. Without it the descriptor is a noise hash of the exact
    # sampling grid — measured: sliding the lattice 2 px ALONG the line
    # (identical physical segment) flipped 56-103/256 bits; a 0.5 px
    # perpendicular registration shift flipped 24-50.
    for _ in range(LBD_SMOOTH):
        gx = _smooth121(gx)
        gy = _smooth121(gy)
    Hh, Ww = gx.shape
    gx_tbl = _pack4(gx)
    gy_tbl = _pack4(gy)
    t = jnp.linspace(0.05, 0.95, BAND_SAMPLES)
    band_off = jnp.linspace(-BAND_WIDTH, BAND_WIDTH, N_BANDS)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # Sample grid [L, N_BANDS, BAND_SAMPLES]
    base_x = seg[:, 0, None] + (seg[:, 2] - seg[:, 0])[:, None] * t[None, :]
    base_y = seg[:, 1, None] + (seg[:, 3] - seg[:, 1])[:, None] * t[None, :]
    off_x = -sa[:, None] * band_off[None, :]
    off_y = ca[:, None] * band_off[None, :]
    xs = base_x[:, None, :] + off_x[:, :, None]
    ys = base_y[:, None, :] + off_y[:, :, None]
    sgx = _bilinear_p(gx_tbl, Hh, Ww, xs, ys)
    sgy = _bilinear_p(gy_tbl, Hh, Ww, xs, ys)
    # Rotate into the line frame.
    g_par = ca[:, None, None] * sgx + sa[:, None, None] * sgy
    g_perp = -sa[:, None, None] * sgx + ca[:, None, None] * sgy

    # On-line support weight per sample column: max magnitude over a
    # +-1 px normal probe at the base position (the subpixel endpoints
    # need not sit exactly on the maximal-gradient ridge).
    mags = []
    for probe in (-1.0, 0.0, 1.0):
        mgx = _bilinear_p(gx_tbl, Hh, Ww, base_x - sa[:, None] * probe,
                          base_y + ca[:, None] * probe)
        mgy = _bilinear_p(gy_tbl, Hh, Ww, base_x - sa[:, None] * probe,
                          base_y + ca[:, None] * probe)
        mags.append(mgx * mgx + mgy * mgy)
    w = jnp.sqrt(jnp.maximum(jnp.maximum(mags[0], mags[1]), mags[2]))
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)
    w = w[:, None, :]                                # [L,1,S]

    def stats(g):
        pos = jnp.maximum(g, 0.0)
        neg = jnp.maximum(-g, 0.0)

        def wmean(x):
            return jnp.sum(w * x, axis=-1)

        def wstd(x):
            m = wmean(x)
            return jnp.sqrt(jnp.maximum(wmean(x * x) - m * m, 0.0))

        return jnp.stack(
            [wmean(pos), wmean(neg), wstd(pos), wstd(neg)],
            axis=-1,
        )  # [L, N_BANDS, 4]

    feats = jnp.concatenate([stats(g_par), stats(g_perp)], axis=-1)  # [L,8,8]
    flat = feats.reshape(L, N_BANDS * 8)  # [L,64]
    # Structured band-pair comparisons (the real LBD compares statistics
    # of NEIGHBORING bands, binary_descriptor_custom.cpp): all ordered
    # band pairs (i<j) x 8 statistics = 224 bits — nearby-band pairs
    # carry the fine structure, distant pairs the global ramp — plus 32
    # same-band cross-statistic bits (mean+ vs mean-, std+ vs std-,
    # parallel vs perpendicular energy).
    pi_, pj_ = [], []
    for i in range(N_BANDS):
        for j in range(i + 1, N_BANDS):
            for s_ in range(8):
                pi_.append(i * 8 + s_)
                pj_.append(j * 8 + s_)
    for i in range(N_BANDS):
        pi_ += [i * 8 + 0, i * 8 + 2, i * 8 + 0, i * 8 + 2]
        pj_ += [i * 8 + 1, i * 8 + 3, i * 8 + 4, i * 8 + 6]
    i_idx = jnp.asarray(pi_, jnp.int32)
    j_idx = jnp.asarray(pj_, jnp.int32)
    bits = (flat[:, i_idx] > flat[:, j_idx]).astype(jnp.uint32)
    words = bits.reshape(L, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1)
