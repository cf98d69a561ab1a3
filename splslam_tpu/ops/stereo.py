"""Stereo left-right keypoint matching with subpixel refinement.

Re-expresses Frame::ComputeStereoMatches (reference: src/Frame.cc:881-1055)
as fixed-shape tensor passes:
  1. all-pairs Hamming distances, masked by epipolar row distance, octave
     compatibility and the [0, fx] disparity window;
  2. row-wise argmin;
  3. SSD subpixel refinement: an 11-wide correlation window slid +-5 px
     (in keypoint-octave scale units) over a bilinear-sampled strip of the
     right image, parabola-fit minimum (reference :966-1038);
  4. outlier rejection at 1.5*1.4*median SSD (reference :1041-1054).
Depth follows z = bf / disparity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from splslam_tpu.ops.match import (
    TH_HIGH,
    hamming_from_bits,
    masked_distances,
    nn_match,
    octave_mask,
)

_W = 5      # correlation half-window (11x11 patch, reference w=5)
_R = 5      # search half-range in scaled pixels (reference L=5)


def bilinear_sample(image: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample image (H,W) at fractional coords xy (...,2) -> (...)."""
    H, W = image.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = image.reshape(-1)
    base = y0 * W + x0
    shp = base.shape
    take = lambda i: jnp.take(flat, i.reshape(-1)).reshape(shp)
    v00 = take(base)
    v01 = take(base + 1)
    v10 = take(base + W)
    v11 = take(base + W + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def masked_median(values: jax.Array, mask: jax.Array, fill: float = jnp.inf) -> jax.Array:
    """Median of values[mask] (jit-safe: sorts with +inf fill)."""
    n = jnp.sum(mask)
    s = jnp.sort(jnp.where(mask, values, fill))
    idx = jnp.clip(n // 2, 0, values.shape[0] - 1)
    return s[idx]


def stereo_match(
    featL,
    featR,
    imgL: jax.Array,
    imgR: jax.Array,
    scales: jax.Array,
    bf: jax.Array,
    fx: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Match left ORB features to right, refine disparity, return depth.

    featL/featR: OrbFeatures (level-0 coords). scales: [n_levels] f32 lookup
    of per-octave scale. Returns (u_right [N], depth [N]) with -1 where no
    valid stereo match (the reference's mvuRight/mvDepth convention,
    include/Frame.h:161).
    """
    dist = hamming_from_bits(featL.bits, featR.bits)

    sL = scales[featL.octave]  # [NL]
    sR = scales[featR.octave]  # [NR]
    # Epipolar row gate: |vL - vR| <= 2 * max(scaleL, scaleR).
    row_r = 2.0 * jnp.maximum(sL[:, None], sR[None, :])
    row_ok = jnp.abs(featL.xy[:, 1:2] - featR.xy[None, :, 1]) <= row_r
    oct_ok = octave_mask(featL.octave, featR.octave, -1, 1)
    disp = featL.xy[:, 0:1] - featR.xy[None, :, 0]
    disp_ok = (disp > -3.0) & (disp < fx)

    d = masked_distances(dist, featL.valid, featR.valid, row_ok & oct_ok & disp_ok)
    best, bestd = nn_match(d, max_dist=TH_HIGH)
    matched = best >= 0
    bi = jnp.clip(best, 0)

    # ---- SSD subpixel refinement around the matched right keypoint ----
    # Sample both patches from the full-res images with spacing = octave
    # scale (equivalent to working on the pyramid level, without the
    # data-dependent choice among level buffers). Latency engineering:
    # nearest-integer sampling (ONE gather per tap instead of four
    # bilinear taps — the reference also correlates integer windows on
    # the level image, subpixel comes from the parabola fit), and the 11
    # sliding windows come from STATIC slices of the strip, not a gather.
    s = sL  # [N]
    dy = jnp.arange(-_W, _W + 1, dtype=jnp.float32)
    dxw = jnp.arange(-_W, _W + 1, dtype=jnp.float32)
    dxs = jnp.arange(-_W - _R, _W + _R + 1, dtype=jnp.float32)  # strip: 21 wide

    cL = featL.xy                      # [N,2]
    uR0 = featR.xy[bi, 0]              # [N]

    H, W = imgL.shape
    N = cL.shape[0]
    n_row = 2 * _W + 1

    # Tiled row-gather + narrow one-hot column matmuls instead of
    # elementwise gathers (TPU general gathers serialized this stage to
    # ~3 ms; row gathers are plain DMAs and column picks ride the MXU in
    # bf16 — exact for one-hot selection of 8-bit pixel values). Every
    # sample column lies within +-36 px of its keypoint (offsets reach
    # (R+W)*max_scale = 10*3.58), so instead of one-hotting over the
    # full image width we gather a 128-wide tile from a 32-stride tile
    # pyramid: the one-hot contraction shrinks from W (1241 on KITTI)
    # to 128 lanes — ~10x less pick work.
    TILE, STRIDE = 128, 32
    nt = -(-W // STRIDE)
    pad_w = STRIDE * nt + (TILE - STRIDE) - W
    ry = jnp.clip(
        jnp.round(cL[:, 1:2] + s[:, None] * dy[None, :]).astype(jnp.int32),
        0, H - 1,
    )                                                    # [N,11]

    def tiles_of(img):
        p = jnp.pad(img.astype(jnp.bfloat16), ((0, 0), (0, pad_w)))
        parts = [
            p[:, o * STRIDE:o * STRIDE + STRIDE * nt].reshape(H, nt, STRIDE)
            for o in range(TILE // STRIDE)
        ]
        return jnp.concatenate(parts, axis=2)            # [H, nt, TILE]

    def tile_rows(img, centers):
        tj = jnp.clip(((jnp.round(centers).astype(jnp.int32) - 36)
                       // STRIDE), 0, nt - 1)            # [N]
        t0 = tj * STRIDE
        T = tiles_of(img).reshape(H * nt, TILE)
        flat = ry * nt + tj[:, None]                     # [N,11]
        rows = jnp.take(T, flat.reshape(-1), axis=0)
        return rows.reshape(N, n_row, TILE), t0

    rows_l, t0_l = tile_rows(imgL, cL[:, 0])
    rows_r, t0_r = tile_rows(imgR, uR0)

    cols_w = jnp.arange(TILE, dtype=jnp.int32)

    def col_pick(rows, centers, offs, t0):
        idx = jnp.clip(
            jnp.round(centers[:, None] + s[:, None] * offs[None, :]),
            0, W - 1,
        ).astype(jnp.int32) - t0[:, None]                # [N,C] local
        idx = jnp.clip(idx, 0, TILE - 1)
        onehot = (cols_w[None, None, :] == idx[:, :, None]).astype(
            jnp.bfloat16
        )                                                # [N,C,TILE]
        return jnp.einsum(
            "nrw,ncw->nrc", rows, onehot,
            preferred_element_type=jnp.float32,
        )

    patchL = col_pick(rows_l, cL[:, 0], dxw, t0_l)       # [N,11,11]
    strip = col_pick(rows_r, uR0, dxs, t0_r)             # [N,11,21]

    # IC normalization: subtract the window center value (reference :989).
    patchL = patchL - patchL[:, _W, _W][:, None, None]
    # 11 sliding windows from the 21-wide strip via static slices.
    wins = jnp.stack(
        [strip[:, :, k:k + 2 * _W + 1] for k in range(2 * _R + 1)], axis=1
    )                                        # [N, shift, row, col]
    wins = wins - wins[:, :, _W, _W][:, :, None, None]
    ssd = jnp.sum((wins - patchL[:, None]) ** 2, axis=(2, 3))  # [N,11]

    best_s = jnp.argmin(ssd, axis=1)
    bd = ssd[jnp.arange(ssd.shape[0]), best_s]
    interior = (best_s > 0) & (best_s < 2 * _R)
    bm1 = ssd[jnp.arange(ssd.shape[0]), jnp.clip(best_s - 1, 0)]
    bp1 = ssd[jnp.arange(ssd.shape[0]), jnp.clip(best_s + 1, 0, 2 * _R)]
    denom = bm1 + bp1 - 2.0 * bd
    delta = jnp.where(jnp.abs(denom) > 1e-6, (bm1 - bp1) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    shift = (best_s.astype(jnp.float32) - _R) + jnp.where(interior, delta, 0.0)

    u_right = uR0 + s * shift
    disparity = cL[:, 0] - u_right
    ok = matched & (disparity > 0.01) & (disparity < fx)

    # Median SSD outlier gate (reference thDist = 1.5 * 1.4 * median).
    med = masked_median(bd, ok)
    ok = ok & (bd <= 1.5 * 1.4 * med)

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    u_right = jnp.where(ok, u_right, -1.0)
    return u_right, depth


def depth_from_rgbd(feat, depth_map: jax.Array, bf: jax.Array,
                    depth_factor: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """RGB-D variant (reference Frame::ComputeStereoFromRGBD): read the
    depth image at each keypoint, synthesize a virtual right coordinate."""
    xy = feat.xy.astype(jnp.int32)
    H, W = depth_map.shape
    d = jnp.take(
        depth_map.reshape(-1),
        jnp.clip(xy[:, 1], 0, H - 1) * W + jnp.clip(xy[:, 0], 0, W - 1),
    )
    d = d * depth_factor
    ok = feat.valid & (d > 0)
    u_right = jnp.where(ok, feat.xy[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0)
    return u_right, jnp.where(ok, d, -1.0)
