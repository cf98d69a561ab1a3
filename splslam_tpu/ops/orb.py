"""ORB keypoint orientation + rBRIEF descriptors, batched over keypoints.

TPU-native re-expression of ORBextractor (reference: src/ORBextractor.cc):
- IC-angle orientation (:472) -> batched 31x31 patch gather + masked moment
  sums, vmap-free (one gather for all keypoints).
- 256-bit rBRIEF (:108-409, hardcoded learned pair pattern) -> a seeded
  Gaussian pair pattern (BRIEF-style; NOT copied from the reference — the
  framework matches descriptors only against itself, so the exact pattern
  is free as long as it is fixed and well-spread) rotated per keypoint,
  sampled with one gather, packed to 8 uint32 words for popcount matching.
- The full multi-level extractor: dense FAST -> border mask -> grid top-k
  -> orientation -> descriptors, concatenated across levels into one
  fixed-capacity feature table.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from splslam_tpu.ops.fast import fast_corners
from splslam_tpu.ops.pyramid import PyramidSpec, build_pyramid, gaussian_blur
from splslam_tpu.ops.topk import grid_topk

HALF_PATCH = 15          # orientation patch radius (reference HALF_PATCH_SIZE)
EDGE_THRESHOLD = 19      # border excluded from detection (reference :47)
N_BITS = 256
N_WORDS = N_BITS // 32


def make_pattern(seed: int = 7) -> np.ndarray:
    """(256, 4) int8 test-pair pattern [x1,y1,x2,y2], Gaussian sigma=patch/5,
    clipped to the 31x31 patch. Fixed seed => reproducible descriptors."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, (2 * HALF_PATCH + 1) / 5.0, size=(N_BITS, 4))
    pts = np.clip(np.round(pts), -HALF_PATCH + 2, HALF_PATCH - 2)
    return pts.astype(np.int8)


_PATTERN = make_pattern()


class OrbFeatures(NamedTuple):
    """Fixed-capacity struct-of-arrays keypoint table (one frame)."""

    xy: jax.Array        # [N,2] f32, level-0 pixel coords [x, y]
    response: jax.Array  # [N] f32
    angle: jax.Array     # [N] f32 radians
    octave: jax.Array    # [N] int32
    sigma2: jax.Array    # [N] f32 scale^2 of the level (for chi2 gates)
    desc: jax.Array      # [N, 8] uint32 packed 256-bit descriptors
    valid: jax.Array     # [N] bool
    bits: jax.Array      # [N,256] bf16 +-1 bit planes — the MXU-ready
    #                      form of `desc`, cached at extraction so every
    #                      matcher skips the unpack (Hamming = matmul)

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def _gather_patches(image: jax.Array, xy: jax.Array, offsets_y: jax.Array,
                    offsets_x: jax.Array) -> jax.Array:
    """Gather image values at xy (N,2 int) + per-sample integer offsets.

    offsets_*: [...,] broadcastable against [N, ...]. Returns [N, ...] f32.
    Coordinates are clipped (border corners were already excluded)."""
    H, W = image.shape
    ys = jnp.clip(xy[:, 1][:, None] + offsets_y.reshape(1, -1), 0, H - 1)
    xs = jnp.clip(xy[:, 0][:, None] + offsets_x.reshape(1, -1), 0, W - 1)
    # flat 1D gather: an order of magnitude faster than 2D gather on TPU
    vals = jnp.take(image.reshape(-1), (ys * W + xs).reshape(-1))
    return vals.reshape((xy.shape[0],) + offsets_y.shape)


def ic_angle(image: jax.Array, xy_int: jax.Array) -> jax.Array:
    """Intensity-centroid orientation for keypoints at integer coords (N,2).

    angle = atan2(m01, m10) over the circular 31x31 patch
    (reference: src/ORBextractor.cc:472 IC_Angle)."""
    r = HALF_PATCH
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1), jnp.arange(-r, r + 1), indexing="ij"
    )
    circle = (dy * dy + dx * dx) <= r * r
    patches = _gather_patches(image, xy_int, dy, dx)  # [N,31,31]
    w = jnp.where(circle, 1.0, 0.0)
    m10 = jnp.sum(patches * (dx * w)[None], axis=(1, 2))
    m01 = jnp.sum(patches * (dy * w)[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def ic_angle_dense(image: jax.Array, xy_int: jax.Array) -> jax.Array:
    """Conv-based IC angle: the circular moment sums m10/m01 are fixed
    31x31 convolutions of the image — MXU work instead of a 961-tap
    gather per keypoint. Only 2 scalars per keypoint are gathered."""
    r = HALF_PATCH
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="ij",
    )
    circle = ((dy * dy + dx * dx) <= r * r).astype(jnp.float32)
    # lax.conv_general_dilated is cross-correlation (no kernel flip), so
    # the moment kernels are used as-is.
    kx = dx * circle
    ky = dy * circle
    k = jnp.stack([kx, ky])[:, None]  # [2,1,31,31]
    m = jax.lax.conv_general_dilated(
        image[None, None], k, (1, 1), [(r, r), (r, r)],
        preferred_element_type=jnp.float32,
    )[0]                               # [2,H,W]
    H, W = image.shape
    flat_idx = (
        jnp.clip(xy_int[:, 1], 0, H - 1) * W + jnp.clip(xy_int[:, 0], 0, W - 1)
    )
    m10 = jnp.take(m[0].reshape(-1), flat_idx)
    m01 = jnp.take(m[1].reshape(-1), flat_idx)
    return jnp.arctan2(m01, m10)


def rbrief(blurred: jax.Array, xy_int: jax.Array, angle: jax.Array):
    """Rotated BRIEF descriptors: (N,2) int coords + (N,) angle ->
    ((N,8) u32 packed, (N,256) bf16 +-1 bit planes)."""
    pat = jnp.asarray(_PATTERN, jnp.float32)  # [256,4]
    ca, sa = jnp.cos(angle), jnp.sin(angle)   # [N]
    # Rotate both test points of every pair (steered BRIEF, reference :431).
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    def rot(px, py):
        rx = jnp.round(ca[:, None] * px[None] - sa[:, None] * py[None])
        ry = jnp.round(sa[:, None] * px[None] + ca[:, None] * py[None])
        return rx.astype(jnp.int32), ry.astype(jnp.int32)

    rx1, ry1 = rot(x1, y1)  # [N,256]
    rx2, ry2 = rot(x2, y2)
    H, W = blurred.shape
    cx = xy_int[:, 0][:, None]
    cy = xy_int[:, 1][:, None]
    flat = blurred.reshape(-1)
    i1 = jnp.clip(cy + ry1, 0, H - 1) * W + jnp.clip(cx + rx1, 0, W - 1)
    i2 = jnp.clip(cy + ry2, 0, H - 1) * W + jnp.clip(cx + rx2, 0, W - 1)
    v1 = jnp.take(flat, i1.reshape(-1)).reshape(i1.shape)
    v2 = jnp.take(flat, i2.reshape(-1)).reshape(i2.shape)
    bits = (v1 < v2).astype(jnp.uint32)  # [N,256]
    words = bits.reshape(-1, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(words << shifts[None, None, :], axis=-1)
    pm1 = (bits.astype(jnp.bfloat16) * 2.0 - 1.0)
    return packed, pm1


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _lane_pad(w: int) -> int:
    return -(-w // 128) * 128


@partial(jax.jit, static_argnames=("spec", "threshold", "cell", "cell_k"))
def extract_orb(
    image: jax.Array,
    spec: PyramidSpec,
    threshold: float = 12.0,
    cell: int = 16,
    cell_k: int = 4,
) -> OrbFeatures:
    """Full multi-level ORB extraction for one grayscale image (H,W) f32.

    Detection (pyramid, dense FAST + NMS, grid top-k) runs per level in
    XLA; orientation + descriptors run in ONE pass over a packed blurred
    pyramid — a Pallas patch kernel on TPU (ops/orb_pallas.py; patch
    gathers are the profile-dominant cost in pure XLA), the arithmetic-
    identical XLA fallback elsewhere.
    """
    from splslam_tpu.ops import orb_pallas as OP

    levels = build_pyramid(image, spec)
    Wp = _lane_pad(spec.sizes[0][1])
    det = []
    blur_rows = []
    row_off = []
    acc = 0
    for lv, img in enumerate(levels):
        H, W = spec.sizes[lv]
        budget = spec.budgets[lv]
        blur_rows.append(jnp.pad(gaussian_blur(img), ((0, 0), (0, Wp - W))))
        row_off.append(acc)
        acc += H
        if budget == 0:
            continue
        score = fast_corners(img, threshold)
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        b = EDGE_THRESHOLD
        inside = (ys >= b) & (ys < H - b) & (xs >= b) & (xs < W - b)
        score = jnp.where(inside, score, 0.0)
        xy, resp, valid = grid_topk(score, budget, cell=cell, cell_k=cell_k)
        det.append((lv, xy, resp, valid))
    # Alignment padding for the Pallas kernel's (8,128)-aligned window
    # loads: 8 extra rows below, 128 extra columns right.
    packed = jnp.concatenate(
        blur_rows + [jnp.zeros((8, Wp), jnp.float32)], axis=0
    )
    # bf16 halves the copy traffic of the patch stage; 256 pad columns
    # cover the kernel's lane-aligned 256-wide DMA windows.
    packed = jnp.pad(packed, ((0, 0), (0, 256))).astype(jnp.bfloat16)

    cys, cxs = [], []
    for (lv, xy, resp, valid) in det:
        xi = xy.astype(jnp.int32)
        # corner = keypoint - 19 is in-bounds for valid detections (FAST
        # border = 19 = OP.C); clamp handles the padded/invalid rows.
        cys.append(jnp.clip(xi[:, 1] - OP.C + row_off[lv], 0, acc - OP.PATCH))
        cxs.append(jnp.clip(xi[:, 0] - OP.C, 0, Wp - OP.PATCH))
    corner_y = jnp.concatenate(cys)
    corner_x = jnp.concatenate(cxs)

    if _use_pallas():
        ang, desc, bits = OP.patch_orient_describe(packed, corner_y, corner_x)
    else:
        ang, desc, bits = OP.patch_orient_describe_xla(
            packed, corner_y, corner_x
        )

    outs = []
    i0 = 0
    for (lv, xy, resp, valid) in det:
        budget = xy.shape[0]
        s = spec.scales[lv]
        sl = slice(i0, i0 + budget)
        outs.append(
            OrbFeatures(
                xy=xy * s,
                response=resp,
                angle=ang[sl],
                octave=jnp.full((budget,), lv, jnp.int32),
                sigma2=jnp.full((budget,), spec.sigma2[lv], jnp.float32),
                desc=desc[sl],
                valid=valid,
                bits=bits[sl],
            )
        )
        i0 += budget
    return OrbFeatures(*[jnp.concatenate(xs, axis=0) for xs in zip(*outs)])
