"""Dense, fully-vectorized FAST-9/16 corner scoring.

Replaces the per-cell cv::FAST loops of ORBextractor::ComputeKeyPointsOctTree
(reference: src/ORBextractor.cc:765-1041). Instead of iterating 30x30 cells
with two thresholds, we compute a FAST score for EVERY pixel as one tensor
program (16 shifted copies of the image -> arc minima via circular rolls),
apply 3x3 non-max suppression, and let the grid top-k selector
(splslam_tpu.ops.topk) enforce spatial spread. On TPU this is pure VPU work
that XLA fuses into a handful of passes over the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (the standard FAST-16 ring, clockwise from
# 12 o'clock). (dy, dx) offsets.
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9  # FAST-9: need 9 contiguous ring pixels all brighter/darker


def _shifted(image: jax.Array, dy: int, dx: int) -> jax.Array:
    """image shifted so out[y,x] = image[y+dy, x+dx] (zero padded)."""
    H, W = image.shape
    padded = jnp.pad(image, 3)
    return jax.lax.dynamic_slice(padded, (3 + dy, 3 + dx), (H, W))


def fast_score_map(image: jax.Array, threshold: float) -> jax.Array:
    """(H,W) f32 image -> (H,W) f32 corner score map.

    Score is the classic FAST "V" measure: the largest margin m such that
    some 9-arc is entirely brighter than center+m (or darker than
    center-m). Non-corners get 0. A 3px border is zeroed.
    """
    H, W = image.shape
    # bf16 ring arithmetic: FAST margins are differences of 8-bit pixel
    # values (<= 255, exact in bf16's 8-bit mantissa up to 256); halves
    # the HBM traffic of the 16-image ring stack.
    img16 = image.astype(jnp.bfloat16)
    ring = jnp.stack(
        [_shifted(img16, dy, dx) for (dy, dx) in _CIRCLE]
    )                               # [16,H,W]
    d_bright = ring - img16[None]   # >t means ring pixel brighter by t
    d_dark = img16[None] - ring     # >t means ring pixel darker by t

    def arc_min(d):
        # m[a] = min(d[a], d[a+1], ..., d[a+8]) circularly, via log-step rolls.
        m = jnp.minimum(d, jnp.roll(d, -1, axis=0))          # runs of 2
        m = jnp.minimum(m, jnp.roll(d, -2, axis=0))          # runs of 3
        m4 = jnp.minimum(m, jnp.roll(m, -3, axis=0))         # runs of 6
        m8 = jnp.minimum(m4, jnp.roll(m, -6, axis=0))        # runs of 9
        return jnp.max(m8, axis=0)

    score = jnp.maximum(arc_min(d_bright), arc_min(d_dark)).astype(
        jnp.float32
    )
    score = jnp.where(score > threshold, score, 0.0)
    # Zero the ring border.
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inside = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(inside, score, 0.0)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression; keeps strict local maxima."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= neigh, score, 0.0)


def fast_corners(image: jax.Array, threshold: float) -> jax.Array:
    """Dense FAST + NMS in one call: (H,W) -> (H,W) sparse score map."""
    return nms3(fast_score_map(image, threshold))
