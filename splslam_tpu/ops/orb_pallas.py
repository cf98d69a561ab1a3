"""Pallas TPU kernel: per-keypoint IC-angle + rBRIEF from VMEM patches.

The profile-dominant cost of frame building is per-keypoint patch access:
XLA lowers the 31x31 orientation window (961 taps) and the 512 rBRIEF
samples per keypoint to general gathers at ~6 cycles/tap — ~29 ms of the
32 ms per KITTI image. This kernel keeps the (blurred) image pyramid
RESIDENT IN VMEM and processes KP_BLOCK keypoints per grid step (TPU
block tiling wants output sublanes in multiples of 8):

  - each 40x40 patch is ONE dynamic slice (vector loads, no gather);
  - intensity-centroid moments are masked 40x40 reductions (VPU);
  - the 256 rotated BRIEF point-pairs are read with a one-hot
    select-reduce over the flattened patch (compare + where + sum —
    pure vector ops, no scalar loop);
  - bit words pack outside the kernel (cheap XLA shifts).

The pyramid is packed row-wise into a single [R, Wp] buffer (levels
stacked vertically, width padded to the lane multiple), so one kernel
invocation serves every level. Keypoint coordinates arrive as
scalar-prefetch arrays so the slice offsets are known up front
(pltpu.PrefetchScalarGridSpec).

`interpret=True` runs the same kernel on CPU for tests;
`patch_orient_describe_xla` is the arithmetic-identical pure-XLA
fallback used on non-TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splslam_tpu.ops.orb import _PATTERN

PATCH = 40  # rotated BRIEF offsets reach +-19 px (pattern radius 13*sqrt2)
WIN_R = 48   # loaded rows: patch + up to 7 sublane-alignment rows
WIN_C = 168  # loaded cols: patch + up to 127 lane-alignment cols
#             (Mosaic vector loads need (8,128)-aligned starts)
C = 19      # patch center; equals the detector's EDGE_THRESHOLD border,
#             so corner = keypoint - 19 is in-bounds by construction
R_C = 15    # IC-angle circle radius (reference HALF_PATCH_SIZE)
KP_BLOCK = 32  # keypoints per grid step (amortizes per-step overhead)


def _extract_patch(win, r8, rc):
    """(48,168) aligned window + (row, col) remainders -> exact (40,40)
    patch via two one-hot selection matmuls (MXU work; in-vector dynamic
    slices are not lowerable)."""
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (PATCH, WIN_R), 0)
    rows_j = jax.lax.broadcasted_iota(jnp.int32, (PATCH, WIN_R), 1)
    rowsel = (rows_j == rows_i + r8).astype(jnp.float32)      # [40,48]
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, PATCH), 0)
    cols_j = jax.lax.broadcasted_iota(jnp.int32, (WIN_C, PATCH), 1)
    colsel = (cols_i == cols_j + rc).astype(jnp.float32)      # [168,40]
    return jnp.dot(
        jnp.dot(rowsel, win, preferred_element_type=jnp.float32),
        colsel, preferred_element_type=jnp.float32,
    )


def _one_keypoint(patch, pat):
    """(40,40) patch + (256,4) pattern -> (m10, m01, bits [256] f32).

    No atan2 in the kernel (unimplemented in Pallas TPU lowering — and
    unnecessary): the steering rotation only needs cos/sin, which are
    m10/r and m01/r; the angle itself is recovered outside the kernel."""
    ys = jax.lax.broadcasted_iota(
        jnp.int32, (PATCH, PATCH), 0
    ).astype(jnp.float32) - C
    xs = jax.lax.broadcasted_iota(
        jnp.int32, (PATCH, PATCH), 1
    ).astype(jnp.float32) - C
    circle = (ys * ys + xs * xs) <= float(R_C * R_C)
    w = jnp.where(circle, 1.0, 0.0)
    m10 = jnp.sum(patch * (xs * w))
    m01 = jnp.sum(patch * (ys * w))
    r = jnp.sqrt(m10 * m10 + m01 * m01)
    safe = r > 1e-9
    ca = jnp.where(safe, m10 / jnp.where(safe, r, 1.0), 1.0)
    sa = jnp.where(safe, m01 / jnp.where(safe, r, 1.0), 0.0)
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
    rx1 = jnp.round(ca * x1 - sa * y1).astype(jnp.int32) + C
    ry1 = jnp.round(sa * x1 + ca * y1).astype(jnp.int32) + C
    rx2 = jnp.round(ca * x2 - sa * y2).astype(jnp.int32) + C
    ry2 = jnp.round(sa * x2 + ca * y2).astype(jnp.int32) + C
    # Sample the 256 rotated pairs with a row-selection matmul (MXU)
    # followed by a column-select reduce (VPU) — no flat reshape (TPU
    # vector reshapes need tile-aligned shapes) and no gather.
    cols = jax.lax.broadcasted_iota(jnp.int32, (256, PATCH), 1)

    def sample(ry, rx):
        rowsel = (cols == ry[:, None]).astype(jnp.float32)   # [256,40]
        picked = jnp.dot(rowsel, patch,
                         preferred_element_type=jnp.float32)  # [256,40]
        colsel = (cols == rx[:, None]).astype(jnp.float32)
        return jnp.sum(picked * colsel, axis=1)

    v1 = sample(ry1, rx1)
    v2 = sample(ry2, rx2)
    return m10, m01, (v1 < v2).astype(jnp.float32)


def _kernel(ky_ref, kx_ref, img_ref, pat_ref, ang_ref, bits_ref):
    i = pl.program_id(0)
    pat = pat_ref[:]
    m10s = []
    m01s = []
    bits = []
    for j in range(KP_BLOCK):
        k = i * KP_BLOCK + j
        y0 = ky_ref[k]
        x0 = kx_ref[k]
        y8 = (y0 // 8) * 8
        x128 = (x0 // 128) * 128
        win = img_ref[
            pl.ds(pl.multiple_of(y8, 8), WIN_R),
            pl.ds(pl.multiple_of(x128, 128), WIN_C),
        ]
        patch = _extract_patch(win, y0 - y8, x0 - x128)
        a10, a01, b = _one_keypoint(patch, pat)
        m10s.append(a10)
        m01s.append(a01)
        bits.append(b)
    m = jnp.stack([jnp.stack(m10s), jnp.stack(m01s)], axis=1)  # [8,2]
    ang_ref[:, :] = jnp.pad(m, ((0, 0), (0, 126)))
    bits_ref[:, :] = jnp.stack(bits)               # [8,256]


@partial(jax.jit, static_argnames=("interpret",))
def patch_orient_describe(
    packed: jax.Array,    # [R, Wp] f32 blurred packed pyramid
    corner_y: jax.Array,  # [N] i32 patch top-left rows (pre-clamped)
    corner_x: jax.Array,  # [N] i32 patch top-left cols
    interpret: bool = False,
):
    """Returns (angle [N] f32, desc [N,8] u32, bits_pm1 [N,256] bf16)."""
    n = corner_y.shape[0]
    n_pad = -(-n // KP_BLOCK) * KP_BLOCK
    if n_pad != n:
        corner_y = jnp.concatenate(
            [corner_y, jnp.zeros((n_pad - n,), jnp.int32)]
        )
        corner_x = jnp.concatenate(
            [corner_x, jnp.zeros((n_pad - n,), jnp.int32)]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KP_BLOCK, 128), lambda i, ky, kx: (i, 0)),
            pl.BlockSpec((KP_BLOCK, 256), lambda i, ky, kx: (i, 0)),
        ],
    )
    ang, bits01 = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 256), jnp.float32),
        ],
        interpret=interpret,
    )(corner_y, corner_x, packed, jnp.asarray(_PATTERN, jnp.float32))
    ang = jnp.arctan2(ang[:n, 1], ang[:n, 0])
    bits01 = bits01[:n]
    words = bits01.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(words << shifts[None, None, :], axis=-1)
    bits_pm1 = bits01.astype(jnp.bfloat16) * 2.0 - 1.0
    return ang, desc, bits_pm1


def patch_orient_describe_xla(
    packed: jax.Array, corner_y: jax.Array, corner_x: jax.Array,
):
    """Pure-XLA fallback with identical sampling arithmetic (used on CPU
    and for the kernel-equivalence test). Same outputs as the kernel."""
    n = corner_y.shape[0]
    R, Wp = packed.shape
    dy = jnp.arange(PATCH)
    dx = jnp.arange(PATCH)
    rows = corner_y[:, None] + dy[None, :]            # [N,40]
    cols = corner_x[:, None] + dx[None, :]            # [N,40]
    flat_idx = rows[:, :, None] * Wp + cols[:, None, :]
    patches = jnp.take(packed.reshape(-1), flat_idx.reshape(-1)).reshape(
        n, PATCH, PATCH
    )
    ys = (dy - C).astype(jnp.float32)
    xs = (dx - C).astype(jnp.float32)
    circle = (ys[:, None] ** 2 + xs[None, :] ** 2) <= float(R_C * R_C)
    w = jnp.where(circle, 1.0, 0.0)
    m10 = jnp.sum(patches * (xs[None, None, :] * w[None]), axis=(1, 2))
    m01 = jnp.sum(patches * (ys[None, :, None] * w[None]), axis=(1, 2))
    ang = jnp.arctan2(m01, m10)
    # cos/sin via the moment norm — the same arithmetic as the kernel, so
    # rotated-coordinate rounding matches bit for bit.
    r = jnp.sqrt(m10 * m10 + m01 * m01)
    safe = r > 1e-9
    ca = jnp.where(safe, m10 / jnp.where(safe, r, 1.0), 1.0)[:, None]
    sa = jnp.where(safe, m01 / jnp.where(safe, r, 1.0), 0.0)[:, None]
    pat = jnp.asarray(_PATTERN, jnp.float32)
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
    rx1 = jnp.round(ca * x1 - sa * y1).astype(jnp.int32) + C
    ry1 = jnp.round(sa * x1 + ca * y1).astype(jnp.int32) + C
    rx2 = jnp.round(ca * x2 - sa * y2).astype(jnp.int32) + C
    ry2 = jnp.round(sa * x2 + ca * y2).astype(jnp.int32) + C
    pf = patches.reshape(n, PATCH * PATCH)
    v1 = jnp.take_along_axis(pf, ry1 * PATCH + rx1, axis=1)
    v2 = jnp.take_along_axis(pf, ry2 * PATCH + rx2, axis=1)
    bits01 = (v1 < v2).astype(jnp.float32)
    words = bits01.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(words << shifts[None, None, :], axis=-1)
    return ang, desc, bits01.astype(jnp.bfloat16) * 2.0 - 1.0
