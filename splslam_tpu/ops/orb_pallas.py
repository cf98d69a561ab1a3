"""Pallas TPU kernel: per-keypoint IC-angle + rBRIEF from VMEM patches.

The profile-dominant cost of frame building is per-keypoint patch access:
XLA lowers the 31x31 orientation window (961 taps) and the 512 rBRIEF
samples per keypoint to general gathers — ~29 ms of the 32 ms per KITTI
image in f32. This kernel DMAs each keypoint's window from the packed
HBM pyramid into VMEM scratch and processes KP_BLOCK keypoints per grid
step. Measured on v5e it matches the XLA gather path (~19 ms/image in
bf16; several structures tried — per-keypoint matmuls, batched
block-one-hot matmuls, full-VMEM residency — all land within noise,
suggesting the cost is the per-keypoint serialization itself, not the
memory system). It is kept as the TPU default because it pins the patch
working set in VMEM (no multi-MB gather intermediates) and is the
natural place for further fusion; the honest win so far came from bf16
packing (frame build 65 -> 52 ms for a stereo pair).

  - each keypoint's (8,128)-aligned (48,168) window is vector-loaded
    (no gather); moments and sample selection carry the (row, col)
    alignment remainders in their index arithmetic;
  - intensity-centroid moments are masked window reductions (VPU);
  - ALL keypoints' 2x256 rotated BRIEF samples per step are read with
    TWO large one-hot matmuls over the stacked windows (a per-keypoint
    matmul is MXU-latency-bound — measured ~12 us/keypoint; batching
    across the block turns it into ~1K-cycle matmuls);
  - bit words pack outside the kernel (cheap XLA shifts).

The pyramid is packed row-wise into a single [R, Wp] buffer (levels
stacked vertically, width padded to the lane multiple + 128 alignment
columns, 8 alignment rows at the bottom), so one kernel invocation
serves every level. Keypoint corners arrive as scalar-prefetch arrays
(pltpu.PrefetchScalarGridSpec).

`interpret=True` runs the same kernel on CPU for tests;
`patch_orient_describe_xla` is the arithmetic-equivalent pure-XLA
fallback used on non-TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splslam_tpu.ops.orb import _PATTERN

PATCH = 40   # rotated BRIEF offsets reach +-19 px (pattern radius 13*sqrt2)
WIN_R = 48   # loaded rows: patch + up to 7 sublane-alignment rows
WIN_C = 256  # loaded cols: patch + alignment (DMA slice widths
#              must be multiples of the 128-lane tiling)
C = 19       # patch center; equals the detector's EDGE_THRESHOLD border,
#              so corner = keypoint - 19 is in-bounds by construction
R_C = 15     # IC-angle circle radius (reference HALF_PATCH_SIZE)
KP_BLOCK = 8  # keypoints per grid step (output sublane tiling)


def _kernel(ky_ref, kx_ref, img_ref, pat_ref, ang_ref, bits_ref,
            win_scratch, dma_sems):
    i = pl.program_id(0)
    pat = pat_ref[:]
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    ys_w = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_R, WIN_C), 0
    ).astype(jnp.float32)
    xs_w = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_R, WIN_C), 1
    ).astype(jnp.float32)
    g_rows = jax.lax.broadcasted_iota(jnp.int32, (256, KP_BLOCK * WIN_R), 1)
    g_cols = jax.lax.broadcasted_iota(jnp.int32, (256, WIN_C), 1)

    # Start all window DMAs (HBM -> VMEM scratch) before computing: the
    # image stays in HBM — a full-array VMEM block would be re-copied
    # EVERY grid step by the pipeline (~2.5 GB of traffic per frame).
    for j in range(KP_BLOCK):
        k = i * KP_BLOCK + j
        y8 = (ky_ref[k] // 8) * 8
        x128 = (kx_ref[k] // 128) * 128
        pltpu.make_async_copy(
            img_ref.at[
                pl.ds(pl.multiple_of(y8, 8), WIN_R),
                pl.ds(pl.multiple_of(x128, 128), WIN_C),
            ],
            win_scratch.at[j],
            dma_sems.at[j],
        ).start()

    wins = []
    moments = []
    sel_r1, sel_r2, sel_c1, sel_c2 = [], [], [], []
    for j in range(KP_BLOCK):
        k = i * KP_BLOCK + j
        y0 = ky_ref[k]
        x0 = kx_ref[k]
        y8 = (y0 // 8) * 8
        x128 = (x0 // 128) * 128
        r8 = y0 - y8
        rc = x0 - x128
        pltpu.make_async_copy(
            img_ref.at[
                pl.ds(pl.multiple_of(y8, 8), WIN_R),
                pl.ds(pl.multiple_of(x128, 128), WIN_C),
            ],
            win_scratch.at[j],
            dma_sems.at[j],
        ).wait()
        # Keep the NATIVE (bf16) window for the pick matmuls — one-hot
        # row/column selection of a bf16 value is exact, and bf16 MXU
        # passes run ~4x the f32 rate; moments accumulate in f32.
        wins.append(win_scratch[j])
        win = win_scratch[j].astype(jnp.float32)

        # IC moments with the remainders folded into the coordinates.
        dy = ys_w - r8.astype(jnp.float32) - C
        dx = xs_w - rc.astype(jnp.float32) - C
        w = jnp.where(dy * dy + dx * dx <= float(R_C * R_C), 1.0, 0.0)
        m10 = jnp.sum(win * (dx * w))
        m01 = jnp.sum(win * (dy * w))
        r = jnp.sqrt(m10 * m10 + m01 * m01)
        safe = r > 1e-9
        ca = jnp.where(safe, m10 / jnp.where(safe, r, 1.0), 1.0)
        sa = jnp.where(safe, m01 / jnp.where(safe, r, 1.0), 0.0)
        moments.append((m10, m01))

        # Rotated sample coordinates within the window frame.
        rx1 = jnp.round(ca * x1 - sa * y1).astype(jnp.int32) + C + rc
        ry1 = jnp.round(sa * x1 + ca * y1).astype(jnp.int32) + C + r8
        rx2 = jnp.round(ca * x2 - sa * y2).astype(jnp.int32) + C + rc
        ry2 = jnp.round(sa * x2 + ca * y2).astype(jnp.int32) + C + r8
        base = j * WIN_R
        sel_r1.append((g_rows == ry1[:, None] + base).astype(jnp.bfloat16))
        sel_r2.append((g_rows == ry2[:, None] + base).astype(jnp.bfloat16))
        sel_c1.append((g_cols == rx1[:, None]).astype(jnp.float32))
        sel_c2.append((g_cols == rx2[:, None]).astype(jnp.float32))

    W = jnp.concatenate(wins, axis=0).astype(jnp.bfloat16)  # [8*48, 256]
    R1 = jnp.concatenate(sel_r1, axis=0)               # [2048, 384]
    R2 = jnp.concatenate(sel_r2, axis=0)
    C1 = jnp.concatenate(sel_c1, axis=0)               # [2048, 256]
    C2 = jnp.concatenate(sel_c2, axis=0)
    picked1 = jnp.dot(R1, W, preferred_element_type=jnp.float32)
    picked2 = jnp.dot(R2, W, preferred_element_type=jnp.float32)
    v1 = jnp.sum(picked1 * C1, axis=1)                 # [2048]
    v2 = jnp.sum(picked2 * C2, axis=1)
    bits = (v1 < v2).astype(jnp.float32).reshape(KP_BLOCK, 256)
    bits_ref[:, :] = bits

    m = jnp.stack(
        [jnp.stack([a for a, _ in moments]),
         jnp.stack([b for _, b in moments])], axis=1
    )                                                   # [8,2]
    ang_ref[:, :] = jnp.pad(m, ((0, 0), (0, 126)))


@partial(jax.jit, static_argnames=("interpret",))
def patch_orient_describe(
    packed: jax.Array,    # [R, Wp] f32/bf16 blurred packed pyramid
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
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KP_BLOCK, 128), lambda i, ky, kx: (i, 0)),
            pl.BlockSpec((KP_BLOCK, 256), lambda i, ky, kx: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((KP_BLOCK, WIN_R, WIN_C), packed.dtype),
            pltpu.SemaphoreType.DMA((KP_BLOCK,)),
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
    """Pure-XLA fallback with equivalent sampling arithmetic (used on CPU
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
    ).astype(jnp.float32)
    ys = (dy - C).astype(jnp.float32)
    xs = (dx - C).astype(jnp.float32)
    circle = (ys[:, None] ** 2 + xs[None, :] ** 2) <= float(R_C * R_C)
    w = jnp.where(circle, 1.0, 0.0)
    m10 = jnp.sum(patches * (xs[None, None, :] * w[None]), axis=(1, 2))
    m01 = jnp.sum(patches * (ys[None, :, None] * w[None]), axis=(1, 2))
    ang = jnp.arctan2(m01, m10)
    # cos/sin via the moment norm — the same arithmetic as the kernel, so
    # rotated-coordinate rounding matches.
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
