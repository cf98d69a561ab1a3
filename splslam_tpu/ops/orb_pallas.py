"""Pallas TPU kernel: per-keypoint patch extraction + matmul rBRIEF.

The profile-dominant cost of frame building is per-keypoint patch work.
Structures tried in round 1/2 (per-keypoint gathers, per-keypoint pick
matmuls, batched block-one-hot matmuls) all floor at ~2-8 us/keypoint:
either XLA general-gather serialization or MXU small-matmul latency.

This design splits the problem at the hardware boundary:

  1. `extract_patches` (Pallas): DMA each keypoint's (8,128)-aligned
     (48,256) window HBM -> VMEM (double-buffered across grid steps so
     copies hide under compute), then align it to the patch origin with
     two dynamic rolls (`pltpu.roll` — a VPU lane/sublane rotate, no
     gather) and write the aligned 40x40 patch. Pure data movement; no
     per-keypoint matmuls.
  2. `describe_from_patches` (XLA): orientation moments are ONE
     [N,1600]@[1600,2] matmul; rBRIEF sampling is ONE
     [N,1600]@[1600,30*256] bf16 matmul against a precomputed +-1
     difference table of the 256 point pairs under 30 quantized pattern
     rotations (the ORB paper itself discretizes steered BRIEF to
     2*pi/30 increments with precomputed patterns — rotating the
     pattern continuously per keypoint, as round 1 did, is *more* exact
     than the published algorithm and forces per-keypoint work).
     The keypoint's angle bin is then selected with a one-hot einsum.
     Every op is a large dense matmul: exactly what the MXU is for.

The packed pyramid layout matches extract_orb: levels stacked row-wise
into one [R, Wp] bf16 buffer (width lane-padded + 128 alignment cols, 8
alignment rows at the bottom), so one kernel invocation serves every
level. Keypoint corners arrive as scalar-prefetch arrays.

`interpret=True` runs the kernel on CPU for tests; `extract_patches_xla`
is the arithmetic-identical gather fallback for non-TPU backends. Both
feed the same `describe_from_patches`, so kernel-vs-fallback equivalence
is bit-exact on the descriptor path.

Reference behavior contract: ORBextractor::computeOrientation +
computeDescriptors (reference src/ORBextractor.cc:122-159, 433-477).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splslam_tpu.ops.orb import _PATTERN

PATCH = 40   # rotated BRIEF offsets reach +-19 px (pattern radius 13*sqrt2)
WIN_R = 48   # loaded rows: patch + up to 7 sublane-alignment rows
WIN_C = 256  # loaded cols: patch + alignment (DMA lane offsets AND
#              widths must be multiples of the 128-lane tiling — 64-
#              quantized starts were rejected by Mosaic)
ALIGN_C = 128  # column-start quantum
C = 19       # patch center; equals the detector's EDGE_THRESHOLD border,
#              so corner = keypoint - 19 is in-bounds by construction
R_C = 15     # IC-angle circle radius (reference HALF_PATCH_SIZE)
KP_BLOCK = 8  # keypoints per grid step (output sublane tiling)
N_BINS = 30  # pattern rotation bins (ORB paper: 2*pi/30 increments)
PROW = 128   # padded patch row stride: patches stay in the native
#              [PATCH, 128] lane layout end-to-end; table rows for
#              cols >= PATCH are zero, so the flat contraction is exact


def _start_block_dmas(i, ky_ref, kx_ref, img_ref, win_scratch, dma_sems,
                      slot, win_r):
    """Issue the KP_BLOCK window DMAs for grid step `i` into buffer
    `slot` of the double-buffered scratch."""
    for j in range(KP_BLOCK):
        k = i * KP_BLOCK + j
        y8 = (ky_ref[k] // 8) * 8
        x64 = (kx_ref[k] // ALIGN_C) * ALIGN_C
        pltpu.make_async_copy(
            img_ref.at[
                pl.ds(pl.multiple_of(y8, 8), win_r),
                pl.ds(pl.multiple_of(x64, ALIGN_C), WIN_C),
            ],
            win_scratch.at[slot, j],
            dma_sems.at[slot, j],
        ).start()


def _kernel(ky_ref, kx_ref, img_ref, out_ref, win_scratch, dma_sems,
            *, n_rows):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    win_r = n_rows + 8

    # Double-buffered window DMAs: step 0 issues its own block, every
    # step prefetches the NEXT block into the other buffer while this
    # block computes, so the 2000 x 24 KB fetches ride under compute
    # instead of serializing across the grid.
    @pl.when(i == 0)
    def _():
        _start_block_dmas(i, ky_ref, kx_ref, img_ref, win_scratch,
                          dma_sems, slot, win_r)

    @pl.when(i + 1 < n_steps)
    def _():
        _start_block_dmas(i + 1, ky_ref, kx_ref, img_ref, win_scratch,
                          dma_sems, jax.lax.rem(i + 1, 2), win_r)

    for j in range(KP_BLOCK):
        k = i * KP_BLOCK + j
        y0 = ky_ref[k]
        x0 = kx_ref[k]
        y8 = (y0 // 8) * 8
        x64 = (x0 // ALIGN_C) * ALIGN_C
        r8 = y0 - y8
        rc = x0 - x64
        # Reconstruct the exact copy descriptor to wait on its
        # semaphore (wait decrements by the descriptor's size).
        pltpu.make_async_copy(
            img_ref.at[
                pl.ds(pl.multiple_of(y8, 8), win_r),
                pl.ds(pl.multiple_of(x64, ALIGN_C), WIN_C),
            ],
            win_scratch.at[slot, j],
            dma_sems.at[slot, j],
        ).wait()
        # Align the patch origin to (0,0): two dynamic rotates (VPU),
        # then a static slice — no gathers, no per-keypoint matmuls.
        # pltpu.roll requires non-negative shifts (left-roll by r is a
        # right-roll by (size - r) mod size) and 32-bit lanes (rotate
        # in f32, store back bf16 — exact round-trip).
        win = win_scratch[slot, j].astype(jnp.float32)  # [win_r, 256]
        win = pltpu.roll(win, jax.lax.rem(WIN_C - rc, WIN_C), 1)
        win = pltpu.roll(win, jax.lax.rem(win_r - r8, win_r), 0)
        out_ref[j] = win[:n_rows, :PROW].astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "n_rows"))
def extract_patches(
    packed: jax.Array,    # [R, Wp] bf16 blurred packed pyramid
    corner_y: jax.Array,  # [N] i32 patch top-left rows (pre-clamped)
    corner_x: jax.Array,  # [N] i32 patch top-left cols
    interpret: bool = False,
    n_rows: int = PATCH,
) -> jax.Array:
    """Aligned patches [N, n_rows, PROW] bf16 (patch in cols < PATCH;
    cols >= PATCH are rotation debris masked out by the zero table
    rows — keeping the native lane layout avoids a relayout). `n_rows`
    (multiple of 8) selects the window height."""
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((KP_BLOCK, n_rows, 128),
                         lambda i, ky, kx: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KP_BLOCK, n_rows + 8, WIN_C), packed.dtype),
            pltpu.SemaphoreType.DMA((2, KP_BLOCK)),
        ],
    )
    (out,) = pl.pallas_call(
        partial(_kernel, n_rows=n_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n_rows, PROW), packed.dtype),
        ],
        interpret=interpret,
    )(corner_y, corner_x, packed)
    return out[:n]


def extract_patches_xla(
    packed: jax.Array, corner_y: jax.Array, corner_x: jax.Array,
    n_rows: int = PATCH,
) -> jax.Array:
    """Gather fallback with identical outputs (CPU backends, tests)."""
    n = corner_y.shape[0]
    R, Wp = packed.shape
    dy = jnp.arange(n_rows)
    dx = jnp.arange(PATCH)
    rows = corner_y[:, None] + dy[None, :]            # [N,n_rows]
    cols = corner_x[:, None] + dx[None, :]            # [N,40]
    flat_idx = rows[:, :, None] * Wp + cols[:, None, :]
    p = jnp.take(packed.reshape(-1), flat_idx.reshape(-1)).reshape(
        n, n_rows, PATCH
    )
    return jnp.pad(p, ((0, 0), (0, 0), (0, PROW - PATCH)))


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    """Host-side constant tables.

    Returns (diff [PATCH*PROW, N_BINS*256] int8, mom [PATCH*PROW, 2] f32):
      diff[p, b*256+s] = +1 where rotated sample 1 of pair s under bin-b
      rotation reads patch pixel p, -1 for sample 2 (0 elsewhere) — so
      patches_flat @ diff = I(p1) - I(p2) and bit = (that < 0);
      mom = (dx*w, dy*w) circle-masked IC-moment weights. Rows are
      indexed with the PROW(=128) stride of the layout-native patch
      buffer; rows for cols >= PATCH stay zero and mask the rotation
      debris the kernel leaves there.
    """
    pat = np.asarray(_PATTERN, np.float32)            # [256,4]
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]
    diff = np.zeros((PATCH * PROW, N_BINS * 256), np.int8)
    for b in range(N_BINS):
        th = 2.0 * np.pi * b / N_BINS
        ca, sa = np.float32(np.cos(th)), np.float32(np.sin(th))
        rx1 = np.round(ca * x1 - sa * y1).astype(np.int32) + C
        ry1 = np.round(sa * x1 + ca * y1).astype(np.int32) + C
        rx2 = np.round(ca * x2 - sa * y2).astype(np.int32) + C
        ry2 = np.round(sa * x2 + ca * y2).astype(np.int32) + C
        s = np.arange(256)
        diff[ry1 * PROW + rx1, b * 256 + s] += 1
        diff[ry2 * PROW + rx2, b * 256 + s] -= 1
    ys = (np.arange(PATCH) - C).astype(np.float32)
    xs = (np.arange(PROW) - C).astype(np.float32)
    w = ((ys[:, None] ** 2 + xs[None, :] ** 2)
         <= float(R_C * R_C)).astype(np.float32)
    w[:, PATCH:] = 0.0
    mom = np.stack(
        [(xs[None, :] * w).reshape(-1), (ys[:, None] * w).reshape(-1)],
        axis=1,
    )
    return diff, mom


_TABLES: tuple[np.ndarray, np.ndarray] | None = None


def _tables() -> tuple[np.ndarray, np.ndarray]:
    global _TABLES
    if _TABLES is None:
        _TABLES = _build_tables()
    return _TABLES


def describe_from_patches(patches: jax.Array):
    """(angle [N] f32, desc [N,8] u32, bits_pm1 [N,256] bf16) from
    aligned bf16 patches [N, PATCH, PROW] (layout-native; cols >= PATCH
    ignored via zero table rows).

    All per-keypoint work is expressed as two shared dense matmuls (see
    module docstring); a pair sample under the keypoint's quantized
    rotation is a single picked pixel, so the +-1-table product is the
    exact difference I(p1) - I(p2) (f32 accumulation of two terms)."""
    diff_np, mom_np = _tables()
    n = patches.shape[0]
    pf = patches.reshape(n, PATCH * PROW)
    m = jnp.dot(pf, jnp.asarray(mom_np, jnp.bfloat16),
                preferred_element_type=jnp.float32)     # [N,2]
    m10, m01 = m[:, 0], m[:, 1]
    ang = jnp.arctan2(m01, m10)
    binf = jnp.round(ang * (N_BINS / (2.0 * np.pi)))
    bins = jnp.mod(binf.astype(jnp.int32), N_BINS)      # [N] in [0,30)
    # int8 MXU pass (2x the bf16 rate). The reference compares uint8
    # blurred pixels (cv::GaussianBlur output), so rounding the bf16
    # blur to integers here matches its arithmetic. Each diff column
    # sums to zero, so re-centering pixels to [-128,127] leaves the
    # products exact: (p-128)@D = p@D.
    p8 = jnp.clip(jnp.round(pf.astype(jnp.float32)) - 128.0,
                  -128, 127).astype(jnp.int8)
    d = jnp.dot(p8, jnp.asarray(diff_np),
                preferred_element_type=jnp.int32)       # [N, 30*256]
    d = d.reshape(n, N_BINS, 256)
    onehot = (jnp.arange(N_BINS)[None, :] == bins[:, None])
    v = jnp.sum(d * onehot[:, :, None].astype(jnp.int32), axis=1)
    bits01 = (v < 0).astype(jnp.float32)                # I(p1) < I(p2)
    words = bits01.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(words << shifts[None, None, :], axis=-1)
    return ang, desc, bits01.astype(jnp.bfloat16) * 2.0 - 1.0


@partial(jax.jit, static_argnames=("interpret",))
def patch_orient_describe(
    packed: jax.Array, corner_y: jax.Array, corner_x: jax.Array,
    interpret: bool = False,
):
    """TPU path: Pallas patch extraction + shared matmul descriptors."""
    return describe_from_patches(
        extract_patches(packed, corner_y, corner_x, interpret=interpret)
    )


def patch_orient_describe_xla(
    packed: jax.Array, corner_y: jax.Array, corner_x: jax.Array,
):
    """Non-TPU path: gather extraction + the same matmul descriptors."""
    return describe_from_patches(
        extract_patches_xla(packed, corner_y, corner_x)
    )
