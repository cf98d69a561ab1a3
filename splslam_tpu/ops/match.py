"""Descriptor matching as masked Hamming-distance matrices.

Replaces the reference's per-cell candidate loops (src/ORBmatcher.cc
SearchByProjection/SearchByBoW/SearchForInitialization; popcount
DescriptorDistance) with whole-frame distance matrices:

- `hamming_matrix` computes all-pairs Hamming distance. The MXU path
  encodes bits as +-1 bf16 and uses one [N1,256]x[256,N2] matmul
  (H = (256 - dot)/2, exact with f32 accumulation); the VPU path XORs
  packed uint32 words and uses jax.lax.population_count.
- Search windows / scale gates / already-matched masks become additive
  masks on the distance matrix.
- Mutual nearest neighbor + Lowe ratio + rotation-histogram consistency
  are array passes over the matrix (reference rotation check:
  ORBmatcher.cc HISTO_LENGTH=30, keep top-3 bins).

All functions are shape-static and jit/vmap safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TH_LOW = 50      # reference: src/ORBmatcher.cc:38
TH_HIGH = 100    # reference: src/ORBmatcher.cc:37
HISTO_BINS = 30  # reference: src/ORBmatcher.cc:39
BIG = jnp.int32(1 << 20)


def unpack_bits(desc: jax.Array) -> jax.Array:
    """[N,8] uint32 -> [N,256] uint8 bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], -1).astype(jnp.uint8)


def hamming_matrix_xor(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """Popcount-XOR all-pairs Hamming distance. [N1,8]x[N2,8]u32 -> [N1,N2]i32."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix_mxu(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """MXU all-pairs Hamming distance via +-1 bf16 matmul (exact)."""
    b1 = unpack_bits(d1).astype(jnp.bfloat16) * 2.0 - 1.0
    b2 = unpack_bits(d2).astype(jnp.bfloat16) * 2.0 - 1.0
    dot = jax.lax.dot_general(
        b1, b2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


hamming_matrix = hamming_matrix_mxu


def hamming_from_bits(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """All-pairs Hamming from cached +-1 bf16 bit planes: one matmul,
    no unpack. [N1,256]x[N2,256] -> [N1,N2] i32."""
    dot = jax.lax.dot_general(
        b1, b2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


def hamming_mixed(bits1: jax.Array, desc2: jax.Array) -> jax.Array:
    """Cached bit planes vs packed descriptors (map tables store packed
    only): unpack the smaller side, then one matmul."""
    b2 = unpack_bits(desc2).astype(jnp.bfloat16) * 2.0 - 1.0
    return hamming_from_bits(bits1, b2)


def masked_distances(
    dist: jax.Array, valid1: jax.Array, valid2: jax.Array,
    extra_mask: jax.Array | None = None,
) -> jax.Array:
    """Apply validity/extra masks: disallowed pairs get distance BIG."""
    ok = valid1[:, None] & valid2[None, :]
    if extra_mask is not None:
        ok = ok & extra_mask
    return jnp.where(ok, dist, BIG)


def nn_match(
    dist: jax.Array,
    max_dist: int = TH_LOW,
    ratio: float | None = None,
    mutual: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Row-wise nearest neighbor matching on a (masked) distance matrix.

    Returns (match_idx [N1] int32, -1 where unmatched; best_dist [N1]).
    `ratio`: Lowe ratio test best < ratio * second-best.
    `mutual`: require the column's best row to be this row (cross-check,
    the reference's BFMatcher cross-check in Linematcher.cc:454).
    """
    best = jnp.argmin(dist, axis=1)
    n1 = dist.shape[0]
    rows = jnp.arange(n1)
    bestd = dist[rows, best]
    ok = bestd <= max_dist
    if ratio is not None:
        second = jnp.partition(dist, 1, axis=1)[:, 1]
        ok = ok & (bestd.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if mutual:
        col_best = jnp.argmin(dist, axis=0)  # [N2]
        ok = ok & (col_best[best] == rows)
    return jnp.where(ok, best, -1), bestd


def window_mask(
    uv_pred: jax.Array, xy: jax.Array, radius: jax.Array | float
) -> jax.Array:
    """[M,2] predictions vs [N,2] keypoints -> [M,N] bool, L-inf window.

    `radius` may be scalar or per-row [M] (the reference scales the window
    by octave / viewing angle)."""
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    dx = jnp.abs(uv_pred[:, 0:1] - xy[None, :, 0])
    dy = jnp.abs(uv_pred[:, 1:2] - xy[None, :, 1])
    return (dx <= r) & (dy <= r)


def octave_mask(
    pred_octave: jax.Array, kp_octave: jax.Array, lo: int = 0, hi: int = 0
) -> jax.Array:
    """[M] predicted scale level vs [N] keypoint octaves -> [M,N] bool,
    allowing kp_octave in [pred+lo, pred+hi] (reference checks
    nPredictedLevel-1 <= octave <= nPredictedLevel)."""
    d = kp_octave[None, :] - pred_octave[:, None]
    return (d >= lo) & (d <= hi)


def rotation_consistency_lines(
    angle1: jax.Array, angle2: jax.Array, matches: jax.Array
) -> jax.Array:
    """Rotation-histogram consistency for UNDIRECTED line angles (mod pi;
    the reference histograms line-angle differences, Linematcher.cc:233).
    """
    ok = matches >= 0
    idx = jnp.clip(matches, 0)
    rot = jnp.mod(angle1 - angle2[idx], jnp.pi)
    bins = jnp.clip(
        (rot * (HISTO_BINS / jnp.pi)).astype(jnp.int32), 0, HISTO_BINS - 1
    )
    hist = jnp.zeros((HISTO_BINS,), jnp.int32).at[bins].add(ok.astype(jnp.int32))
    top3 = jax.lax.top_k(hist, 3)[0]
    thr = jnp.maximum(top3[2], (0.1 * top3[0]).astype(jnp.int32))
    good_bin = hist >= jnp.maximum(thr, 1)
    return jnp.where(ok & good_bin[bins], matches, -1)


def rotation_consistency(
    angle1: jax.Array, angle2: jax.Array, matches: jax.Array
) -> jax.Array:
    """Keep only matches whose angle difference falls in the 3 most common
    of 30 histogram bins (reference ORBmatcher::ComputeThreeMaxima).

    angle1: [N1] angles of the query features; angle2: [N2] of the matched
    frame; matches: [N1] int32 index into angle2 or -1.
    Returns filtered matches [N1]."""
    ok = matches >= 0
    idx = jnp.clip(matches, 0)
    rot = angle1 - angle2[idx]
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(rot, two_pi)
    bins = jnp.clip((rot * (HISTO_BINS / two_pi)).astype(jnp.int32), 0, HISTO_BINS - 1)
    hist = jnp.zeros((HISTO_BINS,), jnp.int32).at[bins].add(ok.astype(jnp.int32))
    top3 = jax.lax.top_k(hist, 3)[0]
    # Reference drops bins whose count < 0.1 * max when selecting maxima.
    thr = jnp.maximum(top3[2], (0.1 * top3[0]).astype(jnp.int32))
    good_bin = hist >= jnp.maximum(thr, 1)
    return jnp.where(ok & good_bin[bins], matches, -1)
