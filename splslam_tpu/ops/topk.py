"""Spatially-spread corner selection: per-cell top-k then global top-K.

TPU-native replacement for ORBextractor::DistributeOctTree (reference:
src/ORBextractor.cc:539-765). The quadtree's purpose is to spread N corners
uniformly over the image; we achieve the same with a fixed-shape two-stage
selection: (1) cap each grid cell at CELL_K best corners, (2) take the
global top-K of the surviving candidates. Both stages are jax.lax.top_k
over statically-shaped tensors — no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_topk(
    score: jax.Array,
    k_total: int,
    cell: int = 16,
    cell_k: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Select up to k_total corners from a sparse (H,W) score map.

    Returns (xy (k_total,2) f32 [x,y], response (k_total,), valid (k_total,)).
    Invalid slots have response 0.
    """
    H, W = score.shape
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    padded = jnp.pad(score, ((0, Hp - H), (0, Wp - W)))
    ncy, ncx = Hp // cell, Wp // cell
    cells = padded.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(ncy * ncx, cell * cell)

    # Per-cell top-k via cell_k unrolled argmax+mask rounds: a [C,256]
    # sort per cell (lax.top_k) costs ~10 passes over the buffer where
    # cell_k max-reduces cost 2 each, and NMS has already zeroed all but
    # a few entries per cell.
    work = cells
    vs, ids = [], []
    for _ in range(cell_k):
        i = jnp.argmax(work, axis=1)                    # [ncells]
        v = jnp.take_along_axis(work, i[:, None], axis=1)[:, 0]
        vs.append(v)
        ids.append(i)
        work = jnp.where(
            jnp.arange(work.shape[1])[None, :] == i[:, None], -1.0, work
        )
    vals = jnp.stack(vs, axis=1)                        # [ncells, cell_k]
    idx = jnp.stack(ids, axis=1)
    # Recover absolute pixel coordinates of each candidate.
    cy = jnp.arange(ncy * ncx) // ncx
    cx = jnp.arange(ncy * ncx) % ncx
    py = cy[:, None] * cell + idx // cell
    px = cx[:, None] * cell + idx % cell

    flat_vals = vals.reshape(-1)
    flat_y = py.reshape(-1)
    flat_x = px.reshape(-1)

    # Global selection as a stable key-value sort + slice: measured on
    # TPU at the L0 shape ([7488] -> k=436), lax.sort is 72 us vs
    # lax.top_k's 109 — top_k lowers to an iterative selection that
    # loses to one bitonic sort pass at these sizes. Ties resolve to the
    # lowest index under both (stable sort), so the selected set is
    # identical.
    neg, top_i = jax.lax.sort(
        (-flat_vals, jnp.arange(flat_vals.shape[0], dtype=jnp.int32)),
        num_keys=1,
    )
    top_vals = -neg[:k_total]
    top_i = top_i[:k_total]
    xy = jnp.stack(
        [flat_x[top_i].astype(jnp.float32), flat_y[top_i].astype(jnp.float32)],
        axis=-1,
    )
    valid = top_vals > 0.0
    return xy, top_vals, valid
