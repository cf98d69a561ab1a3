"""grid_topk: the quadtree-replacement corner selector (ops/topk.py;
reference ORBextractor::DistributeOctTree, src/ORBextractor.cc:539-765).

Protects the sort-based global selection: it must pick exactly the same
set as an exact top-k over the per-cell survivors, with the same
lowest-index tie preference lax.top_k uses."""

import jax.numpy as jnp
import numpy as np

from splslam_tpu.ops.topk import grid_topk


def _numpy_reference(score, k_total, cell, cell_k):
    H, W = score.shape
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    p = np.zeros((Hp, Wp), np.float32)
    p[:H, :W] = score
    cands = []  # (value, flat_candidate_index) in grid_topk's order
    ncy, ncx = Hp // cell, Wp // cell
    for ci in range(ncy * ncx):
        cy, cx = ci // ncx, ci % ncx
        block = p[cy * cell:(cy + 1) * cell, cx * cell:(cx + 1) * cell]
        flat = block.reshape(-1)
        order = np.argsort(-flat, kind="stable")[:cell_k]
        for r, j in enumerate(order):
            y = cy * cell + j // cell
            x = cx * cell + j % cell
            cands.append((float(flat[j]), ci * cell_k + r, x, y))
    # exact global top-k, ties to lowest candidate index
    cands.sort(key=lambda t: (-t[0], t[1]))
    return cands[:k_total]


def test_matches_numpy_reference():
    rng = np.random.default_rng(7)
    score = (rng.uniform(0, 1, (96, 128)).astype(np.float32)
             * (rng.uniform(0, 1, (96, 128)) < 0.08))
    k = 40
    xy, vals, valid = grid_topk(jnp.asarray(score), k, cell=16, cell_k=4)
    ref = _numpy_reference(score, k, 16, 4)
    xy = np.asarray(xy)
    vals = np.asarray(vals)
    np.testing.assert_allclose(vals, [v for v, *_ in ref], rtol=1e-6)
    # positive-score picks must agree exactly (position set)
    got = {(float(x), float(y)) for (x, y), v in zip(xy, vals) if v > 0}
    want = {(float(x), float(y)) for v, _, x, y in ref if v > 0}
    assert got == want


def test_sparse_map_pads_invalid():
    score = np.zeros((64, 64), np.float32)
    score[10, 12] = 3.0
    score[40, 50] = 2.0
    xy, vals, valid = grid_topk(jnp.asarray(score), 8, cell=16, cell_k=4)
    v = np.asarray(valid)
    assert v.sum() == 2
    got = {tuple(map(float, p)) for p in np.asarray(xy)[v]}
    assert got == {(12.0, 10.0), (50.0, 40.0)}
    assert np.all(np.asarray(vals)[~v] <= 0.0)


def test_cell_cap_enforced():
    """A cell packed with strong corners may contribute at most cell_k."""
    score = np.zeros((32, 32), np.float32)
    score[0:16, 0:16] = np.random.default_rng(1).uniform(
        5, 6, (16, 16)).astype(np.float32)  # one dense cell
    score[20, 20] = 1.0  # weak corner in another cell
    xy, vals, valid = grid_topk(jnp.asarray(score), 8, cell=16, cell_k=4)
    v = np.asarray(valid)
    xy = np.asarray(xy)[v]
    from_dense = ((xy[:, 0] < 16) & (xy[:, 1] < 16)).sum()
    assert from_dense == 4  # capped
    assert (xy[:, 0] == 20).any()  # the weak one still selected
