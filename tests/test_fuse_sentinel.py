"""Regression tests for the scatter-sentinel bug (round-3 root cause of
the loop e2e failure): JAX normalizes NEGATIVE scatter indices before the
out-of-bounds check, so `.at[-1].set(..., mode="drop")` silently writes
the LAST slot instead of dropping. fuse_neighbors / fuse_neighbor_lines /
loop_search_and_fuse must use an out-of-bounds-HIGH sentinel. A no-match
fuse pass must therefore leave every observation row bit-identical."""

import numpy as np
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.slam.map import MapState
from splslam_tpu.slam.mapping_ops import fuse_neighbors, fuse_neighbor_lines


def test_jax_negative_scatter_wraps():
    """Documents the platform behavior that motivates the sentinel idiom:
    if this ever starts dropping negatives, the idiom can be retired."""
    x = jnp.zeros((4,), jnp.int32).at[jnp.asarray([-1])].set(
        jnp.asarray([7]), mode="drop"
    )
    assert int(x[3]) == 7  # -1 wrapped to the last slot, NOT dropped


def _tiny_map():
    K, N, L, P, Q = 4, 32, 8, 64, 16
    st = MapState.empty(P, Q, K, N, L)
    rng = np.random.default_rng(0)

    # Two keyframes; kf0 owns landmarks 0..9 placed BEHIND kf1's camera
    # so projection fails for every row -> zero fuse hits by construction.
    lm_idx = np.full((K, N), -1, np.int32)
    lm_idx[0, :10] = np.arange(10)
    lm_idx[1, :10] = np.arange(10, 20)   # kf1's own landmarks
    lm_idx[1, N - 1] = 20                # canary in the LAST slot
    fvalid = np.zeros((K, N), bool)
    fvalid[:2] = True
    xyz = np.zeros((P, 3), np.float32)
    xyz[:21] = rng.normal(size=(21, 3)).astype(np.float32)
    xyz[:10, 2] = -5.0                   # behind both cameras
    pvalid = np.zeros((P,), bool)
    pvalid[:21] = True

    ll_idx = np.full((K, L), -1, np.int32)
    ll_idx[0, :3] = np.arange(3)
    ll_idx[1, L - 1] = 3                 # line canary in the LAST slot
    lvalid = np.zeros((K, L), bool)
    lvalid[:2] = True
    lxyz = np.zeros((Q, 3, 3), np.float32)
    lxyz[:4] = rng.normal(size=(4, 3, 3)).astype(np.float32)
    lxyz[:3, :, 2] = -5.0                # kf0's lines behind the cameras
    lnvalid = np.zeros((Q,), bool)
    lnvalid[:4] = True

    kfs = st.kfs._replace(
        lm_idx=jnp.asarray(lm_idx), fvalid=jnp.asarray(fvalid),
        ll_idx=jnp.asarray(ll_idx), lvalid=jnp.asarray(lvalid),
        valid=jnp.asarray(np.arange(K) < 2),
        desc=jnp.asarray(
            rng.integers(0, 2**32, size=(K, N, 8), dtype=np.uint64)
            .astype(np.uint32)),
        ldesc=jnp.asarray(
            rng.integers(0, 2**32, size=(K, L, 8), dtype=np.uint64)
            .astype(np.uint32)),
    )
    pts = st.pts._replace(
        xyz=jnp.asarray(xyz), valid=jnp.asarray(pvalid),
        n_obs=jnp.asarray(pvalid.astype(np.int32)),
        dmax=jnp.full((P,), 100.0),
    )
    lns = st.lns._replace(
        xyz=jnp.asarray(lxyz), valid=jnp.asarray(lnvalid),
        n_obs=jnp.asarray(lnvalid.astype(np.int32)),
        avg_len2d=jnp.full((Q,), 20.0),
    )
    return st._replace(kfs=kfs, pts=pts, lns=lns)


def test_fuse_neighbors_no_hits_leaves_rows_untouched():
    st = _tiny_map()
    cam = Camera.create(200.0, 200.0, 160.0, 120.0, bf=24.0,
                        width=320, height=240)
    scales = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    before = np.asarray(st.kfs.lm_idx)
    out = fuse_neighbors(st, cam, scales, jnp.int32(0),
                         jnp.asarray([1], jnp.int32), 1.2, 8)
    after = np.asarray(out.kfs.lm_idx)
    # Pre-fix, the -1 sentinel erased lm_idx[1][N-1] (the canary) on
    # every call even with zero hits.
    assert after[1, -1] == 20, "last-slot canary was clobbered"
    np.testing.assert_array_equal(after, before)
    np.testing.assert_array_equal(
        np.asarray(out.pts.n_obs), np.asarray(st.pts.n_obs))


def test_fuse_neighbor_lines_no_hits_leaves_rows_untouched():
    st = _tiny_map()
    cam = Camera.create(200.0, 200.0, 160.0, 120.0, bf=24.0,
                        width=320, height=240)
    before = np.asarray(st.kfs.ll_idx)
    out = fuse_neighbor_lines(st, cam, jnp.int32(0),
                              jnp.asarray([1], jnp.int32))
    after = np.asarray(out.kfs.ll_idx)
    assert after[1, -1] == 3, "last-slot line canary was clobbered"
    np.testing.assert_array_equal(after, before)


def test_donated_map_guard_raises_clearly():
    """Re-invoking mapping_step/add_keyframe_step with an already-donated
    map must raise a clear RuntimeError, not an opaque backend
    InvalidArgument (round-2 VERDICT weak #10)."""
    import jax
    import pytest
    from splslam_tpu.slam.mapping_ops import assert_map_live

    x = jnp.zeros((8,))
    y = jax.jit(lambda a: a * 2.0, donate_argnums=0)(x)
    jax.block_until_ready(y)
    assert_map_live((y,), "mapping_step")  # live buffers pass
    if x.is_deleted():  # donation is backend-dependent; guard the assert
        with pytest.raises(RuntimeError, match="donated"):
            assert_map_live((x, y), "mapping_step")
