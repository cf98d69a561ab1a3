"""Two-view initializer tests: recover (R,t) from synthetic correspondences."""

import numpy as np
import jax
import jax.numpy as jnp

from splslam_tpu.slam.initializer import two_view_init


def _make_corrs(n=200, planar=False, seed=0, noise=0.3, n_pad=56):
    rng = np.random.default_rng(seed)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    if planar:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 4.0)],
            axis=-1,
        )
    else:
        X = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
             rng.uniform(3.0, 8.0, n)], axis=-1,
        )
    # cam1 at origin; cam2 translated + small rotation
    ang = 0.05
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
    )
    t = np.array([-0.4, 0.02, 0.05])

    def proj(P, Rc, tc):
        pc = P @ Rc.T + tc
        return (pc[:, :2] / pc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    xy1 = proj(X, np.eye(3), np.zeros(3)) + rng.normal(0, noise, (n, 2))
    xy2 = proj(X, R, t) + rng.normal(0, noise, (n, 2))
    # pad with invalid rows (fixed-capacity table)
    xy1 = np.concatenate([xy1, np.zeros((n_pad, 2))]).astype(np.float32)
    xy2 = np.concatenate([xy2, np.zeros((n_pad, 2))]).astype(np.float32)
    mask = np.concatenate([np.ones(n, bool), np.zeros(n_pad, bool)])
    return K, R, t, xy1, xy2, mask


def _check(K, R_gt, t_gt, xy1, xy2, mask, expect_h):
    res = two_view_init(
        jax.random.PRNGKey(0), jnp.asarray(xy1), jnp.asarray(xy2),
        jnp.asarray(mask), jnp.asarray(K),
    )
    assert bool(res.ok), (int(res.n_good), float(res.parallax))
    R = np.asarray(res.R21)
    t = np.asarray(res.t21)
    # rotation error
    dR = R @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    # translation direction error (scale is unobservable)
    cos = abs(t @ t_gt / (np.linalg.norm(t) * np.linalg.norm(t_gt)))
    assert cos > 0.995, cos
    return res


def test_general_scene_fundamental():
    K, R, t, xy1, xy2, mask = _make_corrs(planar=False)
    res = _check(K, R, t, xy1, xy2, mask, expect_h=False)
    assert int(res.n_good) > 150


def test_planar_scene_homography():
    K, R, t, xy1, xy2, mask = _make_corrs(planar=True)
    res = _check(K, R, t, xy1, xy2, mask, expect_h=True)
    assert bool(res.used_h)


def test_insufficient_matches_rejected():
    K, R, t, xy1, xy2, mask = _make_corrs(n=20, n_pad=236)
    res = two_view_init(
        jax.random.PRNGKey(0), jnp.asarray(xy1), jnp.asarray(xy2),
        jnp.asarray(mask), jnp.asarray(K),
    )
    assert not bool(res.ok)


def test_pure_rotation_rejected():
    """No parallax -> initialization must refuse."""
    rng = np.random.default_rng(1)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    X = np.stack(
        [rng.uniform(-2, 2, 200), rng.uniform(-1.5, 1.5, 200),
         rng.uniform(3, 8, 200)], axis=-1,
    )
    ang = 0.05
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
         [-np.sin(ang), 0, np.cos(ang)]]
    )

    def proj(P, Rc, tc):
        pc = P @ Rc.T + tc
        return (pc[:, :2] / pc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]

    xy1 = proj(X, np.eye(3), np.zeros(3)).astype(np.float32)
    xy2 = proj(X, R, np.zeros(3)).astype(np.float32)
    mask = np.ones(200, bool)
    res = two_view_init(
        jax.random.PRNGKey(0), jnp.asarray(xy1), jnp.asarray(xy2),
        jnp.asarray(mask), jnp.asarray(K),
    )
    assert not bool(res.ok)
