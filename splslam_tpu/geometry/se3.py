"""SE(3) / Sim(3) Lie-group operations, batched and jit-friendly.

Replaces g2o's `SE3Quat`/`Sim3` types (reference: Thirdparty/g2o/g2o/types/
se3quat.h, sim3.h) with closed-form exp/log maps over plain arrays so that
pose manifolds can be vmapped across frames/keyframes/hypotheses.

Conventions:
- A pose is stored as a 4x4 homogeneous matrix `T` (world-to-camera `Tcw`
  throughout the SLAM pipeline, matching the reference).
- Tangent vectors are `[rho(3), phi(3)]` = (translation, rotation), the
  same ordering as g2o's SE3Quat::exp used by the reference optimizer.
- Everything is float32 by default; the BA normal equations are solved in
  float64-free form via careful normalization (TPU has no f64 MXU path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# TPU matmuls default to bf16; pose math must stay true f32.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector. Batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues formula: axis-angle (3,) -> rotation matrix (3,3).

    Uses the Taylor expansion of sin(t)/t and (1-cos t)/t^2 near zero so the
    function is smooth (and differentiable) at the identity — no
    data-dependent branching, safe under jit/vmap.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos t)/t^2 with series fallback near 0
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(
        theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0
    )
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * _mm(K, K)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle. Batched. Accurate away from theta=pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    # theta/(2 sin theta), series near 0
    scale = jnp.where(
        jnp.abs(sin_t) > _EPS,
        theta / (2.0 * sin_t + _EPS * jnp.sign(sin_t + _EPS)),
        0.5 + theta * theta / 12.0,
    )
    small = w * scale[..., None]
    # Near theta == pi the vee-map above degenerates; recover the axis from
    # the diagonal of R instead.
    near_pi = theta > (jnp.pi - 1e-3)
    axis_sq = jnp.clip((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1) + 1.0) * 0.5, 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal sums.
    sx = jnp.where(R[..., 2, 1] - R[..., 1, 2] < 0, -1.0, 1.0)
    sy = jnp.where(R[..., 0, 2] - R[..., 2, 0] < 0, -1.0, 1.0)
    sz = jnp.where(R[..., 1, 0] - R[..., 0, 1] < 0, -1.0, 1.0)
    signs = jnp.stack([sx, sy, sz], axis=-1)
    big = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], big, small)


def _left_jacobian(phi: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(phi), used inside SE(3) exp."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (theta2 * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * _mm(K, K)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Tangent [rho, phi] (…,6) -> 4x4 transform (…,4,4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(phi), rho, precision=_HI)
    return rt_to_mat(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """4x4 transform -> tangent [rho, phi] (…,6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    Jl = _left_jacobian(phi)
    rho = jnp.linalg.solve(Jl, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R (…,3,3), t (…,3)) -> homogeneous (…,4,4)."""
    batch = R.shape[:-2]
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_HI))


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (…,4,4) to points (…,N,3) or (N,3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision=_HI) + t[..., None, :]


def se3_retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiplicative update exp(xi) @ T — matches g2o's oplusImpl for
    VertexSE3Expmap (reference Optimizer uses T <- exp(dx) * T)."""
    return _mm(se3_exp(xi), T)


# ---------------------------------------------------------------------------
# Sim(3) — for loop closure / essential graph (reference: g2o sim3.h).
# Stored as (s, R, t): scale scalar, rotation, translation.
# ---------------------------------------------------------------------------


def sim3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Tangent [rho(3), phi(3), sigma(1)] -> (s, R, t).

    Closed-form W matrix (t = W @ rho) with the four small-angle /
    small-scale limits expressed as jnp.where selections so the map is
    jit-safe and smooth. Coefficients follow the standard Sim(3) exponential
    (Strasdat, "Local accuracy and global consistency for efficient visual
    SLAM", Appendix)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    sig_small = jnp.abs(sigma) < 1e-5
    th_small = theta < 1e-5
    sig_safe = jnp.where(sig_small, 1.0, sigma)
    th2_safe = jnp.where(th_small, 1.0, theta2)
    th_safe = jnp.where(th_small, 1.0, theta)
    c2 = sigma * sigma + theta2
    c2_safe = jnp.where(c2 < _EPS, 1.0, c2)

    C = jnp.where(sig_small, 1.0, (s - 1.0) / sig_safe)

    a_ss = s * jnp.sin(theta)
    b_sc = s * jnp.cos(theta)
    # A coefficient (multiplies K)
    A_gen = (a_ss * sigma + (1.0 - b_sc) * theta) / (th_safe * c2_safe)
    A_sig0 = (1.0 - jnp.cos(theta)) / th2_safe
    A_th0 = jnp.where(sig_small, 0.5, ((sigma - 1.0) * s + 1.0) / (sig_safe * sig_safe))
    A = jnp.where(th_small, A_th0, jnp.where(sig_small, A_sig0, A_gen))
    # B coefficient (multiplies K @ K)
    B_gen = (C - ((b_sc - 1.0) * sigma + a_ss * theta) / c2_safe) / th2_safe
    B_sig0 = (theta - jnp.sin(theta)) / (th2_safe * th_safe)
    B_th0 = jnp.where(
        sig_small,
        1.0 / 6.0,
        ((0.5 * sigma * sigma - sigma + 1.0) * s - 1.0) / (sig_safe * sig_safe * sig_safe),
    )
    B = jnp.where(th_small, B_th0, jnp.where(sig_small, B_sig0, B_gen))

    W = C[..., None, None] * eye + A[..., None, None] * K + B[..., None, None] * _mm(K, K)
    t = jnp.einsum("...ij,...j->...i", W, rho, precision=_HI)
    return s, R, t


def sim3_apply(s: jax.Array, R: jax.Array, t: jax.Array, pts: jax.Array) -> jax.Array:
    return s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, pts, precision=_HI) + t[..., None, :]


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t, precision=_HI)


def sim3_compose(a, b):
    """Compose Sim3 a∘b (apply b first)."""
    sa, Ra, ta = a
    sb, Rb, tb = b
    return sa * sb, _mm(Ra, Rb), sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb, precision=_HI) + ta
