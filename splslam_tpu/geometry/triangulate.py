"""Two-view triangulation (points and line endpoints), batched DLT.

Replaces the per-match cv::SVD DLT loops in the reference
(src/LocalMapping.cc:484-984 CreateNewMapPoints/CreateNewMapLines,
src/Initializer.cc:1127-1763 ReconstructF/HLines + TriangulateLine) with a
single vmapped 4x4 SVD — hundreds of matches per XLA call instead of one
SVD per match on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_dlt(P1: jax.Array, P2: jax.Array, uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Batched linear triangulation.

    P1, P2: (3,4) projection matrices (K[R|t]).
    uv1, uv2: (N,2) pixel observations.
    Returns (N,3) world points (homogeneous DLT, smallest singular vector).
    """

    def one(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        # Smallest right singular vector of A (4x4): eigvector of A^T A with
        # smallest eigenvalue. jnp.linalg.svd on 4x4 is fine under vmap.
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        w = jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])
        return X[:3] / w

    return jax.vmap(one)(uv1, uv2)


def projection_matrix(K: jax.Array, Tcw: jax.Array) -> jax.Array:
    """K (3,3) + pose Tcw (4,4) -> P (3,4)."""
    return K @ Tcw[:3, :4]


def triangulation_checks(
    X: jax.Array,
    Tcw1: jax.Array,
    Tcw2: jax.Array,
    uv1: jax.Array,
    uv2: jax.Array,
    K: jax.Array,
    sigma2_1: jax.Array,
    sigma2_2: jax.Array,
    chi2_th: float = 5.991,
    min_parallax_cos: float = 0.9998,
) -> jax.Array:
    """Validity mask for triangulated points: finite, positive depth in both
    views, reprojection chi2 under threshold in both views, sufficient
    parallax. Mirrors the acceptance logic of the reference's
    CreateNewMapPoints (src/LocalMapping.cc:598-720) as one fused mask.
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def cam_and_reproj(Tcw, uv):
        pc = X @ Tcw[:3, :3].T + Tcw[:3, 3]
        z = pc[:, 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = fx * pc[:, 0] / z_safe + cx
        v = fy * pc[:, 1] / z_safe + cy
        err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        return z, err2

    z1, e1 = cam_and_reproj(Tcw1, uv1)
    z2, e2 = cam_and_reproj(Tcw2, uv2)
    finite = jnp.all(jnp.isfinite(X), axis=-1)

    # Parallax between the two viewing rays.
    C1 = -Tcw1[:3, :3].T @ Tcw1[:3, 3]
    C2 = -Tcw2[:3, :3].T @ Tcw2[:3, 3]
    r1 = X - C1
    r2 = X - C2
    cosp = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )

    return (
        finite
        & (z1 > 0)
        & (z2 > 0)
        & (e1 < chi2_th * sigma2_1)
        & (e2 < chi2_th * sigma2_2)
        & (cosp < min_parallax_cos)
    )


def triangulate_lines(
    P1: jax.Array,
    P2: jax.Array,
    seg1: jax.Array,
    seg2: jax.Array,
) -> jax.Array:
    """Triangulate line segments as three 3D points (start, mid, end).

    seg1/seg2: (L,4) as [sx, sy, ex, ey] matched segment endpoints in the
    two views. The mid/endpoints are triangulated independently by DLT —
    the reference's MapLine stores exactly this triple
    (include/MapLine.h:121-123, TriangulateLine src/Initializer.cc:1763).
    Returns (L,3,3): [:,0]=start, [:,1]=mid, [:,2]=end.
    """
    s1, e1 = seg1[:, :2], seg1[:, 2:]
    s2, e2 = seg2[:, :2], seg2[:, 2:]
    m1 = 0.5 * (s1 + e1)
    m2 = 0.5 * (s2 + e2)
    Xs = triangulate_dlt(P1, P2, s1, s2)
    Xm = triangulate_dlt(P1, P2, m1, m2)
    Xe = triangulate_dlt(P1, P2, e1, e2)
    return jnp.stack([Xs, Xm, Xe], axis=1)
