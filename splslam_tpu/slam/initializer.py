"""Monocular two-view initialization: unified point + line-midpoint RANSAC.

TPU-native rebuild of the reference Initializer (src/Initializer.cc).
The reference's central novelty is pooling point matches and LINE-MIDPOINT
matches into ONE index space and running the same 8-sample H/F RANSAC over
the union (InitializeBoth :131-252, merge at :169-203). Here that becomes:

- candidate matches from masked Hamming NN passes (points) and the
  midpoint window + angle-histogram + length-gate pass (lines);
- `n_hyp` RANSAC hypotheses drawn with jax.random (seeded => reproducible,
  like the reference's DUtils::Random::SeedRandOnce(0), Initializer.cc:186),
  each hypothesis = 8 unified correspondences;
- homography and fundamental DLT solves vmapped across hypotheses (the
  reference's two std::threads FindHomographyBoth/FindFundamentalBoth
  :211-216 become two branches of one XLA program);
- symmetric-transfer scoring over ALL correspondences per hypothesis,
  model choice by RH = SH/(SH+SF) > 0.40 (reference :218-224);
- reconstruction: E = K^T F K -> 4 (R,t) candidates, or the 8 Faugeras
  motions from H; all candidates scored by batched cheirality/parallax/
  reprojection checks (ReconstructF :1127 / ReconstructH :1248);
- line endpoints + midpoints triangulated with the winning pose
  (TriangulateLine :1763, CheckRTLines :2024).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

TH_CHI2 = 3.841      # 1-dof 95% gate on transfer error (reference :430)
TH_SCORE = 5.991     # score contribution cap (reference CheckFundamental)
SIGMA = 1.0


class TwoViewResult(NamedTuple):
    ok: jax.Array          # scalar bool
    used_h: jax.Array      # scalar bool — homography model chosen
    R21: jax.Array         # (3,3) rotation cam1 -> cam2
    t21: jax.Array         # (3,) unit-norm translation
    xyz: jax.Array         # [M,3] triangulated points (cam-1 frame)
    good: jax.Array        # [M] bool triangulation inliers
    n_good: jax.Array
    parallax: jax.Array    # median parallax (deg) of the good set


def _normalize(xy: jax.Array, mask: jax.Array):
    """Hartley normalization (reference Initializer::NormalizeBoth :1842).
    Returns (normalized xy, 3x3 transform T with xn = T @ x)."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    d = jnp.abs(xy - mean) * w[:, None]
    md = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    xn = (xy - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]],
         [0.0, s[1], -mean[1] * s[1]],
         [0.0, 0.0, 1.0]]
    )
    return xn, T


def _solve_f(x1n: jax.Array, x2n: jax.Array) -> jax.Array:
    """8-point fundamental from [8,2]+[8,2] normalized points; rank-2."""
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )  # [8,9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[-1].reshape(3, 3)
    uf, sf, vtf = jnp.linalg.svd(F)
    sf = sf.at[2].set(0.0)
    return uf @ jnp.diag(sf) @ vtf


def _solve_h(x1n: jax.Array, x2n: jax.Array) -> jax.Array:
    """DLT homography from 8 correspondences (over-determined, like the
    reference's ComputeH21 on the 8-sample set)."""
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    z = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -one, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, one, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [16,9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _score_f(F: jax.Array, xy1, xy2, mask, inv_s2_row=None):
    """Symmetric epipolar-distance score (reference CheckFundamentalBoth
    :430-499): sum of (TH_SCORE - chi2) over inliers, both directions."""
    one = jnp.ones_like(xy1[:, :1])
    x1 = jnp.concatenate([xy1, one], axis=-1)
    x2 = jnp.concatenate([xy2, one], axis=-1)
    l2 = x1 @ F.T      # line in img2
    l1 = x2 @ F        # line in img1
    d2 = jnp.sum(l2 * x2, axis=-1) ** 2 / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    )
    d1 = jnp.sum(l1 * x1, axis=-1) ** 2 / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    )
    inv_s2 = 1.0 / (SIGMA * SIGMA) if inv_s2_row is None else inv_s2_row
    c1 = d1 * inv_s2
    c2 = d2 * inv_s2
    in1 = (c1 <= TH_CHI2) & mask
    in2 = (c2 <= TH_CHI2) & mask
    score = jnp.sum(jnp.where(in1, TH_SCORE - c1, 0.0)) + jnp.sum(
        jnp.where(in2, TH_SCORE - c2, 0.0)
    )
    return score, in1 & in2


def _score_h(Hm: jax.Array, xy1, xy2, mask, inv_s2_row=None):
    """Symmetric transfer score for H (reference CheckHomographyBoth
    :309-377), chi2 gate 5.991 both directions."""
    one = jnp.ones_like(xy1[:, :1])
    x1 = jnp.concatenate([xy1, one], axis=-1)
    x2 = jnp.concatenate([xy2, one], axis=-1)
    Hinv = jnp.linalg.inv(Hm + 1e-12 * jnp.eye(3))
    p2 = x1 @ Hm.T
    p1 = x2 @ Hinv.T
    p2 = p2[:, :2] / jnp.where(jnp.abs(p2[:, 2:]) < 1e-9, 1e-9, p2[:, 2:])
    p1 = p1[:, :2] / jnp.where(jnp.abs(p1[:, 2:]) < 1e-9, 1e-9, p1[:, 2:])
    inv_s2 = 1.0 / (SIGMA * SIGMA) if inv_s2_row is None else inv_s2_row
    c2 = jnp.sum((p2 - xy2) ** 2, axis=-1) * inv_s2
    c1 = jnp.sum((p1 - xy1) ** 2, axis=-1) * inv_s2
    th = 5.991
    in1 = (c1 <= th) & mask
    in2 = (c2 <= th) & mask
    score = jnp.sum(jnp.where(in1, th - c1, 0.0)) + jnp.sum(
        jnp.where(in2, th - c2, 0.0)
    )
    return score, in1 & in2


def _triangulate_all(R, t, K, xy1, xy2):
    """DLT triangulation of all correspondences for pose (R,t) of cam2
    w.r.t. cam1. Returns xyz in cam-1 frame [M,3]."""
    P1 = K @ jnp.eye(3, 4)
    Rt = jnp.concatenate([R, t[:, None]], axis=1)
    P2 = K @ Rt

    def dlt(a, b):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(dlt)(xy1, xy2)


def _check_rt(R, t, K, xy1, xy2, mask, th2: float = 16.0):
    """CheckRT (reference :1857-2022): cheirality in both views, finite
    parallax, reprojection error < th2 in both images. Returns
    (n_good, good_mask, parallax_deg, xyz)."""
    xyz = _triangulate_all(R, t, K, xy1, xy2)
    z1 = xyz[:, 2]
    p2 = xyz @ R.T + t
    z2 = p2[:, 2]
    O2 = -R.T @ t
    n1 = jnp.linalg.norm(xyz, axis=-1)
    n2 = jnp.linalg.norm(xyz - O2, axis=-1)
    cosp = jnp.sum(xyz * (xyz - O2), axis=-1) / jnp.maximum(n1 * n2, 1e-9)

    def reproj(pc, xy):
        zs = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        u = K[0, 0] * pc[:, 0] / zs + K[0, 2]
        v = K[1, 1] * pc[:, 1] / zs + K[1, 2]
        return (u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2

    e1 = reproj(xyz, xy1)
    e2 = reproj(p2, xy2)
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    good = (
        mask & finite & (z1 > 0) & (z2 > 0) & (cosp < 0.99998)
        & (e1 < th2) & (e2 < th2)
    )
    n_good = jnp.sum(good.astype(jnp.int32))
    # parallax at the 50th-smallest-cos percentile of good points
    cos_good = jnp.where(good, cosp, 1.0)
    cos_sorted = jnp.sort(cos_good)
    idx = jnp.clip(jnp.minimum(50, n_good - 1), 0, cosp.shape[0] - 1)
    parallax = jnp.degrees(jnp.arccos(jnp.clip(cos_sorted[idx], -1.0, 1.0)))
    return n_good, good, parallax, xyz


def _decompose_h(Hm: jax.Array, K: jax.Array):
    """Faugeras SVD decomposition of a homography into the 8 candidate
    motions (reference ReconstructH/ReconstructHLines :1248-1574)."""
    A = jnp.linalg.inv(K) @ Hm @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    st_ = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    Rs, ts = [], []
    for i in range(4):
        stheta = st_ * jnp.sign(x1s[i] * x3s[i] + 1e-30)
        Rp = jnp.array(
            [[ct, 0.0, -stheta], [0.0, 1.0, 0.0], [stheta, 0.0, ct]]
        )
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    # case d' < 0
    sphi = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sph = sphi * jnp.sign(x1s[i] * x3s[i] + 1e-30)
        Rp = jnp.array(
            [[cphi, 0.0, sph], [0.0, -1.0, 0.0], [sph, 0.0, -cphi]]
        )
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        Rs.append(s * U @ Rp @ Vt)
        ts.append(U @ tp)
    R8 = jnp.stack(Rs)
    t8 = jnp.stack(ts)
    t8 = t8 / jnp.maximum(jnp.linalg.norm(t8, axis=-1, keepdims=True), 1e-12)
    return R8, t8


def _decompose_e(F: jax.Array, K: jax.Array):
    """E = K^T F K -> the 4 candidate motions (reference ReconstructF +
    DecomposeE :1127-1246, :2162-2188)."""
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    Wm = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ Wm @ Vt
    R2 = U @ Wm.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    R4 = jnp.stack([R1, R1, R2, R2])
    t4 = jnp.stack([t, -t, t, -t])
    return R4, t4


@partial(jax.jit, static_argnames=("n_hyp",))
def two_view_init(
    key: jax.Array,
    xy1: jax.Array,      # [M,2] view-1 coords of unified correspondences
    xy2: jax.Array,      # [M,2] view-2 coords
    mask: jax.Array,     # [M] bool — correspondence exists
    K: jax.Array,        # (3,3) intrinsics
    n_hyp: int = 256,
    inv_sigma2: jax.Array | None = None,  # [M] per-row measurement weight
    #   (line midpoints are noisier than corners — the reference gives
    #   them their own sigma band; pass 1/sigma^2 per row)
) -> TwoViewResult:
    """The unified point+midpoint RANSAC + model select + reconstruction.

    `xy1/xy2` already contain points FOLLOWED BY line midpoints — the
    caller merges them into one index space exactly as the reference does
    (Initializer.cc:169-203); this function is agnostic to which is which.
    """
    M = xy1.shape[0]
    n_match = jnp.sum(mask.astype(jnp.int32))

    x1n, T1 = _normalize(xy1, mask)
    x2n, T2 = _normalize(xy2, mask)

    # --- sample 8-tuples from valid correspondences ---
    # Draw with probability proportional to mask (Gumbel top-k per hyp).
    logits = jnp.where(mask, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, M)) + logits[None]
    _, samples = jax.lax.top_k(g, 8)            # [n_hyp, 8]

    def per_hyp(idx):
        a1 = x1n[idx]
        a2 = x2n[idx]
        Fn = _solve_f(a1, a2)
        Hn = _solve_h(a1, a2)
        F = T2.T @ Fn @ T1
        Hm = jnp.linalg.inv(T2) @ Hn @ T1
        sf, _ = _score_f(F, xy1, xy2, mask, inv_sigma2)
        sh, _ = _score_h(Hm, xy1, xy2, mask, inv_sigma2)
        return F, Hm, sf, sh

    Fs, Hs, sf, sh = jax.vmap(per_hyp)(samples)
    best_f = jnp.argmax(sf)
    best_h = jnp.argmax(sh)
    F = Fs[best_f]
    Hm = Hs[best_h]

    # Refit each best model on ALL of its inliers (normal-equations
    # nullspace via eigh — tightens the minimal-sample estimate).
    _, in_f0 = _score_f(F, xy1, xy2, mask, inv_sigma2)
    _, in_h0 = _score_h(Hm, xy1, xy2, mask, inv_sigma2)

    def refit_f(inl):
        u1, v1 = x1n[:, 0], x1n[:, 1]
        u2, v2 = x2n[:, 0], x2n[:, 1]
        one = jnp.ones_like(u1)
        A = jnp.stack(
            [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one],
            axis=-1,
        ) * inl.astype(jnp.float32)[:, None]
        G = jnp.einsum("mi,mj->ij", A, A, precision=_HI)
        _, vecs = jnp.linalg.eigh(G)
        Fn = vecs[:, 0].reshape(3, 3)
        uf, sfv, vtf = jnp.linalg.svd(Fn)
        Fn = uf @ jnp.diag(sfv.at[2].set(0.0)) @ vtf
        return T2.T @ Fn @ T1

    def refit_h(inl):
        u1, v1 = x1n[:, 0], x1n[:, 1]
        u2, v2 = x2n[:, 0], x2n[:, 1]
        z = jnp.zeros_like(u1)
        one = jnp.ones_like(u1)
        w = inl.astype(jnp.float32)[:, None]
        r1 = jnp.stack(
            [z, z, z, -u1, -v1, -one, v2 * u1, v2 * v1, v2], axis=-1
        ) * w
        r2 = jnp.stack(
            [u1, v1, one, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1
        ) * w
        A = jnp.concatenate([r1, r2], axis=0)
        G = jnp.einsum("mi,mj->ij", A, A, precision=_HI)
        _, vecs = jnp.linalg.eigh(G)
        Hn = vecs[:, 0].reshape(3, 3)
        return jnp.linalg.inv(T2) @ Hn @ T1

    F2 = refit_f(in_f0)
    H2 = refit_h(in_h0)
    sf2, _ = _score_f(F2, xy1, xy2, mask, inv_sigma2)
    sh2, _ = _score_h(H2, xy1, xy2, mask, inv_sigma2)
    F = jnp.where(sf2 >= sf[best_f], F2, F)
    Hm = jnp.where(sh2 >= sh[best_h], H2, Hm)
    SF = jnp.maximum(sf2, sf[best_f])
    SH = jnp.maximum(sh2, sh[best_h])
    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40  # reference :218-224

    _, in_f = _score_f(F, xy1, xy2, mask, inv_sigma2)
    _, in_h = _score_h(Hm, xy1, xy2, mask, inv_sigma2)
    inliers = jnp.where(use_h, in_h, in_f)

    # --- reconstruction candidates (compute both, pick by model flag) ---
    R4, t4 = _decompose_e(F, K)
    R8h, t8h = _decompose_h(Hm, K)
    R8 = jnp.where(use_h, R8h, jnp.concatenate([R4, R4], axis=0))
    t8 = jnp.where(use_h, t8h, jnp.concatenate([t4, t4], axis=0))
    # The F model only has 4 distinct candidates; mask the duplicate slots
    # so the best-vs-second dominance test below stays meaningful.
    slot_ok = use_h | (jnp.arange(8) < 4)

    n_good, good, par, xyz = jax.vmap(
        lambda R, t: _check_rt(R, t, K, xy1, xy2, inliers)
    )(R8, t8)
    n_good = jnp.where(slot_ok, n_good, -1)

    best = jnp.argmax(n_good)
    n_best = n_good[best]
    # Winner must dominate (reference: nsimilar<2 with 0.7 ratio) and
    # explain enough inliers with real parallax.
    second = jnp.sort(n_good)[-2]
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    ok = (
        (n_best >= 0.8 * n_inl.astype(jnp.float32))
        & (second < 0.75 * n_best.astype(jnp.float32))
        & (n_best > 30)
        & (par[best] > 0.5)
        & (n_match >= 30)
    )
    return TwoViewResult(
        ok=ok,
        used_h=use_h,
        R21=R8[best],
        t21=t8[best],
        xyz=xyz[best],
        good=good[best],
        n_good=n_best,
        parallax=par[best],
    )
