"""Pose-only optimization: batched Gauss-Newton / LM on SE(3).

Replaces the reference's g2o pose optimizers and its hand-written
Gauss-Newton (src/Optimizer.cc:1414-2160: PoseOptimizationPoints/Lines/
Both, PoseOptimizationmain, GaussNewtonOptimizationForPose) with one
fixed-shape kernel:

- residuals: (a) point reprojection r = pi(Tcw X) - uv  (2-dim,
  chi2 gate 5.991), (b) line r = l . [pi(Tcw M), 1] where l is the
  normalized observed 2D line and M the 3D midpoint (1-dim, chi2 3.841 —
  the reference's EdgeSE3ProjectXYZOnlyPoseLines, include/Optimizer.h:48-77);
- analytic Jacobians for the left-multiplicative update exp(xi) * Tcw
  (tangent ordering [rho, phi] as in g2o SE3Quat);
- Huber-weighted normal equations accumulated with einsum (f32,
  HIGHEST precision), 6x6 solve, fixed iteration counts;
- outer rounds re-classify outliers by chi2 and drop them from the next
  round (mirrors the 4x10 schedule of g2o PoseOptimization,
  src/Optimizer.cc:409-520).

Everything is jit-safe and vmappable across frames/hypotheses.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splslam_tpu.geometry import se3
from splslam_tpu.geometry.camera import Camera

_HI = jax.lax.Precision.HIGHEST

CHI2_POINT = 5.991   # 2-dof 95% (reference Optimizer.cc:476)
CHI2_STEREO = 7.815  # 3-dof 95% (reference Optimizer.cc:477 chi2Stereo)
CHI2_LINE = 3.841    # 1-dof 95% (reference Optimizer.cc:1780)


class PointObs(NamedTuple):
    """Fixed-size point observation table for one frame.

    `ur`: observed right-image x per keypoint (-1 = monocular row). When
    present, rows with ur >= 0 become the reference's 3-dof stereo pose
    edges (EdgeStereoSE3ProjectXYZOnlyPose, Optimizer.cc:1476-1520:
    residual [u - u_obs, v - v_obs, (u - bf/z) - ur_obs], chi2 gate
    7.815) — the disparity row pins the DEPTH direction of the camera
    translation, which pure 2-dof reprojection leaves weakly observable
    on fronto-parallel scenes (measured: per-frame pose error on the
    lateral e2e scene drops ~3x with the stereo rows). ur=None keeps
    the exact monocular 2-dof program (no numerics change)."""

    xyz_w: jax.Array       # [N,3] landmark world positions
    uv: jax.Array          # [N,2] observed (undistorted) pixels
    inv_sigma2: jax.Array  # [N] information scale (1/sigma^2 of octave)
    mask: jax.Array        # [N] bool — observation exists
    ur: jax.Array | None = None  # [N] right-x obs, -1 mono (None = all mono)

    @staticmethod
    def empty(n: int) -> "PointObs":
        return PointObs(
            jnp.zeros((n, 3)), jnp.zeros((n, 2)), jnp.ones((n,)),
            jnp.zeros((n,), bool),
        )


class LineObs(NamedTuple):
    """Fixed-size line observation table (midpoint form) for one frame."""

    mid_w: jax.Array       # [L,3] 3D line midpoints (world)
    coef: jax.Array        # [L,3] observed 2D line (lx,ly,lz), lx^2+ly^2=1
    inv_sigma2: jax.Array  # [L]
    mask: jax.Array        # [L] bool

    @staticmethod
    def empty(n: int) -> "LineObs":
        return LineObs(
            jnp.zeros((n, 3)), jnp.zeros((n, 3)), jnp.ones((n,)),
            jnp.zeros((n,), bool),
        )


def line_coefficients(seg: jax.Array) -> jax.Array:
    """Observed segment endpoints (L,4)=[sx,sy,ex,ey] -> normalized line
    coefficients (L,3) with lx^2+ly^2 = 1 (the observation format of the
    reference's line edges and EPnL, include/PnPsolver.h:90)."""
    p1 = jnp.concatenate([seg[:, :2], jnp.ones_like(seg[:, :1])], axis=-1)
    p2 = jnp.concatenate([seg[:, 2:4], jnp.ones_like(seg[:, :1])], axis=-1)
    l = jnp.cross(p1, p2)
    norm = jnp.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2) + 1e-12
    return l / norm[:, None]


def _point_terms(Tcw, cam: Camera, pts: PointObs):
    """Residuals r [N,R], Jacobians J [N,R,6], valid depth mask, where
    R = 2 (pts.ur is None: pure mono) or 3 (stereo rows carry the
    disparity residual (u - bf/z) - ur; mono rows have row 3 zeroed)."""
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts.xyz_w @ R.T + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_ok = z > 1e-3
    zs = jnp.where(z_ok, z, 1.0)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    r2 = jnp.stack([u - pts.uv[:, 0], v - pts.uv[:, 1]], axis=-1)
    # Closed-form J = [d(uv)/d(pc) | -d(uv)/d(pc) hat(pc)] (the g2o
    # EdgeSE3ProjectXYZOnlyPose Jacobian, written out so XLA sees pure
    # elementwise [N] arithmetic — a batched [N](2,3)x(3,6) einsum
    # lowers to N tiny MXU matmuls and is latency-bound).
    zeros = jnp.zeros_like(x)
    xiz, yiz = x * iz, y * iz
    Ju = jnp.stack(
        [cam.fx * iz, zeros, -cam.fx * xiz * iz,
         -cam.fx * xiz * yiz, cam.fx * (1.0 + xiz * xiz),
         -cam.fx * yiz], axis=-1)
    Jv = jnp.stack(
        [zeros, cam.fy * iz, -cam.fy * yiz * iz,
         -cam.fy * (1.0 + yiz * yiz), cam.fy * xiz * yiz,
         cam.fy * xiz], axis=-1)
    if pts.ur is None:
        return r2, jnp.stack([Ju, Jv], axis=1), z_ok
    # Stereo disparity row (g2o EdgeStereoSE3ProjectXYZOnlyPose):
    # r3 = (u - bf/z) - ur_obs; d r3/d pc = d u/d pc + bf*iz^2 * e_z,
    # mapped to the SE3 tangent with the same [g | -g hat(pc)] form.
    st = pts.ur >= 0
    r3 = jnp.where(st, (u - cam.bf * iz) - pts.ur, 0.0)
    g0 = cam.fx * iz
    g2s = -cam.fx * xiz * iz + cam.bf * iz2
    Js = jnp.stack(
        [g0, zeros, g2s,
         g2s * y, g0 * zs - g2s * x, -g0 * y], axis=-1)
    Js = Js * st[:, None].astype(Js.dtype)
    r = jnp.concatenate([r2, r3[:, None]], axis=-1)
    J = jnp.stack([Ju, Jv, Js], axis=1)    # [N,3,6]
    return r, J, z_ok


def _line_terms(Tcw, cam: Camera, lines: LineObs):
    """Residuals r [L], Jacobians J [L,6], valid depth mask."""
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = lines.mid_w @ R.T + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_ok = z > 1e-3
    zs = jnp.where(z_ok, z, 1.0)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    lx, ly, lz = lines.coef[:, 0], lines.coef[:, 1], lines.coef[:, 2]
    r = lx * u + ly * v + lz
    zeros = jnp.zeros_like(x)
    # dr/d(pc) = lx * du/dpc + ly * dv/dpc   [L,3]
    dr_dpc = jnp.stack(
        [
            lx * cam.fx * iz,
            ly * cam.fy * iz,
            -(lx * cam.fx * x + ly * cam.fy * y) * iz2,
        ],
        axis=-1,
    )
    # Closed-form J = [g | -g hat(pc)] with g = dr/d(pc) (see
    # _point_terms for why the batched einsum form is avoided).
    g0, g1, g2 = dr_dpc[:, 0], dr_dpc[:, 1], dr_dpc[:, 2]
    J = jnp.stack(
        [g0, g1, g2,
         g2 * y - g1 * z, g0 * z - g2 * x, g1 * x - g0 * y], axis=-1)
    del zeros
    return r, J, z_ok


def solve6(H: jax.Array, b: jax.Array) -> jax.Array:
    """Unrolled 6x6 Cholesky solve. `jnp.linalg.solve` lowers a 6x6 LU
    with pivoting to a serialized scalar loop on TPU (~10s of us per
    call); the damped GN normal matrix is SPD, so straight-line LL^T
    (~80 scalar flops, no control flow) is exact and pipeline-friendly
    inside the sequential GN iteration chain."""
    n = 6
    L = [[None] * n for (_) in range(n)]
    for j in range(n):
        d = H[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        # Relative pivot floor (see optim/ba.solve_dense: an absolute
        # floor turns breakdown pivots into overflow->NaN chains;
        # bit-identical on healthy solves).
        Ljj = jnp.sqrt(jnp.maximum(d, 1e-10 * jnp.abs(H[j, j]) + 1e-20))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _huber_weight(chi2: jax.Array, delta2: float) -> jax.Array:
    """Huber IRLS weight on the squared error (delta2 = delta^2)."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


class PoseOptResult(NamedTuple):
    Tcw: jax.Array          # (4,4)
    inlier_pt: jax.Array    # [N] bool
    inlier_ln: jax.Array    # [L] bool
    n_inlier_pt: jax.Array  # scalar i32
    n_inlier_ln: jax.Array  # scalar i32
    chi2_pt: jax.Array      # [N] final per-obs chi2
    chi2_ln: jax.Array      # [L]
    unit_error: jax.Array   # scalar: total robust chi2 / #inliers


@partial(jax.jit, static_argnames=("rounds", "iters"))
def pose_optimize(
    Tcw0: jax.Array,
    cam: Camera,
    pts: PointObs,
    lines: LineObs,
    *,
    rounds: int = 4,
    iters: int = 10,
    point_weight: float = 1.0,
    line_weight: float = 1.0,
    damping: float = 1e-5,
) -> PoseOptResult:
    """Optimize one camera pose against fixed landmarks.

    Mirrors PoseOptimizationBoth (reference src/Optimizer.cc:1717): one SE3
    vertex, point edges (chi2 5.991) + line midpoint edges (chi2 3.841),
    robust kernels, `rounds` re-classification rounds of `iters` GN steps.
    Pass empty tables (mask all False) to drop a modality; this one kernel
    covers PoseOptimizationPoints / Lines / Both / DoublePoints (the latter
    via point_weight=2).
    """

    # Per-row chi2 gate / Huber delta^2: 3-dof stereo rows use 7.815
    # (reference deltaStereo/chi2Stereo, Optimizer.cc:477), mono 5.991.
    if pts.ur is None:
        gate_pt = CHI2_POINT
    else:
        gate_pt = jnp.where(pts.ur >= 0, CHI2_STEREO, CHI2_POINT)

    def chi2s(Tcw, active_pt, active_ln):
        r_pt, J_pt, zok_pt = _point_terms(Tcw, cam, pts)
        r_ln, J_ln, zok_ln = _line_terms(Tcw, cam, lines)
        c_pt = jnp.sum(r_pt * r_pt, axis=-1) * pts.inv_sigma2
        c_ln = r_ln * r_ln * lines.inv_sigma2
        return (r_pt, J_pt, c_pt, active_pt & zok_pt,
                r_ln, J_ln, c_ln, active_ln & zok_ln)

    def gn_round(carry, _):
        Tcw, active_pt, active_ln = carry

        def gn_step(Tcw, _):
            r_pt, J_pt, c_pt, m_pt, r_ln, J_ln, c_ln, m_ln = chi2s(
                Tcw, active_pt, active_ln
            )
            w_pt = (
                _huber_weight(c_pt, gate_pt)
                * pts.inv_sigma2
                * m_pt
                * point_weight
            )
            w_ln = (
                _huber_weight(c_ln, CHI2_LINE)
                * lines.inv_sigma2
                * m_ln
                * line_weight
            )
            H = jnp.einsum("nik,n,nil->kl", J_pt, w_pt, J_pt, precision=_HI)
            b = jnp.einsum("nik,n,ni->k", J_pt, w_pt, r_pt, precision=_HI)
            H = H + jnp.einsum("nk,n,nl->kl", J_ln, w_ln, J_ln, precision=_HI)
            b = b + jnp.einsum("nk,n,n->k", J_ln, w_ln, r_ln, precision=_HI)
            H = H + damping * jnp.eye(6) * (1.0 + jnp.trace(H) / 6.0)
            dx = -solve6(H, b)
            # Guard against NaN/huge steps when everything is masked out.
            ok = jnp.all(jnp.isfinite(dx)) & (jnp.sum(w_pt) + jnp.sum(w_ln) > 0)
            dx = jnp.where(ok, dx, 0.0)
            return se3.se3_retract(Tcw, dx), None

        Tcw, _ = jax.lax.scan(gn_step, Tcw, None, length=iters)
        # Re-classify inliers for the next round (reference :489-505).
        _, _, c_pt, m_pt, _, _, c_ln, m_ln = chi2s(Tcw, active_pt, active_ln)
        new_pt = pts.mask & (c_pt <= gate_pt) & m_pt
        new_ln = lines.mask & (c_ln <= CHI2_LINE) & m_ln
        return (Tcw, new_pt, new_ln), None

    init = (Tcw0, pts.mask, lines.mask)
    (Tcw, in_pt, in_ln), _ = jax.lax.scan(gn_round, init, None, length=rounds)

    _, _, c_pt, _, _, _, c_ln, _ = chi2s(Tcw, in_pt, in_ln)
    n_pt = jnp.sum(in_pt.astype(jnp.int32))
    n_ln = jnp.sum(in_ln.astype(jnp.int32))
    total = jnp.sum(jnp.where(in_pt, c_pt, 0.0)) + jnp.sum(jnp.where(in_ln, c_ln, 0.0))
    unit = total / jnp.maximum(n_pt + n_ln, 1)
    return PoseOptResult(Tcw, in_pt, in_ln, n_pt, n_ln, c_pt, c_ln, unit)


def pose_optimize_main(Tcw0, cam, pts, lines, **kw):
    """The reference's PoseOptimizationmain (src/Optimizer.cc:1414-1425):
    solve with points only, then refine with points+lines from that seed."""
    res_pt = pose_optimize(Tcw0, cam, pts, LineObs.empty(lines.mask.shape[0]), **kw)
    return pose_optimize(res_pt.Tcw, cam, pts, lines, **kw)
