"""Multi-chip global bundle adjustment: edge-sharded PCG over an ICI mesh.

The reference has no distributed backend (SURVEY §2.4); the TPU-native
scaling axis for the BA back-end is the EDGE TABLE. Camera and landmark
states are small (a few MB) and stay replicated; the observation edges —
the O(K*N) part — shard across devices. Every Hessian-block/gradient
accumulation and every matrix-free Schur product in the PCG loop is a
local segment-sum over the device's edge shard followed by one `psum`
over the mesh, so all communication is dense all-reduces riding ICI.
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
    CHI2_MONO,
    CHI2_STEREO,
    _edge_terms,
    _huber_weight,
)

_HI = jax.lax.Precision.HIGHEST


def _gn_step_sharded(cam: Camera, p: BAProblem, Tcw_all, xyz_all,
                     cg_iters: int, damping: float, axis: str):
    """One GN step with edge-sharded accumulation. `p.e_*` arrays are the
    LOCAL shard; states are replicated. Runs inside shard_map."""
    C = Tcw_all.shape[0]
    L = xyz_all.shape[0]
    chi2_gate = jnp.where(p.e_ur >= 0, CHI2_STEREO, CHI2_MONO)

    r, J_c, J_p, chi2, z_ok = _edge_terms(Tcw_all, xyz_all, cam, p)
    w = (
        _huber_weight(chi2, chi2_gate)
        * p.e_inv_sigma2
        * (p.e_ok & z_ok).astype(jnp.float32)
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
    dx_c = jnp.where(jnp.all(jnp.isfinite(dx_c)), dx_c, 0.0) * free_f

    ve = dx_c[p.e_cam]
    wt = jnp.einsum("ekl,ek->el", G, ve, precision=_HI)
    Wt_dxc = allsum(jnp.zeros((L, 3)).at[p.e_lm].add(wt, mode="drop"))
    dx_p = jnp.einsum("lkm,lm->lk", iHpp, -(bp + Wt_dxc), precision=_HI)
    dx_p = jnp.where(
        (lm_active & jnp.all(jnp.isfinite(dx_p), -1))[:, None], dx_p, 0.0
    )
    Tcw_new = jax.vmap(se3.se3_retract)(Tcw_all, dx_c)
    return Tcw_new, xyz_all + dx_p


def gba_sharded(cam: Camera, p: BAProblem, mesh: Mesh, *,
                gn_iters: int = 4, cg_iters: int = 16,
                damping: float = 1e-3, axis: str = "data"):
    """Run edge-sharded global BA over `mesh`. The edge count must divide
    the mesh size (pad with e_ok=False rows). Returns (Tcw, xyz)."""
    n_dev = mesh.devices.size
    E = p.e_cam.shape[0]
    pad = (-E) % n_dev
    if pad:
        def padE(x, fill=0):
            shp = (pad,) + x.shape[1:]
            return jnp.concatenate([x, jnp.full(shp, fill, x.dtype)])

        p = p._replace(
            e_cam=padE(p.e_cam), e_lm=padE(p.e_lm), e_uv=padE(p.e_uv),
            e_ur=padE(p.e_ur, -1.0), e_inv_sigma2=padE(p.e_inv_sigma2, 1.0),
            e_ok=padE(p.e_ok, False),
        )

    edge_spec = BAProblem(
        Tcw=P(), cam_free=P(), xyz=P(), lm_ok=P(),
        e_cam=P(axis), e_lm=P(axis), e_uv=P(axis), e_ur=P(axis),
        e_inv_sigma2=P(axis), e_ok=P(axis),
    )

    def body(prob):
        Tcw, xyz = prob.Tcw, prob.xyz

        def step(carry, _):
            T, X = carry
            T, X = _gn_step_sharded(
                cam, prob, T, X, cg_iters, damping, axis
            )
            return (T, X), None

        (Tcw, xyz), _ = jax.lax.scan(step, (Tcw, xyz), None, length=gn_iters)
        return Tcw, xyz

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(edge_spec,), out_specs=(P(), P()),
            check_vma=False,
        )
    )
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), p, edge_spec
    )
    return fn(sharded)
