"""Offline analysis of the captured guard-tripping local-BA problem
(/tmp/guard_map.pkl from diag_guard_capture.py): mirror ba_solve's
assemble/gn_step at python level and find where non-finite values enter."""
import os
import pickle
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from splslam_tpu.io.cache import host_cache_dir

jax.config.update("jax_compilation_cache_dir",
                  host_cache_dir("/tmp/splslam_test_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.slam import mapping_ops as MO
from splslam_tpu.slam.map import MapState
from splslam_tpu.optim import ba as BA


def main():
    with open("/tmp/guard_map.pkl", "rb") as f:
        d = pickle.load(f)
    st = jax.tree.map(jnp.asarray, d["map"])
    if not isinstance(st, MapState):
        st = MapState(*st)
    kf = jnp.int32(d["kf"])
    s = d["settings"]
    cam = Camera.create(s["fx"], s["fy"], s["cx"], s["cy"], bf=s["bf"],
                        width=s["width"], height=s["height"])
    cams, lm_ids = MO.build_ba_window(st, kf)
    prob = MO.make_ba_problem(st, cams, lm_ids)
    print("window cams:", np.asarray(cams))
    print("edges ok:", int(np.asarray(prob.e_ok).sum()),
          "lm ok:", int(np.asarray(prob.lm_ok).sum()))
    res = BA.ba_solve(cam, prob, rounds=2, iters=5, n_free=MO.N_WINDOW)
    print("repro n_guarded:", int(res.n_guarded),
          "n_lm_singular:", int(res.n_lm_singular))

    # Python-level mirror of one round to find the NaN entry point.
    p = prob
    C = p.Tcw.shape[0]
    L = p.xyz.shape[0]
    Cf = MO.N_WINDOW
    chi2_gate, huber_d2, joint_chi2 = BA._gates(p)
    Tcw_all, xyz_all = p.Tcw, p.xyz
    active = p.e_ok
    lam = 1e-4
    for rnd in range(2):
        r, J_c, J_p, chi2, z_ok = BA._edge_terms(Tcw_all, xyz_all, cam, p)
        for nm, v in (("r", r), ("J_c", J_c), ("J_p", J_p), ("chi2", chi2)):
            nf = int((~np.isfinite(np.asarray(v))).sum())
            if nf:
                print(f"round {rnd}: NON-FINITE in {nm}: {nf}")
        live = np.asarray(active & z_ok)
        w = np.asarray(BA._huber_weight(chi2, huber_d2)) \
            * np.asarray(p.e_inv_sigma2) * live
        print(f"round {rnd}: live {live.sum()}, w max {np.nanmax(w):.3e}, "
              f"chi2 max(live) "
              f"{np.nanmax(np.where(live, np.asarray(chi2), 0)):.3e}")
        # per-camera live-edge counts
        ec = np.asarray(p.e_cam)
        for c in range(Cf):
            m = (ec == c) & live
            print(f"  cam {c}: live edges {m.sum()}")
        # run 5 LM iters via the real solver and look at the state after
        res1 = BA.ba_solve(cam, p._replace(Tcw=Tcw_all, xyz=xyz_all,
                                           e_ok=jnp.asarray(active)),
                           rounds=1, iters=5, n_free=Cf)
        print(f"round {rnd}: 1-round guard {int(res1.n_guarded)} "
              f"lmsing {int(res1.n_lm_singular)}")
        Tcw_all, xyz_all = res1.Tcw, res1.xyz
        active = jnp.asarray(res1.e_inlier)


if __name__ == "__main__":
    main()
