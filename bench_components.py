"""Component-experiment benches: the reference report's Tables 5-6
(round-4 VERDICT missing #4).

Two experiments, each emitted as a JSON row (and recorded into
BENCH_HEADLINES.json so bench.py re-emits them in driver artifacts):

1. Mono initialization success rate (report Table 5, 测试报告 p.6):
   N trials over re-seeded renders of the low-texture grid scene (the
   fr1_floor regime) — point+line vs points-only success counts plus
   recovered landmark counts. The reference measures 9/10 with
   86 pts + 88 lines vs 1/10 points-only on fr1_floor.

2. Relocalization solver success + per-solve latency (report Table 6):
   N solves of the point path (EPnP analog: pnp_ransac, reference
   PnPsolver::iterate src/PnPsolver.cc:367-447) and the line path
   (EPnL analog: epnl_ransac, PnPsolver::iterateLines) on matched
   correspondences with outlier contamination; success = recovered pose
   within 2 deg / 5 cm; latency = whole-region wall over BATCHES of
   vmapped solves divided by solve count (per-dispatch walls over the
   tunnel carry a ~27 ms RPC floor — see CLAUDE.md timing note; the
   reference times a single CPU solve at 0.20-0.52 ms).

Usage: python bench_components.py   (runs on whatever backend the env
provides; quote chip numbers from an idle-host run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from splslam_tpu.io.cache import host_cache_dir as _hcd
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      _hcd("/tmp/splslam_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

W, H = 320, 240
N_TRIALS = 10


def _low_texture_grid(seed):
    from splslam_tpu.io.synthetic import make_texture

    t = make_texture(seed=seed, size=2048)
    t = 128.0 + (t - 128.0) * 0.12
    for i in range(0, 2048, 96):
        t[i:i + 7, :] = 30.0
        t[:, i:i + 7] = 30.0
    return t.astype(np.float32)


def bench_mono_init() -> dict:
    """Table 5: mono init success over N_TRIALS re-seeded low-texture
    scenes, point+line vs points-only, with recovered landmark counts."""
    from splslam_tpu.io.synthetic import PlaneScene
    from splslam_tpu.slam.system import (
        Sensor, Settings, System, TrackingState)

    K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]],
                 np.float32)

    def trial(seed, using_line):
        scene = PlaneScene(_low_texture_grid(seed), z0=3.0, z1=None,
                           px_per_unit=60.0)
        frames = []
        rng = np.random.default_rng(seed)
        phase = rng.uniform(0, 3.0)
        for i in range(14):
            Twc = np.eye(4)
            Twc[0, 3] = 0.06 * i
            Twc[1, 3] = 0.01 * np.sin(i + phase)
            frames.append(scene.render(K, Twc, H, W))
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=0.0, width=W, height=H,
            n_features=500, n_levels=4, fps=10,
            max_points=8192, max_keyframes=32, local_window=512,
            enable_local_mapping=False,
            using_line=using_line, line_features=64,
        )
        sysm = System(st, Sensor.MONOCULAR)
        for i, img in enumerate(frames):
            sysm.track_mono(img, i * 0.1)
            if sysm.get_tracking_state() == TrackingState.OK:
                n_pts = int(np.asarray(sysm.map.pts.valid).sum())
                n_lns = int(np.asarray(sysm.map.lns.valid).sum())
                return True, n_pts, n_lns
        return False, 0, 0

    rows = {}
    for using_line, tag in ((True, "point_line"), (False, "points_only")):
        ok = pts = lns = 0
        for s in range(N_TRIALS):
            success, n_pts, n_lns = trial(100 + s, using_line)
            ok += success
            pts += n_pts
            lns += n_lns
            print(f"mono-init {tag} seed {100+s}: "
                  f"{'ok' if success else 'FAIL'} pts={n_pts} lns={n_lns}",
                  file=sys.stderr)
        rows[tag] = {
            "success": f"{ok}/{N_TRIALS}",
            "mean_points": round(pts / max(ok, 1), 1),
            "mean_lines": round(lns / max(ok, 1), 1),
        }
    return {
        "metric": "mono_init_success_low_texture",
        "value": int(rows["point_line"]["success"].split("/")[0]),
        "unit": f"successes/{N_TRIALS}",
        "point_line": rows["point_line"],
        "points_only": rows["points_only"],
        "reference": "Table 5 fr1_floor: SPL-SLAM 9/10 (86 pts + 88 "
                     "lines) vs ORB-SLAM 1/10",
    }


def bench_reloc_solvers() -> dict:
    """Table 6: success + per-solve latency of the point (EPnP-analog)
    and line (EPnL-analog) minimal solvers on contaminated matches."""
    import jax
    import jax.numpy as jnp

    from splslam_tpu.geometry.camera import Camera
    from splslam_tpu.optim.pose_gn import (
        LineObs, PointObs, pose_optimize)
    from splslam_tpu.slam.reloc import epnl_ransac, pnp_ransac

    cam = Camera(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2, bf=24.0,
                 width=W, height=H, k1=0., k2=0., p1=0., p2=0., k3=0.)
    rng = np.random.default_rng(0)
    Npt, Nln = 128, 64

    def make_problem(seed):
        r = np.random.default_rng(seed)
        X = r.uniform(-2, 2, (Npt, 3)); X[:, 2] = r.uniform(2, 6, Npt)
        # true pose: modest rotation + translation
        from splslam_tpu.geometry import se3
        xi = r.uniform(-1, 1, 6) * np.array([.3, .3, .3, .1, .1, .1])
        T = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
        pc = X @ T[:3, :3].T + T[:3, 3]
        uv = np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                       cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1)
        uv += r.normal(0, 0.5, uv.shape)           # pixel noise
        out = r.random(Npt) < 0.3                  # 30% contamination
        uv[out] += r.uniform(-60, 60, (out.sum(), 2))
        # lines: 3D segments + their observed 2D coefficients
        S = r.uniform(-2, 2, (Nln, 3)); S[:, 2] = r.uniform(2, 6, Nln)
        D = r.normal(0, 1, (Nln, 3)); D /= np.linalg.norm(D, axis=1)[:, None]
        E = S + 0.8 * D
        X3 = np.stack([S, 0.5 * (S + E), E], 1)
        pcs = S @ T[:3, :3].T + T[:3, 3]
        pce = E @ T[:3, :3].T + T[:3, 3]
        uvs = np.stack([cam.fx * pcs[:, 0] / pcs[:, 2] + cam.cx,
                        cam.fy * pcs[:, 1] / pcs[:, 2] + cam.cy], -1)
        uve = np.stack([cam.fx * pce[:, 0] / pce[:, 2] + cam.cx,
                        cam.fy * pce[:, 1] / pce[:, 2] + cam.cy], -1)
        uvs += r.normal(0, 0.5, uvs.shape)
        uve += r.normal(0, 0.5, uve.shape)
        outl = r.random(Nln) < 0.3
        uvs[outl] += r.uniform(-60, 60, (outl.sum(), 2))
        l = np.cross(np.concatenate([uvs, np.ones((Nln, 1))], 1),
                     np.concatenate([uve, np.ones((Nln, 1))], 1))
        l /= (np.linalg.norm(l[:, :2], axis=1)[:, None] + 1e-12)
        return T, X, uv, X3, l

    probs = [make_problem(s) for s in range(N_TRIALS)]

    def err_of(T_est, T_true):
        dR = np.asarray(T_est)[:3, :3] @ T_true[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        dt = np.linalg.norm(np.asarray(T_est)[:3, 3]
                            - dR @ T_true[:3, 3])
        return ang, dt

    results = {}
    for tag in ("epnp_points", "epnl_lines"):
        succ = 0
        outs = []
        for i, (T, X, uv, X3, l) in enumerate(probs):
            key = jax.random.PRNGKey(i)
            # Minimal RANSAC + GN refinement on the robust residuals —
            # the pipeline the real reloc_attempt runs (and the
            # reference refines its EPnP/EPnL seed too,
            # src/Tracking.cc:3130-3160 PoseOptimization after the
            # solver); the raw 6-sample DLT alone is not the claim.
            if tag == "epnp_points":
                Te, n, _ = pnp_ransac(
                    key, cam, jnp.asarray(uv, jnp.float32),
                    jnp.asarray(X, jnp.float32), jnp.ones((Npt,)),
                    jnp.ones((Npt,), bool))
                obs = PointObs(jnp.asarray(X, jnp.float32),
                               jnp.asarray(uv, jnp.float32),
                               jnp.ones((Npt,)), jnp.ones((Npt,), bool))
                Te = pose_optimize(Te, cam, obs, LineObs.empty(1)).Tcw
            else:
                Te, n, _ = epnl_ransac(
                    key, cam, jnp.asarray(l, jnp.float32),
                    jnp.asarray(X3, jnp.float32), jnp.ones((Nln,), bool))
                lobs = LineObs(jnp.asarray(X3[:, 1], jnp.float32),
                               jnp.asarray(l, jnp.float32),
                               jnp.full((Nln,), 0.25),
                               jnp.ones((Nln,), bool))
                Te = pose_optimize(Te, cam, PointObs.empty(1), lobs).Tcw
            ang, dt = err_of(Te, T)
            ok = ang < 2.0 and dt < 0.05
            succ += ok
            outs.append((ang, dt))
            print(f"{tag} trial {i}: rot {ang:.2f}deg t {dt:.3f} "
                  f"inl {int(n)} {'ok' if ok else 'FAIL'}", file=sys.stderr)
        # latency: whole-region wall over R chained solves (key varies to
        # defeat CSE), divided by R.
        R = 100
        T, X, uv, X3, l = probs[0]
        if tag == "epnp_points":
            f = lambda k: pnp_ransac(
                k, cam, jnp.asarray(uv, jnp.float32),
                jnp.asarray(X, jnp.float32), jnp.ones((Npt,)),
                jnp.ones((Npt,), bool))[0]
        else:
            f = lambda k: epnl_ransac(
                k, cam, jnp.asarray(l, jnp.float32),
                jnp.asarray(X3, jnp.float32), jnp.ones((Nln,), bool))[0]
        f(jax.random.PRNGKey(0)).block_until_ready()
        t0 = time.perf_counter()
        acc = None
        for i in range(R):
            acc = f(jax.random.PRNGKey(i))
        np.asarray(acc)  # drain (block_until_ready is unreliable on axon)
        ms = (time.perf_counter() - t0) * 1000.0 / R
        results[tag] = {"success": f"{succ}/{N_TRIALS}",
                        "ms_per_solve": round(ms, 3)}
    return {
        "metric": "reloc_solver_success_and_latency",
        "value": int(results["epnl_lines"]["success"].split("/")[0]),
        "unit": f"line-solver successes/{N_TRIALS}",
        "epnp_points": results["epnp_points"],
        "epnl_lines": results["epnl_lines"],
        "reference": "Table 6: EPnL 10/10 @ 0.20 ms vs EPnP 10/10 @ "
                     "0.52 ms (V2_03); protocol differs (vmapped RANSAC "
                     "batch vs single CPU solve) — compare success, "
                     "read latency as the amortized batched solve",
    }


def main():
    from splslam_tpu.io.bench_record import record_headline

    row1 = bench_mono_init()
    print(json.dumps(row1))
    record_headline(row1, "bench_components.py")
    row2 = bench_reloc_solvers()
    print(json.dumps(row2))
    record_headline(row2, "bench_components.py")


if __name__ == "__main__":
    main()
