"""Mapping benchmark: Local BA ms/keyframe + per-stage rows (SURVEY §6.2).

The reference reports per-stage averages with these row names (its
测试报告 tables 2-4; BASELINE.md): Feature extraction / Initial pose
tracking / Track local map / Tracking total / KeyFrame insertion / Map
feature culling / Map features creation / Local BA per keyframe /
KeyFrame culling / Mapping total per keyframe. This harness measures the
mapping-side rows on a realistic map (built by tracking a KITTI-sized
synthetic sequence) by dispatching each fused stage as its own program.

Prints ONE JSON line for the headline metric (Local BA ms/KF vs the
reference's 117.22 ms on KITTI) plus a stderr table with the §6 names.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/splslam_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_LOCAL_BA_MS = 117.22  # reference KITTI Local BA / keyframe
KITTI_W, KITTI_H = 1241, 376


def main() -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from splslam_tpu.io.synthetic import make_stereo_sequence
    from splslam_tpu.slam.system import Sensor, Settings, System
    from splslam_tpu.slam import mapping_ops as MO
    from splslam_tpu.optim.ba import ba_solve

    n_frames = 48
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=n_frames, width=KITTI_W, height=KITTI_H,
        fx=718.0, baseline=0.54, motion="forward", seed=3,
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=KITTI_W, height=KITTI_H,
        # fps=4 makes the c1a condition (frames_since_kf >= fps) insert a
        # keyframe every ~4 frames, so the measured map has a populated
        # covisibility 1-ring (the real KITTI cadence) instead of the
        # 1-2 keyframes that easy synthetic tracking would produce.
        n_features=2000, n_levels=8, th_depth=35.0, fps=4.0,
        max_points=65536, max_keyframes=256, local_window=2048,
        enable_local_mapping=True, min_kf_gap=4,
    )
    sysm = System(st, Sensor.STEREO)
    # Easy synthetic tracking keeps n_in ~= ref_matches, so the faithful
    # NeedNewKeyFrame policy (correctly) inserts almost nothing; the
    # benchmark needs a populated covisibility 1-ring, so force the
    # KITTI keyframe cadence (~every 4 frames) for the build phase only.
    sysm._need_new_keyframe = (
        lambda stats, n_in: sysm.frames_since_kf >= 4 and sysm.n_kfs < 12
    )
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
    sysm.drain()
    mst = sysm.map
    cam = sysm.cam
    scales = sysm.scales
    kf = jnp.int32(int(mst.n_kfs) - 1)
    print(f"map: {int(mst.n_kfs)} keyframes, "
          f"{int(np.asarray(mst.pts.valid).sum())} points", file=sys.stderr)

    def timeit(name, fn, n=10):
        r = fn()
        jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x,
            jax.tree.leaves(r)[:1],
        )
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
            np.asarray(jax.tree.leaves(r)[0])
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"{name:32s} {ms:8.2f} ms", file=sys.stderr)
        return ms

    # --- stage programs (each jitted standalone; the production path
    # fuses them into mapping_step — these isolate the §6 rows) ---
    @jax.jit
    def stage_cull(m, k):
        return MO.cull_points(m, k).pts.valid

    @partial(jax.jit, static_argnames=())
    def stage_create(m, k):
        nb, _ = MO._topk_covisible(m, k, MO.N_NEIGH)
        return MO.create_new_points(m, cam, scales, k, nb, 1.2, 8).n_pts

    @jax.jit
    def stage_fuse(m, k):
        nb, _ = MO._topk_covisible(m, k, MO.N_NEIGH)
        return MO.fuse_neighbors(m, cam, scales, k, nb, 1.2, 8).pts.n_obs

    @jax.jit
    def stage_ba(m, k):
        cams, lm_ids = MO.build_ba_window(m, k)
        prob = MO.make_ba_problem(m, cams, lm_ids)
        res = ba_solve(cam, prob, rounds=2, iters=5, n_free=MO.N_WINDOW)
        return res.total_chi2

    @jax.jit
    def stage_kfcull(m, k):
        return MO.cull_keyframes(m, k).kfs.valid

    rows = {}
    rows["Map feature culling"] = timeit(
        "Map feature culling", lambda: stage_cull(mst, kf))
    rows["Map features creation"] = timeit(
        "Map features creation", lambda: stage_create(mst, kf))
    rows["(fuse: part of creation)"] = timeit(
        "SearchInNeighbors fuse", lambda: stage_fuse(mst, kf))
    rows["Local BA / keyframe"] = timeit(
        "Local BA / keyframe", lambda: stage_ba(mst, kf))
    rows["KeyFrame culling"] = timeit(
        "KeyFrame culling", lambda: stage_kfcull(mst, kf))

    # Mapping total / KF insertion: the production fused programs. Both
    # DONATE their map argument, so the timed calls consume PRE-STAGED
    # whole-map copies (copying the ~100 MB map inside the loop would
    # bill dozens of copy dispatches to the row).
    n_rep = 5
    pool = [jax.tree.map(jnp.copy, mst) for _ in range(n_rep + 1)]
    jax.block_until_ready(pool)

    def full():
        m2, stats = MO.mapping_step(pool.pop(), kf, cam, scales)
        return stats
    rows["Mapping total / keyframe"] = timeit(
        "Mapping total / keyframe", full, n=n_rep)
    # KeyFrame insertion: the tracker-side fused program.
    from splslam_tpu.slam import pipeline as P

    pool2 = [jax.tree.map(jnp.copy, mst) for _ in range(n_rep + 1)]
    jax.block_until_ready(pool2)

    def kf_insert():
        m2, s2, out = P.add_keyframe_step(
            pool2.pop(), sysm.step,
            jnp.int32(999), jnp.float32(99.9),
            jnp.float32(35.0 * float(bf) / float(K[0, 0])), cam, sysm.spec,
        )
        return out
    rows["KeyFrame insertion"] = timeit(
        "KeyFrame insertion", kf_insert, n=n_rep)

    ms = rows["Local BA / keyframe"]
    print(json.dumps({
        "metric": "kitti_local_ba_ms_per_keyframe",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_LOCAL_BA_MS / ms, 2),
    }))


if __name__ == "__main__":
    main()
