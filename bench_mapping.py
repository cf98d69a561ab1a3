"""Per-stage benchmark: ALL ten §6 rows (SURVEY §6.2) + Local BA headline.

The reference reports per-stage averages with these row names (its
测试报告 tables 2-4; BASELINE.md): Feature extraction / Initial pose
tracking / Track local map / Tracking total / KeyFrame insertion / Map
feature culling / Map features creation / Local BA per keyframe /
KeyFrame culling / Mapping total per keyframe.

The map is constructed DIRECTLY with reference-like densities
(splslam_tpu/io/synth_map.py: 12 KFs, 2000 features/KF, forward-motion
covisibility band) instead of being built by tracking a sequence — every
stage program is fixed-shape, so stage timing depends on table sizes and
observation density, not provenance, and the bench reaches its first
timed row in seconds instead of minutes.

Prints ONE JSON line for the headline metric (Local BA ms/KF vs the
reference's 117.22 ms on KITTI) plus a stderr table with the §6 names.

Each row reports two protocols (see `timeit`): `amortized` — N dispatches
drained once, per-call device+dispatch cost, the apples-to-apples column
against the reference's pure-compute CPU numbers and the protocol of the
JSON headline — and `1-shot wall`, which additionally pays this
deployment's ~25-30 ms tunnel RPC round-trip per call.
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

BASELINE_LOCAL_BA_MS = 117.22  # reference KITTI Local BA / keyframe
KITTI_W, KITTI_H = 1241, 376
N_FEAT = 2000


def main() -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from splslam_tpu.geometry.camera import Camera
    from splslam_tpu.io.synth_map import make_synthetic_map
    from splslam_tpu.slam import mapping_ops as MO
    from splslam_tpu.optim.ba import ba_solve

    fx, baseline = 718.0, 0.54
    t_build0 = time.perf_counter()
    mst, frame, step, Tcw_next = make_synthetic_map(
        n_kfs=12, n_feat=N_FEAT, width=KITTI_W, height=KITTI_H,
        fx=fx, baseline=baseline,
    )
    cam = Camera.create(fx, fx, KITTI_W / 2.0, KITTI_H / 2.0,
                        bf=fx * baseline, width=KITTI_W, height=KITTI_H)
    scales = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    mst = jax.device_put(mst)
    frame = jax.device_put(frame)
    step = jax.device_put(step)
    jax.block_until_ready(mst.pts.xyz)
    kf = jnp.int32(int(mst.n_kfs) - 1)
    print(f"synthetic map: {int(mst.n_kfs)} keyframes, "
          f"{int(np.asarray(mst.pts.valid).sum())} points "
          f"(built in {time.perf_counter()-t_build0:.1f}s)", file=sys.stderr)

    # Dispatch+fetch RPC floor of the attachment (a tunnel-attached chip
    # pays ~25-30 ms per blocking cycle; PCIe-attached would pay ~0).
    # Every row below contains one such cycle — the floor-corrected
    # column is the device-side cost a production deployment sees.
    @jax.jit
    def _tiny(x):
        return x + 1

    _tiny(jnp.float32(0)).block_until_ready()
    t0 = time.perf_counter()
    n_floor = 20
    for i in range(n_floor):
        np.asarray(_tiny(jnp.float32(i)))
    rpc_floor = (time.perf_counter() - t0) / n_floor * 1000
    print(f"{'(dispatch+fetch RPC floor)':32s} {rpc_floor:8.2f} ms",
          file=sys.stderr)

    def timeit(name, fn, n=10, n_wall=3):
        """Two timing protocols per row:

        - `1-shot wall`: dispatch + blocking fetch per call — includes one
          full tunnel round-trip (~25-30 ms RPC floor, see above) per
          call, i.e. the latency THIS deployment sees.
        - `amortized`: dispatch `n` calls back-to-back, drain once —
          device execution is in-order, so (total wall)/n is the
          per-call device+dispatch cost with the round-trip amortized
          away. This is the apples-to-apples column against the
          reference's pure-compute CPU times (a PCIe-attached chip pays
          ~0 RPC), and the same steady-state protocol bench.py uses for
          the tracking headline.
        """
        r = fn()
        jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x,
            jax.tree.leaves(r)[:1],
        )
        t0 = time.perf_counter()
        for _ in range(n_wall):
            r = fn()
            np.asarray(jax.tree.leaves(r)[0])
        wall = (time.perf_counter() - t0) / n_wall * 1000
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = fn()
        np.asarray(jax.tree.leaves(last)[0])
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"{name:32s} {ms:8.2f} ms amortized   "
              f"({wall:7.2f} ms 1-shot wall incl. RPC)",
              file=sys.stderr)
        return ms

    rows = {}

    # ================= tracking-side §6 rows =================
    # Feature extraction: the real extractor on a real KITTI-sized pair
    # (reference row 1, src/Tracking.cc:381-413 around the Frame ctor).
    from splslam_tpu.io.synthetic import PlaneScene, make_texture
    from splslam_tpu.ops.pyramid import PyramidSpec
    from splslam_tpu.slam import pipeline as P

    scene = PlaneScene(make_texture(seed=1), z0=8.0, z1=25.0)
    K3 = np.array([[fx, 0, KITTI_W / 2], [0, fx, KITTI_H / 2], [0, 0, 1]],
                  np.float32)
    Twc = np.eye(4)
    imgL = scene.render(K3, Twc, KITTI_H, KITTI_W)
    Twc_r = Twc.copy()
    Twc_r[0, 3] += baseline
    imgR = scene.render(K3, Twc_r, KITTI_H, KITTI_W)
    pair = jax.device_put(
        np.stack([imgL, imgR]).astype(np.uint8)[None]  # [1,2,H,W]
    )
    spec = PyramidSpec.create(KITTI_H, KITTI_W, n_levels=8,
                              scale_factor=1.2, n_features=N_FEAT)
    rows["Feature extraction"] = timeit(
        "Feature extraction",
        lambda: P.build_frames_batch(pair, cam, spec, line_capacity=1),
    )

    # Initial pose tracking: motion-model projection match + pose GN
    # (reference row 2: SearchByProjection + PoseOptimization).
    from splslam_tpu.slam import tracking as T
    from splslam_tpu.optim.pose_gn import LineObs, PointObs, pose_optimize

    @jax.jit
    def stage_init_pose(fr, stp):
        T_pred = stp.velocity @ stp.Tcw
        mm, _ = T.motion_model_match(
            cam, scales, T_pred, fr, stp.frame.feat.xy,
            stp.frame.feat.octave, stp.frame.feat.angle,
            stp.frame.feat.bits, stp.lm_xyz, stp.lm_gid != -1, 7.0,
        )
        N = fr.feat.capacity
        rows_ok = mm >= 0
        cols = jnp.where(rows_ok, mm, N)
        gid = jnp.full((N,), -1, jnp.int32).at[cols].set(
            jnp.where(rows_ok, stp.lm_gid, -1), mode="drop")
        axyz = jnp.zeros((N, 3)).at[cols].set(stp.lm_xyz, mode="drop")
        obs = PointObs(xyz_w=axyz, uv=fr.feat.xy,
                       inv_sigma2=1.0 / fr.feat.sigma2, mask=gid != -1)
        res = pose_optimize(T_pred, cam, obs, LineObs.empty(1))
        return res.Tcw, gid

    rows["Initial pose tracking"] = timeit(
        "Initial pose tracking", lambda: stage_init_pose(frame, step))

    # Track local map: covisible-window frustum match + pose GN
    # (reference row 3: UpdateLocalMap/SearchLocalPoints/PoseOptimization).
    @jax.jit
    def stage_track_local(m, fr, stp):
        win = P.assemble_local_window(m, stp.lm_gid, 2048)
        mt, vis, _ = T.local_map_match(
            cam, scales, stp.Tcw, fr, win, stp.lm_gid != -1, 1.2, 8,
        )
        N = fr.feat.capacity
        ok = mt >= 0
        cols = jnp.where(ok, mt, N)
        gid = stp.lm_gid.at[cols].set(
            jnp.where(ok, win.ids, -1), mode="drop")
        axyz = stp.lm_xyz.at[cols].set(win.xyz, mode="drop")
        obs = PointObs(xyz_w=axyz, uv=fr.feat.xy,
                       inv_sigma2=1.0 / fr.feat.sigma2, mask=gid != -1)
        res = pose_optimize(stp.Tcw, cam, obs, LineObs.empty(1))
        return res.Tcw, gid

    rows["Track local map"] = timeit(
        "Track local map", lambda: stage_track_local(mst, frame, step))

    rows["Tracking total (sum of rows)"] = (
        rows["Feature extraction"] + rows["Initial pose tracking"]
        + rows["Track local map"]
    )
    print(f"{'Tracking total (sum of rows)':32s} "
          f"{rows['Tracking total (sum of rows)']:8.2f} ms "
          f"(bench.py measures the amortized batched number)",
          file=sys.stderr)

    # ================= mapping-side §6 rows =================
    # Keyframe-axis bucket, as production LocalMapper dispatches it
    # (slam/local_mapping.py): the 12-KF map's K-sized stages run on
    # 32-row keyframe tables, not the 256-row capacity (NOTES round-4:
    # the KF-cull observer histogram alone was 10.9 ms at capacity).
    KB = min(mst.kfs.Tcw.shape[0],
             max(32, 1 << (max(int(mst.n_kfs), 1) - 1).bit_length()))
    mstb = mst._replace(kfs=jax.tree.map(lambda x: x[:KB], mst.kfs))
    jax.block_until_ready(mstb.kfs.Tcw)

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
        return MO.cull_keyframes(m, k)[0].kfs.valid

    # KeyFrame culling, CHAINED on device (round-4 VERDICT #7): the
    # 1-dispatch amortized row still pays ~2-3 ms of per-dispatch host
    # cost for the large MapState argument pytree; production runs the
    # cull INSIDE the fused mapping_step (one dispatch per keyframe for
    # the whole chain), so the honest per-cull device cost is a scan of
    # R culls in ONE dispatch divided by R — the same chained protocol
    # the Local BA headline uses for its device-side number.
    KFCULL_REPS = 8

    @jax.jit
    def stage_kfcull_chain(m, k):
        def body(mm, _):
            m2, _ = MO.cull_keyframes(mm, k)
            return m2, m2.kfs.valid[0]
        _, vs = jax.lax.scan(body, m, None, length=KFCULL_REPS)
        return vs

    rows["Map feature culling"] = timeit(
        "Map feature culling", lambda: stage_cull(mstb, kf))
    rows["Map features creation"] = timeit(
        "Map features creation", lambda: stage_create(mstb, kf))
    rows["(fuse: part of creation)"] = timeit(
        "SearchInNeighbors fuse", lambda: stage_fuse(mstb, kf))
    rows["Local BA / keyframe"] = timeit(
        "Local BA / keyframe", lambda: stage_ba(mstb, kf))
    rows["KeyFrame culling (1-dispatch)"] = timeit(
        "KeyFrame culling (1-dispatch)", lambda: stage_kfcull(mstb, kf))
    # chained: one dispatch, R on-device culls; report wall/R.
    np.asarray(stage_kfcull_chain(mstb, kf))  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        out = stage_kfcull_chain(mstb, kf)
    np.asarray(out)
    rows["KeyFrame culling"] = (
        (time.perf_counter() - t0) / 3 / KFCULL_REPS * 1000)
    print(f"{'KeyFrame culling (chained x8)':32s} "
          f"{rows['KeyFrame culling']:8.2f} ms amortized", file=sys.stderr)

    # Mapping total / KF insertion: the production fused programs. Both
    # DONATE their map argument, so the timed calls consume PRE-STAGED
    # whole-map copies (copying the ~100 MB map inside the loop would
    # bill dozens of copy dispatches to the row).
    n_rep, n_wall = 5, 2
    pool = [jax.tree.map(jnp.copy, mst) for _ in range(n_rep + n_wall + 1)]
    jax.block_until_ready(pool)

    def full():
        m2, stats = MO.mapping_step(pool.pop(), kf, cam, scales,
                                    k_bucket=KB)
        return stats
    rows["Mapping total / keyframe"] = timeit(
        "Mapping total / keyframe", full, n=n_rep, n_wall=n_wall)

    pool2 = [jax.tree.map(jnp.copy, mst) for _ in range(n_rep + n_wall + 1)]
    jax.block_until_ready(pool2)

    def kf_insert():
        m2, s2, out = P.add_keyframe_step(
            pool2.pop(), step,
            jnp.int32(999), jnp.float32(99.9),
            jnp.float32(35.0 * baseline), cam, spec,
        )
        return out
    rows["KeyFrame insertion"] = timeit(
        "KeyFrame insertion", kf_insert, n=n_rep, n_wall=n_wall)

    # ============== combined tracking + mapping overlap ==============
    # The reference's tracking and mapping rows run on CONCURRENT threads;
    # here mapping is an async device dispatch. Measure a realistic
    # cadence: dispatch mapping_step, then immediately run 8 tracking
    # frames, fetch both — wall/frame shows the overlap (reference: the
    # two columns of §6 simply coexist).
    pool3 = [jax.tree.map(jnp.copy, mst) for _ in range(4)]
    jax.block_until_ready(pool3)

    def overlapped():
        m2, stats = MO.mapping_step(pool3.pop(), kf, cam, scales)
        outs = []
        for _ in range(8):
            _, gid = stage_init_pose(frame, step)
            outs.append(gid)
        np.asarray(stats)  # mapping result
        np.asarray(outs[-1])
        return stats

    t0 = time.perf_counter()
    n3 = 3
    for _ in range(n3):
        overlapped()
    per_frame = (time.perf_counter() - t0) / n3 / 8 * 1000
    print(f"{'Tracking+mapping overlapped':32s} {per_frame:8.2f} "
          f"ms/frame (mapping async behind 8 frames)", file=sys.stderr)

    ms = rows["Local BA / keyframe"]
    print("headline protocol: amortized per-solve time over a chain of "
          "dispatches drained once (tunnel round-trip excluded — the "
          "reference's CPU number has no RPC in it either); the 1-shot "
          "wall incl. the ~25-30 ms tunnel RPC floor is printed per row "
          "above.", file=sys.stderr)
    row = {
        "metric": "kitti_local_ba_ms_per_keyframe",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_LOCAL_BA_MS / ms, 2),
    }
    print(json.dumps(row))
    from splslam_tpu.io.bench_record import record_headline

    record_headline(
        {**row, "mapping_total_ms": round(rows["Mapping total / keyframe"], 2)},
        "bench_mapping.py",
    )


if __name__ == "__main__":
    main()
