"""Diagnose the red dynamic-object robustness test (round-5 VERDICT #1).

Runs the exact test scenario and dumps per-frame: pose-translation error
vs ground truth, inlier counts, and how many final point inliers sit
inside the moving patch rect (features there violate the rigid-world
assumption and should be rejected by the chi2 gates).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from splslam_tpu.io.cache import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SPLSLAM_TEST_CACHE",
                                 host_cache_dir("/tmp/splslam_test_xla_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402

from splslam_tpu.io.synthetic import (  # noqa: E402
    ate_rmse, make_stereo_sequence, path_length)
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState

W, H = 320, 240


def patch_rect(i, n):
    x = int((0.15 + 0.6 * ((1.7 * i / n) % 1.0)) * (W - 72))
    y = int((0.2 + 0.5 * ((1.1 * i / n) % 1.0)) * (H - 56))
    return x, y


def paste(frames, seed=7):
    rng = np.random.default_rng(seed)
    patch = rng.uniform(40, 215, size=(56, 72)).astype(np.float32)
    out = []
    n = len(frames)
    for i, (l, r) in enumerate(frames):
        l = np.asarray(l).copy()
        r = np.asarray(r).copy()
        x, y = patch_rect(i, n)
        for img in (l, r):
            img[y:y + 56, x:x + 72] = patch
        out.append((l, r))
    return out


def main():
    import sys as _sys
    clean = "--clean" in _sys.argv
    th_depth = 60.0 if "--deep" in _sys.argv else 40.0
    scene = "corridor" if "--corridor" in _sys.argv else "planes"
    motion = "forward" if "--corridor" in _sys.argv else "lateral"
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=60, motion=motion, width=W, height=H, seed=11,
        scene=scene, speed=0.5 if scene == "corridor" else 1.0)
    if not clean:
        frames = paste(frames)
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=W, height=H,
        n_features=600, n_levels=4, th_depth=th_depth, fps=10,
        max_points=16384, max_keyframes=64, local_window=1024,
        enable_local_mapping=True,
    )
    sysm = System(st, Sensor.STEREO)
    n = len(frames)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
        # pull the current frame state: association + inliers (may lag
        # one frame under async_depth; compare vs gt[i] and gt[i-1])
        stt = sysm.step
        if stt is None:
            continue
        xy = np.asarray(stt.frame.feat.xy)
        gid = np.asarray(stt.lm_gid)
        depth = np.asarray(stt.frame.depth)
        x, y = patch_rect(i, n)
        in_patch = ((xy[:, 0] >= x) & (xy[:, 0] < x + 72)
                    & (xy[:, 1] >= y) & (xy[:, 1] < y + 56))
        inl = gid >= 0
        n_patch_inl = int(np.sum(in_patch & inl))
        n_patch_depth = int(np.sum(in_patch & (depth > 0)))
        n_patch_feat = int(np.sum(
            in_patch & np.asarray(stt.frame.feat.valid)))
        # pose error vs gt
        Tcw = np.asarray(stt.Tcw)
        C = -Tcw[:3, :3].T @ Tcw[:3, 3]
        errs = [C - gt[j, :3, 3] for j in (i, max(i - 1, 0))]
        ev = min(errs, key=np.linalg.norm)
        err = np.linalg.norm(ev)
        from splslam_tpu.slam import pipeline as PL
        st_last = (np.asarray(sysm._pending[-1][0])
                   if sysm._pending else None)
        ref_m = int(st_last[PL.S_REF_MATCHES]) if st_last is not None else -1
        n_ct = int(st_last[PL.S_CLOSE_TRACKED]) if st_last is not None else -1
        n_cu = int(st_last[PL.S_CLOSE_UNTRACKED]) if st_last is not None else -1
        print(f"f{i:03d} err {err:.4f} "
              f"[{ev[0]:+.3f} {ev[1]:+.3f} {ev[2]:+.3f}] "
              f"patch_inl {n_patch_inl:3d} "
              f"inl {int(np.sum(inl)):3d} kfs {sysm.n_kfs} "
              f"ref_m {ref_m:3d} close {n_ct:3d}/{n_cu:3d} "
              f"since {sysm.frames_since_kf}")
    sysm.drain()
    print("state:", sysm.get_tracking_state(), "KFs:", sysm.n_kfs)
    path = path_length(gt)
    ate = ate_rmse(sysm.poses(), gt)
    print(f"path {path:.3f} ATE {ate:.4f} ({100 * ate / path:.2f}%)")


if __name__ == "__main__":
    main()
