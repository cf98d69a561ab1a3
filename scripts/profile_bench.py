"""Per-dispatch profile of the headline bench's two device programs on
the real chip: batched frame build vs batched tracking, plus the frame
build's internal stages (pyramid+FAST+topk detection, ORB patch stage,
stereo match) timed as separate jits at bench shapes (KITTI 1241x376,
2000 features, 8 levels, B=16).

Run on the tunnel TPU:  nohup python scripts/profile_bench.py > /tmp/prof.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from splslam_tpu.io.cache import host_cache_dir as _hcd
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      _hcd("/tmp/splslam_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.slam.system import Sensor, Settings, System
from splslam_tpu.slam import pipeline

KITTI_W, KITTI_H = 1241, 376
B = 16


def t(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=B + 2, width=KITTI_W, height=KITTI_H,
        fx=718.0, baseline=0.54, motion="forward", seed=3,
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=KITTI_W, height=KITTI_H,
        n_features=2000, n_levels=8, th_depth=35.0, fps=10.0,
        max_points=65536, max_keyframes=256, local_window=2048,
        enable_local_mapping=False, min_kf_gap=32,
    )
    sysm = System(st, Sensor.STEREO)
    sysm.track_stereo(frames[0][0], frames[0][1], 0.0)
    imgs = sysm.upload_batch(frames[1:B + 1])
    jax.block_until_ready(imgs)

    cam, spec, scales = sysm.cam, sysm.spec, sysm.scales

    dt, built = t(pipeline.build_frames_batch, imgs, cam, spec,
                  line_capacity=sysm.line_cap)
    print(f"build_frames_batch: {dt*1000:.1f} ms total, "
          f"{dt*1000/B:.2f} ms/frame", flush=True)

    map0 = sysm.map
    dt2, _ = t(
        lambda: pipeline.track_frames_batch(
            jax.tree.map(lambda x: x, built),
            jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, map0),
            sysm.step, sysm._th_depth_dev, jnp.int32(sysm.ref_kf),
            cam, scales, st.local_window, st.scale_factor, st.n_levels,
            jnp.bool_(False),
        ),
    )
    print(f"track_frames_batch: {dt2*1000:.1f} ms total, "
          f"{dt2*1000/B:.2f} ms/frame", flush=True)

    # --- frame-build internals at the same shapes ---
    from splslam_tpu.ops.orb import extract_orb
    from splslam_tpu.ops.stereo import stereo_match

    img_l = imgs[:, 0].astype(jnp.float32)
    img_r = imgs[:, 1].astype(jnp.float32)

    @jax.jit
    def orb_scan(ims):
        def one(_, im):
            return None, extract_orb(im, spec)
        return jax.lax.scan(one, None, ims)[1]

    dt3, feats_l = t(orb_scan, img_l)
    print(f"extract_orb x{B} (left): {dt3*1000:.1f} ms, "
          f"{dt3*1000/B:.2f} ms/img", flush=True)

    _, feats_r = t(orb_scan, img_r)

    @jax.jit
    def stereo_scan(fl, fr, il, ir):
        def one(_, x):
            fl1, fr1, l1, r1 = x
            return None, stereo_match(fl1, fr1, l1, r1, scales,
                                      cam.bf, cam.fx)
        return jax.lax.scan(one, None, (fl, fr, il, ir))[1]

    dt4, _ = t(stereo_scan, feats_l, feats_r, img_l, img_r)
    print(f"stereo_match x{B}: {dt4*1000:.1f} ms, "
          f"{dt4*1000/B:.2f} ms/img", flush=True)

    # detection-only vs full extraction split, if the ops expose stages
    try:
        from splslam_tpu.ops.orb import detect_keypoints

        @jax.jit
        def det_scan(ims):
            def one(_, im):
                return None, detect_keypoints(im, spec)
            return jax.lax.scan(one, None, ims)[1]

        dt5, _ = t(det_scan, img_l)
        print(f"detect_keypoints x{B}: {dt5*1000:.1f} ms, "
              f"{dt5*1000/B:.2f} ms/img", flush=True)
    except ImportError:
        print("no detect_keypoints stage export", flush=True)


if __name__ == "__main__":
    main()
