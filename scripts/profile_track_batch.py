"""Time track_frames_batch per frame at mono-headline shapes on-chip.

Chained protocol: the donated MapState returned by each call feeds the
next (the real pipeline's usage), 12 batches of B=8 frames, one drain.
Rows: with-lines (Lc=128) vs points-only (Lc=1) — the tracking-side
split of bench_mono's 14.3 ms headline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from splslam_tpu.io.cache import host_cache_dir as _hcd

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      _hcd("/tmp/splslam_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.io.synth_map import make_synthetic_map
from splslam_tpu.slam.pipeline import track_frames_batch

W, H, NF = 640, 480, 1000
B, NB = 8, 12


def run(l_cap: int) -> float:
    mst, frame, step, _ = make_synthetic_map(
        n_kfs=12, n_feat=NF, p_cap=16384, k_cap=128, q_cap=4096,
        l_cap=l_cap, width=W, height=H, fx=520.0, baseline=0.1,
    )
    cam = Camera.create(520.0, 520.0, W / 2, H / 2, bf=0.0,
                        width=W, height=H)
    scales = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
    mst = jax.device_put(mst)
    frame = jax.device_put(frame)
    step = jax.device_put(step)
    jax.block_until_ready(mst.pts.xyz)
    # batch of B identical frames (content is irrelevant to cost)
    frames_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), frame)
    frames_b = jax.device_put(jax.tree.map(np.asarray, frames_b))
    jax.block_until_ready(jax.tree.leaves(frames_b)[0])
    th = jnp.float32(3.0)
    kf = jnp.int32(11)

    def one(m, s):
        return track_frames_batch(m, frames_b_dev, s, th, kf, cam, scales)

    # warm/compile once on a copy
    frames_b_dev = frames_b
    m, s, _ = track_frames_batch(frames_b_dev, mst, step, th, kf, cam,
                                 scales)
    np.asarray(s.Tcw)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(NB):
            m, s, _ = track_frames_batch(frames_b_dev, m, s, th, kf, cam,
                                         scales)
        np.asarray(s.Tcw)
        ms = (time.perf_counter() - t0) * 1000.0 / (NB * B)
        best = ms if best is None else min(best, ms)
    return best


def main() -> None:
    for lc in (128, 1):
        ms = run(lc)
        print(f"track_frames_batch Lc={lc:<4d} {ms:7.2f} ms/frame")


if __name__ == "__main__":
    main()
