"""Measure the per-batch deferred-stats fetch cost inside the real
bench_mono loop: monkeypatch the np.asarray(stats_dev) site with a
timed wrapper, run the timed pass, report total fetch wall vs region.
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

import numpy as np
import jax

from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.slam.system import Sensor, Settings, System
from splslam_tpu.slam import system as sysmod

W, H = 640, 480
n_frames = 120
K, bf, frames, gt = make_stereo_sequence(
    n_frames=n_frames, width=W, height=H, fx=520.0,
    motion="oscillate", seed=4, osc_amp=0.5, texture="grid",
)

fetch_wall = [0.0, 0]
_orig = np.asarray


def run_pass(timed: bool):
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=0.0, width=W, height=H,
        n_features=1000, n_levels=8, fps=30.0,
        max_points=16384, max_keyframes=128, local_window=2048,
        using_line=True, line_features=128,
        batch_defer_stats=True,
        enable_local_mapping=False, min_kf_gap=20,
    )
    sysm = System(st, Sensor.MONOCULAR)

    orig_consume = sysm._consume_batch_stats

    def consume(stats_dev, *a, **k):
        t0 = time.perf_counter()
        _ = np.asarray(stats_dev)
        dt = time.perf_counter() - t0
        fetch_wall[0] += dt
        fetch_wall[1] += 1
        return orig_consume(stats_dev, *a, **k)

    sysm._consume_batch_stats = consume
    B = 8
    i = 0
    while sysm.get_tracking_state().name != "OK" and i < len(frames):
        sysm.track_mono(frames[i][0], i / 30.0)
        i += 1
    starts = list(range(i, n_frames, B))
    staged = {
        s: jax.device_put(np.stack(
            [np.asarray(l) for (l, r) in frames[s:s + B]]).astype(np.uint8))
        for s in starts
    }
    sysm.drain()
    fetch_wall[0] = 0.0
    fetch_wall[1] = 0
    n_timed = 0
    t0 = time.perf_counter()
    for s in starts:
        ts = [j / 30.0 for j in range(s, s + staged[s].shape[0])]
        sysm.track_mono_batch(staged[s], ts)
        n_timed += staged[s].shape[0]
    sysm.drain()
    wall = time.perf_counter() - t0
    return wall * 1000.0 / n_timed, n_timed


run_pass(False)
ms, n = run_pass(True)
print(f"headline-style: {ms:.2f} ms/frame over {n} frames")
print(f"stats fetches: {fetch_wall[1]} x avg "
      f"{fetch_wall[0] / max(fetch_wall[1], 1) * 1000:.1f} ms = "
      f"{fetch_wall[0] * 1000 / n:.2f} ms/frame of the wall")
