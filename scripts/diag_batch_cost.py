"""Per-program device cost inside the REAL bench_mono System loop:
drain around each of the two batch dispatches (build / track) to
attribute the wall. Adds 2 RPC floors per batch (~54 ms) — subtract.
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
from splslam_tpu.slam import pipeline as P

W, H = 640, 480
n_frames = 120
K, bf, frames, gt = make_stereo_sequence(
    n_frames=n_frames, width=W, height=H, fx=520.0,
    motion="oscillate", seed=4, osc_amp=0.5, texture="grid",
)

acc = {"build": 0.0, "track": 0.0, "n": 0}
_orig_build = P.build_frames_batch_mono
_orig_track = P.track_frames_batch


def timed_build(*a, **k):
    t0 = time.perf_counter()
    out = _orig_build(*a, **k)
    np.asarray(jax.tree.leaves(out)[0][0, :1])
    acc["build"] += time.perf_counter() - t0
    return out


def timed_track(*a, **k):
    t0 = time.perf_counter()
    out = _orig_track(*a, **k)
    np.asarray(out[1].Tcw)
    acc["track"] += time.perf_counter() - t0
    acc["n"] += 1
    return out


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
    if timed:
        P.build_frames_batch_mono = timed_build
        P.track_frames_batch = timed_track
        acc["build"] = acc["track"] = 0.0
        acc["n"] = 0
    n_timed = 0
    nkf0 = sysm.n_kfs
    t0 = time.perf_counter()
    for s in starts:
        ts = [j / 30.0 for j in range(s, s + staged[s].shape[0])]
        sysm.track_mono_batch(staged[s], ts)
        n_timed += staged[s].shape[0]
    sysm.drain()
    wall = time.perf_counter() - t0
    P.build_frames_batch_mono = _orig_build
    P.track_frames_batch = _orig_track
    if timed:
        print(f"wall {wall * 1000 / n_timed:.2f} ms/frame | build "
              f"{acc['build'] * 1000 / n_timed:.2f} | track "
              f"{acc['track'] * 1000 / n_timed:.2f} | batches {acc['n']} "
              f"| KFs inserted {sysm.n_kfs - nkf0}")
    return wall


run_pass(False)
run_pass(True)
