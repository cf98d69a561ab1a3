"""Capture the System's exact build_frames_batch_mono args, then time
the SAME call standalone (12 dispatches, one drain) — args vs context.
Also re-times the alternating build/track pattern with captured args.
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
n_frames = 40
K, bf, frames, gt = make_stereo_sequence(
    n_frames=n_frames, width=W, height=H, fx=520.0,
    motion="oscillate", seed=4, osc_amp=0.5, texture="grid",
)

captured = {}
_orig_build = P.build_frames_batch_mono


def capture_build(imgs, cam, spec, **kw):
    if "args" not in captured:
        captured["args"] = (imgs, cam, spec, kw)
    return _orig_build(imgs, cam, spec, **kw)


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
P.build_frames_batch_mono = capture_build
starts = list(range(i, n_frames, B))
for s in starts[:2]:
    ts = [j / 30.0 for j in range(s, s + B)]
    imgs = jax.device_put(np.stack(
        [np.asarray(l) for (l, r) in frames[s:s + B]]).astype(np.uint8))
    sysm.track_mono_batch(imgs, ts)
sysm.drain()
P.build_frames_batch_mono = _orig_build

imgs, cam, spec, kw = captured["args"]
print("captured kw:", kw, file=sys.stderr)
print("spec:", spec, file=sys.stderr)

out = _orig_build(imgs, cam, spec, **kw)
np.asarray(jax.tree.leaves(out)[0][0, :1])
best = None
for _ in range(3):
    t0 = time.perf_counter()
    outs = [_orig_build(imgs, cam, spec, **kw) for _ in range(12)]
    np.asarray(jax.tree.leaves(outs[-1])[0][0, :1])
    ms = (time.perf_counter() - t0) * 1000.0 / (12 * B)
    best = ms if best is None else min(best, ms)
print(f"standalone same-args build: {best:.2f} ms/frame")
