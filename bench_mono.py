"""Mono point+line tracking benchmark (the reference's headline
modality: TUM monocular with lines, Tracking total 41.54 ms/frame ~= 24
FPS — BASELINE.md timing table, 测试报告 Table 2).

Runs the full mono TrackBoth-equivalent per-frame pipeline (pyramid +
FAST + ORB + multi-octave line detection + LBD, then motion-model
point+line match + 3-branch pose GN + local-map point+line match + pose
GN) on TUM-sized (640x480) synthetic frames with the TUM budget (1000
features, 128 line slots), sequential per-frame dispatch (the mono path
is not batched), steady-state median.

Prints ONE JSON line to stdout; the driver's headline metric remains
bench.py's stereo row.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/splslam_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_MS = 41.54  # reference TUM mono+line tracking total / frame
W, H = 640, 480


def main() -> None:
    from splslam_tpu.io.synthetic import make_stereo_sequence
    from splslam_tpu.slam.system import Sensor, Settings, System

    n_frames = 120
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=n_frames, width=W, height=H, fx=520.0,
        motion="lateral", seed=4,
    )
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=0.0, width=W, height=H,
        n_features=1000, n_levels=8, fps=30.0,
        max_points=16384, max_keyframes=128, local_window=2048,
        using_line=True, line_features=128, batch_defer_stats=True,
        enable_local_mapping=False, min_kf_gap=20,
    )
    sysm = System(st, Sensor.MONOCULAR)
    times = []
    warmup = 24
    B = 8
    # Sequential until the two-view init completes, then batched (one
    # dispatch per B frames — track_mono_batch), as a real-time mono
    # deployment on a tunnel-attached chip would run.
    i = 0
    import jax
    import numpy as np_
    while sysm.get_tracking_state().name != "OK" and i < len(frames):
        sysm.track_mono(frames[i][0], i / 30.0)
        i += 1
    while i < len(frames):
        chunk = [l for (l, r) in frames[i:i + B]]
        ts = [j / 30.0 for j in range(i, i + len(chunk))]
        staged = jax.device_put(
            np_.stack([np_.asarray(c) for c in chunk]).astype(np_.uint8))
        t0 = time.perf_counter()
        sysm.track_mono_batch(staged, ts)
        dt = (time.perf_counter() - t0) / len(chunk)
        if i >= warmup:
            times.extend([dt] * len(chunk))
        print(f"batch @{i}: {dt*1000:.1f} ms/frame state={sysm.state.name}",
              file=sys.stderr)
        i += len(chunk)
    sysm.drain()
    ms = float(np.median(times) * 1000.0)
    print(json.dumps({
        "metric": "tum_mono_line_tracking_ms_per_frame",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 2),
    }))


if __name__ == "__main__":
    main()
