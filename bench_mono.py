"""Mono point+line tracking benchmark (the reference's headline
modality: TUM monocular with lines, Tracking total 41.54 ms/frame ~= 24
FPS — BASELINE.md timing table, 测试报告 Table 2).

Runs the full mono TrackBoth-equivalent per-frame pipeline (pyramid +
FAST + ORB + multi-octave line detection + LBD, then motion-model
point+line match + 3-branch pose GN + local-map point+line match + pose
GN) on TUM-sized (640x480) synthetic frames with the TUM budget (1000
features, 128 line slots).

Timing protocol: WHOLE-REGION wall, two passes. Over the tunnel-attached
chip, per-batch walls are NOT device time — dispatches return immediately
and compute piles into the final fetch (observed 0.2 ms "batches"
followed by a multi-second drain). So: a full UNTIMED pass first (a fresh
System over the whole sequence — compiles every program the run touches,
including the data-dependent keyframe-insertion path), then a timed pass:
init, drain() (a real np.asarray fetch = sync barrier), one wall-clock
region around [all batch dispatches + final drain()] divided by the frame
count; best of 2 (the shared tunnel's throughput varies run to run).
Batches are pre-staged to HBM before the region (same methodology note as
bench.py, README "Tests / bench").

Prints ONE JSON line to stdout; the driver's headline metric remains
bench.py's stereo row.
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

BASELINE_MS = 41.54  # reference TUM mono+line tracking total / frame
W, H = 640, 480


def main() -> None:
    from splslam_tpu.io.synthetic import make_stereo_sequence
    from splslam_tpu.slam.system import Sensor, Settings, System

    # Smooth closed lateral path: full per-frame motion everywhere
    # (peak velocity = the "lateral" motion's 0.04/frame, invariant to
    # amplitude), but the camera never leaves the textured region (a
    # one-way 120-frame lateral leg exits the scene and goes LOST,
    # which would time the relocalization path's first compiles instead
    # of tracking; a palindromic shuttle flips velocity in one frame
    # and breaks the constant-velocity model mid-batch). Amplitude 0.5:
    # this bench runs with local mapping OFF (tracking-thread parity
    # with the reference's "Tracking total" row, whose mapping runs on
    # another core), so the map never grows past the init landmarks —
    # at amplitude 0.8 the excursion starves the init view's overlap
    # (inliers decay 90 -> <10 by frame 115, measured) and the timed
    # region ends up measuring loss recovery instead of tracking.
    # texture="grid": strong straight strokes over full-contrast blobs,
    # so BOTH feature families are genuinely exercised — the reference's
    # TUM structure-texture setting. On the plain blob texture the
    # detector finds only 6-11 weak curved-edge segments and the run
    # tracks ~0 map-lines: the "point+line headline" was timing the line
    # pipeline's cost without its work, and the point set alone decayed
    # below the lost floor at the oscillation extremes (mapping off =
    # frozen 2-KF map; mono scale drift compounds over cycles).
    n_frames = 120
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=n_frames, width=W, height=H, fx=520.0,
        motion="oscillate", seed=4, osc_amp=0.5, texture="grid",
    )
    import jax
    import numpy as np_

    def run_pass(timed: bool, using_line: bool = True,
                 allow_lost: bool = False):
        """One full pass over the sequence with a fresh System. The first
        (untimed) pass compiles every program the run will touch —
        including the data-dependent keyframe-insertion path — so the
        timed pass measures steady-state dispatch + device compute only
        (first compiles over the remote-compile tunnel are minutes)."""
        st = Settings(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), bf=0.0, width=W, height=H,
            n_features=1000, n_levels=8, fps=30.0,
            max_points=16384, max_keyframes=128, local_window=2048,
            using_line=using_line, line_features=128,
            batch_defer_stats=True, batch_defer_depth=3,
            enable_local_mapping=False, min_kf_gap=20,
        )
        sysm = System(st, Sensor.MONOCULAR)
        # Count loss-recovery replays (slam/system.py
        # _recover_batch_suffix): a pass that only survives by
        # relocalizing is a different claim than steady tracking, and
        # its wall time is replay-dominated — report it as such.
        n_recoveries = [0]
        orig_rec = sysm._recover_batch_suffix

        def _rec(*a, **k):
            n_recoveries[0] += 1
            return orig_rec(*a, **k)

        sysm._recover_batch_suffix = _rec
        B = 8
        # Sequential until the two-view init completes, then batched
        # (one dispatch per B frames — track_mono_batch), as a real-time
        # mono deployment on a tunnel-attached chip would run.
        i = 0
        while sysm.get_tracking_state().name != "OK" and i < len(frames):
            sysm.track_mono(frames[i][0], i / 30.0)
            i += 1
        init_end = i
        starts = list(range(init_end, n_frames, B))
        staged = {
            s: jax.device_put(np_.stack(
                [np_.asarray(l) for (l, r) in frames[s:s + B]]
            ).astype(np_.uint8))
            for s in starts
        }
        sysm.drain()  # sync barrier: flush init compute + stats
        n_timed = 0
        t0 = time.perf_counter()
        for s in starts:
            ts = [j / 30.0 for j in range(s, s + staged[s].shape[0])]
            sysm.track_mono_batch(staged[s], ts)
            n_timed += staged[s].shape[0]
            print(f"batch @{s}: dispatched state={sysm.state.name}",
                  file=sys.stderr)
            # A LOST excursion would time the reloc path instead of
            # steady tracking — fail loudly, don't report garbage
            # (except in the ablation pass, where LOST is a result).
            if allow_lost and sysm.state.name != "OK":
                return None, s, n_recoveries[0]
            assert sysm.state.name == "OK", f"tracking {sysm.state} at {s}"
        sysm.drain()
        wall = time.perf_counter() - t0
        assert sysm.get_tracking_state().name == "OK", sysm.state
        if not allow_lost:
            # The headline must measure steady tracking, not loss
            # recovery (a replay re-tracks frames sequentially over the
            # tunnel at ~300 ms/frame and would dominate the wall).
            assert n_recoveries[0] == 0, (
                f"{n_recoveries[0]} loss-recovery replays in the timed "
                "region — the scene no longer holds steady tracking")
        return wall * 1000.0 / max(n_timed, 1), None, n_recoveries[0]

    run_pass(timed=False)   # compile pass
    ms = min(run_pass(timed=True)[0] for _ in range(2))
    row = {
        "metric": "tum_mono_line_tracking_ms_per_frame",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 2),
    }
    print(json.dumps(row))
    from splslam_tpu.io.bench_record import record_headline

    record_headline(row, "bench_mono.py")
    # Supplementary usingLine=0 ablation (stderr; the reference's own
    # A/B switch, System.usingLine — SURVEY SS4.3). Three possible
    # outcomes, all informative: a clean per-frame cost delta for the
    # line pipeline; the points-only run LOSING TRACKING where
    # point+line holds; or points-only surviving only through
    # loss-recovery replays (relocalization) — the reference's Tables
    # 5-6 story, on the timing benchmark's own sequence.
    _, lost0, nrec0 = run_pass(timed=False, using_line=False,
                               allow_lost=True)
    if lost0 is not None:
        print(json.dumps({
            "metric": "tum_mono_points_only_ms_per_frame",
            "value": None,
            "points_only_lost_at_frame": lost0,
            "note": "points-only tracking is LOST where point+line "
                    "holds the full sequence",
        }), file=sys.stderr)
    else:
        results = [run_pass(timed=True, using_line=False, allow_lost=True)
                   for _ in range(2)]
        ms_pts = min(r[0] for r in results)
        nrec = min(r[2] for r in results)
        row = {
            "metric": "tum_mono_points_only_ms_per_frame",
            "value": round(ms_pts, 2),
            "unit": "ms",
        }
        if nrec > 0:
            row["loss_recovery_replays"] = nrec
            row["note"] = ("points-only survives only via relocalization "
                           "replays (wall is replay-dominated, not a "
                           "tracking cost); point+line tracks steadily")
        else:
            row["line_pipeline_cost_ms"] = round(ms - ms_pts, 2)
        print(json.dumps(row), file=sys.stderr)


if __name__ == "__main__":
    main()
