"""Diagnostic for tests/test_loop.py failure: instrument KF cadence and
loop detection internals on the out-and-back scenario."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from splslam_tpu.io.synthetic import PlaneScene, make_texture
from splslam_tpu.slam.system import Sensor, Settings, System
from splslam_tpu.slam import loop_closing as LC
from splslam_tpu.slam import pipeline


def _out_and_back(n_out=30, step=0.15, W=320, H=240, FX=200.0, BASE=0.12):
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)
    scene = PlaneScene(make_texture(seed=0), z0=2.0, z1=5.0)
    poses, frames = [], []
    for i in range(2 * n_out):
        Twc = np.eye(4)
        x = step * (i if i < n_out else (2 * n_out - i))
        Twc[0, 3] = x
        Twc[1, 3] = 0.01 * np.sin(i * 0.4)
        poses.append(Twc.copy())
        imgL = scene.render(K, Twc, H, W)
        Twc_r = Twc.copy()
        Twc_r[0, 3] += BASE
        frames.append((imgL, scene.render(K, Twc_r, H, W)))
    return K, FX * BASE, frames, np.stack(poses)


K, bf, frames, gt = _out_and_back()
st = Settings(
    fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
    cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
    n_features=500, n_levels=4, th_depth=60.0, fps=5,
    max_points=16384, max_keyframes=64, local_window=1024,
    enable_local_mapping=True, enable_loop_correction=False,
)
sysm = System(st, Sensor.STEREO)

# --- instrument _need_new_keyframe to log its inputs ---
orig_need = sysm._need_new_keyframe


def need_logged(stats, n_in):
    r = orig_need(stats, n_in)
    ref = int(stats[pipeline.S_REF_MATCHES])
    print(f"frame={sysm.frame_id} n_in={n_in} ref_matches={ref} "
          f"since_kf={sysm.frames_since_kf} n_kfs={sysm.n_kfs} -> kf={r}",
          flush=True)
    return r


sysm._need_new_keyframe = need_logged

# --- instrument loop closer ---
lc = sysm.loop_closer
orig_on_kf = lc.on_keyframe


def on_kf_logged(kf):
    import numpy as np
    from splslam_tpu.slam import reloc
    from splslam_tpu.bow.vocabulary import densify_bow_row, score_rows

    sys_ = lc.sys
    print(f"[loop] on_keyframe kf={kf} n_kfs={sys_.n_kfs} "
          f"vocab={'yes' if sys_.vocab is not None else 'NO'}", flush=True)
    if sys_.vocab is None or sys_.n_kfs < 6:
        orig_on_kf(kf)
        return
    cov = np.array(LC._covisible_mask(sys_.map, jnp.int32(kf)))
    cov[kf] = True
    query = densify_bow_row(
        sys_.kf_bow.ids, sys_.kf_bow.vals, kf, sys_.bow_n_words)
    cov_idx = [c for c in range(sys_.n_kfs) if cov[c] and c != kf]
    if cov_idx:
        rows = jnp.asarray(cov_idx)
        cov_scores = np.asarray(score_rows(
            sys_.kf_bow.ids[rows], sys_.kf_bow.vals[rows], query))
        min_score = float(cov_scores.min())
        scores = np.asarray(reloc.reloc_scores(
            sys_.kf_bow.ids, sys_.kf_bow.vals, sys_.map.kfs.valid, query,
            jnp.asarray(cov)))[: sys_.n_kfs]
        cands = [c for c in np.argsort(scores)[::-1]
                 if scores[c] >= max(min_score, 1e-3)]
        print(f"[loop]  cov_group={sorted(cov_idx)} min_score={min_score:.4f} "
              f"scores={np.round(scores, 4).tolist()} cands={cands[:6]}",
              flush=True)
        print(f"[loop]  consistent(before)="
              f"{[(sorted(g), c) for g, c in lc.consistent]}", flush=True)
    orig_on_kf(kf)
    print(f"[loop]  consistent(after)="
          f"{[(sorted(g), c) for g, c in lc.consistent]} "
          f"verified={lc.verified_loops}", flush=True)


lc.on_keyframe = on_kf_logged

for i, (l, r) in enumerate(frames):
    sysm.track_stereo(l, r, i * 0.2)
sysm.drain()
print("FINAL state:", sysm.state, "n_kfs:", sysm.n_kfs,
      "verified:", lc.verified_loops, flush=True)
