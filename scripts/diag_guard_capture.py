"""Capture the exact mapping_step input whose local BA trips the
camera-class guard on the loop circuit (round-5): snapshot the map
before every mapping dispatch; when the flushed guard counter moves,
save the pre-step snapshot for offline analysis."""
import os
import pickle
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from splslam_tpu.io.cache import host_cache_dir

jax.config.update("jax_compilation_cache_dir",
                  host_cache_dir("/tmp/splslam_test_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from tests.test_loop import _circuit
from splslam_tpu.slam.system import Sensor, Settings, System


def main():
    K, bf, frames, gt = _circuit()
    st = Settings(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
        cy=float(K[1, 2]), bf=float(bf), width=320, height=240,
        n_features=500, n_levels=4, th_depth=60.0, fps=5,
        max_points=16384, max_keyframes=64, local_window=1024,
        enable_local_mapping=True, enable_loop_correction=True,
    )
    sysm = System(st, Sensor.STEREO)
    snaps = {}
    orig = sysm.mapper.on_keyframe

    def hook(kf):
        snaps[kf] = jax.tree.map(jnp.copy, sysm.map)
        for old in [k for k in snaps if k < kf - 2]:
            snaps.pop(old)
        orig(kf)

    sysm.mapper.on_keyframe = hook
    last_g = 0
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.2)
        sysm.mapper.flush()
        g = sysm.mapper.n_guarded
        if g != last_g:
            kf = sysm.mapper._pending_kf
            # pending was just consumed; the flushed kf is the largest
            # snapped one
            kf = max(snaps)
            print(f"frame {i}: guard {last_g}->{g} at mapping kf {kf}; "
                  f"lm_singular {sysm.mapper.n_lm_singular}")
            with open("/tmp/guard_map.pkl", "wb") as f:
                pickle.dump(
                    {"map": jax.tree.map(np.asarray, snaps[kf]), "kf": kf,
                     "settings": dict(
                         fx=st.fx, fy=st.fy, cx=st.cx, cy=st.cy, bf=st.bf,
                         width=st.width, height=st.height,
                         n_levels=st.n_levels)},
                    f)
            print("snapshot saved to /tmp/guard_map.pkl")
            return
        last_g = g
    sysm.drain()
    print("no guard fired; final", sysm.health())


if __name__ == "__main__":
    main()
