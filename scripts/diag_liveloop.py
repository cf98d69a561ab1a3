"""Diagnose mapper.n_guarded > 0 after a LIVE loop correction
(tests/test_loop_live.py round-5)."""
import os
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
                  os.environ.get("SPLSLAM_TEST_CACHE",
                                 host_cache_dir("/tmp/splslam_test_xla_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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
    last_g = 0
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, i * 0.2)
        sysm.mapper.flush()
        g = sysm.mapper.n_guarded
        if g != last_g:
            print(f"frame {i}: mapper.n_guarded {last_g} -> {g}; "
                  f"kfs {sysm.n_kfs}, corrections "
                  f"{sysm.loop_closer.corrections}, "
                  f"stats {sysm.mapper.last_stats}")
            # map state sanity
            Tcw = np.asarray(sysm.map.kfs.Tcw[:sysm.n_kfs])
            xyz = np.asarray(sysm.map.pts.xyz)
            val = np.asarray(sysm.map.pts.valid)
            print(f"  max |Tcw| {np.abs(Tcw).max():.3e}, "
                  f"max |xyz valid| {np.abs(xyz[val]).max():.3e}, "
                  f"n_pts_valid {val.sum()}")
            last_g = g
        if sysm.loop_closer.corrections and i % 10 == 0:
            print(f"frame {i}: post-correction, health {sysm.health()}")
    sysm.drain()
    print("final:", sysm.health())


if __name__ == "__main__":
    main()
