import time, sys, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.slam.system import Sensor, Settings, System

K, bf, frames, gt = make_stereo_sequence(n_frames=30, width=1241, height=376,
    fx=718.0, baseline=0.54, motion="forward", seed=3)
st = Settings(fx=float(K[0,0]), fy=float(K[1,1]), cx=float(K[0,2]), cy=float(K[1,2]),
    bf=float(bf), width=1241, height=376, n_features=2000, n_levels=8,
    th_depth=35.0, fps=10.0, max_points=65536, max_keyframes=256, local_window=2048,
    enable_local_mapping=False)
sysm = System(st, Sensor.STEREO)
times = []
for i, (l, r) in enumerate(frames):
    t0 = time.perf_counter()
    sysm.track_stereo(l, r, i*0.1)
    dt = time.perf_counter() - t0
    times.append(dt)
    log(f"frame {i}: {dt*1000:.0f} ms kfs={sysm.n_kfs} state={sysm.state.name}")
log("median ms:", np.median(times[8:])*1000)
