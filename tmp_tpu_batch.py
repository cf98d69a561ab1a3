import sys, time, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
import jax
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.slam.system import Sensor, Settings, System

K, bf, frames, gt = make_stereo_sequence(n_frames=48, width=1241, height=376,
    fx=718.0, baseline=0.54, motion="forward", seed=3)
st = Settings(fx=float(K[0,0]), fy=float(K[1,1]), cx=float(K[0,2]), cy=float(K[1,2]),
    bf=float(bf), width=1241, height=376, n_features=2000, n_levels=8,
    th_depth=35.0, fps=10.0, max_points=65536, max_keyframes=256, local_window=2048,
    enable_local_mapping=False)
sysm = System(st, Sensor.STEREO)
B = 8
i = 0
while i < len(frames):
    chunk = frames[i:i+B]
    ts = [j*0.1 for j in range(i, i+len(chunk))]
    t0 = time.time()
    sysm.track_stereo_batch(chunk, ts)
    dt = (time.time()-t0)/len(chunk)
    log(f"frames {i}..{i+len(chunk)-1}: {dt*1000:.1f} ms/frame state={sysm.state.name}")
    i += len(chunk)
log("DONE")
