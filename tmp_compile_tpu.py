import sys, time, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
import jax, jax.numpy as jnp
from splslam_tpu.slam.system import Sensor, Settings, System

st = Settings(fx=718.0, fy=718.0, cx=620.5, cy=188.0, bf=387.7,
    width=1241, height=376, n_features=2000, n_levels=8, th_depth=35.0,
    fps=10.0, max_points=65536, max_keyframes=256, local_window=2048,
    enable_local_mapping=False)
sysm = System(st, Sensor.STEREO)
rng = np.random.default_rng(0)
img = rng.integers(0, 255, (376, 1241), dtype=np.uint8)
t0 = time.time()
sysm.track_stereo(img, img, 0.0)
log("frame0 (init):", round(time.time()-t0, 1), "s")
t0 = time.time()
sysm.track_stereo(img, img, 0.1)
sysm.drain()
log("frame1 (fused compile):", round(time.time()-t0, 1), "s")
times = []
for i in range(10):
    t0 = time.time()
    sysm.track_stereo(img, img, 0.2 + i*0.1)
    times.append(time.time()-t0)
sysm.drain()
log("steady ms: " + str([round(t*1000) for t in times]))
log("median steady ms: " + str(round(float(np.median(times[2:]))*1000, 1)))
