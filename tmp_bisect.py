# Bisect the TPU compile hang: compile _track_body pieces separately.
import sys, time, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
import jax, jax.numpy as jnp
from functools import partial
from splslam_tpu.slam.system import Sensor, Settings, System
from splslam_tpu.slam.frame import build_frame_stereo
from splslam_tpu.slam import pipeline
from splslam_tpu.slam.tracking import track_step, LineWindow

st = Settings(fx=718.0, fy=718.0, cx=620.5, cy=188.0, bf=387.7,
    width=1241, height=376, n_features=2000, n_levels=8, th_depth=35.0,
    fps=10.0, max_points=65536, max_keyframes=256, local_window=2048,
    enable_local_mapping=False)
sysm = System(st, Sensor.STEREO)
rng = np.random.default_rng(0)
img = rng.integers(0, 255, (376, 1241), dtype=np.uint8)
t0 = time.time()
sysm.track_stereo(img, img, 0.0)   # init
log("A init:", round(time.time()-t0, 1), "s")

# piece 1: window assembly alone
@jax.jit
def f_win(mst, gid):
    return pipeline.assemble_local_window(mst, gid, st.local_window)
t0 = time.time()
w = f_win(sysm.map, sysm.step.lm_gid)
jax.block_until_ready(w.ids)
log("B window assembly:", round(time.time()-t0, 1), "s")

# piece 2: track_step alone (frame prebuilt)
fb = jax.jit(partial(build_frame_stereo, cam=sysm.cam, spec=sysm.spec, line_capacity=1))
t0 = time.time()
fr = fb(jnp.asarray(img, jnp.float32), jnp.asarray(img, jnp.float32))
jax.block_until_ready(fr.feat.xy)
log("C frame build:", round(time.time()-t0, 1), "s")

prev = sysm.step
t0 = time.time()
res = track_step(sysm.cam, sysm.scales, fr,
    prev.frame.feat.xy, prev.frame.feat.octave, prev.frame.feat.angle,
    prev.frame.feat.bits, prev.lm_xyz, prev.lm_gid,
    prev.Tcw, w,
    prev.frame.lines, prev.ll_gid, prev.ll_mid, prev.ll_len,
    LineWindow.empty(1),
    scale_factor=st.scale_factor, n_levels=st.n_levels)
jax.block_until_ready(res.Tcw)
log("D track_step:", round(time.time()-t0, 1), "s")

# piece 3: stats/update part = full _track_body
t0 = time.time()
m2, s2, stats = jax.jit(partial(pipeline._track_body,
    cam=sysm.cam, scales=sysm.scales, m_local=st.local_window,
    scale_factor=st.scale_factor, n_levels=st.n_levels))(
    fr, sysm.map, prev, sysm._th_depth_dev, jnp.int32(0))
jax.block_until_ready(stats)
log("E full track body:", round(time.time()-t0, 1), "s")
log("BISECT DONE")
