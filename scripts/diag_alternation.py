"""Does alternating two executables cost extra over the axon tunnel?

Times: (a) 12x build-only, (b) 12x track-only (chained map), and
(c) 12x [build; track] alternating — all whole-region wall, one drain.
If (c) >> (a)+(b), program switching itself is the cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from splslam_tpu.io.cache import host_cache_dir as _hcd

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      _hcd("/tmp/splslam_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np
import jax
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.io.synth_map import make_synthetic_map
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.slam.pipeline import (build_frames_batch_mono,
                                       track_frames_batch)

W, H, NF, B, NB = 640, 480, 1000, 8, 12

_, _, frames, _ = make_stereo_sequence(
    n_frames=B * NB, width=W, height=H, fx=520.0,
    motion="oscillate", seed=4, osc_amp=0.5, texture="grid",
)
batches = [
    jax.device_put(np.stack(
        [np.asarray(l) for (l, r) in frames[s:s + B]]).astype(np.uint8))
    for s in range(0, B * NB, B)
]
cam = Camera.create(520.0, 520.0, W / 2, H / 2, bf=0.0, width=W, height=H)
spec = PyramidSpec.create(H, W, n_features=1000, n_levels=8)
scales = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)

mst, frame, step, _ = make_synthetic_map(
    n_kfs=12, n_feat=NF, p_cap=16384, k_cap=128, q_cap=4096,
    l_cap=128, width=W, height=H, fx=520.0, baseline=0.1,
)
mst = jax.device_put(mst)
step = jax.device_put(step)
th = jnp.float32(3.0)
kf = jnp.int32(11)
jax.block_until_ready(mst.pts.xyz)

bld = lambda b: build_frames_batch_mono(b, cam, spec, line_capacity=128)

# warm both
fb = bld(batches[0])
m, s, _ = track_frames_batch(fb, mst, step, th, kf, cam, scales)
np.asarray(s.Tcw)

def timed(name, loop):
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        sink = loop()
        np.asarray(jax.tree.leaves(sink)[0][:1])
        ms = (time.perf_counter() - t0) * 1000.0 / (NB * B)
        best = ms if best is None else min(best, ms)
    print(f"{name:34s} {best:7.2f} ms/frame")

def build_only():
    out = None
    for b in batches:
        out = bld(b)
    return out.feat.xy[0]

def track_only():
    mm, ss = jax.tree.map(jnp.copy, m), s
    for _ in range(NB):
        mm, ss, _ = track_frames_batch(fb, mm, ss, th, kf, cam, scales)
    return ss.Tcw

def alternate():
    mm, ss = jax.tree.map(jnp.copy, m), s
    for b in batches:
        f = bld(b)
        mm, ss, _ = track_frames_batch(f, mm, ss, th, kf, cam, scales)
    return ss.Tcw

timed("build only", build_only)
timed("track only (chained)", track_only)
timed("alternate build/track", alternate)
timed("alternate build/track (2nd)", alternate)
