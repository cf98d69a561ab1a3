import time, sys, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.ops.orb import extract_orb
from splslam_tpu.ops.stereo import stereo_match

W,H = 1241,376
K, bf, frames, gt = make_stereo_sequence(n_frames=2, width=W, height=H,
    fx=718.0, baseline=0.54, motion="forward", seed=3)
spec = PyramidSpec.create(H, W, 8, 1.2, 2000)
imgL = jnp.asarray(frames[0][0], jnp.float32); imgR = jnp.asarray(frames[0][1], jnp.float32)
jax.block_until_ready((imgL,imgR))
scales = jnp.array(spec.scales, jnp.float32)
fxv = jnp.float32(718.0); bfv = jnp.float32(387.7)

def chain_bench(name, fn, state, n=10):
    state = fn(state); state = fn(state)
    np.asarray(jax.tree.leaves(state)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    np.asarray(jax.tree.leaves(state)[0].ravel()[0])
    log(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms")

@jax.jit
def f_orb(img):
    feat = extract_orb(img, spec)
    return img + 0.0 * feat.xy[0, 0]
chain_bench("extract_orb", f_orb, imgL)

featL = extract_orb(imgL, spec); featR = extract_orb(imgR, spec)
jax.block_until_ready((featL.xy, featR.xy))

@jax.jit
def f_sm(img):
    ur, dep = stereo_match(featL, featR, img, imgR, scales, bfv, fxv)
    return img + 0.0 * ur[0]
chain_bench("stereo_match full", f_sm, imgL)

# full frame build
from splslam_tpu.slam.frame import build_frame_stereo
from splslam_tpu.geometry.camera import Camera
cam = Camera.create(fx=718.0, fy=718.0, cx=W/2, cy=H/2, bf=387.7, width=W, height=H)
@jax.jit
def f_fb(img):
    fr = build_frame_stereo(img, imgR, cam, spec)
    return img + 0.0 * fr.feat.xy[0, 0]
chain_bench("frame build stereo", f_fb, imgL)
log("DONE")
