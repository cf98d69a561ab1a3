import sys, time, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
import jax, jax.numpy as jnp
from functools import partial
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.ops.pyramid import PyramidSpec, build_pyramid, gaussian_blur
from splslam_tpu.ops.fast import fast_corners
from splslam_tpu.ops.topk import grid_topk
from splslam_tpu.ops.orb import extract_orb, ic_angle, rbrief
from splslam_tpu.ops.stereo import stereo_match

W,H = 1241,376
K, bf, frames, gt = make_stereo_sequence(n_frames=2, width=W, height=H,
    fx=718.0, baseline=0.54, motion="forward", seed=3)
spec = PyramidSpec.create(H, W, 8, 1.2, 2000)
imgL = jnp.asarray(frames[0][0], jnp.float32); imgR = jnp.asarray(frames[0][1], jnp.float32)
jax.block_until_ready((imgL,imgR))
scales = jnp.array(spec.scales, jnp.float32)

def chain(name, fn, state, n=8):
    state = fn(state); state = fn(state)
    np.asarray(jax.tree.leaves(state)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    np.asarray(jax.tree.leaves(state)[0].ravel()[0])
    log(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms")

# A. detection only (live image chained)
@jax.jit
def f_det(img):
    levels = build_pyramid(img, spec)
    acc = img
    for lv, im in enumerate(levels):
        if spec.budgets[lv] == 0: continue
        score = fast_corners(im, 12.0)
        xy, resp, valid = grid_topk(score, spec.budgets[lv])
        acc = acc + 0.0 * resp[0]
    return acc
chain("A pyramid+FAST+topk(8lvl)", f_det, imgL)

# B. detection + angles
@jax.jit
def f_ang(img):
    levels = build_pyramid(img, spec)
    acc = img
    for lv, im in enumerate(levels):
        if spec.budgets[lv] == 0: continue
        score = fast_corners(im, 12.0)
        xy, resp, valid = grid_topk(score, spec.budgets[lv])
        ang = ic_angle(im, xy.astype(jnp.int32))
        acc = acc + 0.0 * ang[0]
    return acc
chain("B +ic_angle", f_ang, imgL)

# C. full extract_orb (live)
@jax.jit
def f_orb(img):
    f = extract_orb(img, spec)
    return img + 0.0 * (f.desc[0,0].astype(jnp.float32))
chain("C extract_orb full", f_orb, imgL)

# D. both images + stereo (all live)
@jax.jit
def f_full(img):
    fL = extract_orb(img, spec)
    fR = extract_orb(img[:, ::-1], spec)   # live second image
    ur, dep = stereo_match(fL, fR, img, img[:, ::-1], scales,
                           jnp.float32(387.7), jnp.float32(718.0))
    return img + 0.0 * ur[0]
chain("D 2x orb + stereo", f_full, imgL)
log("DONE")
