import time, sys, numpy as np, jax, jax.numpy as jnp
from functools import partial
def log(*a): print(*a, file=sys.stderr, flush=True)
from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.ops.orb import extract_orb
from splslam_tpu.ops import match as M
from splslam_tpu.ops.stereo import stereo_match, bilinear_sample, masked_median, _W, _R

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
def f_ham(d1):
    dist = M.hamming_matrix(d1, featR.desc)
    return d1 ^ (dist[0, 0].astype(jnp.uint32) & jnp.uint32(0))
chain_bench("hamming 2045^2", f_ham, featL.desc)

@jax.jit
def f_sm(img):
    ur, dep = stereo_match(featL, featR, img, imgR, scales, bfv, fxv)
    return img + 0.0 * ur[0]
chain_bench("stereo_match full", f_sm, imgL)

@jax.jit
def f_match(img):
    dist = M.hamming_matrix(featL.desc, featR.desc)
    sL = scales[featL.octave]; sR = scales[featR.octave]
    row_ok = jnp.abs(featL.xy[:, 1:2] - featR.xy[None, :, 1]) <= 2.0*jnp.maximum(sL[:,None], sR[None,:])
    oct_ok = M.octave_mask(featL.octave, featR.octave, -1, 1)
    disp = featL.xy[:, 0:1] - featR.xy[None, :, 0]
    d = M.masked_distances(dist, featL.valid, featR.valid, row_ok & oct_ok & (disp>-3.0)&(disp<fxv))
    best, bestd = M.nn_match(d, max_dist=M.TH_HIGH)
    return img + 0.0 * best[0]
chain_bench("match+masks+nn", f_match, imgL)

@jax.jit
def f_refine(img):
    best = jnp.arange(featL.xy.shape[0]) % featR.xy.shape[0]
    s = scales[featL.octave]
    dy = jnp.arange(-_W, _W + 1, dtype=jnp.float32)
    dxw = jnp.arange(-_W, _W + 1, dtype=jnp.float32)
    dxs = jnp.arange(-_W - _R, _W + _R + 1, dtype=jnp.float32)
    cL = featL.xy; uR0 = featR.xy[best, 0]; vR0 = cL[:, 1]
    lx = cL[:, 0, None, None] + s[:, None, None] * dxw[None, None, :]
    ly = cL[:, 1, None, None] + s[:, None, None] * dy[None, :, None]
    patchL = bilinear_sample(img, jnp.stack([lx * jnp.ones_like(ly), ly * jnp.ones_like(lx)], axis=-1))
    rx = uR0[:, None, None] + s[:, None, None] * dxs[None, None, :]
    ry = vR0[:, None, None] + s[:, None, None] * dy[None, :, None]
    strip = bilinear_sample(imgR, jnp.stack([rx * jnp.ones_like(ry), ry * jnp.ones_like(rx)], axis=-1))
    patchL = patchL - patchL[:, _W, _W][:, None, None]
    idx = jnp.arange(2 * _R + 1)[:, None] + jnp.arange(2 * _W + 1)[None, :]
    wins = strip[:, :, idx]
    wins = jnp.moveaxis(wins, 2, 1)
    wins = wins - wins[:, :, _W, _W][:, :, None, None]
    ssd = jnp.sum((wins - patchL[:, None]) ** 2, axis=(2, 3))
    return img + 0.0 * ssd[0, 0]
chain_bench("SSD refine", f_refine, imgL)

@jax.jit
def f_bilin(img):
    s = scales[featL.octave]
    dy = jnp.arange(-_W, _W + 1, dtype=jnp.float32)
    dxs = jnp.arange(-_W - _R, _W + _R + 1, dtype=jnp.float32)
    cL = featL.xy
    rx = cL[:, 0, None, None] + s[:, None, None] * dxs[None, None, :]
    ry = cL[:, 1, None, None] + s[:, None, None] * dy[None, :, None]
    strip = bilinear_sample(imgR, jnp.stack([rx * jnp.ones_like(ry), ry * jnp.ones_like(rx)], axis=-1))
    return img + 0.0 * strip[0, 0, 0]
chain_bench("bilinear strip only", f_bilin, imgL)

@jax.jit
def f_med(img):
    m = masked_median(featL.response, featL.valid)
    return img + 0.0 * m
chain_bench("masked_median", f_med, imgL)
log("DONE")
