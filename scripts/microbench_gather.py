"""Microbenchmark bilinear-gather variants on the attached chip.

The line detector's cost is its random-ish gathers (NOTES: TPU general
gathers dominate; 5 gathers per march sample today — 4 bilinear corner
takes + 1 nearest angle take). This measures, at the march's real shape
(lanes x steps over a 640x480 field), whether fewer/wider gathers win:

  v0: 4x jnp.take of corners from flat [HW] (current _bilinear)
  v1: ONE jnp.take over a pre-packed [HW, 4] corner table
  v2: ONE jnp.take over a pre-packed [HW, 8] table (mag corners + angle
      corners in one row — would replace ALL 5 march gathers with 1)
  v3: jnp.take of a [2, HW] stacked (mag, ang) along axis 1, 4 corner
      index sets (replaces 2x4+1 takes with 4)

Whole-region wall protocol: N dispatches, one final fetch.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      _hcd("/tmp/splslam_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from splslam_tpu.io.cache import host_cache_dir as _hcd

import jax
import jax.numpy as jnp
import numpy as np

H, W = 480, 640
LANES, STEPS = 1024, 64   # one detection-level _grow_fb shape
N = 64


def mk_pos(key):
    k1, k2, k3 = jax.random.split(key, 3)
    seeds = jax.random.uniform(k1, (LANES, 2)) * jnp.asarray([W - 2.0, H - 2.0])
    ang = jax.random.uniform(k2, (LANES,)) * jnp.pi
    steps = jnp.arange(1, STEPS + 1, dtype=jnp.float32)
    xs = jnp.clip(seeds[:, 0:1] + jnp.cos(ang)[:, None] * steps, 0, W - 1.001)
    ys = jnp.clip(seeds[:, 1:2] + jnp.sin(ang)[:, None] * steps, 0, H - 1.001)
    return xs, ys


def corners(xs, ys):
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    return x0, y0, xs - x0, ys - y0


def v0(mag_flat, ang_flat, xs, ys):
    x0, y0, fx, fy = corners(xs, ys)
    base = y0 * W + x0
    shp = base.shape
    take = lambda i: jnp.take(mag_flat, i.reshape(-1)).reshape(shp)
    m = (take(base) * (1 - fx) * (1 - fy) + take(base + 1) * fx * (1 - fy)
         + take(base + W) * (1 - fx) * fy + take(base + W + 1) * fx * fy)
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    a = jnp.take(ang_flat, (yi * W + xi).reshape(-1)).reshape(shp)
    return m + a


def v1(packed4, ang_flat, xs, ys):
    x0, y0, fx, fy = corners(xs, ys)
    base = y0 * W + x0
    shp = base.shape
    rows = jnp.take(packed4, base.reshape(-1), axis=0).reshape(*shp, 4)
    m = (rows[..., 0] * (1 - fx) * (1 - fy) + rows[..., 1] * fx * (1 - fy)
         + rows[..., 2] * (1 - fx) * fy + rows[..., 3] * fx * fy)
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    a = jnp.take(ang_flat, (yi * W + xi).reshape(-1)).reshape(shp)
    return m + a


def v2(packed8, xs, ys):
    x0, y0, fx, fy = corners(xs, ys)
    base = y0 * W + x0
    shp = base.shape
    rows = jnp.take(packed8, base.reshape(-1), axis=0).reshape(*shp, 8)
    m = (rows[..., 0] * (1 - fx) * (1 - fy) + rows[..., 1] * fx * (1 - fy)
         + rows[..., 2] * (1 - fx) * fy + rows[..., 3] * fx * fy)
    # nearest angle == corner whose (fx, fy) is closest: pick via where
    a = jnp.where(fx < 0.5, jnp.where(fy < 0.5, rows[..., 4], rows[..., 6]),
                  jnp.where(fy < 0.5, rows[..., 5], rows[..., 7]))
    return m + a


def v3(stacked2, xs, ys):
    x0, y0, fx, fy = corners(xs, ys)
    base = (y0 * W + x0).reshape(-1)
    shp = xs.shape
    g00 = jnp.take(stacked2, base, axis=1)
    g01 = jnp.take(stacked2, base + 1, axis=1)
    g10 = jnp.take(stacked2, base + W, axis=1)
    g11 = jnp.take(stacked2, base + W + 1, axis=1)
    fx_ = fx.reshape(-1); fy_ = fy.reshape(-1)
    m = (g00[0] * (1 - fx_) * (1 - fy_) + g01[0] * fx_ * (1 - fy_)
         + g10[0] * (1 - fx_) * fy_ + g11[0] * fx_ * fy_)
    a = jnp.where(fx_ < 0.5, jnp.where(fy_ < 0.5, g00[1], g10[1]),
                  jnp.where(fy_ < 0.5, g01[1], g11[1]))
    return (m + a).reshape(shp)


def bench(name, fn, args_list):
    out = fn(*args_list[0])
    np.asarray(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        np.asarray(outs[-1])
        wall = (time.perf_counter() - t0) * 1e3 / N
        best = wall if best is None else min(best, wall)
    n_samp = LANES * STEPS
    print(f"{name}: {best:.3f} ms/dispatch  ({n_samp} samples)")
    return best


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W))
    ang = jax.random.uniform(key, (H, W)) * jnp.pi
    mag_flat = jax.device_put(img.reshape(-1))
    ang_flat = jax.device_put(ang.reshape(-1))
    # corner tables (pad one row/col so base+W+1 stays in range)
    p = jnp.pad(img, ((0, 1), (0, 1)))
    pa = jnp.pad(ang, ((0, 1), (0, 1)))
    packed4 = jnp.stack(
        [p[:H, :W], p[:H, 1:W + 1], p[1:H + 1, :W], p[1:H + 1, 1:W + 1]],
        axis=-1).reshape(-1, 4)
    packed8 = jnp.concatenate([
        packed4,
        jnp.stack([pa[:H, :W], pa[:H, 1:W + 1], pa[1:H + 1, :W],
                   pa[1:H + 1, 1:W + 1]], -1).reshape(-1, 4),
    ], axis=-1)
    stacked2 = jnp.stack([mag_flat, ang_flat], axis=0)

    keys = jax.random.split(jax.random.PRNGKey(7), N)
    pos = [mk_pos(k) for k in keys]
    pos = [(jax.device_put(x), jax.device_put(y)) for x, y in pos]

    f0 = jax.jit(lambda x, y: v0(mag_flat, ang_flat, x, y))
    f1 = jax.jit(lambda x, y: v1(packed4, ang_flat, x, y))
    f2 = jax.jit(lambda x, y: v2(packed8, x, y))
    f3 = jax.jit(lambda x, y: v3(stacked2, x, y))
    bench("v0 4-take bilinear + 1-take angle (current)", f0, pos)
    bench("v1 packed[HW,4] 1-take + 1-take angle", f1, pos)
    bench("v2 packed[HW,8] 1-take all", f2, pos)
    bench("v3 [2,HW] axis-1 4-take", f3, pos)


if __name__ == "__main__":
    main()
