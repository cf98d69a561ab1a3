"""Microbench the tracking program's stages at headline shapes on-chip.

Whole-region wall (CLAUDE.md): 64 dispatches per stage, one drain,
divide. Pose-GN at (rounds,iters) schedules, the three match stages,
and the full track_step — the split that decides where the mono
tracking-side ~7 ms/frame goes.
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

import jax
import jax.numpy as jnp
import numpy as np

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.optim.pose_gn import (LineObs, PointObs, pose_optimize)

N, L, M_LOCAL, LC = 1000, 128, 2048, 128
REPS = 64


def region(name, fn, args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(REPS)]
        np.asarray(jax.tree.leaves(outs[-1])[0])
        ms = (time.perf_counter() - t0) * 1000.0 / REPS
        best = ms if best is None else min(best, ms)
    print(f"{name:52s} {best:7.3f} ms")
    return best


def main() -> None:
    rng = np.random.default_rng(0)
    cam = Camera.create(520.0, 520.0, 320.0, 240.0, bf=0.0,
                        width=640, height=480)
    xyz = jnp.asarray(rng.normal(size=(N, 3)) * 2 + np.array([0, 0, 6.0]))
    uv = jnp.asarray(rng.uniform([0, 0], [640, 480], size=(N, 2)))
    pts = PointObs(xyz_w=xyz, uv=uv, inv_sigma2=jnp.ones((N,)),
                   mask=jnp.ones((N,), bool))
    mid = jnp.asarray(rng.normal(size=(L, 3)) * 2 + np.array([0, 0, 6.0]))
    coef = jnp.asarray(rng.normal(size=(L, 3)))
    coef = coef / jnp.linalg.norm(coef[:, :2], axis=-1, keepdims=True)
    lns = LineObs(mid_w=mid, coef=coef, inv_sigma2=jnp.ones((L,)) * 0.25,
                  mask=jnp.ones((L,), bool))
    T0 = jnp.eye(4)

    for (r, i) in ((4, 6), (2, 4), (3, 4), (2, 6)):
        fn = jax.jit(lambda T, p, l, r=r, i=i: pose_optimize(
            T, cam, p, l, rounds=r, iters=i).Tcw)
        region(f"pose_optimize pts+lines ({r}x{i})", fn, (T0, pts, lns))
    fn = jax.jit(lambda T, p, l: pose_optimize(
        T, cam, p, LineObs.empty(1), rounds=4, iters=6).Tcw)
    region("pose_optimize pts only (4x6)", fn, (T0, pts, lns))

    # Match stages at headline shapes.
    from splslam_tpu.slam import tracking as TK
    from splslam_tpu.ops import match as M

    bits_last = jnp.asarray(
        rng.integers(0, 2, size=(N, 256)).astype(np.float32) * 2 - 1,
        jnp.bfloat16)
    bits_cur = jnp.asarray(
        rng.integers(0, 2, size=(N, 256)).astype(np.float32) * 2 - 1,
        jnp.bfloat16)
    fn = jax.jit(lambda a, b: M.hamming_from_bits(a, b))
    region("hamming bitplanes [1000x1000]", fn, (bits_last, bits_cur))
    desc_win = jnp.asarray(
        rng.integers(0, 2 ** 32, size=(M_LOCAL, 8), dtype=np.uint32))
    fn = jax.jit(lambda a, b: M.hamming_mixed(a, b))
    region("hamming mixed [1000x2048] (unpack win)", fn,
           (bits_cur, desc_win))

    # nn_match + masks at motion-model shapes (the non-matmul tail).
    dist = jnp.asarray(rng.integers(0, 256, size=(N, N)), jnp.int32)
    fn = jax.jit(lambda d: M.nn_match(d, max_dist=M.TH_HIGH)[0])
    region("nn_match [1000x1000]", fn, (dist,))
    dist2 = jnp.asarray(rng.integers(0, 256, size=(M_LOCAL, N)), jnp.int32)
    fn = jax.jit(lambda d: M.nn_match(d, max_dist=M.TH_HIGH, ratio=0.8)[0])
    region("nn_match+ratio [2048x1000]", fn, (dist2,))

    print("(full track_step timed inside bench_mono; stages above are "
          "the additive budget)")


if __name__ == "__main__":
    main()
