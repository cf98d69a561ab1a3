"""Split the mono+line headline into build vs track cost on the chip.

Times `build_frames_batch_mono` (the headline's 8-frame build dispatch)
standalone over pre-staged batches — whole-region wall (CLAUDE.md), so
the tracking share of bench_mono's headline is (headline - build).
Also times the detector's internal stages at bench shapes.
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

from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.geometry.camera import Camera
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.slam.pipeline import build_frames_batch_mono

W, H = 640, 480
B = 8
NB = 12


def region(name, fn, args_list, n_items):
    out = fn(*args_list[0])
    np.asarray(jax.tree.leaves(out)[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        np.asarray(jax.tree.leaves(outs[-1])[0])
        ms = (time.perf_counter() - t0) * 1000.0 / (len(args_list) * n_items)
        best = ms if best is None else min(best, ms)
    print(f"{name:46s} {best:7.2f} ms/frame")
    return best


def main() -> None:
    _, _, frames, _ = make_stereo_sequence(
        n_frames=B * NB, width=W, height=H, fx=520.0,
        motion="oscillate", seed=4, osc_amp=0.5, texture="grid",
    )
    batches = [
        jax.device_put(np.stack(
            [np.asarray(l) for (l, r) in frames[s:s + B]]).astype(np.uint8))
        for s in range(0, B * NB, B)
    ]
    jax.block_until_ready(batches[-1])
    cam = Camera.create(520.0, 520.0, W / 2, H / 2, bf=0.0,
                        width=W, height=H)
    spec = PyramidSpec.create(H, W, n_features=1000, n_levels=8)

    region("build_frames_batch_mono (pts+lines)",
           lambda b: build_frames_batch_mono(b, cam, spec,
                                             line_capacity=128),
           [(b,) for b in batches], B)
    region("build_frames_batch_mono (points only)",
           lambda b: build_frames_batch_mono(b, cam, spec,
                                             line_capacity=1),
           [(b,) for b in batches], B)

    # Detector internals at bench shapes (single image, amortized over
    # 48 dispatches — relative costs only; absolute carries dispatch).
    from splslam_tpu.ops import lines as L
    imgs = [jax.device_put(jnp.asarray(np.asarray(l), jnp.float32))
            for (l, r) in frames[:48]]
    jax.block_until_ready(imgs[-1])

    def stage_march_only(im):
        gx, gy = L.sobel_gradients(im)
        a, b, ln, ok, cm = L._detect_level(
            im, 16, 24.0, level_cap=256, grads=(gx, gy),
            seed_cap=L.LEVEL_SEED_CAP[0], max_steps=L.LEVEL_MAX_STEPS[0])
        return a

    region("  L0 _detect_level alone", jax.jit(stage_march_only),
           [(im,) for im in imgs], 1)

    def full_no_canon(im):
        # extract_lines with the canonical-support + LBD tail replaced
        # by a cheap reduction: isolates the tail cost.
        f = L.extract_lines(im, capacity=128)
        return f.seg

    region("  extract_lines full", jax.jit(full_no_canon),
           [(im,) for im in imgs], 1)

    def canon_tail(im):
        gx, gy = L.sobel_gradients(im)
        a = jnp.linspace(10, 600, 128)[:, None] * jnp.ones((1, 2))
        b = a + 40.0
        ar, br, ad, bd, uc = L._canonical_support(a, b, gx, gy, W, H, 24.0)
        d = bd - ad
        desc = L.lbd_descriptor(im, gx, gy,
                                jnp.concatenate([ad, bd], -1),
                                jnp.arctan2(d[:, 1], d[:, 0]),
                                jnp.linalg.norm(d, axis=-1))
        return desc

    region("  canonical_support + LBD tail", jax.jit(canon_tail),
           [(im,) for im in imgs], 1)

    def lbd_only(im):
        gx, gy = L.sobel_gradients(im)
        a = jnp.linspace(10, 600, 128)[:, None] * jnp.ones((1, 2))
        b = a + 40.0
        d = b - a
        return L.lbd_descriptor(im, gx, gy, jnp.concatenate([a, b], -1),
                                jnp.arctan2(d[:, 1], d[:, 0]),
                                jnp.linalg.norm(d, axis=-1))

    region("  LBD only", jax.jit(lbd_only), [(im,) for im in imgs], 1)


if __name__ == "__main__":
    main()
