"""Profile the mono+line frame program's component costs on the chip.

Whole-region wall protocol (CLAUDE.md): N dispatches of each jitted
component over pre-staged frames, one drain, divide. Run with an idle
host — dispatch is host-threaded and a loaded host inflates the wall.

Rows: extract_orb / extract_lines / build_frame_mono (fused) /
tracking program (build excluded) — the split that decides where the
TUM mono+line headline (reference 41.54 ms, bench_mono.py) goes next.
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
from splslam_tpu.ops.lines import extract_lines
from splslam_tpu.ops.orb import extract_orb
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.geometry.camera import Camera
from splslam_tpu.slam.frame import build_frame_mono

N = 48
W, H = 640, 480


def region(name, fn, args_list):
    out = fn(*args_list[0])
    np.asarray(jax.tree.leaves(out)[0])   # block_until_ready does NOT
    #                                       block over the axon tunnel
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        np.asarray(jax.tree.leaves(outs[-1])[0])   # real drain: D2H of
        #   a buffer produced by the LAST dispatch
        ms = (time.perf_counter() - t0) * 1000.0 / len(args_list)
        best = ms if best is None else min(best, ms)
    print(f"{name:42s} {best:7.2f} ms/img")
    return best


def main() -> None:
    _, _, frames, _ = make_stereo_sequence(
        n_frames=N, width=W, height=H, fx=520.0, motion="oscillate", seed=4,
    )
    imgs = [jax.device_put(jnp.asarray(l, jnp.float32)) for (l, r) in frames]
    jax.block_until_ready(imgs[-1])
    cam = Camera.create(520.0, 520.0, W / 2, H / 2, bf=0.0,
                        width=W, height=H)
    spec = PyramidSpec.create(H, W, n_features=1000, n_levels=8)

    orb = jax.jit(lambda im: extract_orb(im, spec))
    region("extract_orb (1000 feat, 8 levels)", orb,
           [(im,) for im in imgs])

    for octs in (2, 1):
        ln = jax.jit(lambda im, o=octs: extract_lines(
            im, capacity=128, n_octaves=o))
        region(f"extract_lines (grow, {octs} octaves)", ln,
               [(im,) for im in imgs])

    bf = jax.jit(lambda im: build_frame_mono(
        im, cam, spec, with_lines=True, line_capacity=128))
    region("build_frame_mono fused (pts+lines)", bf,
           [(im,) for im in imgs])
    bf0 = jax.jit(lambda im: build_frame_mono(
        im, cam, spec, with_lines=False, line_capacity=1))
    region("build_frame_mono points-only", bf0,
           [(im,) for im in imgs])


if __name__ == "__main__":
    main()
