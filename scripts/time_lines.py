"""Time ops.lines.extract_lines in isolation on the attached chip.

Whole-region wall protocol (CLAUDE.md: only dispatch->drain timing is
trustworthy over the tunnel): N dispatches of the jitted detector over
pre-staged frames, one final fetch, divide. Run with an idle host —
dispatch is host-threaded and a loaded host inflates the wall.
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

from splslam_tpu.io.synthetic import make_stereo_sequence
from splslam_tpu.ops.lines import extract_lines

N = 48
W, H = 640, 480


def main() -> None:
    _, _, frames, _ = make_stereo_sequence(
        n_frames=N, width=W, height=H, fx=520.0, motion="oscillate", seed=4,
    )
    imgs = [jax.device_put(jnp.asarray(l, jnp.float32)) for (l, r) in frames]

    fn = jax.jit(lambda im: extract_lines(im, capacity=128))
    out = fn(imgs[0])
    np.asarray(out.seg)  # compile + drain

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(im) for im in imgs]
        # Drain = ONE fetch of the LAST dispatch's output: the single
        # device stream executes dispatches in order, so its data
        # dependency covers the whole region. Fetching every output
        # instead would add the ~27 ms RPC floor PER IMAGE to the wall
        # (measured: +27 ms/img on this 48-image loop).
        np.asarray(outs[-1].seg)
        wall = (time.perf_counter() - t0) * 1e3 / N
        best = wall if best is None else min(best, wall)
        print(f"pass: {wall:.2f} ms/img", file=sys.stderr)
    print(f"extract_lines {W}x{H}: {best:.2f} ms/img (best of 3)")


if __name__ == "__main__":
    main()
