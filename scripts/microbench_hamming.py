"""Pin down the Hamming-matmul device cost: chained scans inside ONE
jit (no dispatch in the measured region) vs dispatch-per-call."""

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

ITERS = 2000


def chained(name, body, x0):
    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), None
        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    out = run(x0)
    np.asarray(jax.tree.leaves(out)[0][:1])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x0)
        np.asarray(jax.tree.leaves(out)[0][:1])
        ms = (time.perf_counter() - t0) * 1000.0 / ITERS
        best = ms if best is None else min(best, ms)
    print(f"{name:56s} {best:8.4f} ms/iter (chained x{ITERS})")
    return best


def main() -> None:
    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.integers(0, 2, (1000, 256)) * 2 - 1, jnp.bfloat16)
    b2 = jnp.asarray(rng.integers(0, 2, (1000, 256)) * 2 - 1, jnp.bfloat16)
    d2 = jnp.asarray(rng.integers(0, 2 ** 32, (2048, 8), dtype=np.uint32))

    def ham(b):
        dot = jax.lax.dot_general(
            b, b2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = ((256.0 - dot) * 0.5)
        # feed something back so the chain has a data dependency
        return b + (h[:, :1] * 0).astype(jnp.bfloat16)

    chained("bf16 [1000,256]x[256,1000] matmul + affine", ham, b1)

    def ham_i32(b):
        dot = jax.lax.dot_general(
            b, b2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = ((256.0 - dot) * 0.5).astype(jnp.int32)
        return b + (h[:, :1] * 0).astype(jnp.bfloat16)

    chained("same + astype(int32)", ham_i32, b1)

    from splslam_tpu.ops.match import unpack_bits

    def unp(d):
        b = unpack_bits(d).astype(jnp.bfloat16) * 2 - 1
        return d + (b[:1, :8] * 0).astype(jnp.uint32).sum()

    chained("unpack_bits [2048,8]->[2048,256] + bf16", unp, d2)

    def big(b):
        bw = unpack_bits(d2).astype(jnp.bfloat16) * 2 - 1
        dot = jax.lax.dot_general(
            b, bw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return b + (dot[:, :1] * 0).astype(jnp.bfloat16)

    chained("unpack + bf16 [1000,256]x[256,2048]", big, b1)

    # control: a fat MXU matmul for scale
    a = jnp.asarray(rng.normal(size=(1024, 1024)), jnp.bfloat16)

    def fat(x):
        return (x @ a) * (1.0 / 32.0)

    chained("bf16 [1024,1024]^2 matmul (control)", fat, a)


if __name__ == "__main__":
    main()
