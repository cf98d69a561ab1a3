"""Image pyramid construction (batched, static shapes).

Replaces ORBextractor::ComputePyramid (reference: src/ORBextractor.cc:1107)
with jax.image.resize per level. Level geometry (sizes, scale factors,
per-level feature budgets) is computed statically from config so every
downstream op has fixed shapes.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PyramidSpec(NamedTuple):
    """Static pyramid geometry for one camera resolution."""

    n_levels: int
    scale_factor: float
    sizes: tuple  # ((H0,W0), (H1,W1), ...)
    scales: tuple  # (1.0, 1.2, 1.44, ...)
    sigma2: tuple  # scale^2 per level
    budgets: tuple  # features to keep per level (sums to >= n_features)

    @staticmethod
    def create(height: int, width: int, n_levels: int = 8,
               scale_factor: float = 1.2, n_features: int = 1000) -> "PyramidSpec":
        sizes, scales = [], []
        for lv in range(n_levels):
            s = scale_factor ** lv
            scales.append(s)
            sizes.append((int(round(height / s)), int(round(width / s))))
        # Geometric feature budget per level, factor 1/scale (reference:
        # src/ORBextractor.cc:410-470).
        inv = 1.0 / scale_factor
        ndesired = n_features * (1 - inv) / (1 - inv ** n_levels)
        budgets, acc = [], 0
        for lv in range(n_levels - 1):
            b = int(round(ndesired * inv ** lv))
            budgets.append(b)
            acc += b
        budgets.append(max(n_features - acc, 0))
        sigma2 = tuple(s * s for s in scales)
        return PyramidSpec(n_levels, scale_factor, tuple(sizes), tuple(scales),
                           sigma2, tuple(budgets))

    @property
    def total_capacity(self) -> int:
        return sum(self.budgets)


def build_pyramid(image: jax.Array, spec: PyramidSpec) -> list[jax.Array]:
    """Grayscale image (H,W) f32 -> list of per-level images.

    Bilinear anti-aliased downsampling; each level resized from the
    previous (as the reference does) to keep the blur cascade.
    """
    levels = [image]
    cur = image
    for lv in range(1, spec.n_levels):
        h, w = spec.sizes[lv]
        cur = jax.image.resize(cur, (h, w), method="bilinear", antialias=True)
        levels.append(cur)
    return levels


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(image: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur (the reference blurs with 7x7 sigma=2 before
    computing descriptors, src/ORBextractor.cc:1086)."""
    k = gaussian_kernel1d(sigma, radius)
    img = image[None, None]  # NCHW
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), [(radius, radius), (0, 0)])
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (radius, radius)])
    return out[0, 0]
