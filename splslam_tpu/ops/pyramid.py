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


def resize_bilinear(image: jax.Array, hw_out: tuple[int, int]) -> jax.Array:
    """Separable bilinear resize with STATIC index constants.

    Equivalent to the reference's cv::resize INTER_LINEAR
    (src/ORBextractor.cc:1107 ComputePyramid). Deliberately NOT
    jax.image.resize: that lowers to dot_generals whose chosen layout
    flips the whole downstream image chain to column-major, forcing a
    ~13 ms relayout copy in front of the Pallas patch kernel (measured
    on v5e; see NOTES.md round 2). Two static-index row/column gathers +
    lerps keep everything row-major."""
    Hi, Wi = image.shape
    Ho, Wo = hw_out
    import numpy as np

    ys = (np.arange(Ho) + 0.5) * (Hi / Ho) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int32), 0, Hi - 2)
    fy = jnp.asarray((ys - y0).astype(np.float32))[:, None]
    tmp = image[jnp.asarray(y0)] * (1 - fy) + image[jnp.asarray(y0 + 1)] * fy
    xs = (np.arange(Wo) + 0.5) * (Wi / Wo) - 0.5
    x0 = np.clip(np.floor(xs).astype(np.int32), 0, Wi - 2)
    fx = jnp.asarray((xs - x0).astype(np.float32))[None, :]
    return tmp[:, jnp.asarray(x0)] * (1 - fx) + tmp[:, jnp.asarray(x0 + 1)] * fx


def build_pyramid(image: jax.Array, spec: PyramidSpec) -> list[jax.Array]:
    """Grayscale image (H,W) f32 -> list of per-level images.

    Bilinear downsampling, each level resized from the previous (as the
    reference does, src/ORBextractor.cc:1107)."""
    levels = [image]
    cur = image
    for lv in range(1, spec.n_levels):
        cur = resize_bilinear(cur, spec.sizes[lv])
        levels.append(cur)
    return levels


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(image: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur (the reference blurs with 7x7 sigma=2 before
    computing descriptors, src/ORBextractor.cc:1086).

    Shift-and-add formulation: single-channel conv_general_dilated wastes
    the MXU's channel lanes (measured 2.7 ms vs 1.0 ms for one KITTI
    level on v5e) and, like jax.image.resize, can flip layouts. Static
    dynamic_slices fuse into a handful of VPU passes."""
    import numpy as np

    k = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    H, W = image.shape
    taps = 2 * radius + 1
    p = jnp.pad(image, ((radius, radius), (0, 0)))
    out = sum(
        float(k[i]) * jax.lax.dynamic_slice(p, (i, 0), (H, W))
        for i in range(taps)
    )
    p = jnp.pad(out, ((0, 0), (radius, radius)))
    return sum(
        float(k[i]) * jax.lax.dynamic_slice(p, (0, i), (H, W))
        for i in range(taps)
    )
