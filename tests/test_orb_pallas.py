"""Pallas patch kernel vs XLA fallback equivalence (interpret mode)."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from splslam_tpu.ops.orb_pallas import (
    PATCH,
    patch_orient_describe,
    patch_orient_describe_xla,
)


def test_kernel_matches_xla_fallback():
    rng = np.random.default_rng(0)
    R, Wp = 256, 256
    packed = jnp.asarray(
        rng.uniform(0, 255, (R, Wp)).astype(np.float32)
    ).astype(jnp.bfloat16)  # extract_orb packs the blurred pyramid in bf16
    n = 24
    # the kernel loads (8,128)-aligned windows of (48,168): keep 8 pad
    # rows and 128 pad cols (extract_orb pads the packed pyramid so)
    cy = jnp.asarray(rng.integers(0, R - PATCH - 8, n).astype(np.int32))
    cx = jnp.asarray(rng.integers(0, Wp - PATCH - 128, n).astype(np.int32))
    a1, d1, b1 = patch_orient_describe(packed, cy, cx, interpret=True)
    a2, d2, b2 = patch_orient_describe_xla(packed, cy, cx)
    # the kernel reduces over a 48x40 aligned window, the fallback over the
    # 40x40 patch — float summation order differs at ~1e-5
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-3)
    # bits: identical except where a rotated coordinate rounds across a
    # pixel boundary due to that noise — demand >= 99.5% agreement
    bit1 = np.asarray(b1).astype(np.float32)
    bit2 = np.asarray(b2).astype(np.float32)
    agree = (bit1 == bit2).mean()
    assert agree >= 0.995, agree
