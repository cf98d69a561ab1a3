"""Native C++ prefetching dataloader tests (native/dataloader.cpp via
splslam_tpu.io.native)."""

import os

import numpy as np
import pytest

from splslam_tpu.io.native import PrefetchLoader, _load_lib


def _write_pngs(tmp_path, n=6, w=64, h=48):
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = rng.integers(0, 255, (h, w), dtype=np.uint8)
        p = str(tmp_path / f"{i:06d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert _load_lib() is not None


def test_prefetch_matches_cv2(tmp_path):
    import cv2

    paths = _write_pngs(tmp_path)
    with PrefetchLoader(paths, 64, 48, lookahead=3, n_threads=2) as dl:
        for i in range(len(paths)):
            native = dl[i]
            ref = cv2.imread(paths[i], cv2.IMREAD_GRAYSCALE)
            np.testing.assert_array_equal(native, ref)


def test_prefetch_pgm(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
    p = str(tmp_path / "img.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# comment\n64 48\n255\n")
        f.write(img.tobytes())
    with PrefetchLoader([p], 64, 48) as dl:
        np.testing.assert_array_equal(dl[0], img)


def test_prefetch_out_of_order_and_missing(tmp_path):
    paths = _write_pngs(tmp_path, n=4)
    with PrefetchLoader(paths, 64, 48) as dl:
        a = dl[3]
        b = dl[0]
        assert a.shape == b.shape == (48, 64)
    # missing file falls back / raises cleanly
    with PrefetchLoader([str(tmp_path / "nope.png")], 64, 48) as dl:
        with pytest.raises(Exception):
            dl[0]
