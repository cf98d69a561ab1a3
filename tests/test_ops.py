"""Tests for feature extraction, matching and stereo kernels on synthetic
images with known ground truth."""

import jax.numpy as jnp
import numpy as np

from splslam_tpu.ops.fast import fast_corners, fast_score_map
from splslam_tpu.ops.match import (
    hamming_matrix_mxu,
    hamming_matrix_xor,
    masked_distances,
    nn_match,
    rotation_consistency,
    window_mask,
)
from splslam_tpu.ops.orb import extract_orb
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.ops.stereo import bilinear_sample, masked_median, stereo_match

rng = np.random.default_rng(42)


def smooth_texture(h, w, seed=0, sigma=1.5):
    """Random smooth grayscale texture in [0,255] with plenty of corners."""
    r = np.random.default_rng(seed)
    img = r.uniform(0, 1, size=(h // 4, w // 4))
    img = np.kron(img, np.ones((4, 4)))  # blocky => strong corners
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, sigma)
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255.0
    return img.astype(np.float32)


class TestFast:
    def test_square_corners_detected(self):
        img = np.zeros((64, 64), np.float32)
        img[20:40, 20:40] = 200.0
        score = np.array(fast_score_map(jnp.array(img), 20.0))
        # Flat interior and exterior: no response.
        assert score[30, 30] == 0.0
        assert score[5, 5] == 0.0
        # Some response near each of the 4 corners of the square.
        for cy, cx in [(20, 20), (20, 39), (39, 20), (39, 39)]:
            assert score[cy - 3 : cy + 4, cx - 3 : cx + 4].max() > 0.0

    def test_edges_not_corners(self):
        img = np.zeros((64, 64), np.float32)
        img[:, 32:] = 200.0  # vertical step edge
        score = np.array(fast_score_map(jnp.array(img), 20.0))
        # Middle of the edge (away from image border effects) is not a corner.
        assert score[20:44, 28:36].max() == 0.0

    def test_nms_keeps_single_peak(self):
        img = np.zeros((64, 64), np.float32)
        img[20:40, 20:40] = 200.0
        s = np.array(fast_corners(jnp.array(img), 20.0))
        # NMS output is sparser than raw score map.
        raw = np.array(fast_score_map(jnp.array(img), 20.0))
        assert (s > 0).sum() <= (raw > 0).sum()
        assert (s > 0).sum() >= 4


class TestHamming:
    def test_xor_vs_mxu_agree(self):
        d1 = jnp.array(rng.integers(0, 2**32, size=(33, 8), dtype=np.uint32))
        d2 = jnp.array(rng.integers(0, 2**32, size=(47, 8), dtype=np.uint32))
        a = np.array(hamming_matrix_xor(d1, d2))
        b = np.array(hamming_matrix_mxu(d1, d2))
        np.testing.assert_array_equal(a, b)

    def test_self_distance_zero(self):
        d = jnp.array(rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32))
        m = np.array(hamming_matrix_xor(d, d))
        assert np.all(np.diag(m) == 0)

    def test_nn_match_mutual(self):
        d = jnp.array(rng.integers(0, 2**32, size=(20, 8), dtype=np.uint32))
        perm = rng.permutation(20)
        dist = hamming_matrix_xor(d, d[perm])
        ok = jnp.ones(20, bool)
        masked = masked_distances(dist, ok, ok)
        m, md = nn_match(masked, max_dist=0, mutual=True)
        # matches invert the permutation
        assert np.array_equal(np.array(m), np.argsort(perm))

    def test_window_mask(self):
        pred = jnp.array([[10.0, 10.0]])
        xy = jnp.array([[12.0, 9.0], [20.0, 10.0]])
        m = np.array(window_mask(pred, xy, 3.0))
        assert m[0, 0] and not m[0, 1]

    def test_rotation_consistency_rejects_outliers(self):
        n = 100
        a1 = jnp.zeros(n)
        a2 = np.zeros(n, np.float32)
        a2[:90] = 0.1          # dominant rotation
        # scattered outliers, no single bin passes the 0.1*max gate
        a2[90:] = np.linspace(0.5, 6.0, 10)
        matches = jnp.arange(n, dtype=jnp.int32)
        out = np.array(rotation_consistency(a1, jnp.array(a2), matches))
        assert (out[:90] >= 0).all()
        assert (out[90:] == -1).all()


class TestOrbExtraction:
    spec = PyramidSpec.create(192, 256, n_levels=4, n_features=300)

    def test_extract_shapes_and_validity(self):
        img = jnp.array(smooth_texture(192, 256))
        f = extract_orb(img, self.spec)
        n = self.spec.total_capacity
        assert f.xy.shape == (n, 2)
        assert f.desc.shape == (n, 8)
        assert int(f.valid.sum()) > 100
        # All valid keypoints inside the image.
        v = np.array(f.valid)
        xy = np.array(f.xy)[v]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 256).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 192).all()

    def test_match_across_shift(self):
        base = smooth_texture(192, 256, seed=3)
        shift = (4, 7)  # (dy, dx)
        moved = np.roll(np.roll(base, shift[0], axis=0), shift[1], axis=1)
        f1 = extract_orb(jnp.array(base), self.spec)
        f2 = extract_orb(jnp.array(moved), self.spec)
        dist = hamming_matrix_xor(f1.desc, f2.desc)
        masked = masked_distances(dist, f1.valid, f2.valid)
        m, md = nn_match(masked, max_dist=50, mutual=True)
        mi = np.array(m)
        good = mi >= 0
        assert good.sum() > 40
        d_xy = np.array(f2.xy)[mi[good]] - np.array(f1.xy)[good]
        err = np.abs(d_xy - np.array([shift[1], shift[0]]))
        frac_correct = ((err < 2.0).all(axis=1)).mean()
        assert frac_correct > 0.7, frac_correct


class TestStereo:
    def test_constant_disparity(self):
        spec = PyramidSpec.create(192, 256, n_levels=4, n_features=300)
        disp = 8.0
        right = smooth_texture(192, 256, seed=5)
        left = np.roll(right, int(disp), axis=1)  # left shifted right => uL = uR + disp
        fL = extract_orb(jnp.array(left), spec)
        fR = extract_orb(jnp.array(right), spec)
        bf = 40.0
        scales = jnp.array(spec.scales, jnp.float32)
        u_r, depth = stereo_match(fL, fR, jnp.array(left), jnp.array(right),
                                  scales, jnp.float32(bf), jnp.float32(250.0))
        d = np.array(depth)
        ok = d > 0
        assert ok.sum() > 30
        expect = bf / disp
        frac = (np.abs(d[ok] - expect) < 0.5).mean()
        assert frac > 0.8, (frac, np.median(d[ok]))

    def test_bilinear_sample(self):
        img = jnp.array(np.arange(12, dtype=np.float32).reshape(3, 4))
        v = float(bilinear_sample(img, jnp.array([1.5, 0.5])))
        # interpolate between (0,1),(0,2),(1,1),(1,2) = 1,2,5,6 -> 3.5
        assert abs(v - 3.5) < 1e-5

    def test_masked_median(self):
        vals = jnp.array([5.0, 1.0, 3.0, 100.0])
        mask = jnp.array([True, True, True, False])
        assert float(masked_median(vals, mask)) == 3.0
