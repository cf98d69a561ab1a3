"""Adversarial reloc seeding (VERDICT weak #7): a WRONG EPnL line seed
combined with a permissive point set must not produce a confident wrong
relocalization. Since round 3, points re-enter the joint GN under a line
seed only when they reproject consistently under that seed, so a bad
seed keeps ~zero point support and dies at the >= 50 acceptance gate."""

import numpy as np
import jax
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.io.synth_map import _bits_pm1, _pack_desc
from splslam_tpu.ops.lines import LineFeatures
from splslam_tpu.ops.orb import OrbFeatures
from splslam_tpu.slam.frame import FrameData
from splslam_tpu.slam.reloc import reloc_attempt

FX, CX, CY = 500.0, 320.0, 240.0


def _cam():
    return Camera.create(fx=FX, fy=FX, cx=CX, cy=CY, bf=50.0,
                         width=640, height=480)


def _proj(T, X):
    pc = X @ T[:3, :3].T + T[:3, 3]
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX,
                     FX * pc[:, 1] / pc[:, 2] + CY], -1), pc[:, 2]


def _unproj(T, uv, z):
    """Pixel + depth -> world point under camera pose T (Tcw)."""
    xc = (uv[:, 0] - CX) / FX * z
    yc = (uv[:, 1] - CY) / FX * z
    pc = np.stack([xc, yc, z], -1)
    Twc = np.linalg.inv(T)
    return pc @ Twc[:3, :3].T + Twc[:3, 3]


def test_wrong_line_seed_cannot_fake_a_confident_reloc():
    rng = np.random.default_rng(11)
    N, Lc = 200, 16
    T_gt = np.eye(4, dtype=np.float32)          # true camera at origin
    T_bad = np.eye(4, dtype=np.float32)         # adversarial basin: far away
    T_bad[:3, 3] = (4.0, -2.0, 1.5)
    th = 0.6
    T_bad[:3, :3] = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]], np.float32)

    # --- candidate KF: 10 correct landmarks (EPnP-weak: n0 < 12) ---
    n_match = 10
    lm_xyz = rng.uniform([-2, -1.5, 4], [2, 1.5, 9],
                         (N, 3)).astype(np.float32)
    kf_desc_bits = rng.integers(0, 2, (N, 256)).astype(np.uint8)
    kf_desc = _pack_desc(kf_desc_bits)
    kf_lm = np.arange(N, dtype=np.int32)
    # current frame observes the first n_match landmarks under T_GT
    uv_gt, z_gt = _proj(T_gt, lm_xyz[:n_match])
    f_xy = rng.uniform([0, 0], [640, 480], (N, 2)).astype(np.float32)
    f_xy[:n_match] = uv_gt
    f_bits = rng.integers(0, 2, (N, 256)).astype(np.uint8)
    f_bits[:n_match] = kf_desc_bits[:n_match]   # exact descriptor matches
    f_desc = _pack_desc(f_bits)

    # --- lines: 2D segments in the frame whose matched 3D lines are
    # consistent with T_BAD (a perfectly self-consistent wrong seed) ---
    nl = 10
    mid2d = rng.uniform([60, 60], [580, 420], (nl, 2)).astype(np.float32)
    ang = rng.uniform(0, np.pi, nl)
    half = rng.uniform(20, 50, nl)[:, None] * np.stack(
        [np.cos(ang), np.sin(ang)], -1)
    seg = np.concatenate([mid2d - half, mid2d + half], -1).astype(np.float32)
    zs = rng.uniform(4, 8, nl)
    S3 = _unproj(T_bad, seg[:, :2], zs)
    E3 = _unproj(T_bad, seg[:, 2:4], zs * rng.uniform(0.9, 1.1, nl))
    M3 = 0.5 * (S3 + E3)
    kf_ll_xyz3 = np.zeros((Lc, 3, 3), np.float32)
    kf_ll_xyz3[:nl] = np.stack([S3, M3, E3], 1)
    ldesc_bits = rng.integers(0, 2, (Lc, 256)).astype(np.uint8)
    kf_ldesc = _pack_desc(ldesc_bits)
    kf_ll = np.full((Lc,), -1, np.int32)
    kf_ll[:nl] = np.arange(nl)

    feat = OrbFeatures(
        xy=jnp.asarray(f_xy), response=jnp.zeros((N,)),
        angle=jnp.zeros((N,)), octave=jnp.zeros((N,), jnp.int32),
        sigma2=jnp.ones((N,)), desc=jnp.asarray(f_desc),
        valid=jnp.ones((N,), bool),
        bits=jnp.asarray(_bits_pm1(f_desc), jnp.bfloat16),
    )
    lines = LineFeatures.empty(Lc)
    d = seg[:, 2:4] - seg[:, :2]
    lines = lines._replace(
        seg=jnp.asarray(seg[:Lc] if nl >= Lc else np.pad(
            seg, ((0, Lc - nl), (0, 0)))),
        midpoint=jnp.asarray(np.pad(mid2d, ((0, Lc - nl), (0, 0)))),
        angle=jnp.asarray(np.pad(np.arctan2(d[:, 1], d[:, 0]),
                                 (0, Lc - nl))),
        length=jnp.asarray(np.pad(np.linalg.norm(d, -1)
                                  if d.ndim == 1 else
                                  np.linalg.norm(d, axis=-1),
                                  (0, Lc - nl))),
        desc=jnp.asarray(kf_ldesc),  # identical LBDs so the KNN stage hits
        valid=jnp.asarray(np.arange(Lc) < nl),
    )
    frame = FrameData(
        feat=feat,
        u_right=jnp.full((N,), -1.0),
        depth=jnp.full((N,), -1.0),
        lines=lines,
    )

    T_f, n_f, gid_f, ll_f = reloc_attempt(
        jax.random.PRNGKey(0), _cam(), frame,
        jnp.asarray(kf_desc), jnp.ones((N,), bool), jnp.asarray(kf_lm),
        jnp.asarray(lm_xyz), jnp.asarray(kf_ldesc), jnp.asarray(kf_ll),
        jnp.asarray(kf_ll_xyz3),
    )
    n_f = int(n_f)
    t_err = np.linalg.norm(np.asarray(T_f)[:3, 3] - T_gt[:3, 3])
    # The invariant: NO confident wrong pose. Either the attempt reports
    # too few inliers to pass the reference's >= 50 acceptance gate, or
    # it actually found the true pose.
    assert (n_f < 50) or (t_err < 0.1), (n_f, t_err, np.asarray(T_f))
