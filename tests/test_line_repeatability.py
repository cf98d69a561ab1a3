"""Line detection/matching repeatability regression (VERDICT round-2
weak #4): fragment-prone grid scenes must keep a floor on (a) geometric
frame-to-frame re-detection and (b) PRODUCTION matcher re-association.

Round-3 state: collinear-overlap MERGING in the detector (extent union
instead of keep-longest), gradient-magnitude-weighted LBD pooling, and a
line-geometry matcher window (perpendicular distance to the projected 3D
line instead of a midpoint radius) lifted matcher-level re-association
from ~0.29 to ~0.56 row-side / ~0.64 col-side (border-ring suppression
in the detector was an earlier big jump: the four phantom frame-edge
segments collided across frames and stole matches). The late-round-3
descriptor-stability work (finer seeding cell 24->16, level-0 ridge
re-registration, canonical descriptor support, smoothed LBD sampling)
lifted geometric repeatability 0.62 -> 0.70 on this scene. The gates
below hold those with margin so detector/matcher changes cannot
silently regress."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from splslam_tpu.geometry.camera import Camera
from splslam_tpu.io.synthetic import PlaneScene, make_grid_texture
from splslam_tpu.ops.lines import extract_lines
from splslam_tpu.slam.tracking import line_projection_match

W, H, FX = 320, 240, 200.0


def _frames(n=6):
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)
    scene = PlaneScene(make_grid_texture(seed=0), z0=3.0, z1=None)
    out = []
    for i in range(n):
        C1 = np.eye(4)
        C1[0, 3] = 0.05 * i
        C2 = np.eye(4)
        C2[0, 3] = 0.05 * (i + 1)
        C2[1, 3] = 0.01
        T1 = np.linalg.inv(C1).astype(np.float32)
        T2 = np.linalg.inv(C2).astype(np.float32)
        f1 = extract_lines(jnp.asarray(scene.render(K, C1, H, W),
                                       jnp.float32), capacity=64)
        f2 = extract_lines(jnp.asarray(scene.render(K, C2, H, W),
                                       jnp.float32), capacity=64)
        out.append((f1, f2, T1, T2))
    return out


def _unproj_plane(Tc, uv):
    Twc = np.linalg.inv(Tc)
    d = np.stack([(uv[:, 0] - W / 2) / FX, (uv[:, 1] - H / 2) / FX,
                  np.ones(len(uv))], -1)
    dw = d @ Twc[:3, :3].T
    o = Twc[:3, 3]
    t = (3.0 - o[2]) / dw[:, 2]
    return o[None] + dw * t[:, None]


def test_matcher_level_reassociation_floor():
    cam = Camera.create(FX, FX, W / 2, H / 2, bf=24.0, width=W, height=H)
    row_rates, col_rates = [], []
    for f1, f2, T1, T2 in _frames():
        v1 = np.asarray(f1.valid)
        v2 = np.asarray(f2.valid)
        seg1 = np.asarray(f1.seg)
        S = _unproj_plane(T1, seg1[:, :2])
        E = _unproj_plane(T1, seg1[:, 2:4])
        xyz3 = np.stack([S, 0.5 * (S + E), E], 1).astype(np.float32)
        mt, _ = line_projection_match(
            cam, jnp.asarray(T2), f2, jnp.asarray(xyz3), f1.desc,
            jnp.asarray(np.asarray(f1.length)), jnp.asarray(v1),
            jnp.zeros((64,), bool),
        )
        mt = np.asarray(mt)
        a2 = np.asarray(f2.angle)
        m2 = np.asarray(f2.midpoint)
        good, goodcols = 0, set()
        for j in np.nonzero(v1)[0]:
            c = mt[j]
            if c < 0:
                continue
            pc = xyz3[j] @ T2[:3, :3].T + T2[:3, 3]
            uv = np.stack([FX * pc[:, 0] / pc[:, 2] + W / 2,
                           FX * pc[:, 1] / pc[:, 2] + H / 2], -1)
            d2 = uv[2] - uv[0]
            dv = d2 / max(np.linalg.norm(d2), 1e-6)
            nv = np.array([-dv[1], dv[0]])
            perp = abs((m2[c] - uv[1]) @ nv)
            ang = np.abs(np.angle(np.exp(
                1j * (a2[c] - np.arctan2(d2[1], d2[0])))))
            ang = min(ang, np.pi - ang)
            if perp < 8.0 and ang < 0.15:
                good += 1
                goodcols.add(int(c))
        row_rates.append(good / max(v1.sum(), 1))
        col_rates.append(len(goodcols) / max(v2.sum(), 1))
    row, col = float(np.mean(row_rates)), float(np.mean(col_rates))
    print(f"\nmatcher re-association: row-side {row:.3f} col-side {col:.3f}")
    assert row >= 0.50, row
    assert col >= 0.57, col


def test_geometric_repeatability_floor():
    """Fraction of frame-i lines re-detected in frame i+1 (midpoint within
    12 px of the motion-predicted position, angle within 0.1 rad, length
    within 50%)."""
    reps = []
    for f1, f2, T1, T2 in _frames():
        v1 = np.asarray(f1.valid)
        v2 = np.asarray(f2.valid)
        m1 = np.asarray(f1.midpoint)[v1]
        m2 = np.asarray(f2.midpoint)[v2]
        a1 = np.asarray(f1.angle)[v1]
        a2 = np.asarray(f2.angle)[v2]
        l1 = np.asarray(f1.length)[v1]
        l2 = np.asarray(f2.length)[v2]
        dx = -FX * 0.05 / 3.0
        dy = -FX * 0.01 / 3.0
        pred = m1 + np.array([dx, dy])
        hit = 0
        for j in range(len(m1)):
            d = np.linalg.norm(m2 - pred[j], axis=-1)
            ang = np.abs(np.angle(np.exp(1j * (a2 - a1[j]))))
            ang = np.minimum(ang, np.pi - ang)
            ok = (d < 12.0) & (ang < 0.1) \
                & (np.abs(l2 - l1[j]) < 0.5 * np.maximum(l2, l1[j]))
            hit += bool(ok.any())
        reps.append(hit / max(len(m1), 1))
    rep = float(np.mean(reps))
    print(f"\ngeometric repeatability: {rep:.3f}")
    assert rep >= 0.62, rep
