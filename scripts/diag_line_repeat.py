"""Diagnose line-detector repeatability misses: for each frame-i line
with no qualifying match in frame i+1, classify WHY (no nearby candidate
at all / angle off / midpoint drift / length instability), and print the
distribution. Drives the same scene as tests/test_line_repeatability.py.

  python scripts/diag_line_repeat.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from splslam_tpu.io.synthetic import PlaneScene, make_grid_texture
from splslam_tpu.ops.lines import extract_lines

W, H, FX = 320, 240, 200.0


def main():
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)
    scene = PlaneScene(make_grid_texture(seed=0), z0=3.0, z1=None)
    cats = {"hit": 0, "len": 0, "drift": 0, "angle": 0, "gone": 0}
    drift_d = []
    len_ratio = []
    for i in range(6):
        C1 = np.eye(4); C1[0, 3] = 0.05 * i
        C2 = np.eye(4); C2[0, 3] = 0.05 * (i + 1); C2[1, 3] = 0.01
        f1 = extract_lines(jnp.asarray(scene.render(K, C1, H, W),
                                       jnp.float32), capacity=64)
        f2 = extract_lines(jnp.asarray(scene.render(K, C2, H, W),
                                       jnp.float32), capacity=64)
        v1 = np.asarray(f1.valid); v2 = np.asarray(f2.valid)
        m1 = np.asarray(f1.midpoint)[v1]; m2 = np.asarray(f2.midpoint)[v2]
        a1 = np.asarray(f1.angle)[v1]; a2 = np.asarray(f2.angle)[v2]
        l1 = np.asarray(f1.length)[v1]; l2 = np.asarray(f2.length)[v2]
        dx = -FX * 0.05 / 3.0; dy = -FX * 0.01 / 3.0
        pred = m1 + np.array([dx, dy])
        for j in range(len(m1)):
            d = np.linalg.norm(m2 - pred[j], axis=-1)
            ang = np.abs(np.angle(np.exp(1j * (a2 - a1[j]))))
            ang = np.minimum(ang, np.pi - ang)
            lgate = np.abs(l2 - l1[j]) < 0.5 * np.maximum(l2, l1[j])
            full = (d < 12.0) & (ang < 0.1) & lgate
            if full.any():
                cats["hit"] += 1
                continue
            # same line by angle+proximity but length unstable?
            near = (d < 12.0) & (ang < 0.1)
            if near.any():
                cats["len"] += 1
                k = int(np.argmin(np.where(near, d, np.inf)))
                len_ratio.append(float(l2[k] / max(l1[j], 1e-6)))
                continue
            wide = (d < 30.0) & (ang < 0.1) & lgate
            if wide.any():
                cats["drift"] += 1
                drift_d.append(float(d[wide].min()))
                continue
            angloose = (d < 12.0) & (ang < 0.25)
            if angloose.any():
                cats["angle"] += 1
                continue
            cats["gone"] += 1
    tot = sum(cats.values())
    print("total frame-i lines:", tot)
    for k, v in cats.items():
        print(f"  {k:6s}: {v:4d}  ({v / tot:.2%})")
    if len_ratio:
        print("  length-fail l2/l1 ratios:",
              np.round(sorted(len_ratio), 2).tolist())
    if drift_d:
        print("  drift distances:", np.round(sorted(drift_d), 1).tolist())


if __name__ == "__main__":
    main()
