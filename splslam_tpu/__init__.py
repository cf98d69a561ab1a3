"""splslam_tpu — a TPU-native point+line visual SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the SPL-SLAM
reference system (C++/ORB-SLAM2 fork with a line-feature pipeline):

- ORB (FAST + rBRIEF) and line-segment (+LBD) feature extraction as batched
  XLA/Pallas programs over image pyramids resident in HBM.
- Matching as masked Hamming-distance matmuls on the MXU instead of
  per-cell candidate loops.
- Pose-only optimization, local/global bundle adjustment and Sim3 pose
  graphs as batched Gauss-Newton / Levenberg-Marquardt with Schur
  complement solves in pure XLA (replacing g2o).
- Bag-of-words place recognition as dense tree-descent scoring
  (replacing DBoW2).
- RANSAC (homography/fundamental/EPnP/EPnL/Horn-Sim3) vectorized across
  hypotheses with vmap.
- The map as fixed-capacity struct-of-arrays device tables with validity
  masks (replacing the pointer+mutex web).

Public API mirrors the reference `System` facade (reference:
include/System.h:64-128): `System.track_mono / track_stereo / track_rgbd`,
trajectory savers, localization mode, reset.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy to keep `import splslam_tpu.geometry` cheap (no jit warm-up).
    if name in ("System", "Sensor"):
        from splslam_tpu.slam.system import System, Sensor

        return {"System": System, "Sensor": Sensor}[name]
    raise AttributeError(name)
