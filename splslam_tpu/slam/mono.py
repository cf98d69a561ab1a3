"""Monocular tracking path (point+line TrackBoth pipeline).

Implements the reference's monocular branch (src/Tracking.cc:360-417
GrabImageMonocular -> Track / TrackBoth): two-view initialization with the
unified point+line-midpoint RANSAC, then per-frame tracking. Built in the
mono/line milestone of this round; see splslam_tpu.slam.initializer.
"""

from __future__ import annotations

import numpy as np


def track_mono(system, frame, ts: float) -> np.ndarray:
    from splslam_tpu.slam.mono_impl import track_mono_impl

    return track_mono_impl(system, frame, ts)
