"""EuRoC stereo driver with rectification (reference
Examples/Stereo/stereo_euroc.cc: cv::initUndistortRectifyMap + remap)."""

import sys

from splslam_tpu.examples._common import run_sequence
from splslam_tpu.io.config import load_settings
from splslam_tpu.io.datasets import (
    euroc_rectify_maps,
    imread_gray,
    load_euroc,
    rectify,
)
from splslam_tpu.slam.system import Sensor, System


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) < 2:
        print("usage: stereo_euroc <settings.yaml> <sequence_dir> [out.txt]")
        return 1
    st, raw = load_settings(argv[0])
    left, right, ts = load_euroc(argv[1])
    map_l, map_r = euroc_rectify_maps(raw)
    sysm = System(st, Sensor.STEREO)

    def make(l, r, t):
        def step():
            sysm.track_stereo(
                rectify(imread_gray(l), map_l),
                rectify(imread_gray(r), map_r), t,
            )
        return step

    feed = (make(l, r, t) for l, r, t in zip(left, right, ts))
    run_sequence(sysm, feed, len(ts))
    sysm.save_trajectory_tum(argv[2] if len(argv) > 2 else "CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
