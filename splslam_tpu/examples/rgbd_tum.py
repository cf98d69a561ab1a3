"""TUM RGB-D driver (reference Examples/RGB-D/rgbd_tum.cc)."""

import sys

from splslam_tpu.examples._common import run_sequence
from splslam_tpu.io.config import load_settings
from splslam_tpu.io.datasets import imread_gray, load_tum_rgbd
from splslam_tpu.slam.system import Sensor, System


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) < 2:
        print("usage: rgbd_tum <settings.yaml> <sequence_dir> [out.txt]")
        return 1
    st, _ = load_settings(argv[0])
    rgb, depth, ts = load_tum_rgbd(argv[1])
    sysm = System(st, Sensor.RGBD)

    def make(p, d, t):
        import cv2

        def step():
            img = imread_gray(p)
            # TUM depth PNGs are uint16 scaled by DepthMapFactor; the
            # pipeline applies settings.depth_map_factor (= 1/5000).
            dep = cv2.imread(d, cv2.IMREAD_UNCHANGED).astype("float32")
            sysm.track_rgbd(img, dep, t)
        return step

    feed = (make(p, d, t) for p, d, t in zip(rgb, depth, ts))
    run_sequence(sysm, feed, len(ts))
    sysm.save_trajectory_tum(argv[2] if len(argv) > 2 else "CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
