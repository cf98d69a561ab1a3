"""KITTI stereo driver (reference Examples/Stereo/stereo_kitti.cc)."""

import sys

from splslam_tpu.examples._common import run_sequence
from splslam_tpu.io.config import load_settings
from splslam_tpu.io.datasets import imread_gray, load_kitti_stereo
from splslam_tpu.slam.system import Sensor, System


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) < 2:
        print("usage: stereo_kitti <settings.yaml> <sequence_dir> [out.txt]")
        return 1
    st, _ = load_settings(argv[0])
    left, right, ts = load_kitti_stereo(argv[1])
    sysm = System(st, Sensor.STEREO)
    feed = (
        (lambda l=l, r=r, t=t: sysm.track_stereo(
            imread_gray(l), imread_gray(r), t))
        for l, r, t in zip(left, right, ts)
    )
    run_sequence(sysm, feed, len(ts))
    sysm.save_trajectory_kitti(argv[2] if len(argv) > 2 else "CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
