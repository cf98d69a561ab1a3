"""TUM monocular driver (reference Examples/Monocular/mono_tum.cc)."""

import sys

from splslam_tpu.examples._common import run_sequence
from splslam_tpu.io.config import load_settings
from splslam_tpu.io.datasets import imread_gray, load_tum_mono
from splslam_tpu.slam.system import Sensor, System


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) < 2:
        print("usage: mono_tum <settings.yaml> <sequence_dir> [out.txt]")
        return 1
    st, _ = load_settings(argv[0])
    rgb, ts = load_tum_mono(argv[1])
    sysm = System(st, Sensor.MONOCULAR)
    feed = (
        (lambda p=p, t=t: sysm.track_mono(imread_gray(p), t))
        for p, t in zip(rgb, ts)
    )
    run_sequence(sysm, feed, len(ts))
    sysm.save_trajectory_tum(argv[2] if len(argv) > 2 else "KeyFrameTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
