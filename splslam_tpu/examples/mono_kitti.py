"""KITTI monocular driver (reference Examples/Monocular/mono_kitti.cc)."""

import sys

from splslam_tpu.examples._common import run_sequence
from splslam_tpu.io.config import load_settings
from splslam_tpu.io.datasets import load_kitti_mono
from splslam_tpu.io.native import PrefetchLoader
from splslam_tpu.slam.system import Sensor, System


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) < 2:
        print("usage: mono_kitti <settings.yaml> <sequence_dir> [out.txt]")
        return 1
    st, _ = load_settings(argv[0])
    imgs, ts = load_kitti_mono(argv[1])
    sysm = System(st, Sensor.MONOCULAR)
    dl = PrefetchLoader(imgs, st.width, st.height)
    feed = (
        (lambda i=i, t=t: sysm.track_mono(dl[i], t))
        for i, t in enumerate(ts)
    )
    run_sequence(sysm, feed, len(ts))
    dl.close()
    # evo-compatible KITTI-mono export (reference SaveTrajectoryKITTIMono,
    # src/System.cc:492)
    sysm.save_trajectory_kitti_mono(
        argv[2] if len(argv) > 2 else "CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
