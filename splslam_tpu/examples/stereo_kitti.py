"""KITTI stereo driver (reference Examples/Stereo/stereo_kitti.cc)."""

import sys

from splslam_tpu.examples._common import run_sequence
from splslam_tpu.io.config import load_settings
from splslam_tpu.io.datasets import load_kitti_stereo
from splslam_tpu.io.native import PrefetchLoader
from splslam_tpu.slam.system import Sensor, System


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) < 2:
        print("usage: stereo_kitti <settings.yaml> <sequence_dir> [out.txt]")
        return 1
    st, _ = load_settings(argv[0])
    left, right, ts = load_kitti_stereo(argv[1])
    sysm = System(st, Sensor.STEREO)
    # Native prefetcher: the C++ pool decodes frames i+1.. while the
    # device tracks frame i (native/dataloader.cpp).
    dl_l = PrefetchLoader(left, st.width, st.height)
    dl_r = PrefetchLoader(right, st.width, st.height)
    feed = (
        (lambda i=i, t=t: sysm.track_stereo(dl_l[i], dl_r[i], t))
        for i, t in enumerate(ts)
    )
    run_sequence(sysm, feed, len(ts))
    dl_l.close(); dl_r.close()
    sysm.save_trajectory_kitti(argv[2] if len(argv) > 2 else "CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
