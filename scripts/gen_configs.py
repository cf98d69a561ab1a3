"""Generate the bundled per-dataset settings files.

The reference ships 13 hand-written cv::FileStorage YAMLs
(Examples/{Monocular,Stereo,RGB-D}/*.yaml + config/mynteye_*.yaml,
SURVEY §2.3); this script regenerates our equivalents under
splslam_tpu/examples/configs/ from one table of public dataset
calibrations, in the same key dialect our io/config.py loader (and the
reference's cv::FileStorage) reads. Regenerate after changing defaults:

    python scripts/gen_configs.py
"""
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "splslam_tpu",
                    "examples", "configs")

# LSD/FLD detector parameters shared by every point+line config
# (reference Lineextractor key list, consumed at src/Tracking.cc:190-265).
LINE_COMMON = {
    "Lineextractor.nLevels": 2,
    "Lineextractor.refine": 0,
    "Lineextractor.scale": 1.1,
    "Lineextractor.sigma_scale": 0.6,
    "Lineextractor.quant": 2.2,
    "Lineextractor.ang_th": 12.5,
    "Lineextractor.log_eps": 1.0,
    "Lineextractor.density_th": 0.6,
    "Lineextractor.n_bins": 1024,
    "Lineextractor.min_line_length_ratio": 0.02,
    "Lineextractor.threshold_length": 15,
    "Lineextractor.threshold_dist": 1.732,
    "Lineextractor.canny_th1": 50.0,
    "Lineextractor.canny_th2": 100.0,
    "Lineextractor.canny_aperture_size": 3,
    "Lineextractor.do_merge": 0,
}


def orb(n):
    return {
        "ORBextractor.nFeatures": n,
        "ORBextractor.scaleFactor": 1.2,
        "ORBextractor.nLevels": 8,
        "ORBextractor.iniThFAST": 20,
        "ORBextractor.minThFAST": 7,
    }


def cam(fx, fy, cx, cy, w, h, fps, k1=0.0, k2=0.0, p1=0.0, p2=0.0,
        k3=None, rgb=1):
    d = {
        "Camera.fx": fx, "Camera.fy": fy, "Camera.cx": cx, "Camera.cy": cy,
        "Camera.k1": k1, "Camera.k2": k2, "Camera.p1": p1, "Camera.p2": p2,
    }
    if k3 is not None:
        d["Camera.k3"] = k3
    d.update({
        "Camera.width": w, "Camera.height": h,
        "Camera.fps": fps, "Camera.RGB": rgb,
    })
    return d


def lines(n):
    d = {"System.usingLine": 1, "System.usingLsdFeature": 1,
         "Lineextractor.nFeatures": n}
    d.update(LINE_COMMON)
    return d


# -- public dataset calibrations (TUM RGB-D / KITTI odometry / EuRoC MAV;
#    same constants the reference configs carry) ------------------------
TUM = {
    1: cam(517.306408, 516.469215, 318.643040, 255.313989, 640, 480, 30.0,
           k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628,
           k3=1.163314),
    2: cam(520.908620, 521.007327, 325.141442, 249.701764, 640, 480, 30.0,
           k1=0.231222, k2=-0.784899, p1=-0.003257, p2=-0.000105,
           k3=0.917205),
    3: cam(535.4, 539.2, 320.1, 247.6, 640, 480, 30.0),
}
KITTI = {
    "00-02": cam(718.856, 718.856, 607.1928, 185.2157, 1241, 376, 10.0),
    "03": cam(721.5377, 721.5377, 609.5593, 172.854, 1241, 376, 10.0),
    "04-12": cam(707.0912, 707.0912, 601.8873, 183.1104, 1241, 376, 10.0),
}
KITTI_BF = {"00-02": (386.1448, 35), "03": (387.5744, 40),
            "04-12": (379.8145, 40)}
EUROC_MONO = cam(458.654, 457.296, 367.215, 248.375, 752, 480, 20.0,
                 k1=-0.28340811, k2=0.07395907, p1=0.00019359,
                 p2=1.76187114e-05)
EUROC_RECT = cam(435.2046959714599, 435.2046959714599, 367.4517211914062,
                 252.2008514404297, 752, 480, 20.0)

# EuRoC raw-camera rectification inputs (the dataset's own sensor
# calibration; consumed by stereo_euroc's cv-remap-equivalent path)
EUROC_STEREO_RECT = {
    "LEFT.height": 480, "LEFT.width": 752,
    "LEFT.D": [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0],
    "LEFT.K": [458.654, 0.0, 367.215, 0.0, 457.296, 248.375,
               0.0, 0.0, 1.0],
    "LEFT.R": [0.999966347530033, -0.001422739138722922,
               0.008079580483432283, 0.001365741834644127,
               0.9999741760894847, 0.007055629199258132,
               -0.008089410156878961, -0.007044357138835809,
               0.9999424675829176],
    "LEFT.P": [435.2046959714599, 0.0, 367.4517211914062, 0.0,
               0.0, 435.2046959714599, 252.2008514404297, 0.0,
               0.0, 0.0, 1.0, 0.0],
    "RIGHT.height": 480, "RIGHT.width": 752,
    "RIGHT.D": [-0.28368365, 0.07451284, -0.00010473, -3.555907e-05, 0.0],
    "RIGHT.K": [457.587, 0.0, 379.999, 0.0, 456.134, 255.238,
                0.0, 0.0, 1.0],
    "RIGHT.R": [0.9999633526194376, -0.003625811871560086,
                0.007755443660172947, 0.003680398547259526,
                0.9999684752771629, -0.007035845251224894,
                -0.007729688520722713, 0.007064130529506649,
                0.999945173484644],
    "RIGHT.P": [435.2046959714599, 0.0, 367.4517211914062,
                -47.90639384423901, 0.0, 435.2046959714599,
                252.2008514404297, 0.0, 0.0, 0.0, 1.0, 0.0],
}
MYNT_MONO = cam(358.47442850029023, 359.52665535350462, 388.40661559633401,
                254.76941553631312, 752, 480, 20.0,
                k1=-0.30825216120347504, k2=0.084251305214302186,
                p1=-1.5009319710179576e-04, p2=2.0170689406091280e-04)
MYNT_STEREO = cam(332.97713134460906, 332.97713134460906, 398.9270935058594,
                  252.28187370300293, 752, 480, 30.0)


def emit(relpath: str, title: str, *blocks: dict):
    merged = {}
    for b in blocks:
        merged.update(b)
    path = os.path.join(ROOT, relpath)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        f.write(f"# {title}\n")
        f.write("# Generated by scripts/gen_configs.py — edit that "
                "table, not this file.\n")
        last_prefix = None
        for k, v in merged.items():
            prefix = k.split(".")[0]
            if prefix != last_prefix:
                f.write("\n")
                last_prefix = prefix
            if isinstance(v, list):
                # cv::FileStorage matrix node (io/config.py parses these)
                rows, cols = (3, 4) if len(v) == 12 else \
                    (3, 3) if len(v) == 9 else (1, len(v))
                f.write(f"{k}: !!opencv-matrix\n")
                f.write(f"   rows: {rows}\n   cols: {cols}\n   dt: d\n")
                f.write(f"   data: {v}\n")
            else:
                f.write(f"{k}: {v}\n")
    print(f"wrote {os.path.relpath(path, ROOT)}")


def main():
    # Monocular (the reference's point+line flagship modality; KITTI03
    # stays point-only, matching the reference's envelope)
    for i in (1, 2, 3):
        emit(f"Monocular/TUM{i}.yaml",
             f"TUM RGB-D freiburg{i} — monocular point+line",
             TUM[i], orb(1000), lines(600 if i < 3 else 200))
    for seq in ("00-02", "04-12"):
        emit(f"Monocular/KITTI{seq}.yaml",
             f"KITTI odometry {seq} — monocular point+line",
             KITTI[seq], orb(2000), lines(800))
    emit("Monocular/KITTI03.yaml",
         "KITTI odometry 03 — monocular (points only)",
         KITTI["03"], orb(2000))
    emit("Monocular/EuRoC.yaml", "EuRoC MAV cam0 — monocular point+line",
         EUROC_MONO, orb(1000), lines(200))

    # Stereo (reference envelope: point-only — src/Tracking.cc:321-323)
    for seq, (bf, thd) in KITTI_BF.items():
        emit(f"Stereo/KITTI{seq}.yaml",
             f"KITTI odometry {seq} — stereo",
             KITTI[seq], {"Camera.bf": bf, "ThDepth": thd}, orb(2000))
    emit("Stereo/EuRoC.yaml", "EuRoC MAV — stereo (with rectification)",
         EUROC_RECT, {"Camera.bf": 47.90639384423901, "ThDepth": 35},
         EUROC_STEREO_RECT, orb(1200))

    # RGB-D
    for i, dmf in ((1, 5000.0), (2, 5208.0), (3, 5000.0)):
        emit(f"RGB-D/TUM{i}.yaml", f"TUM RGB-D freiburg{i} — RGB-D",
             TUM[i], {"Camera.bf": 40.0, "ThDepth": 40.0,
                      "DepthMapFactor": dmf}, orb(1000))

    # Live MYNT-EYE camera (examples/stereo_mynt.py)
    emit("mynteye_mono.yaml", "MYNT-EYE — monocular",
         MYNT_MONO, {"Camera.bf": 43.0799, "ThDepth": 35}, orb(1000))
    emit("mynteye_stereo.yaml", "MYNT-EYE — stereo (rectified)",
         MYNT_STEREO, {"Camera.bf": 47.90639384423901, "ThDepth": 35},
         orb(1200))


if __name__ == "__main__":
    main()
