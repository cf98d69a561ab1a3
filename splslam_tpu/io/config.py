"""Reference-compatible YAML settings loader.

Reads the reference's exact config files (Examples/*/ *.yaml, written for
cv::FileStorage — `%YAML:1.0` directive, flat dotted keys, optional
`!!opencv-matrix` nodes) and produces a `Settings` (SURVEY §2.3 key list;
consumed by the reference at src/Tracking.cc:57-265 and src/System.cc:51).

Key coverage (tests/test_config.py::test_bundled_yaml_keys_all_consumed
enumerates every key in every bundled YAML against this contract):

- CONSUMED: Camera.*, ThDepth, DepthMapFactor, ORBextractor.*,
  System.usingLine, System.usingLsdFeature, Lineextractor.nFeatures,
  Lineextractor.nLevels, Lineextractor.min_line_length_ratio;
  LEFT.*/RIGHT.* stay in the raw dict for the EuRoC stereo driver's
  rectification maps (examples/stereo_euroc.py, reference
  stereo_euroc.cc:71-115).
- N/A (documented, intentionally unread): the remaining Lineextractor.*
  knobs are INTERNAL tuning parameters of the reference's two vendored
  detectors and have no counterpart in the TPU detector's algorithm —
  LSD options `refine, scale, sigma_scale, quant, ang_th, log_eps,
  density_th, n_bins` (LSDDetectorC, Thirdparty/line_descriptor) and
  FLD options `threshold_length, threshold_dist, canny_th1, canny_th2,
  canny_aperture_size, do_merge` (src/Lineextractor.cc:242-441). The
  TPU detector (ops/lines.py) replaces both algorithms with a
  gradient-ridge march whose own thresholds are fixed by the measured
  repeatability gates; its selectable knobs are exactly the three the
  reference exposes at the Tracking level (backend, octaves, minimum
  length). `Camera.RGB` is consumed but a no-op for grayscale inputs.
"""

from __future__ import annotations

import re

import numpy as np
import yaml


def _load_cv_yaml(path: str) -> dict:
    """Parse a cv::FileStorage YAML file into a plain dict."""
    with open(path) as f:
        text = f.read()
    # strip the %YAML directive and the opencv-matrix tags pyyaml rejects
    text = re.sub(r"^%YAML:.*$", "", text, flags=re.M)
    text = text.replace("!!opencv-matrix", "")
    data = yaml.safe_load(text) or {}
    out = {}
    for k, v in data.items():
        if isinstance(v, dict) and {"rows", "cols", "data"} <= set(v):
            out[k] = np.array(v["data"], np.float64).reshape(
                int(v["rows"]), int(v["cols"])
            )
        else:
            out[k] = v
    return out


def load_settings(path: str, **overrides):
    """Reference YAML -> Settings. Unknown keys are kept in the returned
    raw dict for driver-specific use (e.g. EuRoC LEFT/RIGHT rectification).
    Returns (settings, raw_dict)."""
    from splslam_tpu.slam.system import Settings

    raw = _load_cv_yaml(path)
    g = raw.get

    def num(key, default):
        v = g(key)
        return default if v is None else float(v)

    width = int(num("Camera.width", overrides.pop("width", 640)))
    height = int(num("Camera.height", overrides.pop("height", 480)))
    st = Settings(
        fx=num("Camera.fx", 500.0),
        fy=num("Camera.fy", 500.0),
        cx=num("Camera.cx", width / 2),
        cy=num("Camera.cy", height / 2),
        k1=num("Camera.k1", 0.0),
        k2=num("Camera.k2", 0.0),
        p1=num("Camera.p1", 0.0),
        p2=num("Camera.p2", 0.0),
        k3=num("Camera.k3", 0.0),
        bf=num("Camera.bf", 0.0),
        fps=num("Camera.fps", 30.0),
        width=width,
        height=height,
        rgb=int(num("Camera.RGB", 1)),
        th_depth=num("ThDepth", 35.0),
        # reference: mDepthMapFactor = 1/DepthMapFactor (Tracking.cc:259)
        depth_map_factor=(
            1.0 / num("DepthMapFactor", 1.0)
            if abs(num("DepthMapFactor", 1.0)) > 1e-5 else 1.0
        ),
        n_features=int(num("ORBextractor.nFeatures", 1000)),
        scale_factor=num("ORBextractor.scaleFactor", 1.2),
        n_levels=int(num("ORBextractor.nLevels", 8)),
        ini_th_fast=num("ORBextractor.iniThFAST", 20.0),
        min_th_fast=num("ORBextractor.minThFAST", 7.0),
        using_line=bool(int(num("System.usingLine", 0))),
        line_features=int(num("Lineextractor.nFeatures", 128)),
        # System.usingLsdFeature selects LSD vs FLD in the reference
        # (src/Tracking.cc:143-157); here it selects the detector
        # backend ("grow" = LSD-analog, "fld" = Canny-NMS-seeded).
        using_lsd=bool(int(num("System.usingLsdFeature", 1))),
        line_n_levels=int(num("Lineextractor.nLevels", 2)),
        line_min_length_ratio=num("Lineextractor.min_line_length_ratio", 0.0),
    )
    for k, v in overrides.items():
        setattr(st, k, v)
    return st, raw
