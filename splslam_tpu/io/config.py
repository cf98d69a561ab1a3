"""Reference-compatible YAML settings loader.

Reads the reference's exact config files (Examples/*/ *.yaml, written for
cv::FileStorage — `%YAML:1.0` directive, flat dotted keys, optional
`!!opencv-matrix` nodes) and produces a `Settings` (SURVEY §2.3 key list;
consumed by the reference at src/Tracking.cc:57-265 and src/System.cc:51).
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
    )
    for k, v in overrides.items():
        setattr(st, k, v)
    return st, raw
