"""Per-frame feature containers and jitted frame builders.

Replaces the reference Frame class (src/Frame.cc, 4 constructors with
point/line std::thread pairs) with fixed-shape struct-of-arrays built by a
single XLA program per sensor type. The reference's dual 64x48 / 16x12
feature grids (include/Frame.h:37-44) are unnecessary: windowed candidate
search is expressed as masks on all-pairs distance matrices instead of
per-cell bucket loops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from splslam_tpu.geometry.camera import Camera, undistort_points
from splslam_tpu.ops.lines import LineFeatures, extract_lines
from splslam_tpu.ops.orb import OrbFeatures, extract_orb
from splslam_tpu.ops.pyramid import PyramidSpec
from splslam_tpu.ops.stereo import depth_from_rgbd, stereo_match


class FrameData(NamedTuple):
    """One frame's device-side state (points; lines optional/empty)."""

    feat: OrbFeatures
    u_right: jax.Array   # [N] refined right-image x, -1 if no stereo match
    depth: jax.Array     # [N] stereo/RGBD depth, -1 if unknown
    lines: LineFeatures  # fixed-capacity line table (mask all-False if unused)

    @property
    def n(self) -> int:
        return self.feat.capacity


@partial(jax.jit, static_argnames=("spec", "undistort", "with_lines",
                                   "line_capacity", "line_cfg"))
def build_frame_mono(
    image: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    undistort: bool = False,
    with_lines: bool = False,
    line_capacity: int = 128,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> FrameData:
    """Monocular frame: ORB (+ optionally line) extraction in one program.

    The reference runs ORB and LSD/LBD in two std::threads
    (src/Frame.cc:299-312); here both are branches of one XLA computation
    and the compiler interleaves them.

    `line_cfg` = (backend, n_octaves, min_length): the detector knobs the
    reference reads from YAML (System.usingLsdFeature selects LSD vs FLD,
    src/Tracking.cc:143-157; Lineextractor.nLevels and
    min_line_length_ratio, src/Tracking.cc:166-265) — threaded from
    io/config.load_settings through slam/system.System.
    """
    feat = extract_orb(image, spec)
    if undistort:
        feat = feat._replace(xy=undistort_points(cam, feat.xy))
    n = feat.capacity
    if with_lines:
        lines = extract_lines(
            image, capacity=line_capacity, backend=line_cfg[0],
            n_octaves=line_cfg[1], min_length=line_cfg[2],
        )
        if undistort:
            p1 = undistort_points(cam, lines.seg[:, :2])
            p2 = undistort_points(cam, lines.seg[:, 2:4])
            lines = lines.with_segments(jnp.concatenate([p1, p2], axis=-1))
    else:
        lines = LineFeatures.empty(line_capacity)
    return FrameData(
        feat=feat,
        u_right=jnp.full((n,), -1.0),
        depth=jnp.full((n,), -1.0),
        lines=lines,
    )


@partial(jax.jit, static_argnames=("spec", "line_capacity", "line_cfg"))
def build_frame_stereo(
    img_left: jax.Array,
    img_right: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    line_capacity: int = 8,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> FrameData:
    """Stereo frame: dual ORB extraction + row-constrained stereo matching
    with subpixel disparity (reference Frame ctor src/Frame.cc:99-155).

    The reference keeps stereo point-only (src/Tracking.cc:321-323, an
    acknowledged "not yet extended" limitation, include/Tracking.h:142);
    here a line_capacity > 1 extracts lines from the left image so the
    point+line pipeline works on every sensor (SURVEY §7 requirement) —
    the default capacity 1 reproduces the reference's envelope."""
    feat_l = extract_orb(img_left, spec)
    feat_r = extract_orb(img_right, spec)
    scales = jnp.array(spec.scales, jnp.float32)
    u_right, depth = stereo_match(
        feat_l, feat_r, img_left, img_right, scales, cam.bf, cam.fx
    )
    if line_capacity > 1:
        lines = extract_lines(
            img_left, capacity=line_capacity, backend=line_cfg[0],
            n_octaves=line_cfg[1], min_length=line_cfg[2],
        )
    else:
        lines = LineFeatures.empty(line_capacity)
    return FrameData(
        feat=feat_l,
        u_right=u_right,
        depth=depth,
        lines=lines,
    )


@partial(jax.jit, static_argnames=("spec", "depth_factor", "line_capacity",
                                   "line_cfg"))
def build_frame_rgbd(
    image: jax.Array,
    depth_map: jax.Array,
    cam: Camera,
    spec: PyramidSpec,
    depth_factor: float = 1.0,
    line_capacity: int = 8,
    line_cfg: tuple = ("grow", 2, 24.0),
) -> FrameData:
    """RGB-D frame (reference Frame ctor src/Frame.cc:157-210); lines
    extracted when line_capacity > 1 (see build_frame_stereo)."""
    feat = extract_orb(image, spec)
    u_right, depth = depth_from_rgbd(feat, depth_map, cam.bf, depth_factor)
    if line_capacity > 1:
        lines = extract_lines(
            image, capacity=line_capacity, backend=line_cfg[0],
            n_octaves=line_cfg[1], min_length=line_cfg[2],
        )
    else:
        lines = LineFeatures.empty(line_capacity)
    return FrameData(
        feat=feat,
        u_right=u_right,
        depth=depth,
        lines=lines,
    )
