"""Headless frame overlay + map rendering.

- `draw_frame` re-creates FrameDrawer::DrawFrame(Both) (reference
  src/FrameDrawer.cc:38-129): tracked keypoints as green squares, tracked
  line segments in red, with the status text bar.
- `plot_map` re-creates the MapDrawer content (src/MapDrawer.cc:45-234:
  DrawMapPoints black / reference points red, DrawMapLines, DrawKeyFrames
  frusta, trajectory) as a top-down matplotlib figure saved to disk.
"""

from __future__ import annotations

import numpy as np


def draw_frame(img: np.ndarray, kp_xy: np.ndarray, kp_tracked: np.ndarray,
               lines_seg: np.ndarray | None = None,
               lines_tracked: np.ndarray | None = None,
               state_text: str = "") -> np.ndarray:
    """Grayscale image + feature tables -> BGR overlay image."""
    import cv2

    out = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR)
    for (x, y), ok in zip(kp_xy, kp_tracked):
        if not ok:
            continue
        p1 = (int(x) - 3, int(y) - 3)
        p2 = (int(x) + 3, int(y) + 3)
        cv2.rectangle(out, p1, p2, (0, 255, 0), 1)
        cv2.circle(out, (int(x), int(y)), 1, (0, 255, 0), -1)
    if lines_seg is not None and lines_tracked is not None:
        for (sx, sy, ex, ey), ok in zip(lines_seg, lines_tracked):
            if not ok:
                continue
            cv2.line(out, (int(sx), int(sy)), (int(ex), int(ey)),
                     (0, 0, 255), 2)
    if state_text:
        h = out.shape[0]
        cv2.rectangle(out, (0, h - 22), (out.shape[1], h), (0, 0, 0), -1)
        cv2.putText(out, state_text, (6, h - 6), cv2.FONT_HERSHEY_PLAIN,
                    1.0, (255, 255, 255), 1)
    return out


def render_current_frame(system, image: np.ndarray) -> np.ndarray:
    """FrameDrawer::Update + DrawFrame against the live tracker state."""
    st = system.step
    if st is None:
        return draw_frame(image, np.zeros((0, 2)), np.zeros((0,), bool),
                          state_text=system.state.name)
    kp = np.asarray(st.frame.feat.xy)
    tracked = np.asarray(st.lm_gid >= 0)
    seg = np.asarray(st.frame.lines.seg)
    lt = np.asarray(st.ll_gid >= 0)
    n_pts = int(np.asarray(system.map.pts.valid).sum())
    txt = (f"{system.state.name}  KFs:{system.n_kfs} "
           f"MPs:{n_pts}  matches:{int(tracked.sum())}")
    return draw_frame(image, kp, tracked, seg, lt, txt)


def plot_map(system, path: str, top_down: bool = True) -> None:
    """Save a map figure: landmarks, map-lines, keyframe positions,
    per-frame trajectory."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = system.map
    pts = np.asarray(m.pts.xyz)[np.asarray(m.pts.valid)]
    kf_valid = np.asarray(m.kfs.valid)
    Twc = np.linalg.inv(np.asarray(m.kfs.Tcw)[kf_valid]) if kf_valid.any() \
        else np.zeros((0, 4, 4))
    traj = system.poses_reconstructed() if system.trajectory else np.zeros((0, 4, 4))
    lns_v = np.asarray(m.lns.valid)
    lns = np.asarray(m.lns.xyz)[lns_v] if lns_v.any() else np.zeros((0, 3, 3))

    ax_a, ax_b = (0, 2) if top_down else (0, 1)
    fig, ax = plt.subplots(figsize=(8, 8))
    if len(pts):
        ax.scatter(pts[:, ax_a], pts[:, ax_b], s=1, c="k", alpha=0.4,
                   label=f"map points ({len(pts)})")
    for seg in lns:
        ax.plot([seg[0, ax_a], seg[2, ax_a]], [seg[0, ax_b], seg[2, ax_b]],
                "r-", lw=1.2)
    if len(traj):
        ax.plot(traj[:, ax_a, 3], traj[:, ax_b, 3], "b-", lw=1,
                label="trajectory")
    if len(Twc):
        ax.scatter(Twc[:, ax_a, 3], Twc[:, ax_b, 3], marker="s", s=14,
                   c="tab:green", label=f"keyframes ({len(Twc)})")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]" if top_down else "y [m]")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
