"""Offline visualization (the reference's Pangolin Viewer/FrameDrawer/
MapDrawer, src/Viewer.cc, FrameDrawer.cc, MapDrawer.cc, rendered headless
to image files instead of a GL window)."""

from splslam_tpu.viz.draw import draw_frame, plot_map  # noqa: F401
