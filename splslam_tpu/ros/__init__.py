"""ROS node adapters (reference Examples/ROS/PL-SLAM/src/ros_*.cc).

The reference ships five rosrun entry points (mono, stereo, rgbd, and
the two MYNT-EYE live-camera variants) that subscribe to sensor topics
and feed System::Track*. This package rebuilds the same layer with the
transport separated from the logic:

- `nodes.MonoGrabber` / `StereoGrabber` / `RGBDGrabber`: the message ->
  System glue (timestamp extraction, grayscale conversion, approximate
  L/R pairing), testable without a ROS installation.
- `nodes.run_*_node`: thin rospy wiring (subscribers, ApproximateTime
  sync, spin) used when `rospy` + `cv_bridge` are importable; this
  environment has no ROS distribution, so the wiring raises a clear
  error instead of silently degrading.
"""

from splslam_tpu.ros.nodes import (  # noqa: F401
    MonoGrabber,
    RGBDGrabber,
    StereoGrabber,
    run_mono_node,
    run_rgbd_node,
    run_stereo_node,
)
