"""Dataset example drivers (reference Examples/{Monocular,Stereo,RGB-D}).

Each module is runnable: `python -m splslam_tpu.examples.stereo_kitti
<settings.yaml> <sequence_dir> [trajectory_out]`. The flow mirrors the
reference drivers (LoadImages -> System -> per-frame Track* -> Shutdown ->
SaveTrajectory + median/mean track time, Examples/Monocular/mono_tum.cc:34-120).
"""
