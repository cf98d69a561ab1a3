from splslam_tpu.geometry import se3, camera, triangulate  # noqa: F401
from splslam_tpu.geometry.camera import Camera  # noqa: F401
