from structure_plp_slam_tpu.camera.base import (  # noqa: F401
    Camera,
    CameraModel,
    CameraSetup,
)
