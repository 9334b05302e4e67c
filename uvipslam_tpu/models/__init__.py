from uvipslam_tpu.models.camera import CameraModel

__all__ = ["CameraModel"]
