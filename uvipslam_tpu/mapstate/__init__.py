from uvipslam_tpu.mapstate.map import MapState

__all__ = ["MapState"]
