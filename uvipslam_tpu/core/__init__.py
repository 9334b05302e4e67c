from uvipslam_tpu.core import lie
from uvipslam_tpu.core.state import NavState
from uvipslam_tpu.core.preintegration import PreintState, preintegrate

__all__ = ["lie", "NavState", "PreintState", "preintegrate"]
