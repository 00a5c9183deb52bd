from .detector import DetectionResult, Detector
from .planner import (
    num_windows_for_duration,
    num_windows_for_padded_length,
    plan_detection_job,
    window_starts,
)
from .regions import (
    average_grid_host,
    bin_time,
    filter_min_length,
    find_speech_regions,
    shift_regions,
    window_bin_offset,
)

__all__ = [
    "DetectionResult",
    "Detector",
    "plan_detection_job",
    "num_windows_for_duration",
    "num_windows_for_padded_length",
    "window_starts",
    "average_grid_host",
    "bin_time",
    "filter_min_length",
    "find_speech_regions",
    "shift_regions",
    "window_bin_offset",
]
