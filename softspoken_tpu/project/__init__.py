from .manager import OUTPUTS_DIRNAME, ProjectManager
from .store import (
    COLUMNS,
    COLUMN_TYPES,
    DetectionProject,
    DetectionStore,
    backfill_ids,
    empty_detections_frame,
)

__all__ = [
    "ProjectManager",
    "OUTPUTS_DIRNAME",
    "DetectionStore",
    "DetectionProject",
    "COLUMNS",
    "COLUMN_TYPES",
    "backfill_ids",
    "empty_detections_frame",
]
