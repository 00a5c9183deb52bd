from .metrics import StageTimers, ThroughputMeter
from .workers import DetectRunner, RunCallbacks, RunReport

__all__ = ["ThroughputMeter", "StageTimers", "DetectRunner", "RunCallbacks", "RunReport"]
