from .mel import (
    gather_frames,
    log_mel_clips,
    log_mel_from_frames,
    log_mel_single,
    log_mel_windows,
    mel_filterbank,
)

__all__ = [
    "gather_frames",
    "log_mel_clips",
    "log_mel_from_frames",
    "log_mel_single",
    "log_mel_windows",
    "mel_filterbank",
]
