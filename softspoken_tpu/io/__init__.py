from . import wavio
from .audio import (
    AudioChunk,
    get_audio_data,
    internal_length,
    load_audio,
    load_audio_startstop,
    read_mono,
    stream_chunks,
    to_mono,
)
from .resample import jax_resample, resample, resampled_length

__all__ = [
    "wavio",
    "AudioChunk",
    "get_audio_data",
    "internal_length",
    "load_audio",
    "load_audio_startstop",
    "stream_chunks",
    "to_mono",
    "read_mono",
    "resample",
    "jax_resample",
    "resampled_length",
]
