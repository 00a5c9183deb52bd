"""High-level audio loading with reference-parity semantics.

Mirrors the behavior (not the implementation) of
``root/code/backend/voice_activity.py``:

  * ``get_audio_data``        — voice_activity.py:23-30 (header-only probe)
  * ``load_audio``            — voice_activity.py:32-69 (full read | 3 s slice,
                                 downmix to mono by channel mean, resample to
                                 22050 Hz, error path returns (None, None))
  * ``load_audio_startstop``  — voice_activity.py:72-143 (seconds range read
                                 with EOF clamp)
  * ``stream_chunks``         — no reference counterpart: bounded-memory
                                 chunked reads for multi-hour recordings
                                 (SURVEY.md §5 "long-context" build item).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

from ..config import DEFAULT_CONFIG
from . import wavio
from .resample import resample, resampled_length

log = logging.getLogger(__name__)

_SR = DEFAULT_CONFIG.dsp.sample_rate  # 22050


def probe(path: str):
    """Format-sniffing header probe: WavInfo for RIFF/RF64, FlacInfo for FLAC.

    Both carry samplerate/channels/frames/subtype/bits_per_sample/duration,
    so callers duck-type. The reference got incidental FLAC support through
    libsndfile (voice_activity.py:37); here it comes from csrc/ssflac.cpp.
    """
    try:
        return wavio.info(path)
    except wavio.WavFormatError:
        from . import aiff as aiffmod
        from . import flac as flacmod
        from . import mp3 as mp3mod
        from . import oggvorbis as oggmod
        from . import opus as opusmod

        if flacmod.is_flac(path):
            return flacmod.info(path)
        if aiffmod.is_aiff(path):
            return aiffmod.info(path)
        if oggmod.is_ogg(path):
            # Opus rides the same Ogg container — sniff the BOS packet type
            if opusmod.is_opus(path):
                return opusmod.info(path)
            return oggmod.info(path)
        for is_x, info_x, _read in _pcm_container_mods():
            if is_x(path):
                return info_x(path)
        if mp3mod.is_mp3(path):
            return mp3mod.info(path)
        raise


def _pcm_container_mods():
    """(is_x, info, read) per self-contained PCM container reader.

    Checked AFTER the framed codecs but BEFORE MP3: MP3 sniffing scans for
    a sync pattern anywhere in the lead-in, which could false-positive on
    these containers' raw PCM payloads; their own magics are exact.
    """
    from . import au as aumod
    from . import caf as cafmod
    from . import sphere as sphmod
    from . import w64 as w64mod

    return (
        (w64mod.is_w64, w64mod.info, w64mod.read),
        (cafmod.is_caf, cafmod.info, cafmod.read),
        (aumod.is_au, aumod.info, aumod.read),
        (sphmod.is_sphere, sphmod.info, sphmod.read),
    )


def read_any(
    path: str, start: int = 0, frames: Optional[int] = None, always_2d: bool = False
) -> Tuple[np.ndarray, int]:
    """Format-dispatching ``wavio.read`` (WAV/RF64 or FLAC)."""
    try:
        return wavio.read(path, start=start, frames=frames, always_2d=always_2d)
    except wavio.WavFormatError:
        from . import aiff as aiffmod
        from . import flac as flacmod
        from . import mp3 as mp3mod
        from . import oggvorbis as oggmod
        from . import opus as opusmod

        if flacmod.is_flac(path):
            return flacmod.read(path, start=start, frames=frames, always_2d=always_2d)
        if aiffmod.is_aiff(path):
            return aiffmod.read(path, start=start, frames=frames, always_2d=always_2d)
        if oggmod.is_ogg(path):
            if opusmod.is_opus(path):
                return opusmod.read(path, start=start, frames=frames,
                                    always_2d=always_2d)
            return oggmod.read(path, start=start, frames=frames, always_2d=always_2d)
        for is_x, _info, read_x in _pcm_container_mods():
            if is_x(path):
                return read_x(path, start=start, frames=frames,
                              always_2d=always_2d)
        if mp3mod.is_mp3(path):
            return mp3mod.read(path, start=start, frames=frames, always_2d=always_2d)
        raise


def get_audio_data(path: str) -> Tuple[float, int]:
    """(duration_seconds, native_sample_rate) without loading samples."""
    inf = probe(path)
    return inf.duration, inf.samplerate


def to_mono(data: np.ndarray) -> np.ndarray:
    """Channel mean, like ``librosa.to_mono`` (voice_activity.py:61-62)."""
    if data.ndim > 1:
        data = data.mean(axis=-1, dtype=np.float64).astype(np.float32)
    return data


def read_mono(path: str, start: int = 0, frames: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Float32 mono samples — fused native decode+downmix when possible.

    PCM16 files (the common field-recorder format) decode through the C++
    kernel in one pass; everything else takes the generic decode + mean.
    """
    from . import native

    if native.native_available():
        try:
            # read_raw parses the header itself — ONE open+parse per call
            # (a separate wavio.info() probe doubled both on this hot path,
            # review r3); want_subtype skips the payload for non-PCM16
            raw, inf = wavio.read_raw(path, start=start, frames=frames,
                                      want_subtype="PCM_16")
            if raw is not None:
                out = native.pcm16_to_mono_f32(raw.view("<i2"), inf.channels)
                if out is not None:
                    return out, inf.samplerate
        except wavio.WavFormatError:
            pass  # FLAC etc. → read_any below
        except Exception:  # noqa: BLE001 — fall through to the generic path
            pass
    data, sr = read_any(path, start=start, frames=frames)
    return to_mono(np.asarray(data, np.float32)), sr


def load_audio(
    path: str, start: Optional[int] = None, target_sr: int = _SR
) -> Tuple[Optional[np.ndarray], Optional[int]]:
    """Load a file (or a 3 s slice at internal-rate sample offset ``start``),
    downmix to mono, and resample to ``target_sr``.

    ``start`` is expressed in *internal-rate* samples and translated to the
    native rate exactly as the reference does (voice_activity.py:47-48).
    Returns ``(None, None)`` on decode failure (voice_activity.py:40-41).
    """
    try:
        if start is None:
            data, sr = read_mono(path)
        else:
            inf = probe(path)
            sr = inf.samplerate
            read_start = int(start * (sr / target_sr))
            data, sr = read_mono(path, start=read_start, frames=int(sr * 3))
    except Exception as e:  # noqa: BLE001 — decode errors skip the file
        log.error("failed to read %s: %s", path, e)
        return None, None

    if sr != target_sr:
        data = resample(data, sr, target_sr)
        sr = target_sr
    return data, sr


def load_audio_startstop(
    path: str, start_stop: Tuple[float, float], target_sr: int = _SR
) -> Tuple[Optional[np.ndarray], Optional[int]]:
    """Load ``[start, stop)`` seconds; clamps stop at EOF; mono + resample."""
    start, stop = start_stop
    if start < 0 or stop <= start:
        log.error("invalid start/stop (%s, %s)", start, stop)
        return None, None
    try:
        inf = probe(path)
        sr = inf.samplerate
        read_start = int(start * sr)
        read_stop = min(int(stop * sr), inf.frames)
        data, sr = read_any(path, start=read_start, frames=read_stop - read_start)
    except Exception as e:  # noqa: BLE001
        log.error("failed to read %s: %s", path, e)
        return None, None
    if data.size == 0:
        return None, None
    data = to_mono(np.asarray(data, dtype=np.float32))
    if sr != target_sr:
        data = resample(data, sr, target_sr)
        sr = target_sr
    return data, sr


@dataclass(frozen=True)
class AudioChunk:
    """A contiguous run of internal-rate samples from one file."""

    data: np.ndarray       # float32 mono at target_sr
    start_sample: int      # offset of data[0] in the full internal-rate stream
    total_samples: int     # full internal-rate length of the file
    is_last: bool


def internal_length(path: str, target_sr: int = _SR) -> int:
    """Length of the file after mono downmix + resample, without decoding."""
    inf = probe(path)
    return resampled_length(inf.frames, inf.samplerate, target_sr)


def stream_chunks(
    path: str,
    chunk_samples: int,
    target_sr: int = _SR,
    backend: str = "host",
) -> Iterator[AudioChunk]:
    """Yield the file as bounded-size internal-rate chunks.

    Chunk boundaries are exact: each chunk is produced by resampling a native
    range with filter-length context on both sides, so concatenating chunks
    reproduces ``load_audio`` output to float round-off.  This is the
    bounded-memory decode path for multi-hour recordings; the reference loads
    whole files into RAM (worker.py:57) which SURVEY.md §5 notes is its actual
    scaling limit.

    ``backend``: "host" (scipy/C++ polyphase) or "device" (one fixed-shape
    jitted conv per chunk — the right choice on TPU, where a 1-core host
    can't keep up with the accelerator).
    """
    inf = probe(path)
    sr = inf.samplerate
    total_internal = resampled_length(inf.frames, sr, target_sr)

    _smr = None
    _rr = None
    if inf.subtype.startswith("FLAC"):
        # persistent sequential decoder: per-range reopen would re-decode
        # from the stream start on every chunk (no byte index in FLAC)
        from .flac import SequentialMonoReader

        _smr = SequentialMonoReader(path)
        read_native = _smr.read
    elif inf.subtype.startswith("MPEG"):
        # persistent handle: a per-range mp3.read() re-scans the whole
        # file each chunk (O(n²) IO); one handle keeps the seek index
        from .mp3 import SequentialMonoReader as _Mp3Seq

        _smr = _Mp3Seq(path)
        read_native = _smr.read
    elif inf.subtype == "OPUS":
        # persistent forward-only handle: per-range opus.read() would pay
        # a decoder reset + 80 ms pre-roll per chunk and break the
        # bit-exact chunk-concatenation contract at the seams
        from .opus import SequentialMonoReader as _OpusSeq

        _smr = _OpusSeq(path)
        read_native = _smr.read
    elif isinstance(inf, wavio.WavInfo) and inf.subtype == "PCM_16":
        # persistent handle + sequential fadvise: reopening per chunk
        # resets kernel readahead (the host pipeline's read ceiling)
        from . import native

        _rr = wavio.RawReader(path)

        def read_native(start: int, frames: int) -> np.ndarray:
            _rr.will_need(start + frames, frames)
            raw = _rr.read_raw(start, frames).view("<i2")
            if native.native_available():
                out = native.pcm16_to_mono_f32(raw, inf.channels)
                if out is not None:
                    return out
            data = raw.reshape(-1, inf.channels).astype(np.float32) / 32768.0
            return to_mono(data)
    else:
        def read_native(start: int, frames: int) -> np.ndarray:
            data, _ = read_mono(path, start=start, frames=frames)
            return data

    try:
        yield from _stream_chunks_impl(
            read_native, inf, sr, total_internal, chunk_samples, target_sr,
            backend,
        )
    finally:
        # deterministic release of decoder handles/fds even when the
        # consumer abandons the generator mid-file (e.g. runner stop)
        if _smr is not None:
            _smr.close()
        if _rr is not None:
            _rr.close()


def _stream_chunks_impl(
    read_native, inf, sr, total_internal, chunk_samples, target_sr, backend
) -> Iterator[AudioChunk]:
    from .resample import design_taps, get_device_resampler
    import math

    if sr == target_sr:
        pos = 0
        while pos < inf.frames:
            n = min(chunk_samples, inf.frames - pos)
            yield AudioChunk(
                read_native(pos, n), pos, total_internal, pos + n >= inf.frames
            )
            pos += n
        return

    if backend == "device":
        rs_dev = get_device_resampler(sr, target_sr, chunk_samples)
        out_pos = 0
        while out_pos < total_internal:
            out_n = min(chunk_samples, total_internal - out_pos)
            data = rs_dev.resample_range(read_native, inf.frames, out_pos, out_n)
            yield AudioChunk(
                data, out_pos, total_internal, out_pos + out_n >= total_internal
            )
            out_pos += out_n
        return

    g = math.gcd(sr, target_sr)
    up, down = target_sr // g, sr // g
    taps = design_taps(up, down)
    # native-rate context needed so edge outputs see the full filter support
    context = -(-(len(taps) // 2) // up) + 8

    out_pos = 0
    while out_pos < total_internal:
        out_n = min(chunk_samples, total_internal - out_pos)
        # native range whose resampled image covers [out_pos, out_pos+out_n)
        in_first = (out_pos * down) // up
        in_last = -(-((out_pos + out_n) * down) // up)
        rs = max(0, in_first - context)
        rs -= rs % down  # snap to the output grid: res[k] ↦ global rs*up/down + k
        re = min(inf.frames, in_last + context)
        mono = read_native(rs, re - rs)
        res = resample(mono, sr, target_sr)
        first_out_global = (rs * up) // down  # exact (rs % down == 0)
        lo = out_pos - first_out_global
        yield AudioChunk(
            res[lo : lo + out_n],
            out_pos,
            total_internal,
            out_pos + out_n >= total_internal,
        )
        out_pos += out_n
