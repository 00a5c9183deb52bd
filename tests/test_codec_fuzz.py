"""Deterministic corruption fuzz over the codec surface (io/audio.probe +
read_any): WAV/RF64, FLAC, AIFF, OGG.

Field recorders die mid-write, SD cards bit-rot, files get re-muxed — the
parsers must fail with a clean exception (or tolerate the damage) on ANY
byte-level corruption: no hangs, no native crashes, no unbounded loops.
The round-2 advisor found exactly this class of bug (ssflac seek-overshoot
loop on a malformed header), so this suite pins the contract.

Each case is bounded by a watchdog alarm: a parser that loops forever fails
the test instead of wedging the suite.
"""

import os
import signal

import numpy as np
import pytest

from softspoken_tpu.io import wavio
from softspoken_tpu.io.audio import probe, read_any

SR = 22050


class _Watchdog:
    """SIGALRM-based per-case timeout (POSIX; tests never run threaded)."""

    def __init__(self, seconds: int = 20):
        self.seconds = seconds

    def __enter__(self):
        def _fire(signum, frame):
            raise TimeoutError("codec parser exceeded the fuzz watchdog")

        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)


def _tone(seconds=2.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    x = 0.4 * np.sin(2 * np.pi * 523 * t) + 0.02 * rng.normal(size=len(t))
    return x.astype(np.float32)


def _make_originals(tmp_path):
    """One valid file per codec; skip codecs whose writer is unavailable."""
    x = _tone()
    out = {}

    wav = str(tmp_path / "a.wav")
    wavio.write(wav, x, SR, subtype="PCM_16")
    out["wav"] = wav

    import flac_ref  # the test-oracle encoder (tests/flac_ref.py)

    fl = str(tmp_path / "a.flac")
    flac_ref.write_flac(fl, (x * 32767).astype(np.int16), SR, bits=16)
    out["flac"] = fl

    try:
        from softspoken_tpu.io import oggvorbis as ov

        if ov.available():
            og = str(tmp_path / "a.ogg")
            ov.write_vorbis(og, x, SR)
            out["ogg"] = og
    except Exception:
        pass

    from test_aiff import write_aiff  # the AIFF test writer

    af = str(tmp_path / "a.aiff")
    write_aiff(af, (x * 32767).astype(np.int16)[:, None], SR)
    out["aiff"] = af

    return out


def _attempt(path):
    """probe+read must either succeed or raise a clean Python exception."""
    ok_errors = (IOError, OSError, ValueError, EOFError, KeyError,
                 IndexError, struct_error_types())
    with _Watchdog(20):
        try:
            probe(path)
            data, sr = read_any(path)
            assert sr > 0 and np.asarray(data).ndim in (1, 2)
        except ok_errors:
            pass
        except Exception as e:  # noqa: BLE001 — name the codec's own errors
            # codec-specific exception types are also clean failures
            assert type(e).__module__.startswith("softspoken_tpu"), (
                f"unexpected {type(e).__name__}: {e}")


def struct_error_types():
    import struct

    return struct.error


@pytest.mark.parametrize("codec", ["wav", "flac", "ogg", "aiff"])
def test_truncations(tmp_path, codec):
    files = _make_originals(tmp_path)
    if codec not in files:
        pytest.skip(f"no writer for {codec} in this image")
    raw = open(files[codec], "rb").read()
    # header boundary, sub-header, mid-data, last-byte-short
    for cut in (4, 11, 29, 44, len(raw) // 3, len(raw) // 2, len(raw) - 1):
        if cut >= len(raw):
            continue
        p = str(tmp_path / f"trunc_{codec}_{cut}{os.path.splitext(files[codec])[1]}")
        with open(p, "wb") as f:
            f.write(raw[:cut])
        _attempt(p)


@pytest.mark.parametrize("codec", ["wav", "flac", "ogg", "aiff"])
def test_byte_mutations(tmp_path, codec):
    files = _make_originals(tmp_path)
    if codec not in files:
        pytest.skip(f"no writer for {codec} in this image")
    raw = bytearray(open(files[codec], "rb").read())
    rng = np.random.default_rng(hash(codec) % 2**31)
    ext = os.path.splitext(files[codec])[1]
    # 24 mutations: half in the first 128 bytes (headers), half anywhere
    spots = list(rng.integers(0, min(128, len(raw)), 12)) + \
        list(rng.integers(0, len(raw), 12))
    for i, at in enumerate(spots):
        mut = bytearray(raw)
        mut[int(at)] ^= int(rng.integers(1, 256))
        p = str(tmp_path / f"mut_{codec}_{i}{ext}")
        with open(p, "wb") as f:
            f.write(bytes(mut))
        _attempt(p)


@pytest.mark.parametrize("codec", ["wav", "flac", "ogg", "aiff"])
def test_field_corruption(tmp_path, codec):
    """Size/count header fields forced to extremes (0, huge, negative)."""
    files = _make_originals(tmp_path)
    if codec not in files:
        pytest.skip(f"no writer for {codec} in this image")
    raw = bytearray(open(files[codec], "rb").read())
    ext = os.path.splitext(files[codec])[1]
    patterns = [b"\x00\x00\x00\x00", b"\xff\xff\xff\xff",
                b"\xff\xff\xff\x7f", b"\x00\x00\x00\x80"]
    for i, off in enumerate((4, 8, 16, 22, 24, 40)):
        if off + 4 > len(raw):
            continue
        mut = bytearray(raw)
        mut[off:off + 4] = patterns[i % len(patterns)]
        p = str(tmp_path / f"field_{codec}_{i}{ext}")
        with open(p, "wb") as f:
            f.write(bytes(mut))
        _attempt(p)


def test_garbage_and_empty(tmp_path):
    rng = np.random.default_rng(99)
    empty = str(tmp_path / "empty.wav")
    open(empty, "wb").close()
    _attempt(empty)
    garbage = str(tmp_path / "garbage.wav")
    with open(garbage, "wb") as f:
        f.write(rng.bytes(4096))
    _attempt(garbage)
    # magic-only prefixes (dispatchers must not over-trust magic)
    for magic, ext in ((b"OggS", ".ogg"), (b"fLaC", ".flac"),
                      (b"RIFF", ".wav"), (b"FORM", ".aiff")):
        p = str(tmp_path / f"magic{ext}")
        with open(p, "wb") as f:
            f.write(magic)
        _attempt(p)
