"""Deterministic corruption fuzz over the codec surface (io/audio.probe +
read_any): WAV/RF64, FLAC, AIFF, OGG/Vorbis, Ogg/Opus, MP3, W64, CAF,
AU, NIST SPHERE.

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

    from test_adpcm import _write_ms  # the MS ADPCM test encoder

    ad = str(tmp_path / "a_adpcm.wav")
    _write_ms(ad, np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int64),
              sr=SR, spb=500)
    out["adpcm"] = ad

    try:
        from softspoken_tpu.io import mp3 as mp3mod

        if mp3mod.encoder_available():
            mp = str(tmp_path / "a.mp3")
            mp3mod.write_mp3(mp, x, SR)
            out["mp3"] = mp
    except Exception:
        pass

    try:
        from softspoken_tpu.io import opus as opusmod

        if opusmod.available():
            op = str(tmp_path / "a.opus")
            opusmod.write_opus(op, x, 48000)
            out["opus"] = op
    except Exception:
        pass

    import struct as _s

    from test_pcm_containers import write_caf, write_sphere, write_w64

    w6 = str(tmp_path / "a.w64")
    write_w64(w6, x[:, None], SR)
    out["w64"] = w6
    cf = str(tmp_path / "a.caf")
    write_caf(cf, x[:, None], SR)
    out["caf"] = cf
    sp = str(tmp_path / "a.sph")
    write_sphere(sp, x[:, None], 16000)
    out["sphere"] = sp
    auf = str(tmp_path / "a.au")
    with open(auf, "wb") as f:
        f.write(b".snd" + _s.pack(">5I", 24, len(x) * 2, 3, SR, 1))
        f.write(np.clip(np.rint(x * 32767), -32768, 32767)
                .astype(">i2").tobytes())
    out["au"] = auf

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


@pytest.mark.parametrize("codec", ["wav", "flac", "ogg", "aiff", "adpcm",
                                   "mp3", "opus", "w64", "caf", "sphere",
                                   "au"])
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


@pytest.mark.parametrize("codec", ["wav", "flac", "ogg", "aiff", "adpcm",
                                   "mp3", "opus", "w64", "caf", "sphere",
                                   "au"])
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


@pytest.mark.parametrize("codec", ["wav", "flac", "ogg", "aiff", "adpcm",
                                   "mp3", "opus", "w64", "caf", "sphere",
                                   "au"])
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
    from test_pcm_containers import _W64_RIFF, _W64_SUF

    for magic, ext in ((b"OggS", ".ogg"), (b"fLaC", ".flac"),
                      (b".snd", ".au"), (b"caff", ".caf"),
                      (b"NIST_1A", ".sph"),
                      (_W64_RIFF + b"\x00" * 8 + b"wave" + _W64_SUF, ".w64"),
                      (b"RIFF", ".wav"), (b"FORM", ".aiff"),
                      (b"ID3", ".mp3"), (b"\xff\xfb\x90\x00", ".mp3")):
        p = str(tmp_path / f"magic{ext}")
        with open(p, "wb") as f:
            f.write(magic)
        _attempt(p)


def _streaminfo(total=1000, sr=22050, ch=1, bps=16, minbs=4096, maxbs=4096):
    si = bytearray(34)
    si[0:2] = minbs.to_bytes(2, "big")
    si[2:4] = maxbs.to_bytes(2, "big")
    si[10] = (sr >> 12) & 0xFF
    si[11] = (sr >> 4) & 0xFF
    si[12] = ((sr & 0xF) << 4) | (((ch - 1) & 0x7) << 1) | (((bps - 1) >> 4) & 1)
    si[13] = (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    si[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)


def test_flac_lpc_order_exceeding_blocksize_rejected(tmp_path):
    """Crafted frame: blocksize 1 (bs_code 6, byte 0) + subframe type 63
    (LPC order 32).  The warm-up loop used to write 31 int64s past the end
    of the block vector — a heap overflow on untrusted input (review r3).
    Must now fail the subframe decode cleanly, never crash."""
    from softspoken_tpu.io import flac

    if not flac.flac_available():
        pytest.skip("native decoder unavailable")
    frame = bytes([0xFF, 0xF8, 0x60, 0x00, 0x00, 0x00, 0x00, 0x7E]) + b"\x00" * 96
    p = str(tmp_path / "lpc_oob.flac")
    open(p, "wb").write(_streaminfo() + frame)
    with pytest.raises(flac.FlacError):
        flac.read(p)


def test_flac_wasted_bits_ge_bps_rejected(tmp_path):
    """Crafted CONSTANT subframe whose wasted-bits unary count >= bps used
    to wrap the unsigned bps and shift by negative amounts (UB, review r3).
    Must fail cleanly."""
    from softspoken_tpu.io import flac

    if not flac.flac_available():
        pytest.skip("native decoder unavailable")
    # subframe byte 0x01: type CONSTANT, wasted flag set; then unary
    # 15 zeros + 1 (in 0x00 0x01) -> wasted = 16 >= bps 16
    frame = bytes([0xFF, 0xF8, 0x60, 0x00, 0x00, 0x00, 0x00,
                   0x01, 0x00, 0x01]) + b"\x00" * 32
    p = str(tmp_path / "wasted.flac")
    open(p, "wb").write(_streaminfo() + frame)
    with pytest.raises(flac.FlacError):
        flac.read(p)


def test_truncated_fmt_and_ds64_raise_wavformaterror(tmp_path):
    """Truncated fmt/ds64 chunks must raise WavFormatError (probe() and
    read_any() dispatch on it), not struct.error (review r3)."""
    import struct as _s

    from softspoken_tpu.io import wavio

    # RIFF/WAVE with an 8-byte fmt chunk body
    p1 = str(tmp_path / "shortfmt.wav")
    body = b"RIFF" + _s.pack("<I", 4 + 8 + 8) + b"WAVE" + b"fmt " + \
        _s.pack("<I", 8) + b"\x00" * 8
    open(p1, "wb").write(body)
    with pytest.raises(wavio.WavFormatError):
        wavio.info(p1)

    # RF64 with a truncated ds64 body
    p2 = str(tmp_path / "shortds64.wav")
    body = b"RF64" + _s.pack("<I", 0xFFFFFFFF) + b"WAVE" + b"ds64" + \
        _s.pack("<I", 8) + b"\x00" * 8
    open(p2, "wb").write(body)
    with pytest.raises(wavio.WavFormatError):
        wavio.info(p2)


def test_aiff_inf_sample_rate_raises_format_error(tmp_path):
    """COMM sampleRate with exponent 0x7FFF (inf/NaN) must raise
    AiffFormatError, not OverflowError (review r3)."""
    import struct as _s

    from softspoken_tpu.io import aiff

    comm = _s.pack(">hIh", 1, 100, 16) + bytes([0x7F, 0xFF]) + b"\x00" * 8
    chunks = b"COMM" + _s.pack(">I", len(comm)) + comm
    body = b"AIFF" + chunks
    raw = b"FORM" + _s.pack(">I", len(body)) + body
    p = str(tmp_path / "inf_rate.aiff")
    open(p, "wb").write(raw)
    with pytest.raises(aiff.AiffFormatError):
        aiff.info(p)
