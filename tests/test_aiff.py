"""AIFF/AIFF-C reader tests.

Fixtures are packed by hand with struct (big-endian chunk layout written
straight from the AIFF-1.3 spec), independently of io/aiff.py, so reader
bugs can't self-verify.
"""

import os
import struct

import numpy as np
import pytest

from softspoken_tpu.io import aiff
from softspoken_tpu.io.audio import get_audio_data, load_audio, probe, read_any


def _ext80(rate: float) -> bytes:
    """Pack a positive sample rate as IEEE 80-bit extended (spec appendix)."""
    assert rate > 0
    exp = 16383 + 63
    mant = int(rate)
    frac = rate - mant
    # normalize integer part into the top bits
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
        if frac:
            frac *= 2.0
            if frac >= 1.0:
                mant |= 1
                frac -= 1.0
    return struct.pack(">HQ", exp, mant)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack(">I", len(body)) + body + pad


def write_aiff(path, data_i16, sr, form=b"AIFF", comp=None, payload=None,
               bits=16):
    """data_i16: (frames, channels) int16 (or raw payload bytes via payload)."""
    frames, channels = data_i16.shape if payload is None else data_i16
    comm = struct.pack(">hIh", channels, frames, bits) + _ext80(float(sr))
    if form == b"AIFC":
        comm += comp + b"\x00\x00"  # empty pstring name (len byte + pad)
    if payload is None:
        payload = data_i16.astype(">i2").tobytes()
    ssnd = struct.pack(">II", 0, 0) + payload
    body = b""
    if form == b"AIFC":
        body += _chunk(b"FVER", struct.pack(">I", 0xA2805140))
    body += _chunk(b"COMM", comm) + _chunk(b"SSND", ssnd)
    blob = b"FORM" + struct.pack(">I", 4 + len(body)) + form + body
    with open(path, "wb") as f:
        f.write(blob)


def test_ext80_roundtrip():
    for rate in (8000, 22050, 44100, 48000, 96000):
        assert aiff._extended80(_ext80(rate)) == pytest.approx(rate)


def test_read_be_pcm16_stereo(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(-30000, 30000, (1000, 2)).astype(np.int16)
    p = str(tmp_path / "a.aiff")
    write_aiff(p, data, 44100)
    inf = probe(p)
    assert (inf.samplerate, inf.channels, inf.frames) == (44100, 2, 1000)
    assert inf.subtype == "PCM_16"
    out, sr = read_any(p)
    assert sr == 44100 and out.shape == (1000, 2)
    np.testing.assert_allclose(out, data.astype(np.float32) / 32768.0)


def test_read_range_and_eof_clamp(tmp_path):
    data = (np.arange(100, dtype=np.int16) * 100).reshape(-1, 1)
    p = str(tmp_path / "m.aif")
    write_aiff(p, data, 22050)
    out, _ = read_any(p, start=10, frames=5)
    np.testing.assert_allclose(out * 32768.0, np.arange(10, 15) * 100.0)
    out, _ = read_any(p, start=95, frames=50)  # clamps at EOF
    assert out.shape == (5,)


def test_aifc_sowt_little_endian(tmp_path):
    data = np.array([[1000], [-2000], [32000]], np.int16)
    p = str(tmp_path / "s.aifc")
    write_aiff(p, (3, 1), 22050, form=b"AIFC", comp=b"sowt",
               payload=data.astype("<i2").tobytes())
    out, sr = read_any(p)
    np.testing.assert_allclose(out * 32768.0, data[:, 0].astype(np.float32))


def test_aifc_fl32(tmp_path):
    vals = np.array([0.5, -0.25, 1.0], np.float32)
    p = str(tmp_path / "f.aifc")
    write_aiff(p, (3, 1), 48000, form=b"AIFC", comp=b"fl32",
               payload=vals.astype(">f4").tobytes(), bits=32)
    out, sr = read_any(p)
    assert sr == 48000
    np.testing.assert_allclose(out, vals)


def test_pcm24_big_endian(tmp_path):
    # -1, 0, +max in 24-bit, packed BE by hand
    samples = [-8388608, 0, 8388607]
    payload = b"".join(
        int(s & 0xFFFFFF).to_bytes(3, "big") for s in samples
    )
    p = str(tmp_path / "d.aiff")
    write_aiff(p, (3, 1), 22050, payload=payload, bits=24)
    out, _ = read_any(p)
    np.testing.assert_allclose(out * 8388608.0, samples)


def test_unsupported_compression_raises(tmp_path):
    p = str(tmp_path / "u.aifc")
    write_aiff(p, (2, 1), 22050, form=b"AIFC", comp=b"ima4",
               payload=b"\x00\x00\x00\x00")
    with pytest.raises(aiff.AiffFormatError):
        aiff.info(p)


def test_load_audio_resamples_aiff(tmp_path):
    """The app loader path: AIFF in → mono 22050 float out (like sf.read)."""
    sr = 44100
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    p = str(tmp_path / "tone.aiff")
    write_aiff(p, np.stack([tone, tone], axis=1), sr)
    dur, native = get_audio_data(p)
    assert native == sr and dur == pytest.approx(1.0)
    data, out_sr = load_audio(p)
    assert out_sr == 22050
    assert data.shape[0] == 22050
    # energy preserved through downmix+resample
    assert np.abs(data).max() == pytest.approx(0.5, abs=0.05)


@pytest.mark.slow
def test_fused_detect_aiff_matches_wav(tmp_path):
    """detect_file_fused dispatches AIFF through the f32 path and produces
    the same intervals as the identical audio in a WAV container."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.io import wavio

    rng = np.random.default_rng(3)
    audio = (rng.uniform(-0.4, 0.4, 8 * 22050) * 32767).astype(np.int16)
    pa = str(tmp_path / "x.aiff")
    pw = str(tmp_path / "x.wav")
    write_aiff(pa, audio.reshape(-1, 1), 22050)
    wavio.write(pw, audio.astype(np.float32) / 32768.0, 22050, subtype="PCM_16")

    cfg = Config().with_engine(precision="parity", device_batch=8,
                               chunk_seconds=6.0)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    ra = det.detect_file_fused(pa)
    rw = det.detect_file_fused(pw)
    assert ra.num_windows == rw.num_windows
    assert ra.intervals == rw.intervals


def test_truncated_ssnd_clamps_to_physical_size(tmp_path):
    """Advisor r2: a crash-truncated AIFF whose SSND header overstates the
    payload must clamp frames to the physical file size (like wavio), not
    short-read into a reshape error."""
    rng = np.random.default_rng(11)
    audio = (rng.uniform(-0.3, 0.3, 4000) * 32767).astype(np.int16)
    p = str(tmp_path / "t.aiff")
    write_aiff(p, audio.reshape(-1, 1), 22050)
    full = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.truncate(full - 1000)  # chop tail; headers still claim 4000 frames

    inf = aiff.info(p)
    assert inf.frames == 4000 - 1000 // 2
    data, sr = aiff.read(p)
    assert sr == 22050
    assert data.shape[0] == inf.frames
    np.testing.assert_allclose(
        data[: inf.frames], audio[: inf.frames].astype(np.float32) / 32768.0,
        atol=1e-6)


def test_missing_ssnd_with_frames_raises(tmp_path):
    """COMM promising audio with no SSND chunk must raise AiffFormatError,
    not decode the header bytes as PCM (review r3 batch 12)."""
    import struct

    import pytest

    from softspoken_tpu.io import aiff

    comm = struct.pack(">hIh", 1, 100, 16) + b"\x40\x0c\xac\x44\x00\x00\x00\x00\x00\x00"
    body = b"COMM" + struct.pack(">I", len(comm)) + comm
    data = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body
    p = tmp_path / "nossnd.aiff"
    p.write_bytes(data)
    with pytest.raises(aiff.AiffFormatError, match="SSND"):
        aiff.info(str(p))


def test_empty_ssnd_reports_zero_frames(tmp_path):
    """An empty SSND payload followed by trailing chunks must report zero
    frames, not decode the trailing chunk bytes as audio (r3 batch 12)."""
    import struct

    from softspoken_tpu.io import aiff

    comm = struct.pack(">hIh", 1, 100, 16) + b"\x40\x0c\xac\x44\x00\x00\x00\x00\x00\x00"
    ssnd = struct.pack(">II", 0, 0)  # offset 0, block 0, no payload
    anno = b"ANNO" + struct.pack(">I", 64) + b"x" * 64
    body = (b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + anno)
    data = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body
    p = tmp_path / "emptyssnd.aiff"
    p.write_bytes(data)
    inf = aiff.info(str(p))
    assert inf.frames == 0 and inf.data_bytes == 0
    got, sr = aiff.read(str(p))
    assert len(got) == 0
