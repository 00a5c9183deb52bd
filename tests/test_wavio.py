import os

import numpy as np
import pytest

from softspoken_tpu.io import wavio


def _sig(frames=5000, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.9, 0.9, size=(frames, channels)).astype(np.float32)
    return x if channels > 1 else x[:, 0]


@pytest.mark.parametrize(
    "subtype,tol",
    [
        ("PCM_U8", 1 / 120.0),
        ("PCM_16", 1 / 30000.0),
        ("PCM_24", 1 / 8e6),
        ("PCM_32", 1e-7),
        ("FLOAT", 0.0),
        ("DOUBLE", 1e-7),
    ],
)
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(tmp_path, subtype, tol, channels):
    x = _sig(channels=channels)
    p = str(tmp_path / "a.wav")
    wavio.write(p, x, 22050, subtype=subtype)
    y, sr = wavio.read(p)
    assert sr == 22050
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) <= tol


def test_info_probe(tmp_path):
    x = _sig(frames=44100, channels=2)
    p = str(tmp_path / "b.wav")
    wavio.write(p, x, 44100, subtype="PCM_16")
    inf = wavio.info(p)
    assert inf.samplerate == 44100
    assert inf.channels == 2
    assert inf.frames == 44100
    assert inf.duration == pytest.approx(1.0)
    assert inf.subtype == "PCM_16"


def test_range_read(tmp_path):
    x = _sig(frames=10000)
    p = str(tmp_path / "c.wav")
    wavio.write(p, x, 22050, subtype="FLOAT")
    y, _ = wavio.read(p, start=1000, frames=500)
    np.testing.assert_array_equal(y, x[1000:1500])
    # EOF clamp
    y, _ = wavio.read(p, start=9900, frames=500)
    assert len(y) == 100


def test_streaming_writer(tmp_path):
    x = _sig(frames=9000, channels=2)
    p = str(tmp_path / "d.wav")
    with wavio.WavWriter(p, 48000, channels=2, subtype="FLOAT") as w:
        for i in range(0, 9000, 2500):
            w.write(x[i : i + 2500])
    y, sr = wavio.read(p)
    assert sr == 48000
    np.testing.assert_array_equal(y, x)


def test_extensible_format(tmp_path):
    # hand-build a WAVE_FORMAT_EXTENSIBLE PCM16 file
    import struct

    x = (np.arange(100, dtype=np.int16) - 50)
    payload = x.astype("<i2").tobytes()
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
    )
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 0x4) + guid
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    p = str(tmp_path / "ext.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    y, sr = wavio.read(p)
    assert sr == 8000
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0)


# ---------------------------------------------------------------------------
# round 2: RF64 auto-promotion (>4 GiB outputs)
# ---------------------------------------------------------------------------

def test_wavwriter_plain_wav_has_junk_reservation(tmp_path):
    """Small files stay plain RIFF; the ds64 reservation parses as JUNK."""
    p = str(tmp_path / "small.wav")
    x = np.linspace(-0.5, 0.5, 500, dtype=np.float32)
    with wavio.WavWriter(p, 22050, 1, "PCM_16") as w:
        w.write(x)
    with open(p, "rb") as f:
        hdr = f.read(20)
    assert hdr[:4] == b"RIFF" and hdr[12:16] == b"JUNK"
    got, sr = wavio.read(p)
    assert sr == 22050
    np.testing.assert_allclose(got, x, atol=1.0 / 32000)


def test_wavwriter_rf64_promotion_roundtrip(tmp_path):
    """Force the RF64 branch with a tiny threshold; the result must be a
    valid RF64/ds64 file our reader (and the streaming read_raw) round-trips."""
    p = str(tmp_path / "big.wav")
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.8, 0.8, (3000, 2)).astype(np.float32)
    w = wavio.WavWriter(p, 48000, 2, "PCM_16")
    w._RF64_THRESHOLD = 1  # pretend 4 GiB is tiny
    w.write(x[:1000])
    w.write(x[1000:])
    w.close()

    with open(p, "rb") as f:
        hdr = f.read(20)
    assert hdr[:4] == b"RF64"
    assert hdr[4:8] == b"\xff\xff\xff\xff"
    assert hdr[12:16] == b"ds64"

    inf = wavio.info(p)
    assert inf.frames == 3000 and inf.channels == 2 and inf.samplerate == 48000
    got, sr = wavio.read(p, always_2d=True)
    np.testing.assert_allclose(got, x, atol=1.0 / 32000)

    # streaming range reads over the RF64 file
    raw, inf2 = wavio.read_raw(p, start=500, frames=250)
    assert len(raw) == 250 * 4  # 2ch × 2B
    mid = raw.view("<i2").reshape(-1, 2).astype(np.float32) / 32768.0
    np.testing.assert_allclose(mid, x[500:750], atol=1.0 / 32000)


def test_wavwriter_header_level_4gib(tmp_path):
    """Header math at a true >4 GiB payload size without writing 4 GiB:
    spoof the payload counter, then verify the ds64 fields."""
    import struct

    p = str(tmp_path / "huge.wav")
    w = wavio.WavWriter(p, 44100, 2, "PCM_16")
    w.write(np.zeros((4, 2), np.float32))
    fake_payload = 5 * 1024**3 + 4 * 4  # 5 GiB + what we actually wrote
    w._payload_bytes = fake_payload
    w.close()

    with open(p, "rb") as f:
        assert f.read(4) == b"RF64"
        f.seek(12)
        assert f.read(4) == b"ds64"
        csize, riff_size, data_size, sample_count, table = struct.unpack(
            "<IQQQI", f.read(32)
        )
    assert csize == 28
    assert data_size == fake_payload
    assert sample_count == fake_payload // 4
    assert riff_size == wavio.WavWriter.HEADER_BYTES - 8 + fake_payload
    # the header-only probe clamps to the bytes physically present
    # (truncation robustness); the ds64 fields above carry the 64-bit
    # sizes, and the real >4 GiB round-trip is verified by the 4.18 GiB
    # end-to-end run recorded in docs/STATUS.md
    inf = wavio.info(p)
    assert inf.frames == 4


def test_rawreader_matches_read_raw(tmp_path):
    p = str(tmp_path / "r.wav")
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.9, 0.9, 48000).astype(np.float32)
    wavio.write(p, x, 16000, subtype="PCM_16")
    with wavio.RawReader(p) as r:
        assert r.info.frames == 48000
        for start, n in [(0, 1000), (100, 777), (47000, 5000), (48000, 10)]:
            got = r.read_raw(start, n)
            want, _ = wavio.read_raw(p, start=start, frames=n)
            np.testing.assert_array_equal(got, want)
        r.will_need(0, 48000)  # must not raise anywhere


def test_truncated_data_chunk_clamps_to_physical_size(tmp_path):
    """Regression (code review r2 pass 2): a recorder-crash WAV whose data
    header overstates the payload must decode the samples that exist, not
    crash on short reads."""
    import numpy as np

    from softspoken_tpu.io import wavio

    data = (np.arange(1000, dtype=np.int16) * 7).astype(np.int16)
    p = str(tmp_path / "t.wav")
    wavio.write(p, data.astype(np.float32) / 32768.0, 22050, subtype="PCM_16")
    full = os.path.getsize(p)
    with open(p, "r+b") as f:
        f.truncate(full - 501)  # cut mid-sample

    inf = wavio.info(p)
    assert inf.frames == 1000 - 251  # 501 bytes = 250 samples + 1 odd byte
    out, sr = wavio.read(p)
    assert sr == 22050 and out.shape == (inf.frames,)
    np.testing.assert_allclose(out * 32768.0, data[: inf.frames])
    raw, _ = wavio.read_raw(p, start=0)
    assert len(raw) == inf.frames * 2


def test_odd_payload_riff_size_counts_pad_byte(tmp_path):
    """RIFF size must include the odd-payload pad byte (review r3: write()
    omitted it while WavWriter.close counted it)."""
    import struct

    p = str(tmp_path / "odd.wav")
    x = (np.random.default_rng(0).uniform(-0.5, 0.5, 333)).astype(np.float32)
    wavio.write(p, x, 8000, subtype="PCM_U8")  # 333 bytes payload — odd
    raw = open(p, "rb").read()
    declared = struct.unpack("<I", raw[4:8])[0]
    assert declared == len(raw) - 8
    y, sr = wavio.read(p)
    assert len(y) == 333 and sr == 8000


def test_second_data_chunk_is_ignored(tmp_path):
    """First data chunk wins: a concatenated/malformed WAV with a second
    data chunk must not redirect the payload (review r3 batch 11)."""
    import struct

    import numpy as np

    from softspoken_tpu.io import wavio

    good = np.linspace(-0.5, 0.5, 100).astype(np.float32)
    p = str(tmp_path / "twodata.wav")
    wavio.write(p, good, 8000, subtype="PCM_16")
    # append a second data chunk full of garbage and patch the RIFF size
    garbage = (np.zeros(100, np.int16) + 12345).tobytes()
    with open(p, "r+b") as f:
        f.seek(0, 2)
        f.write(b"data" + struct.pack("<I", len(garbage)) + garbage)
        total = f.tell()
        f.seek(4)
        f.write(struct.pack("<I", total - 8))
    got, sr = wavio.read(p)
    ref = np.round(good * 32767.0) / 32768.0
    assert sr == 8000 and len(got) == 100
    assert np.allclose(got, ref, atol=2.0 / 32768.0)
