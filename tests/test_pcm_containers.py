"""W64 / CAF / AU / NIST-SPHERE reader tests (+ the shared G.711 tables).

Fixtures are packed by hand with struct straight from each container's
spec — independently of the io modules under test, so reader bugs can't
self-verify.  AU additionally gets a REAL independent oracle: the stdlib
``sunau`` writer (present on this image's Python 3.12), and the G.711
tables are pinned bit-exact against stdlib ``audioop``.
"""

import os
import struct
import warnings

import numpy as np
import pytest

from softspoken_tpu.io import au, caf, g711, sphere, w64, wavio
from softspoken_tpu.io.audio import load_audio, probe, read_any

SR = 22050


def _sig(frames: int, channels: int = 1, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(frames) / SR
    base = 0.5 * np.sin(2 * np.pi * 440 * t)
    out = np.stack(
        [base * (1.0 - 0.3 * c) + 0.01 * rng.normal(size=frames)
         for c in range(channels)], axis=1)
    return np.clip(out, -1, 1).astype(np.float32)


# ---------------------------------------------------------------- G.711


def test_g711_tables_match_stdlib_audioop():
    audioop = pytest.importorskip("audioop")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # audioop is deprecated in 3.12
        codes = bytes(range(256))
        u_ref = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
        a_ref = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert np.array_equal(g711.ulaw_to_i16(np.frombuffer(codes, np.uint8)),
                          u_ref)
    assert np.array_equal(g711.alaw_to_i16(np.frombuffer(codes, np.uint8)),
                          a_ref)


# ---------------------------------------------------------------- W64

_W64_RIFF = b"riff" + bytes.fromhex("2e91cf11a5d628db04c10000")
_W64_SUF = bytes.fromhex("f3acd3118cd100c04f8edb8a")
_KS_PCM_SUF = bytes.fromhex("000000001000800000aa00389b71")


def _w64_chunk(fourcc: bytes, body: bytes) -> bytes:
    blob = fourcc + _W64_SUF + struct.pack("<Q", 24 + len(body)) + body
    return blob + b"\x00" * (-len(blob) % 8)


def write_w64(path, data, sr, subtype="PCM_16", extensible=False):
    frames, ch = data.shape
    if subtype == "PCM_16":
        tag, bits = 1, 16
        payload = np.clip(np.rint(data * 32768.0), -32768, 32767)\
            .astype("<i2").tobytes()
    elif subtype == "FLOAT":
        tag, bits = 3, 32
        payload = data.astype("<f4").tobytes()
    elif subtype == "ULAW":
        tag, bits = 7, 8
        lin = np.clip(np.rint(data * 32768.0), -32768, 32767)\
            .astype("<i2").tobytes()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
            payload = audioop.lin2ulaw(lin, 2)
    else:
        raise AssertionError(subtype)
    bpf = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 0xFFFE if extensible else tag,
                      ch, sr, sr * bpf, bpf, bits)
    if extensible:
        fmt += struct.pack("<HHI", 22, bits, (1 << ch) - 1)
        fmt += struct.pack("<H", tag) + _KS_PCM_SUF
    body = _w64_chunk(b"fmt ", fmt) + _w64_chunk(b"data", payload)
    head = _W64_RIFF + struct.pack("<Q", 40 + len(body)) + \
        b"wave" + _W64_SUF
    with open(path, "wb") as f:
        f.write(head + body)


def test_w64_pcm16_stereo_roundtrip(tmp_path):
    x = _sig(3000, channels=2)
    p = str(tmp_path / "a.w64")
    write_w64(p, x, SR)
    inf = w64.info(p)
    assert (inf.samplerate, inf.channels, inf.frames, inf.subtype) == \
        (SR, 2, 3000, "PCM_16")
    data, sr = w64.read(p)
    assert sr == SR and data.shape == (3000, 2)
    np.testing.assert_allclose(data, x, atol=1.0 / 32768)


def test_w64_float32_and_extensible(tmp_path):
    x = _sig(1000)
    pf = str(tmp_path / "f.w64")
    write_w64(pf, x, SR, subtype="FLOAT")
    assert w64.info(pf).subtype == "FLOAT"
    np.testing.assert_array_equal(w64.read(pf)[0], x[:, 0])

    pe = str(tmp_path / "e.w64")
    write_w64(pe, x, SR, extensible=True)
    assert w64.info(pe).subtype == "PCM_16"


def test_w64_ulaw_matches_g711(tmp_path):
    """G.711 W64 (format tag 7) decodes through the pinned tables —
    libsndfile reads these, so the reference incidentally did too."""
    audioop = pytest.importorskip("audioop")
    x = _sig(1200)
    p = str(tmp_path / "u.w64")
    write_w64(p, x, SR, subtype="ULAW")
    inf = w64.info(p)
    assert inf.subtype == "ULAW" and inf.frames == 1200
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lin = np.clip(np.rint(x[:, 0] * 32768.0), -32768, 32767).astype("<i2")
        ref = np.frombuffer(
            audioop.ulaw2lin(audioop.lin2ulaw(lin.tobytes(), 2), 2),
            "<i2").astype(np.float32) / 32768.0
    np.testing.assert_array_equal(w64.read(p)[0], ref)


def test_w64_range_read_and_eof_clamp(tmp_path):
    x = _sig(2000)
    p = str(tmp_path / "r.w64")
    write_w64(p, x, SR)
    full, _ = w64.read(p)
    part, _ = w64.read(p, start=500, frames=700)
    np.testing.assert_array_equal(part, full[500:1200])
    tail, _ = w64.read(p, start=1900, frames=10_000)  # clamps at EOF
    assert tail.shape[0] == 100


def test_w64_truncated_payload_clamps(tmp_path):
    x = _sig(2000)
    p = str(tmp_path / "t.w64")
    write_w64(p, x, SR)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) - 999])
    inf = w64.info(p)
    assert 0 < inf.frames < 2000
    data, _ = w64.read(p)
    assert data.shape[0] == inf.frames


def test_w64_odd_sized_chunk_alignment(tmp_path):
    """A chunk whose payload is not a multiple of 8 must still land the
    NEXT chunk on its 8-byte boundary (sizes include the 24-byte header)."""
    x = _sig(100)
    payload = np.clip(np.rint(x * 32768), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, SR, SR * 2, 2, 16)
    # 5-byte junk chunk between fmt and data exercises the alignment walk
    body = _w64_chunk(b"fmt ", fmt) + _w64_chunk(b"junk", b"abcde") + \
        _w64_chunk(b"data", payload)
    head = _W64_RIFF + struct.pack("<Q", 40 + len(body)) + b"wave" + _W64_SUF
    p = str(tmp_path / "odd.w64")
    open(p, "wb").write(head + body)
    data, sr = w64.read(p)
    assert sr == SR and data.shape[0] == 100


# ---------------------------------------------------------------- CAF


def write_caf(path, data, sr, subtype="PCM_16", little=False,
              data_size=None):
    frames, ch = data.shape
    if subtype == "PCM_16":
        flags, bits = (2 if little else 0), 16
        payload = np.clip(np.rint(data * 32768.0), -32768, 32767)\
            .astype("<i2" if little else ">i2").tobytes()
    elif subtype == "FLOAT":
        flags, bits = (3 if little else 1), 32
        payload = data.astype("<f4" if little else ">f4").tobytes()
    elif subtype == "ULAW":
        import audioop

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            lin = np.clip(np.rint(data * 32768.0), -32768, 32767)\
                .astype("<i2").tobytes()
            payload = audioop.lin2ulaw(lin, 2)
        flags, bits = 0, 8
    else:
        raise AssertionError(subtype)
    fmt_id = b"ulaw" if subtype == "ULAW" else b"lpcm"
    bpp = ch * max(bits // 8, 1)
    desc = struct.pack(">d", float(sr)) + fmt_id + \
        struct.pack(">5I", flags, bpp, 1, ch, bits)
    dsize = (4 + len(payload)) if data_size is None else data_size
    blob = (b"caff" + struct.pack(">HH", 1, 0)
            + b"desc" + struct.pack(">q", 32) + desc
            + b"data" + struct.pack(">q", dsize) + struct.pack(">I", 7)
            + payload)
    with open(path, "wb") as f:
        f.write(blob)


def test_caf_be_pcm16_roundtrip(tmp_path):
    x = _sig(2500, channels=2, seed=1)
    p = str(tmp_path / "a.caf")
    write_caf(p, x, SR)
    inf = caf.info(p)
    assert (inf.samplerate, inf.channels, inf.frames, inf.subtype) == \
        (SR, 2, 2500, "PCM_16")
    assert not inf.little_endian
    data, sr = caf.read(p)
    np.testing.assert_allclose(data, x, atol=1.0 / 32768)


def test_caf_le_float_and_unknown_size(tmp_path):
    x = _sig(800)
    p = str(tmp_path / "f.caf")
    write_caf(p, x, SR, subtype="FLOAT", little=True, data_size=-1)
    inf = caf.info(p)
    assert inf.subtype == "FLOAT" and inf.little_endian
    assert inf.frames == 800  # -1 size extends to EOF
    np.testing.assert_array_equal(caf.read(p)[0], x[:, 0])


def test_caf_ulaw_matches_g711(tmp_path):
    pytest.importorskip("audioop")
    x = _sig(1200, seed=2)
    p = str(tmp_path / "u.caf")
    write_caf(p, x, SR, subtype="ULAW")
    inf = caf.info(p)
    assert inf.subtype == "ULAW" and inf.frames == 1200
    data, _ = caf.read(p)
    # one mu-law quantization step at full scale is ~1/32 FS near peak;
    # RMS error of the compander on this signal is far below that
    assert np.max(np.abs(data - x[:, 0])) < 0.04


def test_caf_range_read(tmp_path):
    x = _sig(2000, seed=3)
    p = str(tmp_path / "r.caf")
    write_caf(p, x, SR)
    full, _ = caf.read(p)
    part, _ = caf.read(p, start=123, frames=456)
    np.testing.assert_array_equal(part, full[123:579])


def test_caf_compressed_format_rejected(tmp_path):
    desc = struct.pack(">d", 22050.0) + b"aac " + struct.pack(">5I", 0, 0, 1024, 2, 0)
    blob = (b"caff" + struct.pack(">HH", 1, 0)
            + b"desc" + struct.pack(">q", 32) + desc
            + b"data" + struct.pack(">q", 100) + b"\x00" * 100)
    p = str(tmp_path / "aac.caf")
    open(p, "wb").write(blob)
    with pytest.raises(caf.CafFormatError):
        caf.info(p)


# ---------------------------------------------------------------- AU


def test_au_pcm16_sunau_oracle(tmp_path):
    """Stdlib sunau writes the file; our reader must agree exactly."""
    sunau = pytest.importorskip("sunau")
    x = _sig(1500, channels=2, seed=4)
    # sunau writes PCM frames verbatim — the caller supplies big-endian
    i16 = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(">i2")
    p = str(tmp_path / "a.au")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = sunau.open(p, "w")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.setcomptype("NONE", "")
        w.writeframes(i16.tobytes())
        w.close()
    inf = au.info(p)
    assert (inf.samplerate, inf.channels, inf.frames, inf.subtype) == \
        (SR, 2, 1500, "PCM_16")
    data, sr = au.read(p)
    np.testing.assert_array_equal(
        np.clip(np.rint(data * 32768.0), -32768, 32767).astype(np.int16),
        i16.astype(np.int16))


def test_au_ulaw_sunau_oracle(tmp_path):
    sunau = pytest.importorskip("sunau")
    x = _sig(900, seed=5)
    i16 = np.clip(np.rint(x * 32768.0), -32768, 32767).astype("<i2")
    p = str(tmp_path / "u.au")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = sunau.open(p, "w")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.setcomptype("ULAW", "")
        w.writeframes(i16.tobytes())
        w.close()

        import audioop

        codes = audioop.lin2ulaw(i16.tobytes(), 2)
        ref = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    inf = au.info(p)
    assert inf.subtype == "ULAW" and inf.samplerate == 8000
    data, _ = au.read(p)
    np.testing.assert_array_equal(
        np.rint(data * 32768.0).astype(np.int16), ref)


def test_au_unknown_data_size_reads_to_eof(tmp_path):
    x = _sig(700, seed=6)
    payload = np.clip(np.rint(x * 32768), -32768, 32767).astype(">i2").tobytes()
    p = str(tmp_path / "e.au")
    with open(p, "wb") as f:
        f.write(b".snd" + struct.pack(">5I", 28, 0xFFFFFFFF, 3, SR, 1))
        f.write(b"ann\x00")  # 4-byte annotation pad up to offset 28
        f.write(payload)
    inf = au.info(p)
    assert inf.frames == 700 and inf.data_offset == 28
    data, _ = au.read(p, start=100, frames=50)
    np.testing.assert_array_equal(
        np.rint(data * 32768.0).astype(np.int16),
        np.frombuffer(payload, ">i2")[100:150].astype(np.int16))


def test_au_float_and_alaw(tmp_path):
    x = _sig(400, seed=7)
    pf = str(tmp_path / "f.au")
    with open(pf, "wb") as f:
        f.write(b".snd" + struct.pack(">5I", 24, 400 * 4, 6, SR, 1))
        f.write(x[:, 0].astype(">f4").tobytes())
    np.testing.assert_array_equal(au.read(pf)[0], x[:, 0])

    audioop = pytest.importorskip("audioop")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lin = np.clip(np.rint(x[:, 0] * 32768), -32768, 32767)\
            .astype("<i2").tobytes()
        codes = audioop.lin2alaw(lin, 2)
        ref = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    pa = str(tmp_path / "a.au")
    with open(pa, "wb") as f:
        f.write(b".snd" + struct.pack(">5I", 24, len(codes), 27, 8000, 1))
        f.write(codes)
    assert au.info(pa).subtype == "ALAW"
    np.testing.assert_array_equal(
        np.rint(au.read(pa)[0] * 32768.0).astype(np.int16), ref)


def test_au_compressed_encoding_rejected(tmp_path):
    p = str(tmp_path / "g721.au")
    with open(p, "wb") as f:
        f.write(b".snd" + struct.pack(">5I", 24, 100, 23, 8000, 1))  # G.721
        f.write(b"\x00" * 100)
    with pytest.raises(au.AuFormatError):
        au.info(p)


# ---------------------------------------------------------------- SPHERE


def write_sphere(path, data, sr, coding="pcm", nbytes=2, byte_format="01",
                 sample_count=None, extra_lines=()):
    frames, ch = data.shape
    if coding == "pcm":
        dt = ("<" if byte_format == "01" else ">") + f"i{nbytes}"
        scale = float(1 << (8 * nbytes - 1))
        payload = np.clip(np.rint(data * scale), -scale, scale - 1)\
            .astype(dt).tobytes()
    elif coding == "ulaw":
        import audioop

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            lin = np.clip(np.rint(data * 32768.0), -32768, 32767)\
                .astype("<i2").tobytes()
            payload = audioop.lin2ulaw(lin, 2)
        nbytes = 1
    else:
        payload = b"\x00" * (frames * ch * nbytes)
    lines = [
        b"NIST_1A",
        b"   1024",
        f"channel_count -i {ch}".encode(),
        f"sample_count -i {frames if sample_count is None else sample_count}"
        .encode(),
        f"sample_rate -i {sr}".encode(),
        f"sample_n_bytes -i {nbytes}".encode(),
        f"sample_byte_format -s{len(byte_format)} {byte_format}".encode(),
        f"sample_coding -s{len(coding)} {coding}".encode(),
        *extra_lines,
        b"end_head",
    ]
    head = b"\n".join(lines) + b"\n"
    assert len(head) <= 1024
    with open(path, "wb") as f:
        f.write(head + b" " * (1024 - len(head)) + payload)


def test_sphere_pcm16_le_and_be(tmp_path):
    x = _sig(1800, seed=8)
    for bf in ("01", "10"):
        p = str(tmp_path / f"s{bf}.sph")
        write_sphere(p, x, 16000, byte_format=bf)
        inf = sphere.info(p)
        assert (inf.samplerate, inf.channels, inf.frames, inf.subtype) == \
            (16000, 1, 1800, "PCM_16")
        data, sr = sphere.read(p)
        np.testing.assert_allclose(data, x[:, 0], atol=1.0 / 32768)


def test_sphere_ulaw(tmp_path):
    pytest.importorskip("audioop")
    x = _sig(1000, seed=9)
    p = str(tmp_path / "u.sph")
    write_sphere(p, x, 8000, coding="ulaw")
    inf = sphere.info(p)
    assert inf.subtype == "ULAW"
    data, _ = sphere.read(p)
    assert np.max(np.abs(data - x[:, 0])) < 0.04


def test_sphere_range_and_truncation(tmp_path):
    x = _sig(2000, channels=2, seed=10)
    p = str(tmp_path / "r.sph")
    write_sphere(p, x, 16000)
    full, _ = sphere.read(p)
    part, _ = sphere.read(p, start=77, frames=333)
    np.testing.assert_array_equal(part, full[77:410])
    # physical truncation clamps frames below the declared sample_count
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) - 1001])
    inf = sphere.info(p)
    assert 0 < inf.frames < 2000
    assert sphere.read(p)[0].shape[0] == inf.frames


def test_sphere_shorten_rejected(tmp_path):
    x = _sig(100, seed=11)
    p = str(tmp_path / "sh.sph")
    write_sphere(p, x, 16000, coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(sphere.SphereFormatError):
        sphere.info(p)


# ------------------------------------------------- dispatch + pipeline


def test_probe_and_read_any_dispatch_all_four(tmp_path):
    x = _sig(1200, seed=12)
    paths = {}
    write_w64(str(tmp_path / "d.w64"), x, SR)
    write_caf(str(tmp_path / "d.caf"), x, SR)
    write_sphere(str(tmp_path / "d.sph"), x, 16000)
    with open(str(tmp_path / "d.au"), "wb") as f:
        f.write(b".snd" + struct.pack(">5I", 24, 1200 * 2, 3, SR, 1))
        f.write(np.clip(np.rint(x[:, 0] * 32768), -32768, 32767)
                .astype(">i2").tobytes())
    paths = {"w64": "d.w64", "caf": "d.caf", "sph": "d.sph", "au": "d.au"}
    for kind, name in paths.items():
        p = str(tmp_path / name)
        inf = probe(p)
        assert inf.frames == 1200, kind
        data, sr = read_any(p)
        assert data.shape[0] == 1200 and sr == inf.samplerate, kind
        mono, msr = load_audio(p)
        assert mono is not None and msr == 22050, kind


def test_fused_detect_w64_matches_wav(tmp_path):
    """detect_file_fused routes W64 through the generic host-decode path
    and produces the same intervals as identical audio in a WAV file."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector

    rng = np.random.default_rng(13)
    audio = (rng.uniform(-0.4, 0.4, 8 * 22050) * 32767).astype(np.int16)
    pw64 = str(tmp_path / "x.w64")
    pwav = str(tmp_path / "x.wav")
    write_w64(pw64, audio.astype(np.float32)[:, None] / 32768.0, 22050)
    wavio.write(pwav, audio.astype(np.float32) / 32768.0, 22050,
                subtype="PCM_16")

    cfg = Config().with_engine(precision="parity", device_batch=8,
                               chunk_seconds=6.0)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    ra = det.detect_file_fused(pw64)
    rw = det.detect_file_fused(pwav)
    assert ra.num_windows == rw.num_windows
    assert ra.intervals == rw.intervals


def test_stream_chunks_concat_equals_load_caf(tmp_path):
    from softspoken_tpu.io.audio import stream_chunks

    x = _sig(5 * SR, seed=14)
    p = str(tmp_path / "long.caf")
    write_caf(p, x, SR)
    whole, _ = load_audio(p)
    parts = [c.data for c in stream_chunks(p, 22050)]
    np.testing.assert_array_equal(np.concatenate(parts), whole)
