"""Third-party WAV/AIFF/AU interop against independent oracles.

The reference reads whatever libsndfile reads (voice_activity.py:37
``sf.read``), including big-endian RIFX containers, G.711 mu-law/A-law WAV
(format tags 7/6), and odd valid-bit widths stored in 1-8 byte containers.
None of our own round-trip tests could catch a misread of files OTHER
writers produced, so this suite decodes real third-party corpora:

  * scipy's test-suite WAVs (shipped in this image's scipy install):
    RIFX big-endian PCM/float, a third-party RF64, WAVEX 64-bit float,
    12/20/36/45/53-bit containers, unsigned 8-bit, and two
    deliberately-corrupt headers.  Oracle: ``scipy.io.wavfile`` itself
    (which left-justifies each container into the smallest numpy dtype —
    the comparison rescales accordingly).
  * CPython's test audio data (pluck-* AIFF/AU, present under the
    sandboxing mount when available).  Oracles: stdlib ``aifc``/``sunau``
    (sunau decodes mu-law internally via audioop).
  * stdlib ``audioop`` G.711 tables for mu-law WAV payloads.

Synthetic RIFX/ULAW files built in-test keep the core coverage alive even
where the external corpora are absent.
"""

import os
import struct
import warnings

import numpy as np
import pytest

from softspoken_tpu.io import audio as audiomod
from softspoken_tpu.io import wavio

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    try:
        import audioop  # removed in Python 3.13
    except ImportError:  # pragma: no cover
        audioop = None


def _scipy_data_dir():
    try:
        import scipy.io as sio
    except ImportError:  # pragma: no cover
        return None
    d = os.path.join(os.path.dirname(sio.__file__), "tests", "data")
    return d if os.path.isdir(d) else None

_SCIPY_DIR = _scipy_data_dir()
_SCIPY_WAVS = (sorted(f for f in os.listdir(_SCIPY_DIR) if f.endswith(".wav"))
               if _SCIPY_DIR else [])

# CPython's own test corpus (third-party-authored AIFF/AU); optional mount
_CPY_AUDIODATA = ("/mnt/sandboxing/model_tools_env/v1/python/install/"
                  "lib/python3.11/test/audiodata")


# ---------------------------------------------------------------------------
# scipy corpus: every file either matches the scipy oracle or both reject


@pytest.mark.skipif(not _SCIPY_WAVS, reason="scipy test data not present")
@pytest.mark.parametrize("name", _SCIPY_WAVS)
def test_scipy_corpus_oracle(name):
    from scipy.io import wavfile

    path = os.path.join(_SCIPY_DIR, name)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sr_ref, ref_raw = wavfile.read(path)
        scipy_ok = True
    except Exception:
        scipy_ok = False

    if not scipy_ok:
        # exact known filenames only — a new scipy corpus file that scipy
        # rejects must land in the corrupt-header branch below, not be
        # silently waved through a substring match
        if name in ("test-8000Hz-le-1ch-1byte-ulaw.wav",
                    "test-8000Hz-le-3ch-5S-24bit-inconsistent.wav"):
            # scipy has no G.711 / rejects the lying header fields; we
            # read liberally (libsndfile also reads these).  Expected
            # shape comes from our own header probe, which the exact
            # decode oracles elsewhere pin down (test_ulaw_wav_matches_
            # audioop, the PCM container tests).
            inf = wavio.info(path)
            d, sr = wavio.read(path, always_2d=True)
            assert sr == inf.samplerate
            assert d.shape == (inf.frames, inf.channels)
            assert inf.frames > 0
            return
        # corrupt headers: we must reject cleanly with the format error
        with pytest.raises(wavio.WavFormatError):
            wavio.read(path)
        return

    d, sr = wavio.read(path, always_2d=True)
    inf = wavio.info(path)
    assert sr == sr_ref
    ref = np.asarray(ref_raw).reshape(len(ref_raw), -1)
    if ref.dtype == np.uint8:
        expect = (ref.astype(np.float32) - 128.0) / 128.0
    elif ref.dtype.kind == "f":
        expect = ref.astype(np.float32)
    else:
        # scipy left-justifies the container into its dtype; both scalings
        # are then container-full-scale, so the values must agree exactly
        expect = (ref.astype(np.float64)
                  / float(1 << (8 * ref.dtype.itemsize - 1))).astype(
                      np.float32)
    assert d.shape == expect.shape, (inf.subtype, d.shape, expect.shape)
    np.testing.assert_array_equal(d, expect, err_msg=inf.subtype)


@pytest.mark.skipif(not _SCIPY_WAVS, reason="scipy test data not present")
def test_scipy_corpus_coverage():
    """The interesting format classes must actually be present and READ
    (guards against the corpus silently shrinking in a scipy upgrade)."""
    subtypes = set()
    for name in _SCIPY_WAVS:
        try:
            subtypes.add(wavio.info(os.path.join(_SCIPY_DIR, name)).subtype)
        except wavio.WavFormatError:
            pass
    for needed in ("PCM_32_BE", "FLOAT_BE", "ULAW", "PCM_40", "PCM_64",
                   "DOUBLE", "PCM_U8", "PCM_16", "PCM_24", "PCM_32"):
        assert needed in subtypes, f"corpus no longer exercises {needed}"


@pytest.mark.skipif(audioop is None or not _SCIPY_WAVS,
                    reason="audioop or scipy data missing")
def test_ulaw_wav_matches_audioop():
    path = os.path.join(_SCIPY_DIR, "test-8000Hz-le-1ch-1byte-ulaw.wav")
    inf = wavio.info(path)
    assert inf.subtype == "ULAW" and inf.bytes_per_sample == 1
    with open(path, "rb") as f:
        f.seek(inf.data_offset)
        payload = f.read(inf.data_bytes)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        lin = audioop.ulaw2lin(payload, 2)
    expect = np.frombuffer(lin, "<i2").astype(np.float32) / 32768.0
    d, sr = wavio.read(path)
    assert sr == 8000
    np.testing.assert_array_equal(d, expect)


# ---------------------------------------------------------------------------
# synthetic RIFX / ULAW files: coverage independent of external corpora


def _write_rifx_pcm16(path, data_i16, samplerate, channels):
    """Minimal big-endian RIFX PCM16 writer (test vector only)."""
    payload = data_i16.astype(">i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFX" + struct.pack(">I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack(
            ">IHHIIHH", 16, 1, channels, samplerate,
            samplerate * channels * 2, channels * 2, 16))
        f.write(b"data" + struct.pack(">I", len(payload)) + payload)


def test_rifx_pcm16_equals_le_read(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32767, size=(256, 2), dtype=np.int64)
    be = str(tmp_path / "be.wav")
    le = str(tmp_path / "le.wav")
    _write_rifx_pcm16(be, x, 22050, 2)
    wavio.write(le, x.astype(np.float32) / 32768.0, 22050, subtype="PCM_16")
    db, srb = wavio.read(be, always_2d=True)
    dl, srl = wavio.read(le, always_2d=True)
    assert srb == srl == 22050
    assert wavio.info(be).subtype == "PCM_16_BE"
    np.testing.assert_array_equal(db, dl)
    # range reads go through the same container-aware byte addressing
    mid, _ = wavio.read(be, start=100, frames=50, always_2d=True)
    np.testing.assert_array_equal(mid, dl[100:150])


@pytest.mark.skipif(audioop is None, reason="audioop missing")
def test_ulaw_wav_bits16_header(tmp_path):
    """G.711 WAV with wBitsPerSample=16 (the DECODED width, as some
    encoders write, mirroring AIFF-C COMM) must still decode; libsndfile
    ignores the bits field for ULAW/ALAW."""
    sr = 8000
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        codes = audioop.lin2ulaw(
            (np.linspace(-0.8, 0.8, 500) * 32767).astype("<i2").tobytes(), 2)
    for bits in (0, 8, 16):
        path = str(tmp_path / f"u{bits}.wav")
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", 36 + len(codes)) + b"WAVE")
            f.write(b"fmt " + struct.pack(
                "<IHHIIHH", 16, 7, 1, sr, sr, 1, bits))
            f.write(b"data" + struct.pack("<I", len(codes)) + codes)
        inf = wavio.info(path)
        assert inf.subtype == "ULAW" and inf.frames == 500
        assert inf.bytes_per_sample == 1
        d, osr = wavio.read(path)
        assert osr == sr and len(d) == 500
    # all three headers decode identically (codes are the same bytes)
    d0 = wavio.read(str(tmp_path / "u0.wav"))[0]
    d16 = wavio.read(str(tmp_path / "u16.wav"))[0]
    np.testing.assert_array_equal(d0, d16)


@pytest.mark.skipif(audioop is None, reason="audioop missing")
def test_ulaw_wav_full_stack(tmp_path):
    """ULAW WAV through probe / load_audio / the streaming silencer."""
    from softspoken_tpu.config import DEFAULT_CONFIG
    from softspoken_tpu.silence.silencer import SilenceRunner

    sr = 8000
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        codes = audioop.lin2ulaw(
            (x * 32767).astype("<i2").tobytes(), 2)
    path = str(tmp_path / "voice.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(codes)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 7, 1, sr, sr, 1, 8))
        f.write(b"data" + struct.pack("<I", len(codes)) + codes)
        if len(codes) & 1:
            f.write(b"\x00")

    dur, native_sr = audiomod.get_audio_data(path)
    assert native_sr == sr and abs(dur - 2.0) < 1e-6
    mono, out_sr = audiomod.load_audio(path)
    assert out_sr == DEFAULT_CONFIG.dsp.sample_rate
    assert mono is not None and len(mono) > 0

    # streaming silencer write-back (force the chunked path)
    sil = SilenceRunner(output_dir=str(tmp_path), subtype="PCM_16",
                        stream_threshold_bytes=0)
    out = str(tmp_path / "voice_silenced.wav")
    sil._silence_one(path, out, [(0.5, 1.0)])
    d, osr = wavio.read(out)
    assert osr == sr
    seg = d[int(round(0.5 * sr)):int(round(1.0 * sr))]
    assert np.max(np.abs(seg)) == 0.0
    # outside the interval the companded signal survives
    assert np.max(np.abs(d[: int(0.4 * sr)])) > 0.1


def test_wide_container_sign_and_scale(tmp_path):
    """5-byte container: sign extension and container-full-scale check."""
    # two samples: +2^31 (halfway up a 40-bit container) and -2^39 (min)
    vals = np.array([1 << 31, -(1 << 39)], np.int64)
    b = np.zeros((2, 5), np.uint8)
    for i, v in enumerate(vals):
        u = int(v) & ((1 << 40) - 1)
        for k in range(5):  # little-endian container
            b[i, k] = (u >> (8 * k)) & 0xFF
    payload = b.tobytes()
    path = str(tmp_path / "w40.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                      8000 * 5, 5, 40))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    inf = wavio.info(path)
    assert inf.subtype == "PCM_40" and inf.bytes_per_sample == 5
    d, _ = wavio.read(path)
    np.testing.assert_allclose(d, [2.0 ** -8, -1.0], rtol=0, atol=0)


# ---------------------------------------------------------------------------
# CPython test corpus (optional mount): AIFF/AU vs stdlib aifc/sunau


_HAS_CPY = os.path.isdir(_CPY_AUDIODATA)


@pytest.mark.skipif(not _HAS_CPY, reason="CPython test audio not present")
@pytest.mark.parametrize("name,width", [
    ("pluck-pcm8.aiff", 1), ("pluck-pcm16.aiff", 2),
    ("pluck-pcm24.aiff", 3), ("pluck-pcm32.aiff", 4),
])
def test_cpython_aiff_matches_aifc(name, width):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # aifc removal deprecation
        import aifc

    from softspoken_tpu.io import aiff as aiffmod

    path = os.path.join(_CPY_AUDIODATA, name)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = aifc.open(path)
        n, ch = a.getnframes(), a.getnchannels()
        raw = np.frombuffer(a.readframes(n), np.uint8).reshape(-1, width)
    v = np.zeros(len(raw), np.int64)
    for i in range(width):  # AIFF PCM is big-endian
        v = (v << 8) | raw[:, i]
    v = (v << (64 - 8 * width)) >> (64 - 8 * width)
    expect = (v.astype(np.float64) / float(1 << (8 * width - 1))).astype(
        np.float32).reshape(-1, ch)
    d, sr = aiffmod.read(path, always_2d=True)
    assert sr == 11025
    np.testing.assert_array_equal(d, expect)


@pytest.mark.skipif(audioop is None, reason="audioop missing")
@pytest.mark.parametrize("comp", [b"ulaw", b"alaw"])
def test_aifc_g711_matches_stdlib_aifc(comp, tmp_path):
    """stdlib aifc WRITES G.711 AIFF-C (via audioop) — an independent
    encoder for our ULAW/ALAW AIFF decode."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import aifc

    from softspoken_tpu.io import aiff as aiffmod

    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32767, size=2048, dtype=np.int64).astype("<i2")
    path = str(tmp_path / f"g711_{comp.decode()}.aifc")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = aifc.open(path, "wb")
        a.setnchannels(1)
        a.setsampwidth(2)
        a.setframerate(11025)
        a.setcomptype(comp, b"")
        a.writeframes(pcm.tobytes())
        a.close()
        codes = (audioop.lin2ulaw if comp == b"ulaw"
                 else audioop.lin2alaw)(pcm.tobytes(), 2)
        lin = (audioop.ulaw2lin if comp == b"ulaw"
               else audioop.alaw2lin)(codes, 2)
    expect = np.frombuffer(lin, "<i2").astype(np.float32) / 32768.0
    inf = aiffmod.info(path)
    assert inf.subtype == comp.decode().upper()
    assert inf.frames == len(pcm) and inf.bytes_per_sample == 1
    d, sr = aiffmod.read(path)
    assert sr == 11025
    np.testing.assert_array_equal(d, expect)
    # range reads address by the 1-byte container
    mid, _ = aiffmod.read(path, start=100, frames=64)
    np.testing.assert_array_equal(mid, expect[100:164])


@pytest.mark.skipif(not _HAS_CPY, reason="CPython test audio not present")
@pytest.mark.parametrize("name,width", [
    ("pluck-pcm8.au", 1), ("pluck-pcm16.au", 2),
    ("pluck-pcm24.au", 3), ("pluck-pcm32.au", 4),
    ("pluck-ulaw.au", 2),
])
def test_cpython_au_matches_sunau(name, width):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # sunau removal deprecation
        import sunau

    from softspoken_tpu.io import au as aumod

    path = os.path.join(_CPY_AUDIODATA, name)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s = sunau.open(path)
        ch = s.getnchannels()
        raw = s.readframes(s.getnframes())
    if name.endswith("ulaw.au"):
        # sunau decodes mu-law internally (audioop) → native int16
        expect = (np.frombuffer(raw, "<i2").astype(np.float32)
                  / 32768.0).reshape(-1, ch)
    else:
        b = np.frombuffer(raw, np.uint8).reshape(-1, width)
        v = np.zeros(len(b), np.int64)
        for i in range(width):  # AU PCM is big-endian
            v = (v << 8) | b[:, i]
        v = (v << (64 - 8 * width)) >> (64 - 8 * width)
        expect = (v.astype(np.float64)
                  / float(1 << (8 * width - 1))).astype(
                      np.float32).reshape(-1, ch)
    d, sr = aumod.read(path, always_2d=True)
    assert sr == 11025
    np.testing.assert_array_equal(d, expect)
