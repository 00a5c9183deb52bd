"""MS / IMA ADPCM WAV decode.

The reference reads audio through libsndfile (``voice_activity.py:37``),
which decodes ADPCM WAVs from legacy field recorders; ``io/wavio.py`` covers
them natively.  The decoders here are validated two ways: round-trip against
independent in-test encoders (this file), and bit-exact against SDL's decoder
on a real third-party MS ADPCM file (tests/test_real_audio.py).
"""

import struct

import numpy as np
import pytest

from softspoken_tpu.io import wavio

# ---------------------------------------------------------------------------
# In-test encoders.  Deliberately simple (fixed predictor for MS); what the
# decoder must reproduce is the encoder's *reconstruction*, not the input.

_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _div_trunc(q, d):
    return q // d if q >= 0 else -((-q) // d)


def _encode_ms_block(x, spb):
    """x: int list (one channel, spb samples) → (block bytes, reconstruction)."""
    c1, c2 = _MS_COEFS[0]
    delta = 32
    s2, s1 = int(x[0]), int(x[1])
    hdr = struct.pack("<Bhhh", 0, delta, s1, s2)
    recon = [s2, s1]
    nibs = []
    for want in x[2:]:
        pred = _div_trunc(s1 * c1 + s2 * c2, 256)
        code = max(-8, min(7, _div_trunc(int(want) - pred, delta)))
        val = max(-32768, min(32767, pred + code * delta))
        nibs.append(code & 0xF)
        recon.append(val)
        s2, s1 = s1, val
        delta = max(16, (_MS_ADAPT[code & 0xF] * delta) // 256)
    while len(nibs) % 2:
        nibs.append(0)
    data = bytes((nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2))
    return hdr + data, recon


_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]
_IMA_STEPS = wavio._IMA_STEPS.tolist()


def _encode_ima_channel(x, spb):
    """One channel → (4-byte header, nibble list, reconstruction)."""
    pred = int(x[0])
    idx = 0
    hdr = struct.pack("<hBB", pred, idx, 0)
    recon = [pred]
    nibs = []
    for want in x[1:]:
        step = _IMA_STEPS[idx]
        diff = int(want) - pred
        code = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
            diff -= step >> 2
        mag = (step >> 3) \
            + ((step >> 2) if code & 1 else 0) \
            + ((step >> 1) if code & 2 else 0) \
            + (step if code & 4 else 0)
        pred = max(-32768, min(32767, pred - mag if code & 8 else pred + mag))
        idx = max(0, min(88, idx + _IMA_INDEX[code & 7]))
        nibs.append(code)
        recon.append(pred)
    return hdr, nibs, recon


def _encode_ms_block_stereo(x, spb):
    """(spb, 2) int samples → (block bytes, (spb, 2) reconstruction).

    MS ADPCM stereo layout: per-channel headers interleaved (predictors,
    deltas, sample1s, sample2s), then nibbles alternate channels with the
    high nibble first (L in high, R in low of each byte)."""
    c1, c2 = _MS_COEFS[0]
    delta = [32, 32]
    s2 = [int(x[0, 0]), int(x[0, 1])]
    s1 = [int(x[1, 0]), int(x[1, 1])]
    hdr = struct.pack("<BB", 0, 0)
    hdr += struct.pack("<hh", delta[0], delta[1])
    hdr += struct.pack("<hh", s1[0], s1[1])
    hdr += struct.pack("<hh", s2[0], s2[1])
    recon = [[s2[0], s2[1]], [s1[0], s1[1]]]
    nibs = []
    for i in range(2, spb):
        row = []
        for c in range(2):
            pred = _div_trunc(s1[c] * c1 + s2[c] * c2, 256)
            code = max(-8, min(7, _div_trunc(int(x[i, c]) - pred, delta[c])))
            val = max(-32768, min(32767, pred + code * delta[c]))
            nibs.append(code & 0xF)
            row.append(val)
            s2[c], s1[c] = s1[c], val
            delta[c] = max(16, (_MS_ADAPT[code & 0xF] * delta[c]) // 256)
        recon.append(row)
    data = bytes((nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2))
    return hdr + data, recon


def _write_ms_stereo(path, x, sr=11025, spb=64, fact=None):
    """(n, 2) int16 → stereo MS ADPCM WAV.  Returns (n', 2) reconstruction."""
    block_align = 7 * 2 + (spb - 2) * 2 // 2
    extra = struct.pack("<HHH", 4 + 4 * 7, spb, 7)
    for a, b in _MS_COEFS:
        extra += struct.pack("<hh", a, b)
    blocks, recon = [], []
    for i in range(0, len(x) - spb + 1, spb):
        blk, rec = _encode_ms_block_stereo(x[i:i + spb], spb)
        blocks.append(blk)
        recon.extend(rec)
    _write_wav(path, wavio.WAVE_FORMAT_ADPCM, 2, sr, block_align, 4,
               extra, b"".join(blocks), fact=fact)
    return np.asarray(recon, np.int16)


def _write_wav(path, tag, ch, sr, block_align, bits, extra, data,
               fact=None):
    fmt = struct.pack("<HHIIHH", tag, ch, sr,
                      sr * block_align, block_align, bits) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) % 2:
        chunks += b"\x00"
    if fact is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def _write_ms(path, x, sr=11025, spb=128, fact=None):
    """Mono int16 array → MS ADPCM WAV.  Returns the reconstruction."""
    block_align = 7 + (spb - 2 + 1) // 2
    extra = struct.pack("<HHH", 4 + 4 * 7, spb, 7)
    for a, b in _MS_COEFS:
        extra += struct.pack("<hh", a, b)
    blocks, recon = [], []
    for i in range(0, len(x), spb):
        seg = list(x[i:i + spb])
        if len(seg) < 2:
            break
        blk, rec = _encode_ms_block(seg, spb)
        blocks.append(blk)
        recon.extend(rec)
    _write_wav(path, wavio.WAVE_FORMAT_ADPCM, 1, sr, block_align, 4,
               extra, b"".join(blocks), fact=fact)
    return np.asarray(recon, np.int16)


def _write_ima(path, x, sr=8000, ch=1, groups=4, fact=None):
    """(n, ch) int16 → IMA ADPCM WAV.  Returns (n', ch) reconstruction."""
    x = np.atleast_2d(np.asarray(x, np.int64).T).T if x.ndim == 1 else x
    spb = groups * 8 + 1
    block_align = 4 * ch + groups * 4 * ch
    extra = struct.pack("<HH", 2, spb)
    blocks, recon = [], []
    for i in range(0, len(x) - spb + 1, spb):
        hdrs, chan_nibs, rec = [], [], []
        for c in range(ch):
            hdr, nibs, r = _encode_ima_channel(x[i:i + spb, c], spb)
            hdrs.append(hdr)
            chan_nibs.append(nibs)
            rec.append(r)
        body = bytearray()
        for g in range(groups):
            for c in range(ch):
                for k in range(0, 8, 2):
                    lo = chan_nibs[c][g * 8 + k]
                    hi = chan_nibs[c][g * 8 + k + 1]
                    body.append(lo | (hi << 4))
        blocks.append(b"".join(hdrs) + bytes(body))
        recon.extend(np.asarray(rec).T.tolist())
    _write_wav(path, wavio.WAVE_FORMAT_IMA_ADPCM, ch, sr, block_align, 4,
               extra, b"".join(blocks), fact=fact)
    return np.asarray(recon, np.int16)


def _sig(n, seed=0, scale=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = scale * np.sin(2 * np.pi * 440 * t / 11025) \
        + 0.3 * scale * rng.normal(size=n)
    return np.clip(np.rint(x), -32768, 32767).astype(np.int64)


# ---------------------------------------------------------------------------


def test_ms_adpcm_roundtrip(tmp_path):
    p = str(tmp_path / "ms.wav")
    recon = _write_ms(p, _sig(1000), spb=128)
    inf = wavio.info(p)
    assert inf.subtype == "MS_ADPCM"
    assert inf.samples_per_block == 128
    assert inf.frames == len(recon)
    data, sr = wavio.read(p)
    assert sr == 11025
    np.testing.assert_array_equal(
        np.rint(data * 32768.0).astype(np.int16), recon)


def test_ms_adpcm_range_reads_match_full(tmp_path):
    p = str(tmp_path / "ms.wav")
    _write_ms(p, _sig(900, seed=1), spb=64)
    full, _ = wavio.read(p)
    for start, n in [(0, 10), (63, 2), (64, 64), (100, 500), (890, 50)]:
        part, _ = wavio.read(p, start=start, frames=n)
        np.testing.assert_array_equal(part, full[start:start + n])


def test_ms_adpcm_fact_trims_padded_final_block(tmp_path):
    p = str(tmp_path / "ms.wav")
    recon = _write_ms(p, _sig(256, seed=2), spb=128, fact=200)
    inf = wavio.info(p)
    assert inf.frames == 200
    data, _ = wavio.read(p)
    assert len(data) == 200
    np.testing.assert_array_equal(
        np.rint(data * 32768.0).astype(np.int16), recon[:200])


def test_ima_adpcm_roundtrip_mono(tmp_path):
    p = str(tmp_path / "ima.wav")
    x = _sig(33 * 6, seed=3)[:, None]
    recon = _write_ima(p, x, groups=4)
    inf = wavio.info(p)
    assert inf.subtype == "IMA_ADPCM"
    assert inf.samples_per_block == 33
    data, sr = wavio.read(p)
    assert sr == 8000
    np.testing.assert_array_equal(
        np.rint(data * 32768.0).astype(np.int16), recon[:, 0])


def test_ms_adpcm_roundtrip_stereo(tmp_path):
    p = str(tmp_path / "ms2.wav")
    x = np.stack([_sig(64 * 5, seed=12), _sig(64 * 5, seed=13)], axis=1)
    recon = _write_ms_stereo(p, x, spb=64)
    inf = wavio.info(p)
    assert inf.channels == 2 and inf.subtype == "MS_ADPCM"
    data, sr = wavio.read(p)
    assert sr == 11025 and data.shape == recon.shape
    np.testing.assert_array_equal(
        np.rint(data * 32768.0).astype(np.int16), recon)


def test_ima_adpcm_roundtrip_stereo(tmp_path):
    p = str(tmp_path / "ima2.wav")
    x = np.stack([_sig(33 * 4, seed=4), _sig(33 * 4, seed=5)], axis=1)
    recon = _write_ima(p, x, ch=2, groups=4)
    inf = wavio.info(p)
    assert inf.channels == 2
    data, _ = wavio.read(p)
    assert data.shape == recon.shape
    np.testing.assert_array_equal(
        np.rint(data * 32768.0).astype(np.int16), recon)


def test_adpcm_rawreader_refuses_block_coded(tmp_path):
    p = str(tmp_path / "ms.wav")
    _write_ms(p, _sig(300, seed=6))
    with pytest.raises(wavio.WavFormatError):
        wavio.RawReader(p)
    raw, inf = wavio.read_raw(p)
    assert raw is None and inf.subtype == "MS_ADPCM"


def test_adpcm_overlarge_spb_rejected(tmp_path):
    """A header wSamplesPerBlock past the block's physical nibble capacity
    must raise WavFormatError, not index past the nibble matrix."""
    x = _sig(256, seed=9)
    for make, cap_spb, bogus in (
        (lambda p, s: _write_ms(p, x, spb=s), 128, 4000),
        (lambda p, s: _write_ima(p, x[:, None], groups=4), 33, 4000),
    ):
        p = str(tmp_path / "ok.wav")
        make(p, cap_spb)
        raw = bytearray(open(p, "rb").read())
        # wSamplesPerBlock lives 2 bytes into the fmt extra (offset 38 for
        # the canonical fmt-first layout these writers emit)
        import struct as _s

        assert raw[12:16] == b"fmt "
        ext_off = 20 + 16 + 2
        raw[ext_off:ext_off + 2] = _s.pack("<H", bogus)
        p2 = str(tmp_path / "bad.wav")
        open(p2, "wb").write(bytes(raw))
        with pytest.raises(wavio.WavFormatError):
            wavio.read(p2)


def test_adpcm_truncated_final_block_decodes_prefix(tmp_path):
    p = str(tmp_path / "ms.wav")
    _write_ms(p, _sig(512, seed=7), spb=128)
    full, _ = wavio.read(p)
    with open(p, "rb") as f:
        b = f.read()
    # chop the file mid-final-block (keep header integrity: shrink data size)
    cut = 40
    short = b[:-cut]
    p2 = str(tmp_path / "cut.wav")
    with open(p2, "wb") as f:
        f.write(short)
    inf = wavio.info(p2)
    assert 0 < inf.frames < 512
    data, _ = wavio.read(p2)
    assert len(data) == inf.frames
    np.testing.assert_array_equal(data, full[:len(data)])


def test_detect_and_silence_on_adpcm(tmp_path):
    """Whole pipeline on an MS ADPCM input (generic host-decode path)."""
    import pandas as pd

    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.engine.fused import detect_file_fused
    from softspoken_tpu.engine.planner import num_windows_for_padded_length
    from softspoken_tpu.io import internal_length
    from softspoken_tpu.silence import SilenceRunner

    p = str(tmp_path / "field.wav")
    _write_ms(p, _sig(11025 * 4, seed=8), spb=500)
    cfg = Config().with_engine(device_batch=4, chunk_seconds=6.0)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    res = detect_file_fused(det, p)
    padded = internal_length(p, cfg.dsp.sample_rate) + 2 * cfg.pad_samples
    assert res.num_windows == num_windows_for_padded_length(padded, cfg)

    df = pd.DataFrame([{
        "file_path": str(tmp_path), "file_name": "field.wav",
        "start_time": 0.5, "end_time": 1.0, "erase": 1,
    }])
    out = str(tmp_path / "out")
    rep = SilenceRunner(out).run(df)
    assert rep.files_failed == 0 and rep.files_done == 1
    sil, sr = wavio.read(rep.outputs[0])
    orig, _ = wavio.read(p)
    assert sr == 11025 and len(sil) == len(orig)
    assert np.all(sil[int(0.5 * sr):int(1.0 * sr)] == 0.0)
    # outside the interval the PCM16 output equals the ADPCM decode
    np.testing.assert_allclose(sil[:int(0.5 * sr)], orig[:int(0.5 * sr)],
                               atol=1.0 / 32768.0)


def test_ms_adpcm_extensible_wrapper(tmp_path):
    """EXTENSIBLE-wrapped stereo MS ADPCM decodes identically to the plain
    tag: dwChannelMask/GUID bytes must not be misread as the coefficient
    table (review r3 batch 19)."""
    x = np.stack([_sig(128, seed=11), _sig(128, seed=12)], axis=1)
    spb = 64
    plain = str(tmp_path / "plain.wav")
    _write_ms_stereo(plain, x, spb=spb)
    with open(plain, "rb") as f:
        raw = f.read()
    di = raw.index(b"data")
    dsize = struct.unpack("<I", raw[di + 4:di + 8])[0]
    data = raw[di + 8:di + 8 + dsize]

    codec_tail = struct.pack("<H", 7)
    for a, b in _MS_COEFS:
        codec_tail += struct.pack("<hh", a, b)
    guid = struct.pack("<IHH", wavio.WAVE_FORMAT_ADPCM, 0, 0x10) + \
        bytes([0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71])
    # cbSize + Samples.wSamplesPerBlock + dwChannelMask(0x3) + GUID + coefs
    ext_extra = struct.pack("<HHI", 22 + len(codec_tail), spb, 0x3) \
        + guid + codec_tail
    block_align = 7 * 2 + (spb - 2) * 2 // 2
    extp = str(tmp_path / "ext.wav")
    _write_wav(extp, wavio.WAVE_FORMAT_EXTENSIBLE, 2, 11025, block_align, 4,
               ext_extra, data)

    pi, ei = wavio.info(plain), wavio.info(extp)
    assert ei.subtype == "MS_ADPCM"
    assert ei.samples_per_block == pi.samples_per_block == spb
    assert ei.frames == pi.frames
    a_, sra = wavio.read(plain)
    b_, srb = wavio.read(extp)
    assert sra == srb
    np.testing.assert_array_equal(a_, b_)


def test_adpcm_tail_clamped_to_samples_per_block(tmp_path):
    """Header spb below the block's nibble capacity + a truncated final
    block: info().frames must equal len(read()) — the capacity formula
    alone overstates the tail (review r3 batch 19)."""
    x = _sig(256, seed=13)
    spb_cap = 128
    blocks = []
    for i in range(0, 256, spb_cap):
        blk, _ = _encode_ms_block(list(x[i:i + spb_cap]), spb_cap)
        blocks.append(blk)
    block_align = 7 + (spb_cap - 2 + 1) // 2  # 70 bytes: capacity 128
    extra = struct.pack("<HHH", 4 + 4 * 7, 64, 7)  # header spb=64 < capacity
    for a, b in _MS_COEFS:
        extra += struct.pack("<hh", a, b)
    data = b"".join(blocks)
    # final block truncated to 7 header + 40 data bytes: the capacity
    # formula says 82 tail samples, but the decoder emits at most spb=64
    data = data[:block_align + 7 + 40]
    p = str(tmp_path / "t.wav")
    _write_wav(p, wavio.WAVE_FORMAT_ADPCM, 1, 11025, block_align, 4,
               extra, data)
    inf = wavio.info(p)
    out, _ = wavio.read(p)
    assert inf.samples_per_block == 64
    assert len(out) == inf.frames == 64 + 64
