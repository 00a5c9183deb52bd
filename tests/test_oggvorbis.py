"""Ogg/Vorbis codec surface (io/oggvorbis.py) — closes VERDICT r2 missing #4.

The reference reads OGG incidentally through libsndfile
(voice_activity.py:37); here the system libvorbis is bound directly.
Skips cleanly when the system libraries are absent.
"""

import os

import numpy as np
import pytest

from softspoken_tpu.io import oggvorbis as ov

pytestmark = pytest.mark.skipif(
    not ov.available(), reason="system libvorbis not installed")


def _tone(sr=22050, seconds=5.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=len(t))
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def ogg_file(tmp_path_factory):
    sr = 22050
    x = _tone(sr)
    p = str(tmp_path_factory.mktemp("ogg") / "tone.ogg")
    ov.write_vorbis(p, x, sr, quality=0.5)
    return p, x, sr


def test_info(ogg_file):
    p, x, sr = ogg_file
    inf = ov.info(p)
    assert inf.samplerate == sr
    assert inf.channels == 1
    assert inf.frames == len(x)
    assert inf.subtype == "VORBIS"
    assert abs(inf.duration - 5.0) < 1e-6


def test_roundtrip_close(ogg_file):
    p, x, sr = ogg_file
    y, sr2 = ov.read(p)
    assert sr2 == sr and len(y) == len(x)
    # lossy codec: assert strong correlation, not equality
    assert np.corrcoef(x, y)[0, 1] > 0.98


def test_range_read_sample_accurate(ogg_file):
    p, x, sr = ogg_file
    full, _ = ov.read(p)
    part, _ = ov.read(p, start=sr, frames=sr)
    np.testing.assert_allclose(part, full[sr:2 * sr], atol=1e-6)
    # EOF clamp
    tail, _ = ov.read(p, start=len(x) - 100, frames=1000)
    assert len(tail) == 100


def test_stereo_roundtrip(tmp_path):
    sr = 32000
    t = np.arange(2 * sr) / sr
    x = np.stack([0.3 * np.sin(2 * np.pi * 300 * t),
                  0.3 * np.sin(2 * np.pi * 500 * t)], axis=1).astype(np.float32)
    p = str(tmp_path / "st.ogg")
    ov.write_vorbis(p, x, sr)
    inf = ov.info(p)
    assert inf.channels == 2 and inf.frames == len(t)
    y, _ = ov.read(p)
    assert y.shape == x.shape
    assert np.corrcoef(x[:, 0], y[:, 0])[0, 1] > 0.95
    assert np.corrcoef(x[:, 1], y[:, 1])[0, 1] > 0.95


def test_probe_and_read_any_dispatch(ogg_file):
    from softspoken_tpu.io.audio import get_audio_data, read_any, read_mono

    p, x, sr = ogg_file
    dur, native_sr = get_audio_data(p)
    assert native_sr == sr and abs(dur - 5.0) < 1e-6
    data, sr2 = read_any(p, start=100, frames=50)
    assert sr2 == sr and len(data) == 50
    mono, sr3 = read_mono(p)
    assert sr3 == sr and mono.ndim == 1 and len(mono) == len(x)


def test_not_ogg_raises(tmp_path):
    p = str(tmp_path / "junk.ogg")
    with open(p, "wb") as f:
        f.write(b"OggS" + b"\x00" * 64)  # magic but not a vorbis stream
    with pytest.raises(ov.OggFormatError):
        ov.info(p)


@pytest.mark.slow
def test_detect_file_on_ogg(tmp_path):
    """Whole pipeline on an OGG input: plan + fused f32 streaming path."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.engine.fused import detect_file_fused

    sr = 32000
    rng = np.random.default_rng(3)
    x = (0.02 * rng.normal(size=20 * sr)).astype(np.float32)
    p = str(tmp_path / "field.ogg")
    ov.write_vorbis(p, x, sr)
    cfg = Config().with_engine(device_batch=4, chunk_seconds=12.0)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    res = detect_file_fused(det, p)
    # plan formula over the DECODED length (clamped at the codec's frames)
    n = ov.info(p).frames
    from softspoken_tpu.engine.planner import num_windows_for_padded_length
    from softspoken_tpu.io import internal_length

    padded = internal_length(p, cfg.dsp.sample_rate) + 2 * cfg.pad_samples
    assert res.num_windows == num_windows_for_padded_length(padded, cfg)
    assert n == 20 * sr


def test_silencer_on_ogg(tmp_path):
    """The silence workflow must cover every format probe() dispatches;
    OggInfo.data_bytes was missing and crashed the stream-size gate
    (review r3 finding)."""
    import pandas as pd

    from softspoken_tpu.io import wavio
    from softspoken_tpu.silence import SilenceRunner

    sr = 22050
    x = _tone(sr, seconds=4.0, seed=3)
    src = str(tmp_path / "rec.ogg")
    ov.write_vorbis(src, x, sr, quality=0.5)

    df = pd.DataFrame([{
        "file_path": str(tmp_path), "file_name": "rec.ogg",
        "start_time": 1.0, "end_time": 2.0, "erase": 1,
    }])
    outdir = str(tmp_path / "out")
    report = SilenceRunner(outdir).run(df)
    assert report.files_failed == 0 and report.files_done == 1
    y, osr = wavio.read(report.outputs[0])
    assert osr == sr and len(y) == len(x)
    s0, s1 = int(1.0 * sr), int(2.0 * sr)
    assert np.all(y[s0:s1] == 0)              # muted span is hard zero
    assert np.abs(y[: s0 - 1]).max() > 0.05   # audio elsewhere survives


def test_write_vorbis_bad_path_raises_and_state_survives(tmp_path):
    """A failed write must raise cleanly and leak no encoder state: the
    clears now run in a finally keyed to which inits succeeded (review r3:
    they ran only on the success path).  A subsequent good write works."""
    x = (0.2 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(
        np.float32)
    with pytest.raises(OSError):
        ov.write_vorbis(str(tmp_path / "no_such_dir" / "x.ogg"), x, 8000)
    ok = str(tmp_path / "ok.ogg")
    ov.write_vorbis(ok, x, 8000)
    y, sr = ov.read(ok)
    assert sr == 8000 and len(y) == len(x)


def test_write_vorbis_failure_leaves_no_file(tmp_path):
    """A rejected encode (absurd sample rate) must raise AND remove the
    partially-opened output — not strand a 0-byte .ogg that later
    directory scans mistake for a vector (review r3 batch 17)."""
    if not ov.available():
        pytest.skip("libvorbis not present")
    p = str(tmp_path / "bad.ogg")
    x = np.zeros(256, np.float32)
    with pytest.raises(ov.OggFormatError):
        ov.write_vorbis(p, x, samplerate=8000, quality=-2.0)
    assert not os.path.exists(p)
