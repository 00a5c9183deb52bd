"""Decoder interop against real third-party-encoded audio.

Every other codec test in this suite decodes files *we* encoded; these use
the only real recorded audio shipped in this image (pygame's bundled example
sounds — music loop, impacts, whooshes) with pygame/SDL as an independent
decode oracle.  This catches the failure family self-round-trips cannot: a
matching encode/decode bug, or a header convention other encoders use and
ours never emits (the MS ADPCM file here is exactly that — found because our
reader rejected it).

Skipped wholesale if pygame is not importable.
"""

import os

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")

from softspoken_tpu.io import audio, wavio  # noqa: E402
from softspoken_tpu.io import oggvorbis as ov  # noqa: E402

DATA = os.path.join(os.path.dirname(pygame.__file__), "examples", "data")
PCM_U8_FILES = ["house_lo.wav", "boom.wav", "car_door.wav",
                "punch.wav", "whiff.wav"]


def _sdl_decode(path: str, samplerate: int, channels: int) -> np.ndarray:
    """pygame/SDL decode to int16 at the file's NATIVE rate (no resample)."""
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    import pygame.sndarray as sa

    pygame.mixer.quit()
    pygame.mixer.init(frequency=samplerate, size=-16, channels=channels)
    try:
        return sa.array(pygame.mixer.Sound(path)).reshape(-1).copy()
    finally:
        pygame.mixer.quit()


@pytest.mark.parametrize("name", PCM_U8_FILES)
def test_pcm_u8_matches_sdl(name):
    p = os.path.join(DATA, name)
    inf = wavio.info(p)
    assert inf.subtype == "PCM_U8" and inf.channels == 1
    ours, sr = wavio.read(p)
    theirs = _sdl_decode(p, inf.samplerate, 1).astype(np.float32) / 32768.0
    assert sr == inf.samplerate and len(ours) == len(theirs)
    # SDL widens u8→s16 with a 1-LSB16 convention difference at most
    np.testing.assert_allclose(ours, theirs, atol=1.001 / 32768.0)


def test_ms_adpcm_real_file_bit_exact_vs_sdl():
    """secosmic_lo.wav: MS ADPCM encoded by a third-party tool.  Our decode
    must be bit-identical to SDL's (C truncating-division predictor)."""
    p = os.path.join(DATA, "secosmic_lo.wav")
    inf = wavio.info(p)
    assert inf.subtype == "MS_ADPCM"
    assert (inf.block_align, inf.samples_per_block) == (256, 500)
    ours16 = np.rint(wavio.read(p)[0] * 32768.0).astype(np.int64)
    theirs = _sdl_decode(p, inf.samplerate, inf.channels).astype(np.int64)
    assert len(ours16) == len(theirs) == inf.frames
    np.testing.assert_array_equal(ours16, theirs)


def test_ogg_real_file_matches_sdl_to_int16():
    """house_lo.ogg: a real Vorbis stream from another encoder.  Our
    libvorbis binding and SDL's decoder must agree to int16 precision,
    modulo int16 clipping of >1.0 float peaks (Vorbis floats may exceed
    full scale; SDL's int16 path saturates)."""
    p = os.path.join(DATA, "house_lo.ogg")
    inf = ov.info(p)
    ours, sr = ov.read(p)
    theirs = _sdl_decode(p, inf.samplerate, inf.channels) \
        .astype(np.float32) / 32768.0
    assert sr == inf.samplerate and len(ours) == len(theirs)
    clipped = np.clip(ours, -1.0, 32767.0 / 32768.0)
    np.testing.assert_allclose(clipped, theirs, atol=2.0 / 32768.0)
    # and the stream really does exceed full scale somewhere (the reason
    # this comparison needs the clip at all)
    assert np.abs(ours).max() > 1.0


def test_probe_durations_match_sdl():
    for name in PCM_U8_FILES + ["secosmic_lo.wav", "house_lo.ogg"]:
        p = os.path.join(DATA, name)
        dur, sr = audio.get_audio_data(p)
        inf = wavio.info(p) if name.endswith(".wav") else ov.info(p)
        theirs = _sdl_decode(p, inf.samplerate, inf.channels)
        assert abs(dur - len(theirs) / inf.samplerate) < 1e-6, name


def test_detect_runs_on_real_recordings(tmp_path):
    """End-to-end detect over the real files (random-init weights — this
    checks the pipeline accepts real-world headers, not quality)."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.engine.fused import detect_file_fused

    cfg = Config().with_engine(device_batch=4, chunk_seconds=6.0)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    for name in ["house_lo.wav", "secosmic_lo.wav", "house_lo.ogg"]:
        res = detect_file_fused(det, os.path.join(DATA, name))
        assert res.num_windows > 0, name
