import json
import os

import numpy as np
import pytest

from softspoken_tpu import ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu import Config
from softspoken_tpu.io import wavio
from softspoken_tpu.train import fit, list_wavs


@pytest.fixture
def corpora(tmp_path):
    rng = np.random.default_rng(0)
    speech = tmp_path / "speech"
    noise = tmp_path / "noise"
    speech.mkdir()
    noise.mkdir()
    sr = 22050
    for i in range(2):
        t = np.arange(4 * sr) / sr
        s = (0.4 * np.sin(2 * np.pi * (500 + 100 * i) * t)).astype(np.float32)
        wavio.write(str(speech / f"s{i}.wav"), s, sr)
    # one long noise file and one shorter-than-3s (exercises tile-fill)
    wavio.write(str(noise / "n0.wav"), (0.1 * rng.normal(size=5 * sr)).astype(np.float32), sr)
    wavio.write(str(noise / "n1.wav"), (0.1 * rng.normal(size=sr)).astype(np.float32), sr)
    return str(speech), str(noise)


@pytest.mark.slow
def test_fit_runs_and_saves(tmp_path, corpora):
    speech, noise = corpora
    out = str(tmp_path / "trained")
    metrics = fit(
        speech, noise, steps=3, batch_size=2, ckpt_out=out,
        augmentations=["reduce_volume"], save_every=3, log_every=1,
    )
    assert np.isfinite(metrics["loss"])
    variables, epoch = ckpt.load(out)
    assert epoch == 3
    # the trained checkpoint drives the detector
    det = Detector(
        Config().with_engine(precision="parity", device_batch=4, chunk_seconds=12.0),
        variables=variables,
    )
    res = det.detect_waveform(np.zeros(22050 * 4, np.float32))
    assert res.num_windows > 0


@pytest.mark.slow
def test_fit_sharded(tmp_path, corpora):
    from softspoken_tpu.parallel import make_mesh

    speech, noise = corpora
    mesh = make_mesh(("data", "seq"), shape=(4, 2))
    metrics = fit(speech, noise, steps=2, batch_size=4, mesh=mesh, log_every=1)
    assert np.isfinite(metrics["loss"])


def test_list_wavs(tmp_path, corpora):
    speech, _ = corpora
    assert len(list_wavs(speech)) == 2


@pytest.mark.slow
def test_fit_resume_warm_starts(tmp_path, corpora):
    """--resume continues from a saved checkpoint: params start equal to the
    checkpoint's and the saved epoch accumulates across runs."""
    import jax

    from softspoken_tpu.train.loop import create_train_state

    speech, noise = corpora
    out = str(tmp_path / "ck")
    fit(speech, noise, steps=2, batch_size=2, ckpt_out=out,
        augmentations=[], save_every=2, log_every=2)
    saved, epoch = ckpt.load(out)
    assert epoch == 2

    _, state, _ = create_train_state(jax.random.PRNGKey(9), resume=out)
    assert int(state.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(saved["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fit(speech, noise, steps=2, batch_size=2, ckpt_out=out,
        augmentations=[], save_every=2, log_every=2, resume=out)
    _, epoch2 = ckpt.load(out)
    assert epoch2 == 4


def test_clip_sampler_short_file_tiling_varies(tmp_path, corpora):
    """Sub-3s noise files must be tiled from a random phase, not always
    offset 0 — start=0 made every draw the identical clip (review r3
    batch 6)."""
    import numpy as np

    from softspoken_tpu.io import wavio
    from softspoken_tpu.train.fit import ClipSampler

    sr = 22050
    short = tmp_path / "short.wav"
    wavio.write(str(short), np.arange(sr, dtype=np.float32) / sr, sr,
                subtype="FLOAT")
    sampler = ClipSampler([str(short)], np.random.default_rng(0),
                          tile_short=True)
    clips = [sampler.sample() for _ in range(4)]
    assert any(not np.array_equal(clips[0], c) for c in clips[1:])


def test_daemon_job_none_result_is_done():
    """A job whose fn returns None must still count as done (review r3
    batch 6: pool refresh stalled forever otherwise)."""
    import time

    from softspoken_tpu.train.fit import _DaemonJob

    job = _DaemonJob(lambda: None)
    for _ in range(100):
        if job.done() or job.failed():
            break
        time.sleep(0.01)
    assert job.done() and not job.failed()


def test_load_spoken_word_out_of_clip_offset(tmp_path):
    """start_idx at/past CLIP must be skipped, not crash with a broadcast
    ValueError (review r3 batch 6)."""
    import numpy as np

    from softspoken_tpu.io import wavio
    from softspoken_tpu.train import data as D

    sr = 22050
    w = tmp_path / "w.wav"
    wavio.write(str(w), np.ones(10000, np.float32), sr, subtype="FLOAT")
    clip = D.load_spoken_word([(str(w), D.CLIP + 4000)])
    assert clip.shape == (D.CLIP,) and float(np.abs(clip).max()) == 0.0
    clip2 = D.load_spoken_word([(str(w), D.CLIP - 100)])
    assert float(np.abs(clip2[: D.CLIP - 100]).max()) == 0.0
    assert float(np.abs(clip2[D.CLIP - 100:]).max()) > 0.0
