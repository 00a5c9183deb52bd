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
