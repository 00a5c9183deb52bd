"""Flax → torch .pth export (the reverse interop direction).

``ckpt.export_pth`` lets weights trained in THIS framework load into the
reference application unmodified (``NNDetector.py:42-53`` reads
``{'model_state_dict','epoch'}`` via ``torch.load``).  Verified three ways:
our own restricted reader round-trips it, REAL ``torch.load`` (when
installed) reads it with ``weights_only=True``, and the key set matches the
reference model's ``state_dict()`` exactly (including the torchaudio mel
buffers, whose values are the validated tables from ops/mel.py).
"""

import numpy as np
import pytest

from softspoken_tpu import ckpt
from softspoken_tpu.ckpt import pth_reader, pth_writer


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def test_export_roundtrip_through_own_reader(tmp_path):
    variables = ckpt.fixture_variables(seed=3)
    p = str(tmp_path / "export.pth")
    ckpt.export_pth(p, variables, epoch=123)
    sd, epoch = pth_reader.load_checkpoint(p)
    assert epoch == 123
    back = ckpt.convert_torch_state_dict(sd)
    for (ka, a), (kb, b) in zip(_leaves(variables), _leaves(back)):
        assert ka == kb
        np.testing.assert_array_equal(a, b, err_msg=ka)


def test_export_key_set_matches_reference_model(tmp_path):
    """Strict load_state_dict needs the EXACT key set: every fixture key
    (the reference model's state_dict) plus the torchaudio buffers."""
    sd = ckpt.flax_to_torch_state_dict(ckpt.fixture_variables(seed=0))
    want = set(ckpt.fixture_state_dict(seed=0))
    want |= {"mel_spectrogram.spectrogram.window",
             "mel_spectrogram.mel_scale.fb"}
    assert set(sd) == want
    assert sd["mel_spectrogram.spectrogram.window"].shape == (512,)
    assert sd["mel_spectrogram.mel_scale.fb"].shape == (1025, 128)


def test_layout_inverse_is_exact():
    """torch → flax → torch is the identity on every tensor."""
    sd0 = ckpt.fixture_state_dict(seed=9)
    variables = ckpt.convert_torch_state_dict(sd0)
    sd1 = ckpt.flax_to_torch_state_dict(variables, include_mel_buffers=False)
    for key, v0 in sd0.items():
        if key.endswith("num_batches_tracked"):
            continue  # counters aren't represented in flax; exported as 0
        np.testing.assert_array_equal(
            np.asarray(sd1[key], np.float32), np.asarray(v0, np.float32),
            err_msg=key)
    assert {k for k in sd0 if not k.endswith("num_batches_tracked")} \
        == {k for k in sd1 if not k.endswith("num_batches_tracked")}


def test_real_torch_loads_the_export(tmp_path):
    torch = pytest.importorskip("torch")

    variables = ckpt.fixture_variables(seed=5)
    p = str(tmp_path / "export.pth")
    ckpt.export_pth(p, variables, epoch=48750)
    obj = torch.load(p, map_location="cpu", weights_only=True)
    assert int(obj["epoch"]) == 48750
    sd = obj["model_state_dict"]
    ref = ckpt.fixture_state_dict(seed=5)
    for key, v in ref.items():
        if key.endswith("num_batches_tracked"):
            assert int(sd[key]) == 0
            continue
        t = sd[key]
        assert tuple(t.shape) == tuple(np.asarray(v).shape), key
        np.testing.assert_array_equal(t.numpy(), np.asarray(v), err_msg=key)
    # scalar counters come back as 0-dim int64 tensors
    nbt = sd["conv1_1.residual.1.num_batches_tracked"]
    assert nbt.dtype == torch.int64 and nbt.ndim == 0


def test_writer_value_types(tmp_path):
    p = str(tmp_path / "mixed.pth")
    pth_writer.write(p, {
        "model_state_dict": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "epoch": 7, "best_f1": 0.93, "note": "hi", "flag": True,
    })
    obj = pth_reader.load(p)
    assert obj["epoch"] == 7 and obj["note"] == "hi" and obj["flag"] is True
    assert abs(obj["best_f1"] - 0.93) < 1e-12
    np.testing.assert_array_equal(
        obj["model_state_dict"]["w"],
        np.arange(6, dtype=np.float32).reshape(2, 3))


def test_detector_runs_on_reexported_checkpoint(tmp_path):
    """orbax → .pth → convert-ckpt → Detector forward: the full circle."""
    from softspoken_tpu import Config
    from softspoken_tpu.engine import Detector

    variables = ckpt.fixture_variables(seed=1)
    orb = str(tmp_path / "orb")
    ckpt.save(orb, variables, epoch=11)
    p = str(tmp_path / "roundtrip.pth")
    v2, ep = ckpt.load(orb)
    ckpt.export_pth(p, v2, epoch=ep)
    v3, ep3 = ckpt.load_pth(p)
    assert ep3 == 11
    det_a = Detector(Config().with_engine(device_batch=2, chunk_seconds=6.0),
                     variables=variables)
    det_b = Detector(Config().with_engine(device_batch=2, chunk_seconds=6.0),
                     variables=v3)
    x = (0.1 * np.random.default_rng(0).normal(size=22050 * 4)).astype(
        np.float32)
    ra, rb = det_a.detect_waveform(x), det_b.detect_waveform(x)
    np.testing.assert_allclose(np.asarray(ra.avg_values),
                               np.asarray(rb.avg_values), rtol=0, atol=1e-6)
