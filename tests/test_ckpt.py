import numpy as np
import pytest

from softspoken_tpu import ckpt
from softspoken_tpu.models import SpecUNet2D


def test_orbax_roundtrip(tmp_path):
    variables = ckpt.fixture_variables(seed=2)
    path = str(tmp_path / "ckpt")
    ckpt.save(path, variables, epoch=7)
    restored, epoch = ckpt.load(path)
    assert epoch == 7
    for a, b in zip(
        sorted(_leaves(variables)), sorted(_leaves(restored))
    ):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_load_any_dispatch(tmp_path):
    # missing → (None, -1), the random-init degrade path
    v, e = ckpt.load_any(str(tmp_path / "nope"))
    assert v is None and e == -1

    variables = ckpt.fixture_variables(seed=1)
    path = str(tmp_path / "c2")
    ckpt.save(path, variables, epoch=3)
    v2, e2 = ckpt.load_any(path)
    assert e2 == 3 and v2 is not None


def test_pth_roundtrip(tmp_path):
    """The reference checkpoint format {'model_state_dict','epoch'}
    (NNDetector.py:47-49) converts losslessly."""
    import torch

    sd = ckpt.fixture_state_dict(seed=4)
    pth = str(tmp_path / "model_checkpoint.pth")
    torch.save({"model_state_dict": {k: torch.as_tensor(v) for k, v in sd.items()},
                "epoch": 12}, pth)
    variables, epoch = ckpt.load_pth(pth)
    assert epoch == 12
    direct = ckpt.convert_torch_state_dict(sd)
    for (ka, va), (kb, vb) in zip(sorted(_leaves(variables)), sorted(_leaves(direct))):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # converted variables drive the model
    out = SpecUNet2D().apply(variables, np.zeros((1, 128, 256, 1), np.float32))
    assert out[1].shape == (1, 256)


def _leaves(tree, prefix=""):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _leaves(v, prefix + k + "/")
        else:
            out.append((prefix + k, v))
    return out
