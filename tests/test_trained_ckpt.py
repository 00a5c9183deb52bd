"""Invariant tests with the COMMITTED TRAINED checkpoint.

The round-2 carry-clamp bug survived round 1's whole parity suite because
the random-init fixture emits nearly uniform logits — grid bookkeeping
errors shrink to ~1e-4 when every window scores the same. These tests run
the real trained model (sharp, structured logits) so chunking/sharding/
pipeline invariants actually bite.
"""

import os

import numpy as np
import pytest

from softspoken_tpu import Config
from softspoken_tpu.engine import Detector
from softspoken_tpu.io import wavio
from softspoken_tpu.train import synth

CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "root", "models", "spec_unet_2d", "model_checkpoint",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CKPT), reason="trained checkpoint not present"
)


@pytest.fixture(scope="module")
def field(tmp_path_factory):
    """A 30 s labeled synthetic field recording at 22050 Hz."""
    rng = np.random.default_rng(99)
    audio, intervals = synth.synth_field_recording(
        rng, 30.0, sr=22050, speech_events=(3, 3), snr_db=(10.0, 20.0)
    )
    p = str(tmp_path_factory.mktemp("trained") / "field.wav")
    wavio.write(p, audio, 22050, subtype="PCM_16")
    return p, intervals


def _det(**kw):
    cfg = Config().with_engine(precision="parity", device_batch=8, **kw)
    return Detector(cfg, checkpoint_path=CKPT)


def test_trained_model_finds_planted_speech(field):
    path, truth = field
    res = _det(chunk_seconds=60.0).detect_file(path)
    # every labeled span overlaps some detection (recall), and detections
    # stay in the recording
    for s, e in truth:
        assert any(ds < e and de > s for ds, de in res.intervals), (
            f"missed planted speech at ({s:.2f}, {e:.2f}): {res.intervals}"
        )
    for ds, de in res.intervals:
        assert de > 0 and ds < 30.0


@pytest.mark.slow
def test_trained_chunked_equals_unchunked(field):
    """The invariant the fixture could not protect: sharp logits across
    chunk boundaries."""
    path, _ = field
    multi = _det(chunk_seconds=6.0).detect_file_fused(path)
    single = _det(chunk_seconds=60.0).detect_file_fused(path)
    np.testing.assert_allclose(
        multi.avg_values, single.avg_values, atol=2e-5
    )
    assert multi.intervals == single.intervals


@pytest.mark.slow
def test_trained_fused_matches_host(field):
    path, _ = field
    fused = _det(chunk_seconds=60.0).detect_file_fused(path)
    host = _det(chunk_seconds=60.0, pipeline="host").detect_file_streaming(path)
    assert fused.intervals == host.intervals


@pytest.mark.slow
def test_trained_sharded_equals_single(field):
    from softspoken_tpu.parallel import MeshDetector, make_mesh

    path, _ = field
    single = _det(chunk_seconds=60.0).detect_file_fused(path)
    det = _det(chunk_seconds=60.0)
    MeshDetector(det, make_mesh(("data",), shape=(8,)))
    sharded = det.detect_file_fused(path)
    np.testing.assert_allclose(
        sharded.avg_values, single.avg_values, atol=2e-5
    )
    assert sharded.intervals == single.intervals
