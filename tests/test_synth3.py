"""Third training-texture family (train/synth3.py; VERDICT r3 #7)."""

import numpy as np
import pytest

from softspoken_tpu.train import synth, synth3


@pytest.mark.parametrize("kind", synth3.KINDS3)
def test_texture3_shape_bounds_determinism(kind):
    x = synth3.texture3(np.random.default_rng(7), 66150, kind)
    assert x.shape == (66150,) and x.dtype == np.float32
    assert np.isfinite(x).all() and np.abs(x).max() <= 0.9 + 1e-6
    assert float(np.sqrt(np.mean(x ** 2))) > 1e-4  # not silence
    y = synth3.texture3(np.random.default_rng(7), 66150, kind)
    np.testing.assert_array_equal(x, y)


def test_texture3_dispatches_through_synth_environment():
    a = synth.synth_environment(np.random.default_rng(3), 66150, "crackle")
    b = synth3.texture3(np.random.default_rng(3), 66150, "crackle")
    np.testing.assert_array_equal(a, b)


def test_default_pools_untouched_by_third_family():
    """Adding KINDS3 to EXTRA_ENVIRONMENT_KINDS must not change the default
    (no-extras) pools: the committed checkpoint's training stream and every
    seeded eval set stay reproducible."""
    sp0, nz0 = synth.make_pools(np.random.default_rng(5), 2, 4)
    sp1, nz1 = synth.make_pools(np.random.default_rng(5), 2, 4,
                                extra_kinds=())
    np.testing.assert_array_equal(sp0, sp1)
    np.testing.assert_array_equal(nz0, nz1)


def test_pools_with_third_family_extras():
    sp, nz = synth.make_pools(
        np.random.default_rng(6), 2, 10,
        extra_kinds=synth3.KINDS3, extra_frac=0.3)
    assert sp.shape == (2, synth.CLIP) and nz.shape == (10, synth.CLIP)
    assert np.isfinite(nz).all()


def test_drone_is_sustained_and_pitched():
    """The drone must be a sustained near-periodic texture: high
    autocorrelation at its fundamental lag, energy spread over the whole
    clip (unlike impact chains)."""
    x = synth3.texture3(np.random.default_rng(11), 66150, "drone")
    # energy in every 0.5 s slice (sustained)
    n = 11025
    slices = [float(np.sqrt(np.mean(x[i * n:(i + 1) * n] ** 2)))
              for i in range(6)]
    assert min(slices) > 0.2 * max(slices)
    # periodicity: normalized autocorrelation has a strong off-zero peak
    xc = x[:22050] - x[:22050].mean()
    ac = np.correlate(xc, xc, "full")[len(xc) - 1:]
    ac /= ac[0]
    lag0 = int(22050 / 200.0)  # search below 200 Hz fundamentals
    assert float(ac[lag0:].max()) > 0.3


def test_impact_chain_is_sparse_and_transient():
    """Impacts must be impulsive: high crest factor (peak >> rms) and most
    of the clip near-silent."""
    x = synth3.texture3(np.random.default_rng(13), 66150, "impact_chain")
    rms = float(np.sqrt(np.mean(x ** 2)))
    assert np.abs(x).max() / max(rms, 1e-9) > 5.0
    assert float(np.mean(np.abs(x) < 0.02)) > 0.5


def test_eval_sets_never_use_third_family():
    """KINDS3 stay out of the default environment draw: v1 eval sets are
    bit-identical before/after this module existed."""
    for k in synth3.KINDS3:
        assert k not in synth.ENVIRONMENT_KINDS
    assert set(synth3.KINDS3) <= set(synth.EXTRA_ENVIRONMENT_KINDS)
