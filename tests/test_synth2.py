"""Out-of-family generator + degradations (train/synth2.py, train/degrade.py)."""

import numpy as np
import pytest

from softspoken_tpu.train import degrade, evaluate as E, synth2


def test_speech2_spans_cover_energy():
    rng = np.random.default_rng(1)
    audio, spans = synth2.speech2(rng, 22050 * 3)
    assert audio.dtype == np.float32 and np.isfinite(audio).all()
    assert spans, "plan must contain utterances"
    inside = np.zeros(len(audio), bool)
    for s, e in spans:
        assert 0 <= s < e <= len(audio)
        inside[s:e] = True
    # energy concentrates inside the planned spans
    rms_in = float(np.sqrt(np.mean(audio[inside] ** 2)))
    rms_out = float(np.sqrt(np.mean(audio[~inside] ** 2))) if (~inside).any() else 0.0
    assert rms_in > 5 * max(rms_out, 1e-6)


@pytest.mark.parametrize("kind", synth2.TEXTURES2)
def test_texture2_kinds(kind):
    rng = np.random.default_rng(2)
    x = synth2.texture2(rng, 22050, kind)
    assert x.shape == (22050,) and np.isfinite(x).all()
    assert np.abs(x).max() <= 1.0 + 1e-6


def test_texture2_corvid_shorter_than_one_call():
    """Beds shorter than one squawk (~0.15-0.5 s) must truncate the call,
    not crash broadcasting into the clamped write slice (review r3)."""
    for seed in range(5):
        x = synth2.texture2(np.random.default_rng(seed), 4000, "corvid")
        assert x.shape == (4000,) and np.isfinite(x).all()


def test_ou_field_matches_literal_recursion():
    """The lfilter form must stay bit-identical to the defining AR(1) loop
    (seeded eval sets depend on it)."""
    for seed, n, tau in ((0, 50_000, 1.0), (1, 3_000, 0.3), (2, 63, 8.0)):
        rng = np.random.default_rng(seed)
        got = synth2._ou_field(rng, n, tau)
        rng = np.random.default_rng(seed)
        k = int(max(1, tau * synth2.SR / 64))
        m = n // 64 + 2
        x = np.empty(m)
        x[0] = 0.0
        theta = 1.0 / k
        for i in range(1, m):
            x[i] = x[i - 1] * (1 - theta) + np.sqrt(theta) * rng.standard_normal()
        want = (1.0 + 0.5 * np.tanh(np.repeat(x, 64)[:n])).astype(np.float32)
        np.testing.assert_array_equal(got, want)


def test_field_recording2_labels_sane():
    rng = np.random.default_rng(3)
    audio, ivs = synth2.field_recording2(rng, 20.0, sr=22050)
    assert len(audio) == 20 * 22050
    assert ivs
    last_end = 0.0
    for s, e in ivs:
        assert 0.0 <= s < e <= 20.0
        assert s >= last_end  # sorted, non-overlapping after merge
        last_end = e


@pytest.mark.parametrize("kind", degrade.DEGRADATIONS)
def test_degradations_shape_and_bounds(kind):
    rng = np.random.default_rng(4)
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(32000) / 32000)).astype(np.float32)
    y = degrade.apply(x, 32000, [kind], rng)
    assert y.shape == x.shape and y.dtype == np.float32
    assert np.isfinite(y).all() and np.abs(y).max() <= 1.0


def test_mulaw_roundtrip_is_lossy_but_close():
    rng = np.random.default_rng(5)
    x = (0.5 * np.sin(2 * np.pi * 300 * np.arange(8000) / 8000)).astype(np.float32)
    y = degrade.mulaw(x, 8000, rng)
    err = np.abs(y - x)
    assert 1e-6 < err.max() < 0.02  # quantized, not destroyed


def test_make_eval_set_v2_with_degradations(tmp_path):
    labels = E.make_eval_set(
        str(tmp_path), n_files=1, seconds=10.0, sr=22050, seed=7,
        generator="v2", snr_db=(10.0, 10.0), degradations=["mulaw"],
    )
    labeled = E.load_labels(labels)
    assert len(labeled) == 1
    path, ivs = labeled[0]
    assert ivs and path.endswith("eval_000.wav")


def test_degrade_mulaw_is_the_shipped_wire_codec():
    """The quality grid's "mulaw" condition must exercise the SAME codec
    the fused engine ships on the wire (review r3: an independent 256-level
    mid-rise quantizer here gave silence a +8.6e-5 DC pedestal the real
    255-level mid-tread codec never produces)."""
    from softspoken_tpu.ops import mulaw as wire

    rng = np.random.default_rng(6)
    x = np.concatenate([
        np.zeros(100, np.float32),                       # digital silence
        (0.4 * np.sin(2 * np.pi * 250 * np.arange(4000) / 8000)
         ).astype(np.float32),
    ])
    y = degrade.mulaw(x, 8000, rng)
    assert np.all(y[:100] == 0.0), "silence must round-trip to exact zero"
    i16 = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(
        y, wire.decode_host(wire.encode_lut()[i16.view(np.uint16)]))


def test_degrade_rolloff_low_sample_rate():
    """rolloff4k must clamp its cutoff below Nyquist instead of raising at
    telephone-band sample rates (review r3 batch 11)."""
    import numpy as np

    from softspoken_tpu.train import degrade

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(8000).astype(np.float32)
    out = degrade.rolloff4k(audio, 8000, rng)
    assert out.shape == audio.shape and np.isfinite(out).all()


# ---------------------------------------------------------------------------
# round-4 eval degradations (VERDICT r3 #2): reverb + slow-fading channel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rt60", [0.3, 0.8, 1.5])
def test_image_source_rir_t60(rt60):
    """The RIR's Schroeder backward-integration decay must hit the RT60 it
    claims (within 15%), its direct path must be at t=0 with unit
    amplitude (truth labels stay aligned), and it must be deterministic."""
    sr = 32000
    rir = degrade._image_source_rir(sr, rt60, np.random.default_rng(3))
    e = np.cumsum(rir[::-1] ** 2)[::-1]
    edb = 10 * np.log10(e / e[0] + 1e-30)
    i5 = int(np.argmax(edb < -5))
    i25 = int(np.argmax(edb < -25))
    t60_est = (i25 - i5) / sr * 3.0  # -20 dB span → x3 = T60
    assert abs(t60_est - rt60) / rt60 < 0.15

    x = np.zeros(sr, np.float32)
    x[100] = 1.0
    y = degrade._reverb(x, sr, np.random.default_rng(3), rt60)
    assert abs(float(y[100]) - 1.0) < 1e-3          # unit direct path
    assert np.abs(y[:100]).max() < 1e-9             # nothing pre-echo
    y2 = degrade._reverb(x, sr, np.random.default_rng(3), rt60)
    np.testing.assert_array_equal(y, y2)


def test_reverb_differs_from_training_reverb():
    """The eval reverb must not be the augmentation reverb: the training one
    (train/augment.py add_reverb) is a sparse log-spaced tap delay line;
    the eval RIR is dense past the mixing time (a Schroeder tail has
    energy in essentially every sample)."""
    sr = 32000
    rir = degrade._image_source_rir(sr, 0.8, np.random.default_rng(0))
    mix = int(0.06 * sr)
    seg = rir[mix: mix + int(0.2 * sr)]
    assert np.count_nonzero(seg) > 0.99 * len(seg)


def test_fading_varies_effective_snr():
    """The envelope must actually move (≥6 dB swing between quiet and loud
    10 s halves of a constant-amplitude tone) while the added floor keeps
    the quiet sections non-silent."""
    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 500 * np.arange(40 * sr) / sr)).astype(
        np.float32)
    y = degrade.fading(x, sr, np.random.default_rng(11))
    n = len(y) // 8
    rms = [float(np.sqrt(np.mean(y[i * n:(i + 1) * n] ** 2)))
           for i in range(8)]
    swing_db = 20 * np.log10(max(rms) / min(rms))
    assert swing_db > 6.0
    assert min(rms) > 1e-4  # floor keeps it audible, never digital silence
