import os

import numpy as np
import pandas as pd
import pytest

from softspoken_tpu.io import wavio
from softspoken_tpu.ops.mute import apply_mute, interval_samples, jax_apply_mute, mute_gain
from softspoken_tpu.silence import SilenceRunner, write_status_file


def naive_zero(audio_ct, intervals, sr):
    """Literal reference loop (silencer_ui.py:974-985)."""
    out = audio_ct.copy()
    for st, et in intervals:
        s = int(round(st * sr))
        e = int(round(et * sr))
        s = max(0, min(s, out.shape[1]))
        e = max(0, min(e, out.shape[1]))
        out[:, s:e] = 0.0
    return out


def test_apply_mute_matches_reference_loop():
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.3, size=(2, 44100 * 4)).astype(np.float32)
    intervals = [(0.5, 1.0), (0.9, 1.2), (-1.0, 0.1), (3.9, 99.0)]
    want = naive_zero(audio, intervals, 44100)
    got = apply_mute(audio, intervals, 44100)
    np.testing.assert_array_equal(got, want)


def test_apply_mute_chunked_equals_full():
    rng = np.random.default_rng(1)
    audio = rng.normal(0, 0.3, size=(1, 100000)).astype(np.float32)
    intervals = [(0.3, 0.5), (1.0, 1.5), (2.0, 2.26)]
    sr = 32000
    for fade in (0, 320):
        full = apply_mute(audio, intervals, sr, fade_samples=fade)
        parts = []
        for pos in range(0, audio.shape[1], 33333):
            chunk = audio[:, pos : pos + 33333]
            parts.append(
                apply_mute(chunk, intervals, sr, fade_samples=fade,
                           offset=pos, total_samples=audio.shape[1])
            )
        np.testing.assert_allclose(np.concatenate(parts, axis=1), full, atol=1e-7)


def test_crossfade_ramps():
    audio = np.ones((1, 1000), np.float32)
    out = apply_mute(audio, [(0.25, 0.5)], 1000, fade_samples=100)
    assert out[0, 250:500].max() == 0.0          # hard mute inside
    assert out[0, 100] == 1.0                     # untouched far away
    ramp = out[0, 150:250]
    assert np.all(np.diff(ramp) <= 0)             # monotone fade-out
    ramp2 = out[0, 500:600]
    assert np.all(np.diff(ramp2) >= 0)            # monotone fade-in
    assert out[0, 650] == 1.0


def test_jax_apply_mute_matches_numpy():
    rng = np.random.default_rng(2)
    audio = rng.normal(0, 0.3, size=(2, 20000)).astype(np.float32)
    intervals = [(0.1, 0.2), (0.55, 0.7)]
    sr = 16000
    starts, ends = interval_samples(intervals, sr, audio.shape[1])
    for fade in (0, 160):
        want = apply_mute(audio, intervals, sr, fade_samples=fade)
        got = np.asarray(jax_apply_mute(audio, starts, ends, fade_samples=fade))
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.fixture
def review_setup(tmp_path):
    sr = 44100
    rng = np.random.default_rng(3)
    # stay within [-1, 1): PCM_16 write clips, which isn't what's under test
    audio = rng.uniform(-0.9, 0.9, size=(sr * 3, 2)).astype(np.float32)
    src = tmp_path / "in"
    src.mkdir()
    wavio.write(str(src / "field.wav"), audio, sr)
    df = pd.DataFrame(
        {
            "ID": [1, 2],
            "file_path": [str(src)] * 2,
            "file_name": ["field.wav"] * 2,
            "start_time": [0.5, 2.0],
            "end_time": [1.0, 2.5],
            "erase": [1, 0],   # only the first row is erased
            "user_comment": ["", ""],
            "review_datetime": ["", ""],
        }
    )
    return audio, sr, src, df


def test_silence_runner_parity(tmp_path, review_setup):
    audio, sr, src, df = review_setup
    outdir = tmp_path / "out"
    runner = SilenceRunner(str(outdir))
    report = runner.run(df)
    assert report.files_done == 1 and not report.errors
    out_path = outdir / "field_silenced.wav"
    assert report.outputs == [str(out_path)]

    got, got_sr = wavio.read(str(out_path), always_2d=True)
    assert got_sr == sr
    want = naive_zero(audio.T, [(0.5, 1.0)], sr).T
    # PCM_16 write quantizes (reference wrote PCM_16 via soundfile default)
    np.testing.assert_allclose(got, want, atol=1.0 / 32000)
    # erased region is exactly zero
    assert np.abs(got[int(0.5 * sr) : int(1.0 * sr)]).max() == 0.0
    # non-erased interval untouched (within quantization)
    assert np.abs(got[int(2.0 * sr) : int(2.5 * sr)]).max() > 0.01


def test_silence_runner_streaming_equals_memory(tmp_path, review_setup):
    audio, sr, src, df = review_setup
    mem = SilenceRunner(str(tmp_path / "mem"))
    mem.run(df)
    stream = SilenceRunner(str(tmp_path / "st"), stream_threshold_bytes=1, chunk_frames=10000)
    stream.run(df)
    a, _ = wavio.read(str(tmp_path / "mem" / "field_silenced.wav"))
    b, _ = wavio.read(str(tmp_path / "st" / "field_silenced.wav"))
    np.testing.assert_array_equal(a, b)


def test_silence_runner_skips_bad_file(tmp_path, review_setup):
    _, _, src, df = review_setup
    df2 = df.copy()
    df2.loc[0, "file_name"] = "missing.wav"
    report = SilenceRunner(str(tmp_path / "o")).run(df2)
    assert report.files_failed == 1
    assert report.files_done == 0  # failures are not completions
    assert list(report.errors) == [os.path.join(str(src), "missing.wav")]


def test_silence_no_erase_rows(tmp_path, review_setup):
    _, _, _, df = review_setup
    df = df[df["erase"] == 0]
    report = SilenceRunner(str(tmp_path / "o")).run(df)
    assert report.files_done == 0 and report.outputs == []


def test_status_file(tmp_path):
    proj = {"name": "p", "silence_status_file": ""}
    path = write_status_file(proj, str(tmp_path))
    assert os.path.exists(path)
    assert proj["silence_status_file"] == path


def test_same_basename_outputs_do_not_collide(tmp_path):
    """Per-site recorders reuse file names; two /siteX/rec.wav inputs must
    produce two outputs, not silently overwrite one (review r3)."""
    import pandas as pd

    sr = 22050
    rows = []
    for site, freq in (("siteA", 500.0), ("siteB", 900.0)):
        d = tmp_path / site
        d.mkdir()
        t = np.arange(sr * 2) / sr
        x = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        wavio.write(str(d / "rec.wav"), x, sr, subtype="PCM_16")
        rows.append({"file_path": str(d), "file_name": "rec.wav",
                     "start_time": 0.5, "end_time": 1.0, "erase": 1})

    out = tmp_path / "out"
    report = SilenceRunner(str(out)).run(pd.DataFrame(rows))
    assert report.files_done == 2 and report.files_failed == 0
    assert len(set(report.outputs)) == 2
    names = sorted(os.path.basename(p) for p in report.outputs)
    assert names[0] == "rec_silenced.wav" and names[1] == "rec_silenced_2.wav"


def test_malformed_review_row_skips_file_not_run(tmp_path):
    """float('abc') on one row must record a per-file error and continue
    (review r3: parsing previously ran outside the try block)."""
    import pandas as pd

    sr = 22050
    t = np.arange(sr) / sr
    good = tmp_path / "good.wav"
    wavio.write(str(good), (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
                sr, subtype="PCM_16")
    df = pd.DataFrame([
        {"file_path": str(tmp_path), "file_name": "bad.wav",
         "start_time": "abc", "end_time": 1.0, "erase": 1},
        {"file_path": str(tmp_path), "file_name": "good.wav",
         "start_time": 0.25, "end_time": 0.5, "erase": 1},
    ])
    report = SilenceRunner(str(tmp_path / "out")).run(df)
    assert report.files_done == 1
    assert report.files_failed == 1
    assert any("bad.wav" in k for k in report.errors)


def test_apply_mute_degenerate_interval_noops():
    """An end<start interval must no-op, not cancel the coverage of a valid
    overlapping interval (review r3 batch 7)."""
    import numpy as np

    from softspoken_tpu.ops.mute import apply_mute

    audio = np.ones(30, np.float32)
    out = apply_mute(audio, [(10.0, 20.0), (15.0, 5.0)], sr=1)
    assert float(np.abs(out[10:20]).max()) == 0.0
    assert float(out[:10].min()) == 1.0 and float(out[20:].min()) == 1.0


def test_jax_apply_mute_degenerate_interval_noops():
    import jax.numpy as jnp
    import numpy as np

    from softspoken_tpu.ops.mute import jax_apply_mute

    audio = jnp.ones((1, 30), jnp.float32)
    out = np.asarray(jax_apply_mute(
        audio, jnp.asarray([10, 15], jnp.int32), jnp.asarray([20, 5], jnp.int32)))
    assert float(np.abs(out[0, 10:20]).max()) == 0.0
    assert float(out[0, :10].min()) == 1.0 and float(out[0, 20:].min()) == 1.0
