"""Audio augmentation suite — batched, jit-friendly JAX versions.

The reference implements eight augmentations as per-clip numpy/scipy
routines with Python loops (``voice_activity.py:299-886``).  Here each one
operates on a whole batch ``(B, 66150)`` on device, with static shapes:

  change_pitch            — linear-interp resample (voice_activity.py:386-441)
  change_speed            — STFT phase-vocoder time stretch (:467-643), as
                            framed rFFT + a lax.scan phase accumulator +
                            scatter-add overlap-add
  add_reverb              — log-spaced delay taps with normalized exponential
                            decays (:734-788)
  reduce_volume           — scalar gain (:791-802)
  add_echo                — single delayed copy (:805-823)
  bandpass_filter         — 1st-order Butterworth band-pass (:826-846); the
                            digital filter's exact frequency response applied
                            via rFFT (circular filtering — differs from
                            lfilter's causal edge transient only)
  add_harmonic_distortion — sign(x)·(1−exp(−k|x|)) waveshaper (:849-861)
  compress_dynamics       — hard-knee compressor above a dB threshold (:864-886)

Random parameter sampling ranges match get_parameters
(voice_activity.py:299-350); sampling uses jax.random so an augmentation
pipeline is reproducible from one PRNGKey.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SR = 22050
CLIP = 66150

# --------------------------------------------------------------------------
# parameter sampling (ranges: voice_activity.py:314-343)
# --------------------------------------------------------------------------

PARAM_RANGES: Dict[str, Dict[str, Tuple[float, float]]] = {
    "change_pitch": {"pitch_factor": (-3.0, 3.0)},
    "change_speed": {"speed_factor": (0.80, 1.2)},
    "add_reverb": {
        "reverb_level": (0.2, 0.8),
        "decay_time": (0.2, 1.0),
        "num_delays": (1.0, 5.0),
    },
    "reduce_volume": {"reduction_level": (0.1, 0.99)},
    "add_echo": {"echo_delay": (0.1, 0.7), "decay_factor": (0.3, 0.7)},
    "bandpass_filter": {"low_freq": (100.0, 500.0), "high_freq": (600.0, 2500.0)},
    "add_harmonic_distortion": {"distortion_level": (10.0, 50.0)},
    "compress_dynamics": {
        "compression_ratio": (1.5, 6.0),
        "threshold_level": (-40.0, -10.0),
    },
    # NOT a reference augmentation (voice_activity.py has no channel-gain
    # aug): round-4 addition — the within-clip analog of the slow-fading
    # channel the round-4 eval grid measures (train/degrade.py::fading).
    # Endpoints drawn independently so a clip can fade in, out, or sit at
    # a random low level; opt-in only (never in the default aug list)
    # pending a gated from-scratch train (docs/FT_SNRFLOOR_r04.json
    # round5_reading).
    "gain_ramp": {"start_db": (-18.0, 0.0), "end_db": (-18.0, 0.0)},
}


def get_parameters(rng: jax.Array, augmentations: Sequence[str]) -> List[Dict[str, float]]:
    """Random params per augmentation (reference: voice_activity.py:299-350)."""
    out = []
    for aug in augmentations:
        spec = PARAM_RANGES.get(aug)
        if spec is None:
            continue
        params = {}
        for key, (lo, hi) in spec.items():
            rng, sub = jax.random.split(rng)
            params[key] = float(jax.random.uniform(sub, (), minval=lo, maxval=hi))
        out.append(params)
    return out


# --------------------------------------------------------------------------
# the augmentations — all take/return (B, n) float32
# --------------------------------------------------------------------------

def change_pitch(audio, sr=SR, pitch_factor=0.0):
    """Linear-interpolation pitch shift by `pitch_factor` semitones.

    Note (reference parity): the reference reads source index j/factor
    (voice_activity.py:406), so *positive* semitones LOWER the pitch —
    opposite to its own docstring.  We reproduce the code's behavior.
    """
    n = audio.shape[-1]
    factor = 2.0 ** (pitch_factor / 12.0)
    src = jnp.arange(n, dtype=jnp.float32) / factor
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    w = src - lo.astype(jnp.float32)
    return ((1.0 - w) * audio[..., lo] + w * audio[..., hi]).astype(jnp.float32)


def _stft(x, n_fft=1024, hop=256):
    """Non-centered framed rFFT with a symmetric Hann window
    (matches the reference's from-scratch stft, voice_activity.py:467-499)."""
    n = x.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[..., idx] * jnp.asarray(np.hanning(n_fft), jnp.float32)
    return jnp.fft.rfft(frames)                        # (..., n_frames, n_fft//2+1)


def _istft(spec, n, n_fft=1024, hop=256):
    """Windowed overlap-add inverse (voice_activity.py:501-528)."""
    frames = jnp.fft.irfft(spec, n=n_fft).real.astype(jnp.float32)
    frames = frames * jnp.asarray(np.hanning(n_fft), jnp.float32)
    n_frames = frames.shape[-2]
    out_len = hop * (n_frames - 1) + n_fft
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (-1,))
    out = jnp.zeros(frames.shape[:-2] + (out_len,), jnp.float32)
    out = out.at[..., idx].add(flat)
    return out[..., :n] if out_len >= n else jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, n - out_len)])


def _phase_vocoder(spec, speed_factor, hop=256, out_frames=None):
    """Time-stretch an STFT (…, T, F) by `speed_factor` (traced scalar).

    ``out_frames`` sets the static output frame count; frames beyond the
    stretched extent are zeroed.  For slowdown (speed < 1) it must exceed
    the input frame count or the stretched tail is dropped — the reference
    emits ceil(T/speed) frames and only then truncates to the clip length
    (voice_activity.py:629-636; review r3 finding).
    """
    n_frames = spec.shape[-2]
    if out_frames is None:
        out_frames = n_frames
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)

    def step(phase_acc, t):
        orig_t = t.astype(jnp.float32) * speed_factor
        int_t = jnp.clip(jnp.floor(orig_t).astype(jnp.int32), 0, n_frames - 2)
        frac = orig_t - int_t.astype(jnp.float32)
        m1 = jax.lax.dynamic_index_in_dim(mag, int_t, axis=-2, keepdims=False)
        m2 = jax.lax.dynamic_index_in_dim(mag, int_t + 1, axis=-2, keepdims=False)
        p1 = jax.lax.dynamic_index_in_dim(phase, int_t, axis=-2, keepdims=False)
        p2 = jax.lax.dynamic_index_in_dim(phase, int_t + 1, axis=-2, keepdims=False)
        m = (1.0 - frac) * m1 + frac * m2
        dphase = p2 - p1
        dphase = jnp.mod(dphase + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        new_acc = phase_acc + dphase * speed_factor
        valid = (orig_t < n_frames - 1).astype(m.dtype)
        frame = m * valid * jnp.exp(1j * new_acc)
        return new_acc, frame

    init = phase[..., 0, :]
    _, frames = jax.lax.scan(step, init, jnp.arange(1, out_frames))
    # scan stacks on axis 0 → move the time axis back
    frames = jnp.moveaxis(frames, 0, -2)
    first = spec[..., 0:1, :]
    return jnp.concatenate([first, frames], axis=-2)


def change_speed(audio, sr=SR, speed_factor=1.0, n_fft=1024, hop=256):
    """Phase-vocoder time stretch, clip length preserved.

    Note (reference parity): the reference short-circuits speed 1.0
    (voice_activity.py:608-609) — its STFT→iSTFT round trip is not
    unit-gain (the Hann window is applied in both directions with no
    window-sum normalization), so stretched outputs carry a ~1.5× level
    change.  We reproduce both behaviors.
    """
    if isinstance(speed_factor, (int, float)) and float(speed_factor) == 1.0:
        return jnp.asarray(audio, jnp.float32)
    n = audio.shape[-1]
    spec = _stft(audio, n_fft, hop)
    n_frames = spec.shape[-2]
    # slowdown emits MORE frames than the input; size the static output so
    # the stretched tail survives up to the clip length (review r3: capping
    # at n_frames zeroed the last ~40 ms of slowed clips)
    sf = float(speed_factor)
    out_frames = (n_frames if sf >= 1.0
                  else int(np.ceil((n_frames - 1) / sf)) + 1)
    stretched = _phase_vocoder(spec, jnp.asarray(sf, jnp.float32), hop,
                               out_frames=out_frames)
    return _istft(stretched, n, n_fft, hop)


def add_reverb(audio, sr=SR, reverb_level=0.5, decay_time=0.5, num_delays=5):
    """Log-spaced delay taps with normalized exponential decay weights."""
    n = audio.shape[-1]
    k = int(num_delays)
    max_delay = int(sr * decay_time)
    delays = np.linspace(0, max_delay, k + 1, dtype=int)[1:]
    decays = np.exp(-np.linspace(0, 3, k))
    decays = decays / decays.sum()
    reverb = jnp.zeros_like(audio)
    for d, g in zip(delays, decays):
        if 0 < d < n:
            reverb = reverb.at[..., d:].add(audio[..., : n - d] * float(g))
    return ((1.0 - reverb_level) * audio + reverb_level * reverb).astype(jnp.float32)


def reduce_volume(audio, sr=SR, reduction_level=0.5):
    return (audio * reduction_level).astype(jnp.float32)


def gain_ramp(audio, sr=SR, start_db=0.0, end_db=0.0):
    """Linear-in-dB gain ramp across the clip (round-4, non-reference)."""
    n = audio.shape[-1]
    db = jnp.linspace(start_db, end_db, n)
    return (audio * 10.0 ** (db / 20.0)).astype(jnp.float32)


def add_echo(audio, sr=SR, echo_delay=0.5, decay_factor=0.5):
    n = audio.shape[-1]
    d = int(echo_delay * sr)
    echo = jnp.zeros_like(audio)
    if 0 < d < n:
        echo = echo.at[..., d:].set(audio[..., : n - d] * decay_factor)
    return (audio + echo).astype(jnp.float32)


def _butter1_band_coeffs(low_freq, high_freq, sr):
    """scipy.signal.butter(1, [lo, hi], 'band') digital coefficients."""
    import scipy.signal

    nyq = 0.5 * sr
    b, a = scipy.signal.butter(1, [low_freq / nyq, high_freq / nyq], btype="band")
    return b, a


def bandpass_filter(audio, sr=SR, low_freq=300.0, high_freq=2000.0):
    """1st-order Butterworth band-pass, applied via the filter's exact
    digital frequency response in the rFFT domain (circular filtering)."""
    b, a = _butter1_band_coeffs(float(low_freq), float(high_freq), sr)
    n = audio.shape[-1]
    w = 2j * np.pi * np.fft.rfftfreq(n)
    z = np.exp(-w)  # e^{-jω}
    h = np.polyval(b[::-1], z) / np.polyval(a[::-1], z)
    spec = jnp.fft.rfft(audio) * jnp.asarray(h.astype(np.complex64))
    return jnp.fft.irfft(spec, n=n).astype(jnp.float32)


def add_harmonic_distortion(audio, sr=SR, distortion_level=0.5):
    return (jnp.sign(audio) * (1.0 - jnp.exp(-distortion_level * jnp.abs(audio)))).astype(
        jnp.float32
    )


def compress_dynamics(audio, sr=SR, compression_ratio=2.0, threshold_level=-20.0):
    """Note (reference parity): the below-threshold branch keeps the RAW
    value, so the trailing sign(audio) multiply RECTIFIES quiet negative
    samples (sign(x)·x = |x|) — a reference bug reproduced deliberately
    (voice_activity.py compress_dynamics behaves identically; the device
    trainer pins the same quirk, train/device_data.py).  Do not "fix"
    either side alone: train/inference parity would silently break."""
    thr = 10.0 ** (threshold_level / 20.0)
    mag = jnp.abs(audio)
    compressed = jnp.where(mag > thr, thr + (mag - thr) / compression_ratio, audio)
    return (jnp.sign(audio) * compressed).astype(jnp.float32)


FUNC_MAP = {
    "change_pitch": change_pitch,
    "change_speed": change_speed,
    "add_reverb": add_reverb,
    "reduce_volume": reduce_volume,
    "gain_ramp": gain_ramp,
    "add_echo": add_echo,
    "bandpass_filter": bandpass_filter,
    "add_harmonic_distortion": add_harmonic_distortion,
    "compress_dynamics": compress_dynamics,
}


def apply_augmentations(
    audio,
    sr: int = SR,
    augmentations: Sequence[str] = (),
    augmentation_params: Sequence[Dict[str, float]] = (),
):
    """Apply named augmentations in sequence (voice_activity.py:352-384)."""
    for name, params in zip(augmentations, augmentation_params):
        fn = FUNC_MAP.get(name)
        if fn is None:
            raise KeyError(f"no such augmentation: {name}")
        audio = fn(audio, sr, **params)
    return audio
