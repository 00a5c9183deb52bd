"""Training-clip assembly — the reference's latent data loaders, rebuilt.

Parity targets (voice_activity.py):
  * load_environmental_noise (:256-269) — a 3 s noise clip starting at a
    given internal-rate offset, tiled when shorter than 3 s
  * load_peoples_speech      (:274-282) — sum several 3 s speech reads into
    one clip
  * load_spoken_word         (:285-297) — place whole short recordings at
    given offsets inside a 3 s clip

plus a batch builder that composes clips + augmentations + targets into the
(mel, mask, spec) training batches consumed by ``train.loop``:
  clean speech  → mel target channel 0, frame mask from the clean spec
  environment   → mel target channel 1
  model input   → mel of the augmented speech+environment mix
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import DEFAULT_CONFIG
from ..io import load_audio
from ..ops import mel as melops

SR = DEFAULT_CONFIG.dsp.sample_rate
CLIP = SR * 3  # 66150


def load_environmental_noise(filename: str, start_idx: int) -> Optional[np.ndarray]:
    """3 s of environmental audio from ``start_idx`` (internal-rate samples);
    clips shorter than 3 s are tiled to fill (voice_activity.py:256-269)."""
    wav, _sr = load_audio(filename, start=start_idx)
    if wav is None or len(wav) == 0:
        return None
    if len(wav) < CLIP:
        reps = -(-CLIP // len(wav))
        wav = np.tile(wav, reps)[:CLIP]
    return wav[:CLIP].astype(np.float32)


def load_peoples_speech(filenames: Sequence[Tuple[str, int]]) -> np.ndarray:
    """Sum several (file, start_idx) 3 s reads into one clip (:274-282)."""
    clip = np.zeros(CLIP, np.float32)
    for file_name, start_idx in filenames:
        wav, _sr = load_audio(file_name, start=start_idx)
        if wav is None:
            continue
        n = min(len(wav), CLIP)
        clip[:n] += wav[:n]
    return clip


def load_spoken_word(filenames: Sequence[Tuple[str, int]]) -> np.ndarray:
    """Place whole recordings at sample offsets inside a 3 s clip (:285-297)."""
    clip = np.zeros(CLIP, np.float32)
    for file_name, start_idx in filenames:
        wav, _sr = load_audio(file_name)
        if wav is None:
            continue
        if not 0 <= start_idx < CLIP:
            # placement entirely outside the clip: skip like the other
            # loaders degrade on bad input — clip[start:end] would be empty
            # while wav[:end-start] is not, a broadcast ValueError
            # (review r3 batch 6)
            continue
        end = min(start_idx + len(wav), CLIP)
        clip[start_idx:end] = wav[: end - start_idx]
    return clip


def build_batch(
    speech_clips: np.ndarray,
    noise_clips: np.ndarray,
    rng: np.random.Generator,
    augmentations: Sequence[str] = (),
    snr_db_range: Tuple[float, float] = (-5.0, 20.0),
) -> Dict[str, np.ndarray]:
    """Compose (B, 66150) speech + noise into a training batch.

    Returns {"mel": (B,128,256,1), "mask": (B,256), "spec": (B,128,256,2)}.
    The spec target stacks the clean speech / environment mel images
    (matching the model's two separation channels,
    pytorch_neural_nets.py:126-130); the frame mask is any-speech-energy per
    frame on the clean mel (voice_activity.py:933-943 semantics).
    """
    import jax
    import jax.numpy as jnp

    from . import augment as aug
    from .targets import frame_mask_np

    B = speech_clips.shape[0]
    assert noise_clips.shape[0] == B

    # SNR mixing
    snr_db = rng.uniform(*snr_db_range, size=(B, 1)).astype(np.float32)
    sp_rms = np.sqrt(np.mean(speech_clips**2, axis=1, keepdims=True) + 1e-12)
    nz_rms = np.sqrt(np.mean(noise_clips**2, axis=1, keepdims=True) + 1e-12)
    gain = sp_rms / (nz_rms * 10.0 ** (snr_db / 20.0))
    noise_scaled = noise_clips * gain

    mix = speech_clips + noise_scaled
    if augmentations:
        # per-CLIP parameter draws (reference semantics, voice_activity.py
        # :314-343 — and what the device trainer does): one draw for the
        # whole batch gave every row identical reverb/bandpass/volume and
        # 1/B the augmentation diversity (review r3 finding).  Eager per-row
        # application; this host path is not the throughput trainer.
        rows = []
        for b in range(B):
            key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
            params = aug.get_parameters(key, augmentations)
            rows.append(aug.apply_augmentations(
                jnp.asarray(mix[b: b + 1]), SR, augmentations, params))
        mix = np.asarray(jnp.concatenate(rows, axis=0))

    def mel_of(x: np.ndarray) -> np.ndarray:
        # (B, 66150) clips straight through the batched frontend — the same
        # code path the on-device trainer uses (train/device_data.py)
        return np.asarray(melops.log_mel_clips(jnp.asarray(x)))

    mel_mix = mel_of(mix.astype(np.float32))
    mel_speech = mel_of(speech_clips.astype(np.float32))
    mel_noise = mel_of(noise_scaled.astype(np.float32))

    # frame mask from clean-speech energy (threshold tiny numeric floor —
    # log-mel of silence is exactly 0)
    mask = frame_mask_np(np.where(mel_speech > 1e-4, mel_speech, 0.0))

    return {
        "mel": mel_mix[..., None],
        "mask": mask.astype(np.float32),
        "spec": np.stack([mel_speech, mel_noise], axis=-1).astype(np.float32),
    }
