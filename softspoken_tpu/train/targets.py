"""Training-target helpers.

Parity with the reference's latent training code:
  * ``process_spec``       — voice_activity.py:918-930: fixed −80/80 dB
    scaling into [0,1], trim to 256×256, zero out all-ones (silence) specs
  * ``frame_mask``         — voice_activity.py:933-943 (generate_1D_mask):
    1.0 where any frequency bin in the column is nonzero
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def process_spec(spec: np.ndarray) -> np.ndarray:
    """dB spectrogram → [0,1]-scaled 256×256 training image."""
    spec = (np.asarray(spec, np.float32) + 80.0) / 80.0
    spec = spec[0:256, 2:-1]
    spec = spec[..., None]
    if spec.sum() == 256 * 256:  # pure-silence sentinel
        spec = np.zeros_like(spec)
    return spec


def frame_mask(spec) -> jnp.ndarray:
    """(…, F, T) spec → (…, T) float mask: any-nonzero per time column."""
    x = jnp.asarray(spec)
    return jnp.any(x != 0, axis=-2).astype(jnp.float32)


def frame_mask_np(spec: np.ndarray) -> np.ndarray:
    return np.any(np.asarray(spec) != 0, axis=-2).astype(np.float32)
