"""On-device training-batch synthesis — the round-2 throughput fix.

Round 1 built every batch on the host (train/data.py): decode, SNR mix,
augment, mel, targets, then a ~50 MB host→device upload per step — ~3.7 s/
step over the remote-TPU tunnel, 50× slower than the actual train step.

Here the host uploads two *clip pools* once — ``speech (Ns, 66150)`` and
``noise (Nn, 66150)`` float32 — and every batch is synthesized inside the
jitted step itself: index sampling, circular time shifts, SNR mixing,
the batched augmentation suite (train/augment.py), the matmul mel frontend
(ops.mel.log_mel_clips), and the mask/spec targets all run on device, so a
training step transfers nothing but a PRNG key and the metrics scalars.
``make_fused_train_step`` additionally lax.scans ``n_inner`` optimizer
steps into ONE device call, amortizing tunnel dispatch latency the same way
the inference engine's chunk scan does (engine/detector.py:148-160).

Target semantics match train/data.py exactly (clean-speech mel → mask and
spec channel 0, scaled noise mel → spec channel 1); a ``silence_prob``
fraction of rows zero out the speech so the detector sees true negatives.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import mel as melops
from .targets import frame_mask

SR = 22050
CLIP = SR * 3


# --------------------------------------------------------------------------
# traced, per-row augmentations
#
# train/augment.py keeps reference-exact semantics but takes *static* Python
# params — every new random draw is a fresh jit specialization (one
# recompile per step, the round-1 killer). The device pipeline needs params
# as traced tensors, sampled per ROW, inside one compiled program. The
# filtering augmentations (reverb taps, echo, Butterworth band-pass) compose
# into a single per-row frequency response applied in one rfft/irfft round;
# this is numerically the augment.py behavior (which already applies the
# band-pass via its exact circular frequency response).
# --------------------------------------------------------------------------

_DEVICE_AUGS = (
    "change_pitch",
    "add_reverb",
    "reduce_volume",
    "add_echo",
    "bandpass_filter",
    "add_harmonic_distortion",
    "compress_dynamics",
    "gain_ramp",
)


def _butter1_band_response(theta: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                           sr: float) -> jnp.ndarray:
    """H(e^{jθ}) of scipy.signal.butter(1, [lo, hi], 'band'), traced.

    Evaluates the bilinear transform directly: the analog first-order
    band-pass H(s) = BW·s / (s² + BW·s + w0²) at s = 4(z−1)/(z+1) with the
    prewarped edges w = 4·tan(π f / sr) — identical to evaluating scipy's
    (b, a) polynomial response (verified in tests/test_train.py).
    """
    w1 = 4.0 * jnp.tan(jnp.pi * lo / sr)
    w2 = 4.0 * jnp.tan(jnp.pi * hi / sr)
    bw = w2 - w1
    w0sq = w1 * w2
    z = jnp.exp(1j * theta)
    s = 4.0 * (z - 1.0) / (z + 1.0 + 1e-12)
    return (bw * s) / (s * s + bw * s + w0sq + 1e-12)


def make_device_augment_fn(augmentations: Sequence[str], sr: int = SR):
    """Returns traced ``augment(mix (B, n), key) -> (B, n)`` applying the
    named augmentations with independent per-row random parameters
    (ranges: augment.PARAM_RANGES / voice_activity.py:314-343)."""
    augs = [a for a in augmentations if a in _DEVICE_AUGS]
    unknown = set(augmentations) - set(augs)
    if unknown - {"change_speed"}:
        raise KeyError(f"no device augmentation for {sorted(unknown)}")
    if "change_speed" in unknown:
        import logging

        logging.getLogger(__name__).warning(
            "change_speed has no traced device implementation (variable-"
            "length output breaks the fixed batch shape); it is SKIPPED on "
            "the --synthetic path. The host `fit` path does apply it."
        )
    if not augs:
        return lambda mix, key: mix

    _FILTERS = ("add_reverb", "add_echo", "bandpass_filter")

    def augment(mix: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        B, n = mix.shape
        # per-aug keys folded on the aug's STABLE identity (its index in
        # _DEVICE_AUGS), not its position in the caller's list: the same
        # augmentation set then draws the same parameters regardless of
        # requested order, so reordering changes only the composition
        keys = {a: jax.random.fold_in(key, _DEVICE_AUGS.index(a))
                for a in augs}

        def u(k, lohi, shape=(B, 1)):
            return jax.random.uniform(k, shape, minval=lohi[0], maxval=lohi[1])

        def change_pitch(mix):
            semi = u(keys["change_pitch"], (-3.0, 3.0), (B,))
            factor = 2.0 ** (semi / 12.0)
            src = jnp.arange(n, dtype=jnp.float32)[None, :] / factor[:, None]
            lo_i = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n - 1)
            w = src - lo_i.astype(jnp.float32)
            hi_i = jnp.clip(lo_i + 1, 0, n - 1)
            return (1.0 - w) * jnp.take_along_axis(mix, lo_i, axis=1) + \
                w * jnp.take_along_axis(mix, hi_i, axis=1)

        def reduce_volume(mix):
            return mix * u(keys["reduce_volume"], (0.1, 0.99))

        def gain_ramp(mix):
            # linear-in-dB ramp; endpoints independent per row (round-4
            # fading analog).  Ranges READ from augment.PARAM_RANGES —
            # unlike the reference-frozen augs this is a round-5 tuning
            # knob, and a hardcoded copy here would silently diverge from
            # the host path when it is retuned (review r4)
            from .augment import PARAM_RANGES

            rng_spec = PARAM_RANGES["gain_ramp"]
            k1, k2 = jax.random.split(keys["gain_ramp"])
            a = u(k1, rng_spec["start_db"])
            b = u(k2, rng_spec["end_db"])
            t = jnp.linspace(0.0, 1.0, n)[None, :]
            return mix * 10.0 ** ((a + (b - a) * t) / 20.0)

        def add_harmonic_distortion(mix):
            k_dist = u(keys["add_harmonic_distortion"], (10.0, 50.0))
            return jnp.sign(mix) * (1.0 - jnp.exp(-k_dist * jnp.abs(mix)))

        def compress_dynamics(mix):
            k1, k2 = jax.random.split(keys["compress_dynamics"])
            ratio = u(k1, (1.5, 6.0))
            thr = 10.0 ** (u(k2, (-40.0, -10.0)) / 20.0)
            mag = jnp.abs(mix)
            # below-threshold branch uses the RAW value (not |mix|): the
            # reference quirk rectifies quiet negative samples
            # (sign(x)·x = |x|), which augment.compress_dynamics matches
            # deliberately — the device path must too (review r3 finding)
            return jnp.sign(mix) * jnp.where(
                mag > thr, thr + (mag - thr) / ratio, mix
            )

        def apply_filters(mix, group):
            # one combined frequency response for ADJACENT filtering augs.
            # Zero-pad to a power of two: TPU XLA lowers non-radix FFTs into
            # a dense DFT matmul (a 66150² = 17.5 GB buffer!), and the pad
            # turns circular filtering into linear convolution for every
            # delay shorter than the pad (max reverb delay 1 s ≪ 2.9 s pad).
            nfft = 1 << (n - 1).bit_length()
            theta = 2.0 * jnp.pi * jnp.fft.rfftfreq(nfft).astype(jnp.float32)
            H = jnp.ones((B, theta.shape[0]), jnp.complex64)
            if "add_reverb" in group:
                k1, k2, k3 = jax.random.split(keys["add_reverb"], 3)
                level = u(k1, (0.2, 0.8))
                decay_time = u(k2, (0.2, 1.0))
                # host path int-truncates uniform(1.0, 5.0) → {1..4}; randint
                # upper bound 5 (exclusive) keeps both trainers on the same
                # augmentation distribution (review r3 finding)
                n_del = jax.random.randint(k3, (B, 1), 1, 5).astype(jnp.float32)
                taps = jnp.arange(5, dtype=jnp.float32)[None, :]       # (1, 5)
                live = (taps < n_del).astype(jnp.float32)               # (B, 5)
                # delays: linspace(0, sr·decay, k+1)[1:] ≈ (i+1)/k · sr·decay
                d = (taps + 1.0) / jnp.maximum(n_del, 1.0) * sr * decay_time
                g = jnp.exp(-3.0 * taps / jnp.maximum(n_del - 1.0, 1.0)) * live
                g = g / jnp.sum(g, axis=1, keepdims=True)
                tap_resp = jnp.sum(
                    g[..., None] * jnp.exp(-1j * d[..., None] * theta), axis=1
                )
                H = H * ((1.0 - level) + level * tap_resp)
            if "add_echo" in group:
                k1, k2 = jax.random.split(keys["add_echo"])
                d = u(k1, (0.1, 0.7)) * sr
                decay = u(k2, (0.3, 0.7))
                H = H * (1.0 + decay * jnp.exp(-1j * d * theta))
            if "bandpass_filter" in group:
                k1, k2 = jax.random.split(keys["bandpass_filter"])
                f_lo = u(k1, (100.0, 500.0))
                f_hi = u(k2, (600.0, 2500.0))
                H = H * _butter1_band_response(theta[None, :], f_lo, f_hi, sr)
            padded = jnp.pad(mix, ((0, 0), (0, nfft - n)))
            return jnp.fft.irfft(jnp.fft.rfft(padded) * H, n=nfft)[
                :, :n
            ].astype(jnp.float32)

        pointwise = {"change_pitch": change_pitch,
                     "reduce_volume": reduce_volume,
                     "gain_ramp": gain_ramp,
                     "add_harmonic_distortion": add_harmonic_distortion,
                     "compress_dynamics": compress_dynamics}

        # apply in the CALLER's sequence order — nonlinear augmentations do
        # not commute with filtering, and the host path honors the order
        # (review r3: a fixed pitch→filter→volume→distort→compress order
        # silently diverged for any other requested sequence).  Adjacent
        # filter augs still fuse into one FFT round trip; filters within a
        # fused group commute (they multiply in the frequency domain).
        i = 0
        while i < len(augs):
            if augs[i] in _FILTERS:
                group = []
                while i < len(augs) and augs[i] in _FILTERS:
                    group.append(augs[i])
                    i += 1
                mix = apply_filters(mix, group)
            else:
                mix = pointwise[augs[i]](mix)
                i += 1
        return mix.astype(jnp.float32)

    return augment


def sample_mix_rows(
    key: jax.Array,
    batch_size: int,
    n_speech: int,
    n_noise: int,
    snr_db_range: Tuple[float, float],
    silence_prob: float,
    extras_start: int | None = None,
    extras_snr_range: Tuple[float, float] = (10.0, 20.0),
    extras_silent_prob: float = 0.5,
):
    """Per-row draw of ``(si, ni, keep, snr_db, k_roll, k_aug)``.

    With ``extras_start=None`` this reproduces the historical sampling
    stream bit-for-bit (same key splits, same order), so existing recipes
    are unchanged.  ``extras_start`` marks where the opt-in confuser
    textures begin in the noise pool (synth.make_pools appends them at the
    tail) and switches on the **protected placement policy** — the round-4
    reading of the four rejected fine-tunes (docs/FT_SNRFLOOR_r04.json
    ``round5_reading``): texture confusers must teach "texture alone is not
    speech" WITHOUT polluting the marginal-SNR speech distribution.

      * silent rows draw from the extras region with probability
        ``extras_silent_prob`` — pure negatives at natural level (the
        "music playing, nobody talking" case the real-audio probe measures)
      * speech rows that drew an extras clip get their SNR redrawn from
        ``extras_snr_range`` — speech over a texture stays clearly audible,
        so the hard low-SNR mixes remain exclusively in-distribution
        environment noise (the conditions all four fine-tunes regressed)
    """
    B = batch_size
    k_si, k_ni, k_roll, k_sil, k_snr, k_aug = jax.random.split(key, 6)

    si = jax.random.randint(k_si, (B,), 0, n_speech)
    ni = jax.random.randint(k_ni, (B,), 0, n_noise)
    keep = (jax.random.uniform(k_sil, (B, 1)) >= silence_prob).astype(jnp.float32)
    snr_db = jax.random.uniform(
        k_snr, (B, 1), minval=snr_db_range[0], maxval=snr_db_range[1]
    )

    if extras_start is not None and 0 < extras_start < n_noise:
        # fresh fold_in keys: the six historical splits above stay
        # byte-identical for the default path
        k_nx = jax.random.fold_in(key, 101)
        k_ux = jax.random.fold_in(key, 102)
        k_sx = jax.random.fold_in(key, 103)
        ni_extra = jax.random.randint(k_nx, (B,), extras_start, n_noise)
        silent = keep[:, 0] < 0.5
        force = (jax.random.uniform(k_ux, (B,)) < extras_silent_prob) & silent
        ni = jnp.where(force, ni_extra, ni)
        is_extra = (ni >= extras_start)[:, None]
        snr_hi = jax.random.uniform(
            k_sx, (B, 1), minval=extras_snr_range[0], maxval=extras_snr_range[1]
        )
        snr_db = jnp.where(is_extra & (keep > 0.5), snr_hi, snr_db)

    return si, ni, keep, snr_db, k_roll, k_aug


def make_synth_batch_fn(
    batch_size: int,
    augmentations: Sequence[str] = (),
    snr_db_range: Tuple[float, float] = (-5.0, 20.0),
    silence_prob: float = 0.2,
    extras_start: int | None = None,
    extras_snr_range: Tuple[float, float] = (10.0, 20.0),
    extras_silent_prob: float = 0.5,
):
    """Returns jit-able ``synth(speech_pool, noise_pool, key) -> batch``.

    ``extras_start`` (optional) enables the protected confuser-placement
    policy — see :func:`sample_mix_rows`."""
    augment_fn = make_device_augment_fn(augmentations)

    def synth(speech_pool: jnp.ndarray, noise_pool: jnp.ndarray, key: jax.Array):
        B = batch_size
        si, ni, keep, snr_db, k_roll, k_aug = sample_mix_rows(
            key, B, speech_pool.shape[0], noise_pool.shape[0],
            snr_db_range, silence_prob,
            extras_start=extras_start, extras_snr_range=extras_snr_range,
            extras_silent_prob=extras_silent_prob)
        speech = speech_pool[si]
        noise = noise_pool[ni]

        # circular time shift decorrelates repeated pool draws
        shift = jax.random.randint(k_roll, (B,), 0, CLIP)
        speech = jax.vmap(jnp.roll)(speech, shift)

        # true negatives: drop speech entirely on some rows
        speech = speech * keep
        sp_rms = jnp.sqrt(jnp.mean(speech**2, axis=1, keepdims=True) + 1e-12)
        nz_rms = jnp.sqrt(jnp.mean(noise**2, axis=1, keepdims=True) + 1e-12)
        gain = sp_rms / (nz_rms * 10.0 ** (snr_db / 20.0))
        # silent rows: keep the noise at its natural level instead of ×~0
        gain = jnp.where(keep > 0, gain, 1.0)
        noise_scaled = noise * gain

        mix = speech + noise_scaled
        if augmentations:
            mix = augment_fn(mix, k_aug)

        mel_mix = melops.log_mel_clips(mix)
        mel_speech = melops.log_mel_clips(speech)
        mel_noise = melops.log_mel_clips(noise_scaled)

        mask = frame_mask(jnp.where(mel_speech > 1e-4, mel_speech, 0.0))
        return {
            "mel": mel_mix[..., None],
            "mask": mask,
            "spec": jnp.stack([mel_speech, mel_noise], axis=-1),
        }

    return synth


def make_fused_train_step(model, tx, synth_fn, n_inner: int = 8,
                          boundary_weight: float = 0.0):
    """One device call = ``n_inner`` full {synthesize → forward → backward →
    update} steps via lax.scan. Returns ``step(state, pools, key)`` →
    (state, metrics averaged over the inner steps)."""
    from .loop import make_train_step

    base_step = make_train_step(model, tx, boundary_weight)

    def fused(state, speech_pool, noise_pool, key):
        def body(state, k):
            k_batch, k_drop = jax.random.split(k)
            batch = synth_fn(speech_pool, noise_pool, k_batch)
            return base_step(state, batch, k_drop)

        keys = jax.random.split(key, n_inner)
        state, ms = jax.lax.scan(body, state, keys)
        return state, {k: v.mean() for k, v in ms.items()}

    return jax.jit(fused, donate_argnums=(0,))


def make_sharded_fused_train_step(model, tx, synth_fn, mesh, n_inner: int = 8,
                                  boundary_weight: float = 0.0):
    """Mesh variant: pools replicated, the synthesized batch dp-sharded.

    The synthesizer's output is constrained to ``P('data', …)`` so GSPMD
    splits the U-Net forward/backward over chips; parameters/optimizer state
    stay replicated (1.7 M params — far below the threshold where sharding
    them pays).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .loop import batch_partition_specs, make_train_step

    base_step = make_train_step(model, tx, boundary_weight)

    def constrain(batch):
        # same layout as the host sharded trainer, from the one shared
        # spec builder (loop.batch_partition_specs)
        spec = batch_partition_specs(mesh)
        return {
            k: jax.lax.with_sharding_constraint(v, NamedSharding(mesh, spec[k]))
            for k, v in batch.items()
        }

    def fused(state, speech_pool, noise_pool, key):
        def body(state, k):
            k_batch, k_drop = jax.random.split(k)
            batch = constrain(synth_fn(speech_pool, noise_pool, k_batch))
            return base_step(state, batch, k_drop)

        keys = jax.random.split(key, n_inner)
        state, ms = jax.lax.scan(body, state, keys)
        return state, {k: v.mean() for k, v in ms.items()}

    repl = NamedSharding(mesh, P())
    return jax.jit(
        fused,
        in_shardings=(None, repl, repl, repl),
        donate_argnums=(0,),
    )
