"""Training driver: fit SpecUNet_2D from directories of speech/noise WAVs.

The reference ships no trainer — only the latent data-prep code this module
builds on (SURVEY.md §2.1 "training-data augmentation suite").  Batches are
synthesized the way that code implies: clean 3 s speech clips mixed into
environmental noise at random SNR, optionally augmented, with the clean/
noise mel images as the spec-head separation targets and any-speech-energy
frames as the mask-head targets (train/data.py).

Checkpoints are orbax (ckpt.save) and load straight into the Detector.
"""

from __future__ import annotations

import glob
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from .. import ckpt as ckpt_mod
from ..io import internal_length, load_audio
from . import data as D
from .loop import create_train_state, make_sharded_train_step, make_train_step

log = logging.getLogger(__name__)


def list_wavs(directory: str) -> List[str]:
    return sorted(glob.glob(os.path.join(directory, "**", "*.wav"), recursive=True))


class ClipSampler:
    """Random 3 s internal-rate clips from a file pool (bounded reads)."""

    def __init__(self, files: Sequence[str], rng: np.random.Generator, tile_short: bool):
        if not files:
            raise ValueError("empty file pool")
        self.files = list(files)
        self.rng = rng
        self.tile_short = tile_short
        self._lengths = {f: internal_length(f) for f in self.files}

    def sample(self) -> np.ndarray:
        f = self.files[int(self.rng.integers(len(self.files)))]
        n = self._lengths[f]
        start = int(self.rng.integers(max(1, n - D.CLIP + 1)))
        if self.tile_short and n < D.CLIP:
            # random tiling phase: start=0 would make every draw of a
            # sub-3s file the identical clip (review r3 batch 6); the
            # reference rotates start_idx the same way (voice_activity.py
            # start_idx into the tiled read)
            clip = D.load_environmental_noise(f, int(self.rng.integers(max(1, n))))
            if clip is not None:
                return clip
        wav, _ = load_audio(f, start=start)
        clip = np.zeros(D.CLIP, np.float32)
        if wav is not None:
            m = min(len(wav), D.CLIP)
            clip[:m] = wav[:m]
        return clip

    def batch(self, b: int) -> np.ndarray:
        return np.stack([self.sample() for _ in range(b)])


def fit(
    speech_dir: str,
    noise_dir: str,
    steps: int = 1000,
    batch_size: int = 16,
    learning_rate: float = 1e-3,
    ckpt_out: Optional[str] = None,
    augmentations: Sequence[str] = ("add_reverb", "reduce_volume", "bandpass_filter"),
    seed: int = 0,
    mesh=None,
    log_every: int = 20,
    save_every: int = 200,
    on_metrics=None,
    resume: Optional[str] = None,
    train_dtype: str = "float32",
    boundary_weight: float = 0.0,
) -> Dict[str, float]:
    """Run training; returns the final metrics dict."""
    rng = np.random.default_rng(seed)
    speech = ClipSampler(list_wavs(speech_dir), rng, tile_short=False)
    noise = ClipSampler(list_wavs(noise_dir), rng, tile_short=True)

    import jax.numpy as jnp

    model, state, tx = create_train_state(jax.random.PRNGKey(seed), learning_rate,
                                          resume=resume,
                                          compute_dtype=jnp.dtype(train_dtype))
    step0 = int(state.step)
    if mesh is not None:
        step_fn, shardings = make_sharded_train_step(
            model, tx, mesh, boundary_weight=boundary_weight)
    else:
        step_fn = jax.jit(make_train_step(model, tx, boundary_weight),
                          donate_argnums=(0,))
        shardings = None
    key = jax.random.PRNGKey(seed + 1)

    metrics = {}
    t0 = time.perf_counter()
    for step in range(1, steps + 1):
        batch = D.build_batch(
            speech.batch(batch_size), noise.batch(batch_size), rng,
            augmentations=augmentations,
        )
        if shardings is not None:
            batch = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
        if mesh is not None:
            with mesh:
                state, m = step_fn(state, batch, key)
        else:
            state, m = step_fn(state, batch, key)
        if step % log_every == 0 or step == steps:
            metrics = {k: float(v) for k, v in m.items()}
            rate = step * batch_size / (time.perf_counter() - t0)
            log.info("step %d  loss=%.4f  mask=%.4f  spec=%.4f  (%.1f clips/s)",
                     step, metrics["loss"], metrics["mask_loss"],
                     metrics["spec_loss"], rate)
            if on_metrics:
                on_metrics(step, metrics)
        if ckpt_out and (step % save_every == 0 or step == steps):
            _save_checkpoint(ckpt_out, state, step0 + step,
                             fatal=step == steps)
    return metrics


def _save_checkpoint(ckpt_out: str, state, epoch: int, fatal: bool) -> None:
    """Persist params+batch_stats; a mid-run save failure must not kill a
    long training run (the final save still raises)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    try:
        ckpt_mod.save(ckpt_out, jax.device_get(variables), epoch=epoch)
    except Exception:  # noqa: BLE001 — keep training, surface the failure
        if fatal:
            raise
        log.exception("checkpoint save failed at step %d (continuing)", epoch)


def fit_synthetic(
    steps: int = 2000,
    batch_size: int = 32,
    learning_rate: float = 1e-3,
    ckpt_out: Optional[str] = None,
    augmentations: Sequence[str] = ("add_reverb", "reduce_volume", "bandpass_filter"),
    seed: int = 0,
    mesh=None,
    n_inner: int = 10,
    pool_speech: int = 768,
    pool_noise: int = 768,
    pool_refresh_outer: int = 50,
    log_every_outer: int = 5,
    save_every_outer: int = 25,
    on_metrics=None,
    resume: Optional[str] = None,
    train_dtype: str = "float32",
    noise_extra_kinds: tuple = (),
    noise_extra_frac: float = 0.2,
    noise_extra_policy: str = "mixed",
    noise_extra_snr_range: tuple = (10.0, 20.0),
    noise_extra_silent_prob: float = 0.5,
    boundary_weight: float = 0.0,
    snr_db_range: tuple = (-5.0, 20.0),
    stall_abort_s: float = 900.0,
) -> Dict[str, float]:
    """Train from the synthetic corpus with fully on-device batch synthesis.

    Round-1's host batch builder cost ~3.7 s/step over the remote-TPU tunnel;
    here the host uploads a clip pool once (~400 MB at 768+768 clips), each
    device call runs ``n_inner`` complete steps (train/device_data.py), and
    fresh pools are generated on a background thread and swapped in every
    ``pool_refresh_outer`` outer iterations, so host work never blocks the
    device.
    """
    from . import synth
    from .device_data import (
        make_fused_train_step,
        make_sharded_fused_train_step,
        make_synth_batch_fn,
    )

    if noise_extra_policy not in ("mixed", "protected"):
        raise ValueError(f"unknown noise_extra_policy {noise_extra_policy!r}")
    if (noise_extra_policy == "protected" and noise_extra_kinds
            and int(pool_noise * noise_extra_frac) >= pool_noise):
        # extras_start would be 0 and device_data would silently fall back
        # to the legacy mixed path — the opposite of what was requested
        raise ValueError(
            "noise_extra_policy='protected' requires noise_extra_frac < 1.0 "
            "(some non-extra noise must remain to mix under speech); got "
            f"noise_extra_frac={noise_extra_frac}")
    rng = np.random.default_rng(seed)
    log.info("generating initial clip pools (%d speech + %d noise)…",
             pool_speech, pool_noise)
    sp_np, nz_np = synth.make_pools(rng, pool_speech, pool_noise,
                                    extra_kinds=tuple(noise_extra_kinds),
                                    extra_frac=noise_extra_frac)
    speech_pool, noise_pool = jax.device_put(sp_np), jax.device_put(nz_np)

    import jax.numpy as jnp

    model, state, tx = create_train_state(jax.random.PRNGKey(seed), learning_rate,
                                          resume=resume,
                                          compute_dtype=jnp.dtype(train_dtype))
    step0 = int(state.step)
    # protected placement: synth.make_pools appends the extra kinds as the
    # LAST extra_frac of the noise pool, so the region boundary is static
    n_extra = int(pool_noise * noise_extra_frac) if noise_extra_kinds else 0
    extras_start = (pool_noise - n_extra
                    if noise_extra_policy == "protected" and n_extra > 0
                    else None)
    synth_fn = make_synth_batch_fn(batch_size, augmentations,
                                   snr_db_range=tuple(snr_db_range),
                                   extras_start=extras_start,
                                   extras_snr_range=tuple(noise_extra_snr_range),
                                   extras_silent_prob=noise_extra_silent_prob)
    if mesh is not None:
        step_fn = make_sharded_fused_train_step(
            model, tx, synth_fn, mesh, n_inner=n_inner,
            boundary_weight=boundary_weight)
    else:
        step_fn = make_fused_train_step(model, tx, synth_fn, n_inner=n_inner,
                                        boundary_weight=boundary_weight)

    outer_total = -(-steps // n_inner)
    key = jax.random.PRNGKey(seed + 1)
    pool_rng = np.random.default_rng(seed + 2)
    pool_pending = None
    metrics: Dict[str, float] = {}
    t0 = time.perf_counter()

    watchdog = (_StallWatchdog(stall_abort_s)
                if stall_abort_s and stall_abort_s > 0 else None)

    # the watchdog daemon must not outlive the loop: on an exception it
    # would os._exit(86) the whole process up to stall_abort_s later,
    # killing in-process callers and mislabelling a crash as a stall
    try:
        for outer in range(1, outer_total + 1):
            if pool_refresh_outer:
                # never block the device on the host synthesizer: swap in a
                # fresh pool the moment its background generation finishes
                # (on this 1-core host a 768+768 pool takes ~15 min, far
                # longer than pool_refresh_outer steps); meanwhile keep
                # training on the current pool — shifts/mixing/augs keep
                # batches varied. Generations run on a DAEMON thread (an
                # executor's non-daemon worker would block process exit up to a
                # full pool generation whose result is discarded) and are not
                # started near the end of the run.
                if pool_pending is not None and pool_pending.failed():
                    # don't let a failed generation silently end pool refresh
                    # for the rest of training: log and allow a later retry
                    log.warning("background pool refresh failed (%s); will retry",
                                pool_pending.error)
                    pool_pending = None
                elif pool_pending is not None and pool_pending.done():
                    speech_pool = jax.device_put(pool_pending.result[0])
                    noise_pool = jax.device_put(pool_pending.result[1])
                    log.info("swapped in a fresh clip pool at step %d",
                             outer * n_inner)
                    pool_pending = None
                if (pool_pending is None
                        and outer % pool_refresh_outer == 0
                        and outer_total - outer >= pool_refresh_outer):
                    pool_pending = _DaemonJob(
                        synth.make_pools, pool_rng, pool_speech, pool_noise,
                        extra_kinds=tuple(noise_extra_kinds),
                        extra_frac=noise_extra_frac,
                    )
            key, sub = jax.random.split(key)
            if mesh is not None:
                with mesh:
                    state, m = step_fn(state, speech_pool, noise_pool, sub)
            else:
                state, m = step_fn(state, speech_pool, noise_pool, sub)
            if watchdog is not None:
                # dispatch is async but JAX bounds in-flight device calls, so
                # the loop blocks inside step_fn once the pipeline fills — this
                # heartbeat tracks real device progress to within ~2 outer steps
                watchdog.beat(outer)
            step = outer * n_inner
            if outer % log_every_outer == 0 or outer == outer_total:
                metrics = {k: float(v) for k, v in m.items()}
                rate = step * batch_size / (time.perf_counter() - t0)
                log.info(
                    "step %d/%d  loss=%.4f  mask=%.4f  spec=%.4f  (%.1f clips/s, %.2f s/step)",
                    step, outer_total * n_inner, metrics["loss"],
                    metrics["mask_loss"], metrics["spec_loss"], rate,
                    (time.perf_counter() - t0) / step,
                )
                if on_metrics:
                    on_metrics(step, metrics)
            if ckpt_out and (outer % save_every_outer == 0 or outer == outer_total):
                _save_checkpoint(ckpt_out, state, step0 + step,
                                 fatal=outer == outer_total)
    finally:
        if watchdog is not None:
            watchdog.stop()
    return metrics


class _StallWatchdog:
    """Abort the process when training stops making progress.

    A remote-TPU session can die SILENTLY — the connection thread blocks in
    ``tcp_recvmsg`` on a response that never comes and the training loop
    futex-waits forever (observed live in round 4: 14+ min frozen at step
    6600/8000 while a fresh connection to the same server worked fine).  A
    hang is strictly worse than a crash here: checkpoints make restarts
    cheap, so when no heartbeat arrives within ``timeout_s`` we abort the
    PROCESS with exit code 86 — the blocked thread is inside a C recv and
    cannot be unwound from Python.  Supervisors treat 86 as retryable
    (scripts/ftlib.py ``run(retries=)``).  The 900 s default clears the
    worst observed first-execution compile+load over the tunnel (502 s,
    .claude/skills/verify).
    """

    EXIT_CODE = 86

    def __init__(self, timeout_s: float, abort=None):
        import threading

        self.timeout_s = timeout_s
        self._abort = abort if abort is not None else os._exit
        self._beat = {"t": time.monotonic(), "step": 0}
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._watch, daemon=True, name="train-stall-watchdog")
        self._thread.start()

    def beat(self, step: int) -> None:
        self._beat = {"t": time.monotonic(), "step": step}

    def stop(self) -> None:
        self._stop.set()

    def _watch(self) -> None:
        poll = max(0.05, min(30.0, self.timeout_s / 4))
        while not self._stop.wait(poll):
            beat = self._beat
            quiet = time.monotonic() - beat["t"]
            if quiet > self.timeout_s:
                log.error(
                    "no training progress for %.0f s (device/link stall?) "
                    "— aborting with exit code %d so a supervisor can "
                    "retry; last completed outer step %d, latest "
                    "checkpoint is resumable",
                    quiet, self.EXIT_CODE, beat["step"])
                self._abort(self.EXIT_CODE)
                return


class _DaemonJob:
    """One background computation on a daemon thread (never blocks exit)."""

    def __init__(self, fn, *args, **kwargs):
        import threading

        self.result = None
        self.error: Exception | None = None
        self._done = threading.Event()

        def run():
            try:
                self.result = fn(*args, **kwargs)
            except Exception as e:  # surfaced by the training loop
                self.error = e
            finally:
                self._done.set()

        threading.Thread(target=run, daemon=True).start()

    def done(self) -> bool:
        # completion is the event alone: gating on `result is not None`
        # would leave a job whose fn legitimately returned None neither
        # done() nor failed(), stalling pool refresh forever with no log
        # (review r3 batch 6)
        return self._done.is_set() and self.error is None

    def failed(self) -> bool:
        return self._done.is_set() and self.error is not None
