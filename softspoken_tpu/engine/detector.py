"""The TPU detection engine.

Reference behavior being reproduced (not its structure):
  * NNDetector.__init__/load_checkpoint  — NNDetector.py:21-53
  * process_batch (3 s slices → model)   — NNDetector.py:84-101
  * worker-side per-file loop            — worker.py:49-128
  * average_overlapping_detections        — NNDetector.py:153-190
  * find_speech_regions                   — NNDetector.py:103-143

TPU-first design decisions:
  * The waveform chunk crosses the host↔device boundary ONCE; the 5×
    window overlap is materialized on device by the fused gather in
    ``ops.mel`` instead of re-uploading each 3 s slice (the reference
    re-slices on host per batch, worker.py:71-84 / NNDetector.py:93-96).
  * mel frontend + U-Net run under one jit; when only intervals are needed
    the spec head is not returned, so XLA dead-code-eliminates ~15% of the
    FLOPs.
  * One compiled shape: a fixed chunk buffer (cfg.engine.chunk_seconds) and
    a fixed device batch; ragged tails are padded and masked.  Long
    recordings stream through the same buffer (overlap-save: consecutive
    chunks share a window-length halo so every window sees real audio;
    results are independent of the chunking — SURVEY.md §5).
  * BatchNorm folded into conv weights at load (models.fold).
  * "parity" precision: float32 + HIGHEST matmuls, including the mel
    frontend — the log compression feeding a raw-logit 0.1 threshold is
    precision-sensitive, and bf16 DFT products (8-bit mantissa) can flip
    borderline bins.  "fast": bfloat16 convs with float32 accumulation,
    and mel_precision "auto" resolves to DEFAULT (1-pass bf16) mel
    matmuls — gated on the 24-condition hardware quality grid (max |ΔF1|
    0.0016 frame vs "high"; docs/QUALITY_r03.json mel_default_gate).  Set
    mel_precision explicitly to pin either mode.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..io import load_audio
from ..models import SpecUNet2D, fold_batch_norm
from ..ops import mel as melops
from .. import ckpt as ckpt_mod
from . import regions as R
from .planner import num_windows_for_padded_length, window_starts

log = logging.getLogger(__name__)


def _enable_compilation_cache() -> None:
    """Persistent XLA compile cache — the U-Net program costs minutes to
    compile on remote-attached TPUs and is identical across runs."""
    cache_dir = os.environ.get(
        "SOFTSPOKEN_JAX_CACHE", os.path.expanduser("~/.cache/softspoken_tpu/jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


@dataclasses.dataclass
class DetectionResult:
    """Per-file detection output (times already −pad-shifted, seconds)."""

    intervals: List[Tuple[float, float]]
    avg_values: np.ndarray          # averaged raw logits per covered grid bin
    num_windows: int
    audio_seconds: float            # unpadded duration at internal rate

    def averaged_detections(self) -> List[Tuple[float, str]]:
        """Reference-shaped [(avg, "%.4f" time)] list (NNDetector.py:179-187)."""
        return [
            (float(v), f"{i * R.TIME_RESOLUTION:.4f}")
            for i, v in enumerate(self.avg_values)
        ]


class Detector:
    """Sliding-window speech detector over a jitted mel+U-Net forward."""

    def __init__(
        self,
        config: Config = DEFAULT_CONFIG,
        variables: Optional[Dict] = None,
        checkpoint_path: Optional[str] = None,
        fold: bool = True,
    ):
        self.cfg = config
        self.epoch = -1
        _enable_compilation_cache()

        if variables is None:
            path = checkpoint_path or os.path.join(
                config.paths.model_dir, config.paths.model_name
            )
            variables, self.epoch = ckpt_mod.load_any(path)
            if variables is None:
                # degrade to a deterministic untrained model
                # (reference prints and continues — NNDetector.py:51-53)
                log.warning("no checkpoint found at %s; using random init", path)
                variables = ckpt_mod.fixture_variables(seed=0)

        fast = config.engine.precision != "parity"
        dtype = jnp.bfloat16 if fast else jnp.float32
        du = config.engine.decoder_upsample
        if du == "auto":
            du = "concat"  # measured faster in-context on v5e (config.py note)
        ci = config.engine.conv_impl
        if ci == "auto":
            # measured on v5e: "packed" loses in-context (5,541 vs 5,939
            # audio-s/s device-only) — see config.EngineConfig.conv_impl
            ci = "direct"
        if fold and "batch_stats" in variables:
            variables = fold_batch_norm(variables)
            self.model = SpecUNet2D(folded=True, compute_dtype=dtype,
                                    decoder_upsample=du, conv_impl=ci)
        else:
            self.model = SpecUNet2D(folded="batch_stats" not in variables,
                                    compute_dtype=dtype, decoder_upsample=du,
                                    conv_impl=ci)
        # one batched host→device transfer for all ~1.7M params
        self.variables = jax.device_put(variables)
        # mel matmul precision: parity mode keeps HIGHEST (strict reference
        # numerics); fast mode runs 1-pass bf16 ("default") — gated on the
        # trained checkpoint over BOTH eval generators × 12 degradation
        # conditions on hardware: max |ΔF1| 0.0016 frame / 0.0095 event vs
        # "high", sign-symmetric, worst-case condition unchanged
        # (docs/QUALITY_r03.json mel_default_gate).
        mp = config.engine.mel_precision
        if mp == "auto":
            mp = "highest" if config.engine.precision == "parity" else "default"
        # the resolved MODE STRING is canonical (the fused kernel keys off
        # it); the XLA enum is derived once here, not reverse-mapped later
        self._mel_mode = mp
        self._mel_precision = {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[mp]
        # mel kernel selection (see config.EngineConfig.mel_kernel):
        # "fused" = the Pallas framing+DFT+mel kernel (ops.pallas_frame_mel)
        # — windows never materialize in HBM; measured 5.0 ms (bf16x3) /
        # 6.8 ms (f32) vs 7.3 / 9.6 ms for the XLA chain per 256-window
        # frontend on v5e.  "auto" = fused on TPU, xla elsewhere (the
        # kernel needs Mosaic; CPU runs use interpret mode only in tests).
        mk = config.engine.mel_kernel
        if mk == "auto":
            # parity mode keeps the XLA two-matmul chain everywhere: the
            # fused Pallas kernel differs ~1e-5 (4-block DFT accumulation
            # order) which would break the strict-reference-numerics
            # contract and TPU-vs-CPU parity comparisons (same carve-out
            # policy as mel_precision and upload_codec "auto")
            mk = ("fused"
                  if (config.engine.precision != "parity"
                      and jax.default_backend() == "tpu")
                  else "xla")
        self._mel_kernel = mk

        self._fwd = jax.jit(self._forward)
        self._fwd_full = jax.jit(self._forward_full)
        self._fwd_chunk = jax.jit(self._forward_chunk)

    # ------------------------------------------------------------------
    # jitted forward
    # ------------------------------------------------------------------
    def _forward(self, variables, wave, starts):
        """(chunk_buf,), (B,) → mask logits (B, 256). Spec head is DCE'd."""
        if self._mel_kernel == "fused":
            from ..ops.pallas_frame_mel import log_mel_windows_fused

            mel = log_mel_windows_fused(
                wave, starts, mode=self._mel_mode,
                interpret=jax.default_backend() != "tpu",
                out_dtype=self.model.compute_dtype)
        elif self._mel_kernel == "pallas":
            from ..ops.pallas_mel import log_mel_windows_pallas

            mel = log_mel_windows_pallas(wave, starts)
        else:
            mel = melops.log_mel_windows(wave, starts, precision=self._mel_precision)
        _, logits = self.model.apply(variables, mel[..., None])
        return logits

    def _forward_full(self, variables, wave, starts):
        """Like _forward but also returns the spec head (B, 128, 256, 2)."""
        mel = melops.log_mel_windows(wave, starts, precision=self._mel_precision)
        spec, logits = self.model.apply(variables, mel[..., None])
        return spec, logits

    def _forward_chunk(self, variables, wave, starts_nb):
        """A whole chunk in ONE device call: lax.scan of the batched forward
        over (n_batches, B) start indexes → (n_batches, B, 256) logits.

        One host↔device round trip per ~8 min of audio instead of one per
        batch — per-call tunnel latency dominates dispatch otherwise.
        """

        def body(_, starts):
            return None, self._forward(variables, wave, starts)

        _, logits = jax.lax.scan(body, None, starts_nb,
                                 unroll=self.cfg.engine.scan_unroll)
        return logits

    def chunk_windows(self) -> int:
        """Windows per device chunk: the NEAREST multiple of device_batch
        to chunk_seconds' window count (flooring silently halved a 150 s /
        batch-128 chunk to 76.8 s, defeating the measured chunk-size
        tuning)."""
        cfg = self.cfg
        w = int(cfg.engine.chunk_seconds * cfg.dsp.sample_rate // cfg.samples_per_step)
        B = cfg.engine.device_batch
        return max(B, int(round(w / B)) * B)

    def chunk_buffer_len(self) -> int:
        """Fixed device buffer: a chunk's windows + the full last window."""
        cfg = self.cfg
        return (self.chunk_windows() - 1) * cfg.samples_per_step + cfg.samples_per_window

    # ------------------------------------------------------------------
    # reference API parity
    # ------------------------------------------------------------------
    def plan_detection_job(self, files: Sequence[str]) -> Dict[str, np.ndarray]:
        from .planner import plan_detection_job

        return plan_detection_job(files, self.cfg)

    def process_batch(self, audio_data: np.ndarray, batch_indexes):
        """Reference-shaped single-batch API (NNDetector.py:84-101): padded
        audio + start indexes → (speech_pred, mask_pred) numpy arrays in the
        reference's torch layout: (B,2,128,256) NCHW and (B,1,256).
        """
        idxs = np.asarray(batch_indexes, np.int64)
        if idxs.size == 0:
            return (np.zeros((0, 2, 128, 256), np.float32),
                    np.zeros((0, 1, 256), np.float32))
        if int(idxs.max()) + self.cfg.samples_per_window > np.iinfo(np.int32).max:
            # device indexes are int32; wrapping would silently score the
            # wrong audio.  (The chunked hot path uses chunk-LOCAL indexes
            # and handles any length — use detect_file* for >27 h streams.)
            raise ValueError(
                f"start index {int(idxs.max())} exceeds the int32 device "
                "index range; use the chunked detect_file/detect_waveform "
                "APIs for very long recordings")
        need = int(idxs.max()) + self.cfg.samples_per_window
        wave = np.zeros(max(need, len(audio_data)), np.float32)
        wave[: len(audio_data)] = np.asarray(audio_data, np.float32)
        spec, logits = self._fwd_full(
            self.variables, jnp.asarray(wave), jnp.asarray(idxs, jnp.int32)
        )
        spec = np.asarray(spec, np.float32).transpose(0, 3, 1, 2)
        mask = np.asarray(logits, np.float32)[:, None, :]
        return spec, mask

    # ------------------------------------------------------------------
    # the hot path
    # ------------------------------------------------------------------
    def _logits_from_segments(
        self,
        padded_len: int,
        fill_segment: Callable[[int, int, np.ndarray], None],
        progress: Optional[Callable[[float], None]] = None,
    ) -> np.ndarray:
        """All window logits for a padded stream of ``padded_len`` samples.

        ``fill_segment(s0, s1, out)`` writes padded-stream samples [s0, s1)
        into ``out`` (zero-filled, len s1-s0).  One device transfer per chunk,
        one compiled program for every call.
        """
        cfg = self.cfg
        B = cfg.engine.device_batch
        n_windows = num_windows_for_padded_length(padded_len, cfg)
        if n_windows <= 0:
            return np.zeros((0, 256), np.float32)
        starts = window_starts(n_windows, cfg)

        chunk_w = self.chunk_windows()
        buf_len = self.chunk_buffer_len()
        out: List[np.ndarray] = []

        chunk_ranges = [
            (w0, min(w0 + chunk_w, n_windows))
            for w0 in range(0, n_windows, chunk_w)
        ]

        # pipelined host fill: decode/resample of chunk i+1 overlaps the
        # device compute of chunk i (single fill thread — fill_segment may
        # carry sequential decoder state).  Each chunk gets a FRESH buffer:
        # on the remote (axon) backend block_until_ready can return before
        # the upload actually consumed the host memory (engine/fused.py,
        # project memory), so reusing a double buffer here silently
        # corrupted in-flight chunk audio (review r3 finding).  np.zeros is
        # lazily-zeroed pages — the allocation is cheap next to the decode.
        from concurrent.futures import ThreadPoolExecutor

        def fill_chunk(ci: int) -> np.ndarray:
            w0, w1 = chunk_ranges[ci]
            s0 = int(starts[w0])
            s1 = min(int(starts[w1 - 1]) + cfg.samples_per_window, padded_len)
            b = np.zeros(buf_len, np.float32)
            fill_segment(s0, s1, b[: s1 - s0])
            return b

        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(fill_chunk, 0)
            for ci, (w0, w1) in enumerate(chunk_ranges):
                buf = fut.result()
                wave_dev = jnp.asarray(buf)
                if ci + 1 < len(chunk_ranges):
                    fut = ex.submit(fill_chunk, ci + 1)

                s0 = int(starts[w0])
                local = (starts[w0:w1] - s0).astype(np.int32)
                n = len(local)
                if n == chunk_w:
                    # full chunk: one device call for the whole chunk
                    got = np.asarray(
                        self._fwd_chunk(
                            self.variables, wave_dev, jnp.asarray(local.reshape(-1, B))
                        ),
                        np.float32,
                    ).reshape(n, -1)
                else:
                    # ragged tail: per-batch path, padded windows read the
                    # zeroed buffer tail and are dropped below
                    n_pad = (-n) % B
                    if n_pad:
                        local = np.concatenate([local, np.zeros(n_pad, np.int32)])
                    pending = [
                        self._fwd(self.variables, wave_dev, jnp.asarray(local[b0 : b0 + B]))
                        for b0 in range(0, len(local), B)
                    ]
                    got = np.concatenate([np.asarray(x, np.float32) for x in pending])[:n]
                out.append(got)
                if progress is not None:
                    progress(w1 / n_windows)
        return np.concatenate(out)

    def mask_logits_for_padded(self, padded: np.ndarray) -> np.ndarray:
        """All window logits for an already ±3 s-padded waveform: (W, 256)."""
        padded = np.asarray(padded, np.float32)

        def fill(s0: int, s1: int, out: np.ndarray) -> None:
            out[:] = padded[s0:s1]

        return self._logits_from_segments(len(padded), fill)

    def _finalize(self, logits: np.ndarray, audio_seconds: float) -> DetectionResult:
        cfg = self.cfg
        sum_g, cnt_g = R.average_grid_host(logits, cfg.engine.step_seconds)
        avg = np.divide(sum_g, cnt_g, out=np.zeros_like(sum_g), where=cnt_g > 0)
        if cfg.engine.min_count > 1:
            # reference drops bins with coverage < min_count
            # (NNDetector.py:153,181-183); forcing them below threshold
            # excludes them from regions identically
            avg = np.where(cnt_g >= cfg.engine.min_count, avg, -np.inf)
        regions = R.find_speech_regions(
            avg, cfg.engine.threshold, cfg.engine.break_duration,
            exit_threshold=cfg.engine.exit_threshold,
            smooth_bins=cfg.engine.grid_smooth,
        )
        regions = R.shift_regions(regions, -cfg.engine.pad_seconds)
        return DetectionResult(regions, avg, logits.shape[0], audio_seconds)

    def detect_waveform(
        self, audio: np.ndarray, progress: Optional[Callable[[float], None]] = None
    ) -> DetectionResult:
        """Unpadded internal-rate mono waveform → intervals.

        Applies the ±3 s zero padding (worker.py:59-62) virtually: segments
        are assembled as [zeros | audio | zeros] without materializing a
        padded copy.
        """
        cfg = self.cfg
        audio = np.asarray(audio, np.float32)
        pad = cfg.pad_samples
        padded_len = len(audio) + 2 * pad

        def fill(s0: int, s1: int, out: np.ndarray) -> None:
            a0, a1 = max(s0, pad), min(s1, pad + len(audio))
            if a1 > a0:
                out[a0 - s0 : a1 - s0] = audio[a0 - pad : a1 - pad]

        logits = self._logits_from_segments(padded_len, fill, progress)
        result = self._finalize(logits, len(audio) / cfg.dsp.sample_rate)
        if cfg.engine.music_filter is not None:
            sr = cfg.dsp.sample_rate

            def read_ctx(s: float, e: float) -> np.ndarray:
                return audio[int(s * sr) : int(e * sr)]

            result = self._apply_music_filter(result, read_ctx)
        return result

    def detect_file(
        self, path: str, progress: Optional[Callable[[float], None]] = None
    ) -> DetectionResult:
        """Decode + resample + detect one file (in-memory decode path)."""
        audio, _sr = load_audio(path, target_sr=self.cfg.dsp.sample_rate)
        if audio is None:
            raise IOError(f"failed to decode {path}")
        return self.detect_waveform(audio, progress)

    def detect_file_fused(
        self, path: str, progress: Optional[Callable[[float], None]] = None,
        journal_dir: Optional[str] = None, timers=None,
    ) -> DetectionResult:
        """Fully-fused device pipeline (engine.fused): raw PCM streams to the
        accelerator; decode, resample, mel, U-Net and the overlap grid all
        run in one program per chunk.  ``journal_dir`` enables chunk-granular
        resume (see engine.journal).  ``timers`` (runtime.metrics.StageTimers)
        accumulates the per-phase pipeline breakdown — the bench's multifile
        phase reads it to show WHERE concurrent files do (or don't) overlap."""
        from .fused import detect_file_fused

        result = detect_file_fused(self, path, progress, journal_dir,
                                   timers=timers)
        if self.cfg.engine.music_filter is not None:
            result = self._apply_music_filter(result, self._file_reader(path))
        return result

    def _file_reader(self, path: str):
        """Context reader for the music post-filter: [s, e) seconds of the
        file as internal-rate mono (None on decode failure -> region kept)."""
        from ..io.audio import load_audio_startstop

        def read_ctx(s: float, e: float):
            audio, _sr = load_audio_startstop(
                path, (s, e), target_sr=self.cfg.dsp.sample_rate)
            return audio

        return read_ctx

    def _apply_music_filter(self, result: DetectionResult, read_ctx) -> DetectionResult:
        """Drop regions whose context scores music-like (engine/postfilter).

        Opt-in via cfg.engine.music_filter; fails open (unreadable or
        too-short context keeps the region).  The averaged grid is left
        untouched — only the interval list is filtered.
        """
        from . import postfilter

        kept, scores = postfilter.filter_intervals(
            result.intervals, read_ctx, self.cfg.dsp.sample_rate,
            result.audio_seconds, float(self.cfg.engine.music_filter),
        )
        if len(kept) != len(result.intervals):
            log.info(
                "music filter dropped %d/%d region(s) (threshold %.2f)",
                len(result.intervals) - len(kept), len(result.intervals),
                float(self.cfg.engine.music_filter),
            )
        return dataclasses.replace(result, intervals=kept)

    def detect_file_streaming(
        self, path: str, progress: Optional[Callable[[float], None]] = None,
        journal_dir: Optional[str] = None, timers=None,
    ) -> DetectionResult:
        """Bounded-memory decode for multi-hour recordings.

        Dispatches to the fused device pipeline when
        cfg.engine.pipeline is "fused" (or "auto" on TPU); the host pipeline
        below keeps exact reference-pad numerics.

        A rolling decode buffer follows the (monotonically advancing) chunk
        requests; only the inter-chunk window halo is retained between
        requests, so peak host memory is ~one chunk regardless of file size.
        """
        from ..io import internal_length, stream_chunks

        cfg = self.cfg
        pipeline = cfg.engine.pipeline
        if pipeline == "auto":
            pipeline = "fused" if jax.default_backend() == "tpu" else "host"
        if pipeline == "fused":
            return self.detect_file_fused(path, progress, journal_dir,
                                          timers=timers)
        if journal_dir:
            # chunk-granular resume lives in the fused pipeline's grid
            # bookkeeping; say so instead of silently restarting from zero
            logging.getLogger(__name__).warning(
                "chunk checkpointing requires the fused pipeline "
                "(engine.pipeline='fused'); host pipeline run of %s will "
                "not journal chunk progress", path)

        pad = cfg.pad_samples
        total = internal_length(path, cfg.dsp.sample_rate)
        padded_len = total + 2 * pad

        backend = cfg.engine.resample_backend
        if backend == "auto":
            backend = "device" if jax.default_backend() == "tpu" else "host"
        decode_iter = stream_chunks(
            path,
            chunk_samples=int(cfg.dsp.sample_rate * cfg.engine.chunk_seconds),
            target_sr=cfg.dsp.sample_rate,
            backend=backend,
        )
        state = {"buf": np.zeros(0, np.float32), "at": 0, "done": False}

        def fill(s0: int, s1: int, out: np.ndarray) -> None:
            a0, a1 = max(s0, pad) - pad, min(s1, pad + total) - pad  # audio coords
            if a1 <= a0:
                return
            # advance the rolling buffer
            drop = a0 - state["at"]
            if drop > 0:
                state["buf"] = state["buf"][drop:]
                state["at"] = a0
            while state["at"] + len(state["buf"]) < a1 and not state["done"]:
                try:
                    c = next(decode_iter)
                    state["buf"] = np.concatenate([state["buf"], c.data])
                    state["done"] = c.is_last
                except StopIteration:
                    state["done"] = True
            seg = state["buf"][a0 - state["at"] : a1 - state["at"]]
            out[a0 + pad - s0 : a0 + pad - s0 + len(seg)] = seg

        logits = self._logits_from_segments(padded_len, fill, progress)
        result = self._finalize(logits, total / cfg.dsp.sample_rate)
        if cfg.engine.music_filter is not None:
            result = self._apply_music_filter(result, self._file_reader(path))
        return result
