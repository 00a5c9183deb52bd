"""Typed configuration for the Softspoken-TPU pipeline.

The reference keeps all knobs in a flat constants module
(``root/code/backend/settings.py:1-33``).  Here the same constants become a
frozen dataclass so they can be overridden per run (file / CLI / env) while the
defaults remain the byte-for-byte parity preset.

Reference constant map (file:line → field):
  settings.py:4-6    n_fft=512, win_length=512, hop_length=256
  settings.py:9      step_size=0.6 (window stride, seconds)
  settings.py:12     prediction_batch_size=32
  settings.py:13     threshold=0.1 (raw-logit score threshold)
  settings.py:16     vad_resample=22050 (internal sample rate)
  settings.py:19-20  model_dir / model_name
  settings.py:23     project_dir
  settings.py:26     minimum_detection_len=0.1
  settings.py:32     cpu_threads = os.cpu_count()//2
  pytorch_neural_nets.py:92-99  mel frontend: n_fft*4=2048, n_mels=128, f_max=8000
  worker.py:59-62    pad_seconds=3 (zero padding both sides)
  worker.py:97       break_duration=0.5 (region merge gap)
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class DspConfig:
    """Spectrogram frontend constants (parity-critical, SURVEY.md §2.2)."""

    sample_rate: int = 22050          # settings.py:16
    n_fft: int = 2048                 # pytorch_neural_nets.py:94 (settings.n_fft*4)
    win_length: int = 512             # settings.py:5
    hop_length: int = 256             # settings.py:6
    n_mels: int = 128                 # pytorch_neural_nets.py:87
    f_min: float = 0.0                # torchaudio default
    f_max: float = 8000.0             # pytorch_neural_nets.py:98
    # torchaudio MelSpectrogram defaults baked into the reference model:
    # power=2.0, HTK mel scale, norm=None, center=True, pad_mode="reflect",
    # periodic Hann window zero-padded 512→2048.
    frames_per_window: int = 256      # pytorch_neural_nets.py:150 (259→256 trim)

    # Display STFT (review screen) — voice_activity.py:148-154
    display_n_fft: int = 512


@dataclass(frozen=True)
class EngineConfig:
    """Sliding-window inference constants (NNDetector.py:55-190)."""

    window_seconds: float = 3.0       # NNDetector.py:68
    step_seconds: float = 0.6         # settings.py:9
    pad_seconds: float = 3.0          # worker.py:59
    batch_size: int = 32              # settings.py:12
    threshold: float = 0.1            # settings.py:13
    break_duration: float = 0.5       # worker.py:97
    # Hysteresis (dual-threshold) regionization — NOT reference behavior,
    # None by default.  When set below `threshold`, a region still needs a
    # bin above `threshold` to exist, but extends over contiguous bins
    # above `exit_threshold` (engine/regions.py::find_speech_regions).
    # The averaged logits ramp over ~a window length at speech edges, so
    # the single parity threshold clips onset/offset tails; an exit level
    # recovers them without admitting seed-free false regions.  Selected
    # value gated on the quality grid (docs/QUALITY_r03.json) before use.
    exit_threshold: Optional[float] = None
    # Music post-filter (engine/postfilter.py) — NOT reference behavior,
    # None by default.  When set, each detected region's surrounding audio
    # (>= 4 s context) is scored for rhythmicity and regions scoring
    # >= this threshold are dropped.  Targets the measured real-audio
    # false-positive class (house music: 25 false events/min at the parity
    # point, docs/QUALITY_r03_realaudio.json) after three fine-tune
    # attempts were measured and rejected.  Recommended value when
    # enabling: postfilter.DEFAULT_THRESHOLD (0.85), gated on the quality
    # grid + real-audio probe before adoption.
    music_filter: Optional[float] = None
    # Grid median smoothing (engine/regions.py::smooth_grid) — NOT
    # reference behavior, 0 (off) by default.  Odd bin count (3/5/7 ≈
    # 35/59/82 ms at dt = 3/256 s) of a centered running median applied to
    # the averaged grid before thresholding; removes the single-bin
    # threshold flicker that fragments events at region boundaries.
    # Selected width gated on the quality grid (docs/QUALITY_r04.json)
    # before use.
    grid_smooth: int = 0
    minimum_detection_len: float = 0.1  # settings.py:26
    min_count: int = 1                # NNDetector.py:153 (min windows per grid bin)

    # TPU execution knobs (no reference counterpart):
    # "parity"  -> float32 activations, highest matmul precision
    # "fast"    -> bfloat16 activations on the conv path, float32 accumulation
    precision: str = "fast"
    # Windows dispatched to the device per jit call. The reference uses 32
    # (CPU); on TPU larger batches keep the MXU fed.
    device_batch: int = 128
    # Streaming chunk length, seconds of audio per device dispatch for long
    # recordings (overlap-save; boundaries are window-aligned so chunking
    # never changes results — SURVEY.md §5 "long-context").  150 s measured
    # fastest on the remote v5e: smaller chunks overlap host→device PCM
    # upload with compute better (919–1043× vs 747–884× at 600 s), while
    # chunks <100 s start paying per-dispatch latency.
    chunk_seconds: float = 150.0
    # Skip files whose detections already exist (fixes reference resume quirk
    # SURVEY.md §2.3; set False for strict reference behavior).
    skip_processed_files: bool = True
    # Chunk-granular resume (SURVEY.md §5 failure/recovery): persist fused-
    # pipeline chunk progress every N chunks so a killed multi-hour detection
    # resumes mid-file instead of from zero.  0 disables journaling; the
    # checkpoint itself costs one grid+carry download per N chunks.
    chunk_checkpoint_every: int = 0
    # Files detected concurrently by DetectRunner (1 = the reference's
    # strictly sequential behavior).  With >1, detections for K files run
    # on worker threads while results persist strictly in submission order
    # (CSV row order identical to sequential).  Why it helps on the remote
    # chip: each chunk's upload serializes with its own dependent compute
    # over the tunnel (docs/PROFILE_r03.md session-4), but ANOTHER file's
    # independent transfers interleave into those gaps — measured +6–13%
    # aggregate throughput with 2 concurrent 1800 s files on v5e.  Costs
    # K× host staging/decode memory; per-file progress callbacks
    # interleave across files.
    file_concurrency: int = 1
    # Fused-pipeline read-ahead depth: chunks prepared (host fill + async
    # host→device upload) ahead of the one the device is computing.  At
    # depth 1 the main thread serializes on each chunk's host fill
    # (~40 ms/chunk measured) and the tunnel idles between uploads; depth 4
    # keeps the wire busy end-to-end at ~3×29 MB extra staging + HBM.
    readahead_chunks: int = 4
    # Transport codec for the fused pipeline's PCM upload (ops/mulaw.py,
    # ops/adpcm.py):
    #   "pcm16"  — exact int16 samples (or f32 for non-16-bit sources)
    #   "mulaw8" — 8-bit mu-law compander: half the wire bytes on a
    #              link-bound path; round-trip error ≤ 0.022 full-scale
    #              (worst case at clipping; ops/mulaw.py MAX_ABS_ERROR).
    #              Quality-gated by the degradation grid's mulaw condition
    #              (frame F1 above clean in BOTH generators,
    #              docs/QUALITY_r03.json) and the codec gate run.
    #   "adpcm4" — 4-bit IMA ADPCM: ~0.52 bytes/sample, half the mu-law
    #              wire again on the link-bound path.  Predictive residual
    #              coding, NOT the rejected block-float bfp4 (which
    #              fragmented event boundaries — docs/BFP4_GATE.json);
    #              gated by scripts/codec_gate.py before any default flip.
    # "auto" = mulaw8 on TPU when precision != "parity" and the source is
    # 16-bit PCM; exact pcm16 everywhere else (parity mode never lossy).
    upload_codec: str = "auto"
    # Host decimation of the wire stream (io/decimate.py): when the native
    # rate is an integer multiple M of >= 2*dsp.f_max, ship the stream
    # decimated by M (32 kHz -> 16 kHz halves the bytes again on the
    # link-bound path).  The model cannot see above f_max — the mel
    # filterbank tops out there and the 22050 Hz device resample lowpasses
    # at 11.025 kHz — so only a narrow transition band straddling f_max is
    # at stake; quality-gated on the degradation grid like the compander
    # (docs/QUALITY_r03.json wire_decimate gate).  "auto" = engage exactly
    # when the lossy mu-law wire is on (never in parity mode / exact
    # wires); "off" disables.
    wire_decimate: str = "auto"
    # Streaming-decode resampler for the host pipeline: "host" (scipy/C++
    # polyphase), "device" (fixed-shape jitted matmul), or "auto" (device
    # iff running on TPU).
    resample_backend: str = "host"
    # Mel frontend kernel:
    #   "fused"  — Pallas framing+DFT+mel kernel (ops.pallas_frame_mel):
    #              windows stream straight from the chunk buffer, never
    #              materializing the (B, 66150) window matrix in HBM.
    #              Measured per 256-window frontend on v5e: 5.0 ms (bf16x3)
    #              / 6.8 ms (f32) vs the XLA chain's 7.3 / 9.6 ms.
    #   "xla"    — two-matmul XLA path (ops.mel)
    #   "pallas" — the r2 DFT→mel-only kernel (ops.pallas_mel), kept as a
    #              baseline experiment
    # "auto" = fused on TPU, xla elsewhere.
    mel_kernel: str = "auto"
    # Mel matmul precision: "highest" (6-pass bf16 ≈ f32, the r2 default),
    # "high" (3-pass, ~21-bit mantissa), "default" (1-pass bf16).  The DFT
    # matmul is ~12% of device step time at "highest" (docs/PROFILE_r03.md);
    # 1-pass bf16 lifts device-only throughput ~6% over "high" (5,919 vs
    # 5,590 audio-s/s at B=128/600 s).  Each step down was gated on the
    # trained checkpoint over the full 24-condition quality grid on
    # hardware: high vs highest scored within ±0.002 F1 with intervals
    # exactly equal; default vs high within 0.0016 frame / 0.0095 event F1
    # (sign-symmetric, worst-case condition unchanged, intervals identical
    # on 82/96 files — docs/QUALITY_r03.json mel_default_gate).
    # "auto" = "highest" when precision == "parity" (strict reference
    # numerics), else "default".
    mel_precision: str = "auto"
    # Decoder upsample+concat strategy: "concat" materializes
    # concat([skip, up2(x)]) like the reference; "phase" computes the same
    # convolution via the phase decomposition (models.unet._phase_merge_kernel)
    # — upsampled activations never hit HBM and the low-res half runs with
    # full MXU lanes.  Exact in f64; in bf16 it changes only tap-merge
    # rounding.  Measured on v5e IN CONTEXT the phase path is ~3% slower
    # (4,458 vs 4,616 audio-s/s at 150 s chunks): XLA already folds the
    # nearest-upsample broadcast into the conv's input read, while the phase
    # interleave is a real high-res shuffle — so "auto" = "concat".  Kept as
    # an option because the trade flips if a future step size or kernel
    # changes the fusion structure.
    decoder_upsample: str = "auto"
    # 3×3 conv implementation for the 32/64-channel U-Net levels:
    # "direct" = plain XLA convs; "packed" = column-packed rewrite
    # (models.unet.packed_conv3x3): T=4/2 adjacent output columns stack on
    # the lane axis via one strided conv — (T+2)/3 × the MACs for T × the
    # lanes.  MEASURED NEGATIVE RESULT on v5e: the hypothesis was that the
    # hot 32-channel convs cap at C'/128 = 25% MXU lane occupancy, but
    # packing does not beat XLA's direct conv either standalone (both ~15%
    # MFU isolated, identical times) or in-context (device-only 5,541 vs
    # 5,939 audio-s/s at B=128/600 s) — XLA's conv emitter is not
    # lane-bound on these shapes, so paying (T+2)/3 more MACs only adds
    # work.  Kept as an option + exactness tests (test_model.py) because
    # the trade could flip on other TPU generations.  "auto" = "direct".
    conv_impl: str = "auto"
    # Streaming pipeline: "fused" runs decode→resample→mel→U-Net→grid in one
    # device program (raw PCM up, score grid down — the TPU-native path);
    # "host" resamples host-side with exact reference-pad numerics;
    # "auto" picks fused on TPU, host elsewhere.
    pipeline: str = "auto"
    # Unroll factor for the chunk program's lax.scan over device batches
    # (engine/detector.py::_forward_chunk and the fused program).  The scan
    # lowers to an XLA while loop; unrolling lets the scheduler overlap
    # iterations at the cost of program size.  Measured on v5e at
    # B=128/600 s (scripts/sweep_device.py, repeats=6×2): 5,788 audio-s/s
    # at 1 vs 5,816 / 5,849 / 5,828 at 2/4/8 — ~+1% at 4, near the
    # run-to-run spread, so the default stays 1; kept as a knob because
    # the trade shifts with batch/chunk shape.
    scan_unroll: int = 1


@dataclass(frozen=True)
class PathsConfig:
    model_dir: str = os.path.join(".", "root", "models", "spec_unet_2d")
    model_name: str = "model_checkpoint"        # orbax dir or .pth file stem
    project_dir: str = os.path.join(".", "projects")
    user_guide_url: str = "https://github.com/AVianEco/Softspoken"


@dataclass(frozen=True)
class Config:
    dsp: DspConfig = field(default_factory=DspConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    cpu_threads: int = field(default_factory=lambda: max(1, (os.cpu_count() or 2) // 2))

    # ----- derived quantities (SURVEY.md §2.2) -----
    @property
    def samples_per_window(self) -> int:
        # 3 s * 22050 Hz = 66150 (NNDetector.py:74)
        return int(self.dsp.sample_rate * self.engine.window_seconds)

    @property
    def samples_per_step(self) -> int:
        # floor(22050 * 0.6) = 13230 (NNDetector.py:75)
        return math.floor(self.dsp.sample_rate * self.engine.step_seconds)

    @property
    def pad_samples(self) -> int:
        return int(self.dsp.sample_rate * self.engine.pad_seconds)

    @property
    def time_resolution(self) -> float:
        # 3 s / 256 bins = 11.71875 ms (NNDetector.py:172)
        return self.engine.window_seconds / self.dsp.frames_per_window

    # ----- overrides -----
    def replace(self, **sections: Any) -> "Config":
        return dataclasses.replace(self, **sections)

    def with_engine(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, engine=dataclasses.replace(self.engine, **kw))

    def with_dsp(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, dsp=dataclasses.replace(self.dsp, **kw))

    def with_paths(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, paths=dataclasses.replace(self.paths, **kw))

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        cfg = Config()
        if "dsp" in d:
            cfg = cfg.with_dsp(**d["dsp"])
        if "engine" in d:
            cfg = cfg.with_engine(**d["engine"])
        if "paths" in d:
            cfg = cfg.with_paths(**d["paths"])
        if "cpu_threads" in d:
            cfg = dataclasses.replace(cfg, cpu_threads=d["cpu_threads"])
        return cfg

    @staticmethod
    def from_file(path: str) -> "Config":
        with open(path, "r") as f:
            return Config.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# The parity preset: exactly the reference's defaults plus strict numerics.
def parity_config() -> Config:
    return Config().with_engine(precision="parity", skip_processed_files=False)


DEFAULT_CONFIG = Config()
