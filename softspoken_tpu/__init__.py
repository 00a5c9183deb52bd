"""softspoken_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
capabilities of AVianEco/Softspoken: detect human speech in long outdoor
ecological recordings, review the detections, export review labels to
Audacity/Kaleidoscope/Raven, and silence flagged intervals in the audio.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  config    — typed config; reference-parity defaults
  io        — native WAV codec, polyphase resampler, chunked streaming reads
  ops       — device kernels: fused mel frontend, overlap scatter-add, mute mask
  models    — SpecUNet_2D in Flax (+ BatchNorm folding for inference)
  ckpt      — torch .pth → JAX converter, orbax save/load, random-init fallback
  engine    — window planner, jitted sliding-window forward, regionizer
  parallel  — device-mesh sharding of windows/chunks/files (pjit/shard_map)
  project   — projects.json registry + detections/review CSV stores
  export    — Audacity / Kaleidoscope / Raven transforms (schema parity)
  silence   — interval → mute-mask application + WAV write-back
  train     — augmentation suite, targets, loss, sharded train step
  runtime   — progress/throughput instrumentation, worker pipeline
  ui        — headless review session + spectrogram rendering
"""

__version__ = "0.1.0"

from .config import Config, DEFAULT_CONFIG, parity_config

__all__ = ["Config", "DEFAULT_CONFIG", "parity_config", "__version__"]
