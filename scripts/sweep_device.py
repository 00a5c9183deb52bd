"""Sweep device-only throughput across engine operating points / options.

Measures ``FusedStreamingEngine.device_only_rate`` (all inputs device-
resident) for a grid of config variants, printing audio-sec/s and MFU for
each — the guided-optimization companion to scripts/profile_chunk.py.

Usage: python scripts/sweep_device.py [--repeats 8] [--variants a,b,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VARIANTS = {
    # name: engine-config overrides
    "base":        dict(device_batch=128, chunk_seconds=600.0),
    "phase":       dict(device_batch=128, chunk_seconds=600.0,
                        decoder_upsample="phase"),
    "b96":         dict(device_batch=96, chunk_seconds=600.0),
    "b160":        dict(device_batch=160, chunk_seconds=600.0),
    "b192":        dict(device_batch=192, chunk_seconds=600.0),
    "b256":        dict(device_batch=256, chunk_seconds=600.0),
    "c900":        dict(device_batch=128, chunk_seconds=900.0),
    "c1200":       dict(device_batch=128, chunk_seconds=1200.0),
    "b192c900":    dict(device_batch=192, chunk_seconds=900.0),
    "phase_b192":  dict(device_batch=192, chunk_seconds=600.0,
                        decoder_upsample="phase"),
    "unroll2":     dict(device_batch=128, chunk_seconds=600.0, scan_unroll=2),
    "unroll4":     dict(device_batch=128, chunk_seconds=600.0, scan_unroll=4),
    "unroll8":     dict(device_batch=128, chunk_seconds=600.0, scan_unroll=8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    # the shipped fast-mode wire is decimated 32k->16k (io/decimate.py), so
    # the device program resamples from 16 kHz; sweep that by default
    ap.add_argument("--wire-sr", type=int, default=16000)
    args = ap.parse_args()

    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.engine.fused import get_fused_engine
    from softspoken_tpu.runtime.metrics import mfu

    variables = ckpt.fixture_variables(seed=0)
    for name in args.variants.split(","):
        ov = VARIANTS[name]
        cfg = Config().with_engine(**ov)
        t0 = time.perf_counter()
        det = Detector(cfg, variables=variables)
        eng = get_fused_engine(det, args.wire_sr, "mulaw8")
        r = max(eng.device_only_rate(args.repeats),
                eng.device_only_rate(args.repeats))
        build = time.perf_counter() - t0
        print(f"{name:12s} {r:8.0f} audio-s/s  mfu={mfu(r):.4f}  "
              f"(total incl. compile {build:.0f}s)  {ov}", flush=True)


if __name__ == "__main__":
    main()
