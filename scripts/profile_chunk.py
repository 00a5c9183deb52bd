"""Profile the fused chunk program: device op table → docs/PROFILE_r03.md.

VERDICT r2 weak #1: "no profiler-derived op breakdown is recorded anywhere —
optimization is currently unguided."  This captures a jax.profiler trace of
the fused chunk program (defaults follow bench.py's DEVICE-ONLY operating
point via the same BENCH_DEV_BATCH / BENCH_DEV_CHUNK_SECONDS env vars;
--batch/--chunk-seconds override), aggregates per-op device time from the
trace's event stream, and writes a markdown table of where the step goes.

Usage: python scripts/profile_chunk.py [--out docs/PROFILE_r03.md]
       [--repeats 4] [--batch N] [--chunk-seconds S]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Honor JAX_PLATFORMS (e.g. =cpu for smoke runs): the sitecustomize-
# registered axon plugin ignores the env var, so pin via jax.config
# (same handling as cli.py/bench.py).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)



def capture(batch: int, chunk_seconds: float, repeats: int, trace_dir: str):
    import jax
    import jax.numpy as jnp

    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector, regions as R
    from softspoken_tpu.engine.fused import CARRY, get_fused_engine

    cfg = Config().with_engine(device_batch=batch, chunk_seconds=chunk_seconds)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    eng = get_fused_engine(det, 32000, "i16")
    # the ONE arg layout, shared with device_only_rate (review r3 batch 13)
    args = eng.synthetic_chunk_args()
    cs = jnp.zeros((CARRY,), jnp.float32)
    cc = jnp.zeros((CARRY,), jnp.float32)
    variables = det.variables
    avg, _, cs, cc = eng._fn(variables, *args, cs, cc)
    jax.device_get(avg)  # warm: compile + server-side program load
    print("warm done", flush=True)

    t0 = time.perf_counter()
    for _ in range(repeats):
        avg, _, cs, cc = eng._fn(variables, *args, cs, cc)
    jax.device_get(avg)
    wall = time.perf_counter() - t0

    jax.profiler.start_trace(trace_dir)
    for _ in range(repeats):
        avg, _, cs, cc = eng._fn(variables, *args, cs, cc)
    jax.device_get(avg)
    jax.profiler.stop_trace()
    audio_sec = repeats * eng.chunk_w * cfg.engine.step_seconds
    return wall, audio_sec, eng


def aggregate(trace_dir: str, repeats: int):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    # The trace has parallel tracks per TPU core: "XLA Modules" (one event
    # per executable), "XLA Ops" (each HLO op, INCLUDING ops inside while
    # bodies), "Steps", host threads.  Summing every X event double-counts
    # (module parent + member ops) and leaves control-flow regions opaque —
    # restrict to the "XLA Ops" track(s) when present and fall back to the
    # old name-filter heuristic otherwise.
    tracks = {}  # (pid, tid) -> thread name
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tracks[(e.get("pid"), e.get("tid"))] = (
                e.get("args", {}).get("name", ""))
    op_tracks = {k for k, v in tracks.items() if "XLA Ops" in v}

    agg = collections.Counter()
    cnt = collections.Counter()
    provenance = {}
    host_markers = ("$", "PjitFunction", "np.asarray", "PythonRefManager",
                    "ArrayImpl", "jit_", "copy_to_host")
    for e in tr.get("traceEvents", []):
        n = e.get("name", "")
        if e.get("ph") != "X" or not n:
            continue
        if op_tracks:
            if (e.get("pid"), e.get("tid")) not in op_tracks:
                continue
        elif any(n.startswith(h) or h in n for h in host_markers):
            continue
        agg[n] += float(e.get("dur", 0.0))
        cnt[n] += 1
        args = e.get("args", {})
        lk = args.get("long_name") or args.get("tf_op") or ""
        if lk and n not in provenance:
            provenance[n] = str(lk)
    return agg, cnt, provenance


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/PROFILE_r03.md")
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("BENCH_DEV_BATCH", "128")))
    ap.add_argument("--chunk-seconds", type=float,
                    default=float(os.environ.get("BENCH_DEV_CHUNK_SECONDS",
                                                 "600")))
    ap.add_argument("--trace-dir", default="/tmp/chunk_trace")
    args = ap.parse_args()

    wall, audio_sec, eng = capture(
        args.batch, args.chunk_seconds, args.repeats, args.trace_dir)
    agg, cnt, provenance = aggregate(args.trace_dir, args.repeats)
    total_us = sum(agg.values())

    from softspoken_tpu.runtime.metrics import analytic_flops_per_window, mfu

    rate = audio_sec / wall
    lines = [
        "# Fused chunk program — device op profile (round 3)",
        "",
        f"Captured with `jax.profiler` over {args.repeats} chunk programs "
        f"(device_batch={args.batch}, chunk_seconds={args.chunk_seconds}, "
        "32 kHz int16 input, fixture weights; same shape bench.py times).",
        "",
        f"- un-traced wall for the same loop: **{wall:.3f} s** "
        f"→ {rate:,.0f} audio-sec/s, MFU {mfu(rate):.1%} "
        f"(analytic {analytic_flops_per_window()/1e9:.2f} GFLOP/window)",
        f"- summed device op time in trace: {total_us/1e3:.1f} ms "
        f"({total_us/1e3/args.repeats:.1f} ms/chunk)",
        "",
        "| device op | ms (all reps) | % | count | source |",
        "|---|---|---|---|---|",
    ]
    for n, v in agg.most_common(30):
        src = provenance.get(n, "")
        lines.append(f"| `{n[:70]}` | {v/1e3:.3f} | {100*v/total_us:.1f}% "
                     f"| {cnt[n]} | {src[:60]} |")
    out = "\n".join(lines) + "\n"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(out)
    print(out[:2000])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
