"""Where does e2e wall time go?  Per-phase breakdown of the fused pipeline.

Measures the same WAV→intervals run bench.py times, but with StageTimers
threaded into FusedStreamingEngine.run:

- host_fill    — disk read + staging copy (read-ahead thread)
- device_put   — host→device upload of the chunk PCM (read-ahead thread)
- wait_prepare — main thread blocked on the read-ahead future
- dispatch     — main thread issuing the chunk program (async)
- final_fetch  — batched download of all score grids + compute drain

host_fill+device_put overlap the device compute of the previous chunk;
wait_prepare+dispatch+final_fetch are the true serial path.  If
wait_prepare ≈ device_put the pipeline is upload-bound; if final_fetch
dominates, compute (or the download link) is the bound.

Usage: python scripts/profile_e2e.py [--seconds 1800] [--repeats 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS (e.g. =cpu for smoke runs): the sitecustomize-
# registered axon plugin ignores the env var, so pin via jax.config
# (same handling as cli.py/bench.py).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=1800.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk-seconds", type=float, default=150.0)
    ap.add_argument("--codec", default="auto",
                    choices=["auto", "pcm16", "mulaw8", "adpcm4"])
    args = ap.parse_args()

    from bench import make_recording
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.engine.fused import get_fused_engine
    from softspoken_tpu.io import wavio
    from softspoken_tpu.runtime.metrics import StageTimers

    cfg = Config().with_engine(device_batch=args.batch,
                               chunk_seconds=args.chunk_seconds,
                               upload_codec=args.codec)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))

    tmp = "/tmp/softspoken_bench"
    os.makedirs(tmp, exist_ok=True)
    path = os.path.join(tmp, f"bench_{int(args.seconds)}s.wav")
    if not os.path.exists(path):
        make_recording(path, args.seconds)
    from softspoken_tpu.engine.fused import _i16_kind

    inf = wavio.info(path)
    kind = _i16_kind(det)
    print(f"wire kind: {kind}", flush=True)
    engine = get_fused_engine(det, inf.samplerate, kind)

    reader = wavio.RawReader(path)

    def read_native(start, frames):
        reader.will_need(start + frames, frames)
        return reader.read_raw(start, frames).view("<i2")

    # warm: compile + server-side program load
    engine.run(read_native, inf.frames)

    for r in range(args.repeats):
        timers = StageTimers()
        t0 = time.perf_counter()
        res = engine.run(read_native, inf.frames, timers=timers)
        wall = time.perf_counter() - t0
        rate = res.audio_seconds / wall
        tot = timers.totals
        acct = sum(tot.get(k, 0.0) for k in
                   ("wait_prepare", "dispatch", "final_fetch"))
        print(f"run {r}: wall={wall:.3f}s rate={rate:.0f}x  "
              f"main-thread accounted={acct:.3f}s "
              f"unaccounted={wall - acct:.3f}s", flush=True)
        for k in ("host_fill", "device_put", "wait_prepare", "dispatch",
                  "final_fetch"):
            n = timers.counts.get(k, 0)
            v = tot.get(k, 0.0)
            print(f"    {k:13s} {v * 1e3:9.1f} ms  n={n:3d}  "
                  f"{v / max(n, 1) * 1e3:7.1f} ms/call", flush=True)
    reader.close()


if __name__ == "__main__":
    main()
