"""Train-step throughput on the real chip.

Measures the fused on-device training program (train/device_data.py::
make_fused_train_step — synthesize → forward → backward → update, n_inner
steps per device call) the way bench.py measures inference: clips/s,
s/step, and an MFU figure using the standard 3× forward-FLOPs
approximation for fwd+bwd (the on-device batch synthesis and optimizer
update are extra unmodeled work, so the reported MFU is conservative).

The reference has no trainer at all (its training code is latent and was
run offline — SURVEY.md §2.1 "Training augmentation suite"); this records
that the from-scratch TPU trainer is itself fast enough to retrain the
model in minutes, not hours.

Usage: python scripts/bench_train.py [--outer 8] [--batch 32] [--n-inner 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outer", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-inner", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--pool", type=int, default=96,
                    help="clips per pool (small: upload, not realism)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from softspoken_tpu.runtime.metrics import analytic_flops_per_window
    from softspoken_tpu.train import synth
    from softspoken_tpu.train.device_data import (
        make_fused_train_step, make_synth_batch_fn,
    )
    from softspoken_tpu.train.fit import create_train_state

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    sp, nz = synth.make_pools(rng, args.pool, args.pool)
    t_pool = time.perf_counter() - t0
    speech_pool, noise_pool = jax.device_put(sp), jax.device_put(nz)

    import jax.numpy as jnp

    model, state, tx = create_train_state(
        jax.random.PRNGKey(0), 1e-3, compute_dtype=jnp.dtype(args.dtype))
    synth_fn = make_synth_batch_fn(
        args.batch, ("add_reverb", "reduce_volume", "bandpass_filter"))
    step_fn = make_fused_train_step(model, tx, synth_fn, n_inner=args.n_inner)

    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    state, m = step_fn(state, speech_pool, noise_pool, sub)  # compile
    jax.device_get(m["loss"])

    t0 = time.perf_counter()
    for _ in range(args.outer):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, speech_pool, noise_pool, sub)
    loss = float(jax.device_get(m["loss"]))  # forces the whole chain
    wall = time.perf_counter() - t0

    steps = args.outer * args.n_inner
    clips = steps * args.batch
    fwd = analytic_flops_per_window()      # per window == per training clip
    train_flops = 3.0 * fwd * clips        # fwd + ~2x for bwd
    peak = 197e12
    print({
        "steps": steps, "batch": args.batch,
        "s_per_step": round(wall / steps, 4),
        "clips_per_s": round(clips / wall, 1),
        "train_mfu": round(train_flops / wall / peak, 4),
        "audio_s_per_s": round(clips * 3.0 / wall, 1),
        "loss": round(loss, 4),
        "dtype": args.dtype,
        "pool_gen_s": round(t_pool, 1),
    })


if __name__ == "__main__":
    main()
