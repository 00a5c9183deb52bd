"""Training: loss, optimizer state, and the (shardable) train step.

The reference ships no training loop — only latent training *data* code
(augmentations, targets; ``voice_activity.py:256-943``).  The loss here is
our documented choice matching the two heads' semantics
(pytorch_neural_nets.py:126-140):

  * mask head emits raw per-frame logits  → sigmoid BCE against the 0/1
    frame mask (``train.targets.frame_mask``)
  * spec head emits ReLU'd separation masks → MSE against the
    speech/environment magnitude targets

The train step is pure jit; under a ``Mesh`` the caller shards the batch
over ``data`` and (optionally) the mel time axis over ``seq`` — XLA/GSPMD
then inserts the BN-stat psums and conv halo exchanges (parallel.mesh).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import SpecUNet2D


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    rng: jax.Array,
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    resume: Optional[str] = None,
    compute_dtype: Any = jnp.float32,
) -> Tuple[SpecUNet2D, TrainState, optax.GradientTransformation]:
    """Fresh model+optimizer; ``resume`` warm-starts params/batch_stats (and
    the step counter) from an orbax checkpoint so training can continue from
    the committed checkpoint instead of from scratch. Optimizer moments
    restart fresh — adamw re-warms within a few hundred steps.

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in mixed
    precision (params, grads, optimizer state stay f32 — flax casts per
    call).  Default stays f32: the committed checkpoint's training lineage
    is f32, and the measured speedup (scripts/bench_train.py --dtype
    bfloat16) is a throughput option, not a numerics recommendation."""
    model = SpecUNet2D(compute_dtype=compute_dtype)
    variables = model.init(rng, jnp.zeros((1, 128, 256, 1), jnp.float32))
    step0 = 0
    if resume:
        from .. import ckpt as ckpt_mod

        # load_any, not load: it recovers a save() interrupted mid-swap
        # (stranded <ckpt>.old) and accepts a converted .pth — both are
        # exactly the resume-after-crash scenarios (review r3 batch 6)
        variables, epoch = ckpt_mod.load_any(resume)
        if variables is None:
            raise FileNotFoundError(f"resume checkpoint not found: {resume}")
        step0 = max(0, int(epoch or 0))  # epoch=-1 sentinel (converted .pth)
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.asarray(step0, jnp.int32),
    )
    return model, state, tx


def boundary_weights(mask: jnp.ndarray, boundary_weight: float,
                     halo: int = 4) -> jnp.ndarray:
    """Per-frame loss weights emphasizing speech onsets/offsets.

    ``mask`` (B, T) in {0,1} → weights (B, T): 1 everywhere, plus
    ``boundary_weight`` within ``halo`` frames (~47 ms at dt = 3/256 s for
    halo=4) of any 0↔1 transition.  Event-level F1 lags frame F1 because
    boundaries fragment (VERDICT r3 #3); this concentrates gradient on the
    frames that decide where an interval starts and ends.  Weights are
    mean-normalized so the loss scale (and the learned threshold landscape)
    is unchanged — only the emphasis moves.
    """
    trans = jnp.abs(jnp.diff(mask, axis=-1)) > 0.5  # (B, T-1)
    trans = jnp.concatenate(
        [trans, jnp.zeros_like(trans[..., :1])], axis=-1).astype(jnp.float32)
    # dilate the transition indicator by ±halo with a max-pool
    near = trans
    for _ in range(halo):
        shifted_l = jnp.concatenate(
            [near[..., 1:], jnp.zeros_like(near[..., :1])], axis=-1)
        shifted_r = jnp.concatenate(
            [jnp.zeros_like(near[..., :1]), near[..., :-1]], axis=-1)
        near = jnp.maximum(near, jnp.maximum(shifted_l, shifted_r))
    w = 1.0 + boundary_weight * near
    return w / jnp.mean(w, axis=-1, keepdims=True)


def loss_fn(
    model: SpecUNet2D,
    params,
    batch_stats,
    batch: Dict[str, jnp.ndarray],
    dropout_rng: jax.Array,
    boundary_weight: float = 0.0,
):
    """batch: mel (B,128,256,1), mask (B,256) in {0,1},
    spec (B,128,256,2) targets."""
    (spec_out, mask_logits), updates = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["mel"],
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": dropout_rng},
    )
    bce = optax.sigmoid_binary_cross_entropy(mask_logits, batch["mask"])
    if boundary_weight > 0.0:
        bce = bce * boundary_weights(batch["mask"], boundary_weight)
    mask_loss = bce.mean()
    spec_loss = jnp.mean((spec_out - batch["spec"]) ** 2)
    loss = mask_loss + spec_loss
    metrics = {"loss": loss, "mask_loss": mask_loss, "spec_loss": spec_loss}
    return loss, (updates["batch_stats"], metrics)


def make_train_step(model: SpecUNet2D, tx: optax.GradientTransformation,
                    boundary_weight: float = 0.0):
    """Returns jit-able ``step(state, batch, rng) -> (state, metrics)``."""

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(model, p, state.batch_stats, batch, dropout_rng,
                              boundary_weight),
            has_aux=True,
        )
        (_, (new_stats, metrics)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            metrics,
        )

    return train_step


def batch_partition_specs(mesh, shard_time: bool = True):
    """PartitionSpec per training-batch key: dp over batch, optional sp over
    the mel time axis.  The SINGLE source of truth for the batch layout —
    shared by the host sharded trainer below and the fused synthetic
    trainer (device_data.make_sharded_fused_train_step), so the two cannot
    silently shard differently (review r3 finding)."""
    from jax.sharding import PartitionSpec as P

    seq = "seq" if (shard_time and "seq" in mesh.axis_names) else None
    return {
        "mel": P("data", None, seq, None),
        "mask": P("data", None),
        "spec": P("data", None, seq, None),
    }


def make_sharded_train_step(model, tx, mesh, shard_time: bool = True,
                            boundary_weight: float = 0.0):
    """Train step jitted with dp (batch) × sp (mel time) shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = {
        k: NamedSharding(mesh, s)
        for k, s in batch_partition_specs(mesh, shard_time).items()
    }
    repl = NamedSharding(mesh, P())
    step = jax.jit(
        make_train_step(model, tx, boundary_weight),
        in_shardings=(None, batch_sharding, repl),
        donate_argnums=(0,),
    )
    return step, batch_sharding


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)
