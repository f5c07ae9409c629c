"""Train state, optimizer, and the pjit-sharded train/eval steps.

Replaces the reference's L0/L5 runtime (mmcv EpochBasedRunner + DDP,
SURVEY §2.5): one ``jax.sharding.Mesh(('data',))`` over all devices, batch
sharded on 'data', parameters replicated; XLA inserts the gradient
all-reduces that DDP/NCCL performed in the reference.  Loss average factors
are computed over the GLOBAL batch inside the jitted step, which matches the
reference's ``reduce_mean`` collectives (unibev_head.py:397-407) exactly.

Optimizer parity (config :380-390): AdamW lr 2e-4 wd 0.01, grad clip
global-norm 35, paramwise lr_mult 0.1 on both backbones, lr 0 on frozen
stages — implemented as a post-AdamW per-path update scaling.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from unibev_tpu.runtime.lr_schedule import cosine_with_linear_warmup


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    constants: Any
    rng: jax.Array


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def scale_updates_by_path(rules: Sequence[Tuple[str, float]]):
    """Post-optimizer update scaling by parameter path regex (first match wins)."""

    def mult_for(path: str) -> float:
        for pattern, mult in rules:
            if re.search(pattern, path):
                return mult
        return 1.0

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        flat = jax.tree_util.tree_map_with_path(
            lambda p, u: u * mult_for(_path_str(p)), updates)
        return flat, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(base_lr: float = 2e-4, weight_decay: float = 0.01,
                   total_steps: int = 100000, warmup_iters: int = 500,
                   warmup_ratio: float = 1.0 / 3, min_lr_ratio: float = 1e-3,
                   grad_clip: float = 35.0,
                   paramwise: Sequence[Tuple[str, float]] = (
                       (r"img_backbone/(conv1|bn1|layer1_)", 0.0),
                       (r"img_backbone", 0.1),
                       (r"pts_backbone", 0.1),
                   )):
    """AdamW + cosine schedule + grad clip + per-path lr_mult.

    The default rules mirror the reference: frozen_stages=1 freezes the stem
    and stage 1 of the image backbone (lr 0); both backbones get lr_mult 0.1.
    """
    schedule = cosine_with_linear_warmup(base_lr, total_steps, warmup_iters,
                                         warmup_ratio, min_lr_ratio)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(schedule),
        scale_updates_by_path(tuple(paramwise)),
    ), schedule


def create_train_state(variables: Dict[str, Any], tx, rng) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", FrozenDict()),
        constants=variables.get("constants", FrozenDict()),
        rng=rng)


def make_train_step(model, tx) -> Callable:
    """Build the jittable global-batch train step (model is a UniBEV module)."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng = jax.random.fold_in(state.rng, state.step)
        # Re-seed the step's stochastic streams (dropout/gridmask/modality)
        # onto the 'rbg' PRNG: threefry unrolls to hundreds of HLO ops PER
        # dropout site (~20k ops/step across the ~50 sites — measured as a
        # dominant slice of the train-step graph), while rbg is ONE
        # RngBitGenerator op.  One threefry draw below keeps the stream
        # deterministic in (seed, step).
        rng = jax.random.wrap_key_data(
            jax.random.bits(rng, (4,), jnp.uint32), impl="rbg")
        k_grid, k_mod, k_drop = jax.random.split(rng, 3)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats,
                         "constants": state.constants}
            preds, mutated = model.apply(
                variables, batch, train=True,
                rngs=dict(gridmask=k_grid, modality=k_mod, dropout=k_drop),
                mutable=["batch_stats"])
            losses = model.apply(variables, batch, preds,
                                 method=type(model).loss)
            total = sum(losses.values())
            return total, (losses, mutated.get("batch_stats", state.batch_stats))

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, batch_stats=new_stats)
        return new_state, metrics

    return train_step


def make_val_step(model) -> Callable:
    """Loss-only forward for the val workflow (reference config :417
    ``workflow = [('train', 1), ('val', 1)]`` — mmcv's runner.val() computes
    the losses on the val split in eval mode, no optimizer step)."""

    def val_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "constants": state.constants}
        preds = model.apply(variables, batch, train=False)
        losses = model.apply(variables, batch, preds,
                             method=type(model).loss)
        losses = dict(losses)
        losses["loss"] = sum(losses.values())
        return losses

    return val_step


def shard_batch_spec(mesh: jax.sharding.Mesh) -> Callable:
    """NamedSharding putting the leading (batch) axis on the 'data' mesh axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return spec_for


def make_sharded_train_step(model, tx, mesh: jax.sharding.Mesh):
    """jit the train step with batch sharded over 'data', state replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    train_step = make_train_step(model, tx)
    replicated = NamedSharding(mesh, P())
    step = jax.jit(
        train_step,
        in_shardings=(replicated, None),  # batch shardings applied by caller
        out_shardings=(replicated, replicated),
        donate_argnums=(0,))
    return step
