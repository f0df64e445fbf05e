"""Train state and optimizer.

One TrainState pytree (params, BatchNorm stats, optimizer state, step and
NaN-skip counters) + a runtime-LR optimizer: the jitted step receives the
learning rate as a scalar argument, so every schedule — including
val-driven plateau — reuses a single compiled program.

Optimizer semantics match the reference's torch configuration
(`src/train.py:183-211`): adam / adamw / sgd+momentum, with weight decay
coupled (adam/sgd) or decoupled (adamw), global-norm gradient clipping,
frozen-param masking (ref freeze logic `src/cnn_encoder.py:102-166`), and
per-component LR multipliers (ref `src/train_multimodal.py:422-454`).
Masks and multipliers are scalar pytree leaves so the state jits cleanly.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from multimodal_rare_disease_tpu.config import Config
from multimodal_rare_disease_tpu.train.freeze import lr_multipliers, trainable_mask


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    skipped_steps: jnp.ndarray  # NaN-guard counter (ref SmallDataTrainer :369-391)
    mask: Any        # 1.0 = trainable, 0.0 = frozen (scalar leaf per param)
    lr_mult: Any     # per-component LR multiplier (scalar leaf per param)

    grad_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    optimizer_kind: str = struct.field(pytree_node=False)
    weight_decay: float = struct.field(pytree_node=False)


def _make_grad_tx(cfg: Config) -> Tuple[optax.GradientTransformation, str]:
    t = cfg.training
    chain = []
    if t.gradient_clip_val and t.gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(t.gradient_clip_val))
    if t.optimizer in ("adam", "adamw"):
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif t.optimizer == "sgd":
        chain.append(optax.trace(decay=0.9, nesterov=False))
    else:
        raise ValueError(f"Unknown optimizer: {t.optimizer!r}")
    return optax.chain(*chain), t.optimizer


def create_train_state(cfg: Config, variables: dict) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    grad_tx, kind = _make_grad_tx(cfg)
    mask = jax.tree_util.tree_map(
        lambda m: jnp.asarray(1.0 if m else 0.0, jnp.float32),
        trainable_mask(cfg, params))
    mults = jax.tree_util.tree_map(
        lambda m: jnp.asarray(m, jnp.float32), lr_multipliers(cfg, params))
    opt_state = grad_tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        skipped_steps=jnp.zeros((), jnp.int32),
        mask=mask,
        lr_mult=mults,
        grad_tx=grad_tx,
        optimizer_kind=kind,
        weight_decay=cfg.training.weight_decay,
    )


def apply_gradients(
    state: TrainState,
    grads: Any,
    lr: jnp.ndarray,
    new_batch_stats: Optional[Any] = None,
    skip: Optional[jnp.ndarray] = None,
) -> TrainState:
    """One optimizer step; when `skip` is true (non-finite loss/grads) the
    whole update is suppressed and the skip counter increments."""
    wd = state.weight_decay

    if state.optimizer_kind in ("adam", "sgd") and wd > 0:
        # coupled L2: grad += wd * param (torch Adam/SGD semantics)
        grads = jax.tree_util.tree_map(
            lambda g, p, m: g + wd * p * m, grads, state.params, state.mask)

    updates, new_opt_state = state.grad_tx.update(grads, state.opt_state,
                                                  state.params)

    if state.optimizer_kind == "adamw" and wd > 0:
        # decoupled decay (torch AdamW), scaled by lr and multiplier below
        updates = jax.tree_util.tree_map(
            lambda u, p, m: u + wd * p * m, updates, state.params, state.mask)

    new_params = jax.tree_util.tree_map(
        lambda u, p, m, mult: p - lr * mult * m * u,
        updates, state.params, state.mask, state.lr_mult)

    bs = new_batch_stats if new_batch_stats is not None else state.batch_stats

    if skip is not None:
        keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda n, o: jnp.where(skip, o, n), new, old)
        new_params = keep(new_params, state.params)
        new_opt_state = keep(new_opt_state, state.opt_state)
        bs = keep(bs, state.batch_stats)
        skipped = state.skipped_steps + skip.astype(jnp.int32)
    else:
        skipped = state.skipped_steps

    return state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=bs,
        opt_state=new_opt_state,
        skipped_steps=skipped,
    )
