"""Train state: parameters + optimizer + step counter as one pytree.

Mirrors what the reference's torch.save dict carries — {epoch, model state,
optimizer state, best metric} (SURVEY.md §3.3 "Checkpointing") — as a
flax.struct pytree that shards/replicates cleanly and checkpoints via Orbax.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from captionkit.utils.config import TrainConfig


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # [] int32
    rng: jax.Array  # PRNG key threaded into dropout / sampling

    def next_rng(self) -> jax.Array:
        """Per-step rng derived from (rng, step) — resume-stable."""
        return jax.random.fold_in(self.rng, self.step)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with reference-style element-value gradient clipping.

    The reference's clip_gradient clamps each gradient element to
    [-grad_clip, grad_clip] (tutorial-family, SURVEY.md §3.3 ⟦cite⟧) —
    optax.clip is the exact equivalent (not clip_by_global_norm).
    """
    txs = []
    if cfg.grad_clip > 0:
        txs.append(optax.clip(cfg.grad_clip))
    if cfg.optimizer == "adam":
        txs.append(optax.adam(cfg.learning_rate))
    elif cfg.optimizer == "adamw":
        txs.append(optax.adamw(cfg.learning_rate))
    elif cfg.optimizer == "sgd":
        txs.append(optax.sgd(cfg.learning_rate))
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return optax.chain(*txs)


def create_train_state(
    init_params_fn: Callable[[jax.Array], Any],
    cfg: TrainConfig,
    *,
    seed: int | None = None,
) -> TrainState:
    seed = cfg.seed if seed is None else seed
    k_params, k_train = jax.random.split(jax.random.PRNGKey(seed))
    params = init_params_fn(k_params)
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
        rng=k_train,
    )
