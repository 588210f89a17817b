"""Train state: parameters + optimizer + step counter as one pytree.

Mirrors what the reference's torch.save dict carries — {epoch, model state,
optimizer state, best metric} (SURVEY.md §3.3 "Checkpointing") — as a
flax.struct pytree that shards/replicates cleanly and checkpoints via Orbax.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

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


class EmaState(NamedTuple):
    """Polyak-averaged parameters, carried inside the optimizer state so
    TrainState's structure (and therefore every Orbax checkpoint and
    preemption path) is unchanged when EMA is off, and EMA weights
    checkpoint/resume for free when it is on."""

    ema: Any


def ema_weights(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the POST-update parameters.

    Placed LAST in the optimizer chain: the `updates` it receives are the
    final deltas, so `params + updates` is exactly the parameter vector
    the step will publish, and the transform itself passes updates
    through untouched (it never alters the optimization trajectory —
    unlike optax.ema, which smooths the updates themselves). ema_0 is a
    copy of the initial params (the captioning-community convention;
    no bias correction)."""

    def init(params):
        # A real COPY, not jnp.asarray: asarray is a no-op on committed
        # arrays, so EmaState.ema would ALIAS the param buffers at step 0
        # — and the first donate_state=True train dispatch then donates
        # the same buffer under two arguments, which the TPU backend
        # rejects with an opaque INVALID_ARGUMENT (chip-bisected, round-4
        # session 9; CPU tolerates the aliasing, which is why tests alone
        # never caught it).
        return EmaState(ema=jax.tree.map(lambda x: jnp.array(x, copy=True),
                                         params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("ema_weights needs params (use with chain "
                             "and pass params to update)")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params,
        )
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def ema_params(state: TrainState) -> Any | None:
    """The EMA parameter pytree carried in state.opt_state, or None when
    training runs without EMA (TrainConfig.ema_decay == 0)."""
    for element in jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda x: isinstance(x, EmaState)
    ):
        if isinstance(element, EmaState):
            return element.ema
    return None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with reference-style element-value gradient clipping.

    The reference's clip_gradient clamps each gradient element to
    [-grad_clip, grad_clip] (tutorial-family, SURVEY.md §3.3 ⟦cite⟧) —
    optax.clip is the exact equivalent (not clip_by_global_norm).

    With cfg.ema_decay > 0, an ema_weights() tail additionally tracks
    Polyak-averaged parameters (validation decodes and `--export-ema`
    use them; the training trajectory itself is untouched).
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
    ema_decay = getattr(cfg, "ema_decay", 0.0)
    # Validate BEFORE the enable gate: a negative decay (sign typo) must
    # raise like 1.5 does, not silently disable EMA.
    if ema_decay != 0.0 and not (0.0 < ema_decay < 1.0):
        raise ValueError(
            f"train.ema_decay must be 0 (off) or in (0, 1), got {ema_decay}"
        )
    if ema_decay > 0.0:
        txs.append(ema_weights(ema_decay))
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
