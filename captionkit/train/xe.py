"""Cross-entropy (teacher-forcing) training step, data-parallel over the mesh.

Rebuilds the reference XE loop (SURVEY.md §4.1): teacher forcing through the
shared step protocol under lax.scan, masked CE over non-pad steps, Adam with
element-value grad clip. The step is one jitted function with explicit
shardings: batch arrays split on the 'data' axis, state replicated; XLA
inserts the gradient all-reduce over ICI (SURVEY.md §3.5 DP row).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from captionkit.models.base import ModelDef, teacher_forcing_logits
from captionkit.nn.masking import masked_cross_entropy, top5_accuracy
from captionkit.parallel.mesh import batch_sharding, replicated
from captionkit.train.state import TrainState, make_optimizer
from captionkit.utils.config import TrainConfig


def xe_loss(
    model: ModelDef,
    params: Any,
    features: jax.Array,  # [B, R, F]
    existing: jax.Array,  # [B, T_in]
    existing_len: jax.Array,  # [B]
    target: jax.Array,  # [B, T_out]  <start> w1 ... <end> <pad>...
    target_len: jax.Array,  # [B]
    valid: jax.Array,  # [B] bool — padding rows of the tail batch
    *,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    label_smoothing: float = 0.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Masked CE + top-5 accuracy on one batch."""
    ctx = model.encode(params, features, existing, existing_len)
    state0 = model.init_state(params, ctx)
    tokens_in = target[:, :-1]
    labels = target[:, 1:]
    logits = teacher_forcing_logits(
        model, params, ctx, state0, tokens_in, rng=rng, train=train
    )  # [B, T-1, V]
    steps = jnp.arange(labels.shape[1])[None, :]
    mask = steps < (target_len[:, None] - 1)  # predict w1..<end>
    mask = jnp.logical_and(mask, valid[:, None])
    loss = masked_cross_entropy(
        logits, labels, mask, label_smoothing=label_smoothing
    )
    acc = top5_accuracy(logits, labels, mask)
    return loss, {"loss": loss, "top5_acc": acc,
                  "tokens": jnp.sum(mask.astype(jnp.int32))}


def _xe_step_body(model: ModelDef, tx, label_smoothing: float):
    """The raw (unjitted) train-step body shared by the single-step and
    multi-step programs: (TrainState, batch) -> (TrainState, metrics)."""

    def step_fn(state: TrainState, batch: dict[str, jax.Array]):
        rng = state.next_rng()

        def loss_fn(p):
            return xe_loss(
                model, p,
                batch["features"], batch["existing"], batch["existing_len"],
                batch["target"], batch["target_len"], batch["valid"],
                rng=rng, train=True, label_smoothing=label_smoothing,
            )

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state,
            step=state.step + 1, rng=state.rng,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step_fn


def make_xe_train_step(
    model: ModelDef,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    *,
    label_smoothing: float = 0.0,
):
    """Build the jitted DP train step: (TrainState, batch pytree) -> (state,
    metrics). batch is a dict with keys features/existing/existing_len/
    target/target_len/valid, leading dim = global batch."""
    step_fn = _xe_step_body(model, make_optimizer(cfg), label_smoothing)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if cfg.donate_state else ())

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if cfg.donate_state else (),
    )


def make_xe_train_multistep(
    model: ModelDef,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    *,
    label_smoothing: float = 0.0,
):
    """k train steps in ONE compiled program: lax.scan of the step body
    over stacked batches (leaves [k, B, ...]).

    Dispatch/launch overhead is paid once per k steps instead of per step
    — on this host's remote-dispatch runtime that is the difference
    between 404 and ~4,000 captions/sec at B=256 (docs/DESIGN.md round-2
    measurements); on any runtime it lets XLA pipeline step boundaries.
    The math is bit-identical to k sequential single steps: the scanned
    body is the same function, and per-step dropout keys come from
    fold_in(rng, step) with step advancing inside the scan."""
    step_fn = _xe_step_body(model, make_optimizer(cfg), label_smoothing)

    def multi_fn(state: TrainState, batches: dict[str, jax.Array]):
        return jax.lax.scan(step_fn, state, batches)

    donate = (0,) if cfg.donate_state else ()
    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=donate)

    from captionkit.parallel.mesh import stacked_batch_sharding

    repl = replicated(mesh)
    return jax.jit(
        multi_fn,
        in_shardings=(repl, stacked_batch_sharding(mesh)),
        out_shardings=(repl, repl),
        donate_argnums=donate,
    )


def make_eval_loss_step(model: ModelDef, mesh: Optional[Mesh] = None):
    """Jitted validation loss (no dropout, no update)."""

    def step_fn(params, batch):
        _, metrics = xe_loss(
            model, params,
            batch["features"], batch["existing"], batch["existing_len"],
            batch["target"], batch["target_len"], batch["valid"],
            rng=None, train=False,
        )
        return metrics

    if mesh is None:
        return jax.jit(step_fn)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, bsh), out_shardings=repl)


def batch_to_device_dict(batch) -> dict[str, jax.Array]:
    """captionkit.data.Batch -> the dict the train step consumes."""
    return {
        "features": jnp.asarray(batch.features),
        "existing": jnp.asarray(batch.existing),
        "existing_len": jnp.asarray(batch.existing_len),
        "target": jnp.asarray(batch.target),
        "target_len": jnp.asarray(batch.target_len),
        "valid": jnp.asarray(batch.valid),
    }
