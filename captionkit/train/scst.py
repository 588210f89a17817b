"""SCST — self-critical sequence training (SURVEY.md §4.4; Rennie et al.).

Reference recipe [P][B]: after XE, per image sample a caption (multinomial)
and greedy-decode a baseline; reward = CIDEr-D(sample) − CIDEr-D(greedy);
loss = −reward · Σ_t log p(sampled_t).

TPU-native factoring (SURVEY.md §8.1 step 8) — three phases per step, the
device phases jitted and batch-sharded, the reward on host:

1. ``rollout`` (device): sample + greedy legs share one encode; both run as
   lax.scan rollouts from the same step fn the rest of the framework uses.
2. reward (host): ids → words → vectorized CIDEr-D against precomputed df
   (captionkit.metrics.cider.NgramDocFreq), advantage = sample − greedy.
3. ``update`` (device): REINFORCE surrogate −advantage · Σ log p(sampled)
   recomputed under grad via teacher forcing on the sampled tokens —
   algebraically the same gradient as differentiating the rollout, but it
   lets the host reward slot between two clean jit boundaries so the next
   batch's rollout can overlap reward computation (SURVEY.md §4.4 rebuild
   note).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from captionkit.data.vocab import Vocab
from captionkit.decode import greedy_decode, sample_decode
from captionkit.metrics.cider import CiderD, NgramDocFreq
from captionkit.models.base import ModelDef, teacher_forcing_logits
from captionkit.parallel.mesh import batch_sharding, replicated
from captionkit.train.state import TrainState, make_optimizer
from captionkit.utils.config import TrainConfig


def make_scst_rollout(
    model: ModelDef,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int = 22,
    mesh: Optional[Mesh] = None,
):
    """Jitted (params, batch, rng) -> (sampled tokens/mask, greedy tokens,
    greedy mask). One encode feeds both legs."""

    def fn(params, batch, rng):
        ctx = model.encode(
            params, batch["features"], batch["existing"],
            batch["existing_len"],
        )
        sample = sample_decode(
            model, params, ctx, rng,
            start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len,
        )
        greedy = greedy_decode(
            model, params, ctx,
            start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len,
        )
        return {
            "sample_tokens": sample.tokens,
            "sample_mask": sample.mask,
            "greedy_tokens": greedy.tokens,
            "greedy_mask": greedy.mask,
        }

    # Rollouts are decode programs — same scoped-VMEM rebalance as
    # decode/driver.py (utils/tpuopts.py; +10% measured on beam decode).
    from captionkit.utils.tpuopts import decode_compiler_options

    opts = decode_compiler_options()
    if mesh is None:
        return jax.jit(fn, compiler_options=opts)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, bsh, repl), out_shardings=bsh,
                   compiler_options=opts)


def make_scst_update(
    model: ModelDef,
    cfg: TrainConfig,
    *,
    start_id: int,
    mesh: Optional[Mesh] = None,
):
    """Jitted (TrainState, batch, sampled_tokens, sample_mask, advantage)
    -> (TrainState, metrics)."""
    tx = make_optimizer(cfg)

    def loss_fn(params, batch, tokens, mask, advantage):
        ctx = model.encode(
            params, batch["features"], batch["existing"],
            batch["existing_len"],
        )
        state0 = model.init_state(params, ctx)
        B, L = tokens.shape
        tokens_in = jnp.concatenate(
            [jnp.full((B, 1), start_id, jnp.int32), tokens[:, :-1]], axis=1
        )
        logits = teacher_forcing_logits(
            model, params, ctx, state0, tokens_in, rng=None, train=False
        )  # [B, L, V]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_logp = jnp.take_along_axis(logp, tokens[..., None], -1)[..., 0]
        maskf = mask.astype(jnp.float32)
        valid = batch["valid"].astype(jnp.float32)
        # Reference-style: per-token mean of −advantage·logp over real
        # tokens (ruotianluo RewardCriterion shape [R]).
        num = jnp.sum(-advantage[:, None] * tok_logp * maskf * valid[:, None])
        den = jnp.maximum(jnp.sum(maskf * valid[:, None]), 1.0)
        loss = num / den
        return loss, {
            "scst_loss": loss,
            "mean_advantage": jnp.sum(advantage * valid)
            / jnp.maximum(jnp.sum(valid), 1.0),
            "sample_len": jnp.sum(maskf) / jnp.maximum(jnp.sum(valid), 1.0),
        }

    def step_fn(state: TrainState, batch, tokens, mask, advantage):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, tokens, mask, advantage
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state,
            step=state.step + 1, rng=state.rng,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(
            step_fn, donate_argnums=(0,) if cfg.donate_state else ()
        )
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, bsh, bsh, bsh, bsh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if cfg.donate_state else (),
    )


class ScstRewarder:
    """Host-side CIDEr-D advantage: sample reward − greedy baseline.

    Uses a precomputed document-frequency corpus so rewards are batch-
    independent, exactly like the reference's pickled-df CiderD
    (SURVEY.md §3.3). Prefers the native C++ scorer when built.
    """

    def __init__(self, vocab: Vocab, df: NgramDocFreq):
        self.vocab = vocab
        self._df = df
        self.scorer = CiderD(df)
        self._native = None
        try:
            from captionkit.metrics.fast import NativeCiderD

            self._native = NativeCiderD(df)
        except Exception:
            self._native = None

    def _decode(self, tokens: np.ndarray) -> list[list[str]]:
        return [self.vocab.decode(row) for row in tokens]

    def advantage(
        self,
        sample_tokens: np.ndarray,  # [B, L]
        greedy_tokens: np.ndarray,  # [B, L]
        references: Sequence[Sequence[Sequence[str]]],  # [B][n_ref][tok]
    ) -> np.ndarray:
        hyps_s = self._decode(sample_tokens)
        hyps_g = self._decode(greedy_tokens)
        refs = [list(r) for r in references]
        if self._native is not None:
            r_s = self._native.score(hyps_s, refs)
            r_g = self._native.score(hyps_g, refs)
        else:
            _, r_s = self.scorer.compute(hyps_s, refs)
            _, r_g = self.scorer.compute(hyps_g, refs)
        return (np.asarray(r_s) - np.asarray(r_g)).astype(np.float32)


def apply_rollout(
    *,
    update_fn,
    rewarder: ScstRewarder,
    state: TrainState,
    batch: dict[str, jax.Array],
    references: Sequence[Sequence[Sequence[str]]],
    roll: dict[str, jax.Array],
) -> tuple[TrainState, dict[str, Any]]:
    """Finish an SCST step from an already-dispatched rollout: host
    CIDEr-D advantage, then the device update. Shared by the serial and
    pipelined loops so reward/metric semantics cannot drift."""
    sample_tokens = np.asarray(jax.device_get(roll["sample_tokens"]))
    greedy_tokens = np.asarray(jax.device_get(roll["greedy_tokens"]))
    adv = rewarder.advantage(sample_tokens, greedy_tokens, references)
    new_state, metrics = update_fn(
        state, batch, roll["sample_tokens"], roll["sample_mask"],
        jnp.asarray(adv),
    )
    metrics = dict(metrics)
    # Raw (unmasked) mean for debugging; `mean_advantage` from the update
    # step is the valid-row-masked quantity loops should report.
    metrics["reward_sample_minus_greedy"] = float(adv.mean())
    return new_state, metrics


def scst_train_step(
    *,
    rollout_fn,
    update_fn,
    rewarder: ScstRewarder,
    state: TrainState,
    batch: dict[str, jax.Array],
    references: Sequence[Sequence[Sequence[str]]],
    rng: jax.Array,
) -> tuple[TrainState, dict[str, Any]]:
    """One full SCST step (device rollout -> host reward -> device update)."""
    roll = rollout_fn(state.params, batch, rng)
    return apply_rollout(
        update_fn=update_fn, rewarder=rewarder, state=state, batch=batch,
        references=references, roll=roll,
    )
