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
from captionkit.parallel.mesh import (
    batch_sharding,
    replicated,
    stacked_batch_sharding,
)
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
    num_samples: int = 1,
):
    """Jitted (params, batch, rng) -> rollout dict.

    ``num_samples=1`` (the reference recipe [P][B]): one sampled caption +
    a greedy baseline caption per image, one encode feeding both legs —
    returns [B, L] leaves.

    ``num_samples=n>1`` (multi-sample SCST, Luo 2020 "A Better Variance
    Reduction" / ruotianluo new_self_critical): n sampled captions per
    image, no greedy leg — the baseline becomes each sample's
    leave-one-out mean reward (ScstRewarder.advantage_loo), which is
    lower-variance than the single greedy rollout and removes a whole
    decode from the step. Returns [n, B, L] sample leaves (scan dim
    leading, batch sharded — stacked_batch_sharding layout)."""

    def fn(params, batch, rng):
        ctx = model.encode(
            params, batch["features"], batch["existing"],
            batch["existing_len"],
        )
        if num_samples == 1:
            sample = sample_decode(
                model, params, ctx, rng,
                start_id=start_id, end_id=end_id, pad_id=pad_id,
                max_len=max_len,
            )
            greedy = greedy_decode(
                model, params, ctx,
                start_id=start_id, end_id=end_id, pad_id=pad_id,
                max_len=max_len,
            )
            return {
                "sample_tokens": sample.tokens,
                "sample_mask": sample.mask,
                "greedy_tokens": greedy.tokens,
                "greedy_mask": greedy.mask,
            }

        def one(r):
            s = sample_decode(
                model, params, ctx, r,
                start_id=start_id, end_id=end_id, pad_id=pad_id,
                max_len=max_len,
            )
            return s.tokens, s.mask

        # lax.map (sequential) over samples: rollouts are while_loop
        # programs whose peak memory we don't want multiplied by n.
        toks, masks = jax.lax.map(one, jax.random.split(rng, num_samples))
        return {"sample_tokens": toks, "sample_mask": masks}

    # Rollouts are decode programs — same scoped-VMEM rebalance as
    # decode/driver.py (utils/tpuopts.py; +10% measured on beam decode).
    from captionkit.utils.tpuopts import decode_compiler_options

    opts = decode_compiler_options()
    if mesh is None:
        return jax.jit(fn, compiler_options=opts)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    osh = bsh if num_samples == 1 else stacked_batch_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, bsh, repl), out_shardings=osh,
                   compiler_options=opts)


def make_scst_update(
    model: ModelDef,
    cfg: TrainConfig,
    *,
    start_id: int,
    mesh: Optional[Mesh] = None,
    num_samples: int = 1,
):
    """Jitted (TrainState, batch, sampled_tokens, sample_mask, advantage)
    -> (TrainState, metrics). With ``num_samples>1`` the token/mask args
    are [n, B, L] and advantage is [n, B]; the surrogate sums over every
    sample's tokens (one encode, n teacher-forced passes via lax.map so
    peak memory stays at the single-sample footprint)."""
    tx = make_optimizer(cfg)

    def _surrogate(ctx, state0, params, tokens, mask, advantage, valid):
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
        # Reference-style: per-token mean of −advantage·logp over real
        # tokens (ruotianluo RewardCriterion shape [R]).
        num = jnp.sum(-advantage[:, None] * tok_logp * maskf * valid[:, None])
        den = jnp.sum(maskf * valid[:, None])
        return num, den

    def loss_fn(params, batch, tokens, mask, advantage):
        ctx = model.encode(
            params, batch["features"], batch["existing"],
            batch["existing_len"],
        )
        state0 = model.init_state(params, ctx)
        valid = batch["valid"].astype(jnp.float32)
        if num_samples == 1:
            num, den = _surrogate(
                ctx, state0, params, tokens, mask, advantage, valid
            )
            adv_mean = (jnp.sum(advantage * valid)
                        / jnp.maximum(jnp.sum(valid), 1.0))
        else:
            nums, dens = jax.lax.map(
                lambda tma: _surrogate(ctx, state0, params, *tma, valid),
                (tokens, mask, advantage),
            )
            num, den = jnp.sum(nums), jnp.sum(dens)
            adv_mean = (
                jnp.sum(advantage * valid[None, :])
                / jnp.maximum(num_samples * jnp.sum(valid), 1.0)
            )
        loss = num / jnp.maximum(den, 1.0)
        # den already sums mask over valid rows only.
        tok_per_img = den / jnp.maximum(num_samples * jnp.sum(valid), 1.0)
        return loss, {
            "scst_loss": loss,
            "mean_advantage": adv_mean,
            "sample_len": tok_per_img,
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
    ssh = bsh if num_samples == 1 else stacked_batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, bsh, ssh, ssh, ssh),
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

    def advantage_loo(
        self,
        sample_tokens: np.ndarray,  # [n, B, L]
        references: Sequence[Sequence[Sequence[str]]],  # [B][n_ref][tok]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Multi-sample baseline: each sample's advantage is its reward
        minus the LEAVE-ONE-OUT mean of its siblings' rewards (Luo 2020) —
        an unbiased, lower-variance replacement for the greedy rollout.
        Returns (advantage [n, B], rewards [n, B])."""
        n, B, _ = sample_tokens.shape
        if n < 2:
            raise ValueError("advantage_loo needs num_samples >= 2")
        flat = sample_tokens.reshape(n * B, -1)
        hyps = self._decode(flat)
        refs = [list(r) for r in references] * n
        if self._native is not None:
            r = self._native.score(hyps, refs)
        else:
            _, r = self.scorer.compute(hyps, refs)
        rewards = np.asarray(r, np.float32).reshape(n, B)
        baseline = (rewards.sum(axis=0, keepdims=True) - rewards) / (n - 1)
        return (rewards - baseline).astype(np.float32), rewards


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
    pipelined loops so reward/metric semantics cannot drift. Dispatches
    on the rollout's shape: [B, L] sample leaves = reference recipe
    (greedy baseline); [n, B, L] = multi-sample leave-one-out baseline."""
    sample_tokens = np.asarray(jax.device_get(roll["sample_tokens"]))
    if sample_tokens.ndim == 3:
        adv, rewards = rewarder.advantage_loo(sample_tokens, references)
        new_state, metrics = update_fn(
            state, batch, roll["sample_tokens"], roll["sample_mask"],
            jnp.asarray(adv),
        )
        metrics = dict(metrics)
        metrics["reward_sample_mean"] = float(rewards.mean())
        return new_state, metrics
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
