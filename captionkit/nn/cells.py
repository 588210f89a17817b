"""Recurrent cells: standard LSTM and the Copy-LSTM.

Reference semantics (SURVEY.md §3.2, §4.2; paper arXiv:2003.03107):

* The reference's LSTMs are torch ``nn.LSTM``/``nn.LSTMCell`` (cuDNN): gates
  ordered (i, f, g, o), bias split across b_ih/b_hh (summed here), and
  c' = f⊙c + i⊙tanh(g), h' = o⊙tanh(c'). We keep torch gate order so the
  checkpoint converter (captionkit.convert) is a pure reshape.
* **Copy-LSTM** (the paper's novel cell): a standard LSTM whose cell update
  is blended with the SCMA-selected memory c* through a learned copy gate
  r = σ(W_r x + U_r h + V_r c*):   c' = r⊙c* + (1-r)⊙c_gen. Each step thereby
  chooses copy-vs-generate (SURVEY.md §3.2 "Copy-LSTM"). The exact reference
  blend must be fit against released checkpoints (SURVEY.md §8.3 #1); this
  formulation implements the paper's description and is the configurable
  default.

TPU notes: the four gate matmuls are fused into one [in, 4H] matmul so XLA
tiles a single large MXU op per step; compute dtype is configurable (bf16
matmul, fp32 state update).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LSTMParams:
    wx: Any  # [in_dim, 4H]  input kernel (gates i|f|g|o concatenated)
    wh: Any  # [H, 4H]       recurrent kernel
    b: Any  # [4H]           bias (torch b_ih + b_hh summed)


@struct.dataclass
class CopyLSTMParams:
    base: LSTMParams  # standard gates
    wrx: Any  # [in_dim, H]  copy-gate input kernel
    wrh: Any  # [H, H]       copy-gate recurrent kernel
    wrc: Any  # [H, H]       copy-gate memory (c*) kernel
    br: Any  # [H]


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init_lstm(key, in_dim: int, hidden: int) -> LSTMParams:
    """torch-style U(-1/sqrt(H), 1/sqrt(H)) init."""
    s = 1.0 / jnp.sqrt(hidden)
    k1, k2, k3 = jax.random.split(key, 3)
    return LSTMParams(
        wx=_uniform(k1, (in_dim, 4 * hidden), s),
        wh=_uniform(k2, (hidden, 4 * hidden), s),
        b=_uniform(k3, (4 * hidden,), s),
    )


def init_copy_lstm(key, in_dim: int, hidden: int) -> CopyLSTMParams:
    s = 1.0 / jnp.sqrt(hidden)
    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    return CopyLSTMParams(
        base=init_lstm(k0, in_dim, hidden),
        wrx=_uniform(k1, (in_dim, hidden), s),
        wrh=_uniform(k2, (hidden, hidden), s),
        wrc=_uniform(k3, (hidden, hidden), s),
        br=_uniform(k4, (hidden,), s),
    )


def lstm_gates(
    z: jax.Array,  # [B, 4H] pre-activation gates (i|f|g|o), fp32
    c: jax.Array,  # [B, H]
) -> tuple[jax.Array, jax.Array]:
    """Standard LSTM gate math from pre-activations. Returns (h', c').
    Factored out so callers can assemble z from partial matmuls (e.g.
    EditNet hoists the step-invariant v̄-term out of the decode loop)."""
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell(
    params: LSTMParams,
    x: jax.Array,  # [B, in_dim]
    h: jax.Array,  # [B, H]
    c: jax.Array,  # [B, H]
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """One LSTM step. Returns (h', c'). Gate math in fp32, matmuls in
    compute_dtype (bf16 on the MXU by default in model configs).

    The input and recurrent kernels are packed into ONE [D+H, 4H]
    contraction: inside scan/while decode loops the weight concat is
    loop-invariant (XLA hoists it), and a single MXU matmul beats two
    half-width ones on this step's shapes."""
    dt = compute_dtype
    xh = jnp.concatenate([x.astype(dt), h.astype(dt)], axis=-1)
    w = jnp.concatenate(
        [params.wx.astype(dt), params.wh.astype(dt)], axis=0
    )
    z = jnp.dot(xh, w, preferred_element_type=jnp.float32) + params.b
    return lstm_gates(z, c)


def copy_lstm_cell(
    params: CopyLSTMParams,
    x: jax.Array,  # [B, in_dim]
    h: jax.Array,  # [B, H]
    c: jax.Array,  # [B, H]
    c_star: jax.Array,  # [B, H]  SCMA-selected memory to (maybe) copy
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """One Copy-LSTM step: standard gates + copy gate blending c* into the
    cell state (SURVEY.md §4.2 'Copy-LSTM' frame). Returns (h', c').

    All five matmuls (i/f/g/o gates over [x|h] and the copy gate over
    [x|h|c*]) run as two packed contractions — the weight concats are
    loop-invariant inside decode loops and hoisted by XLA."""
    dt = compute_dtype
    xd = x.astype(dt)
    hd = h.astype(dt)
    xh = jnp.concatenate([xd, hd], axis=-1)
    w_base = jnp.concatenate(
        [params.base.wx.astype(dt), params.base.wh.astype(dt)], axis=0
    )
    z = jnp.dot(xh, w_base, preferred_element_type=jnp.float32) + params.base.b
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_gen = f * c + i * g

    xhc = jnp.concatenate([xh, c_star.astype(dt)], axis=-1)
    w_r = jnp.concatenate(
        [params.wrx.astype(dt), params.wrh.astype(dt),
         params.wrc.astype(dt)], axis=0
    )
    r = jax.nn.sigmoid(
        jnp.dot(xhc, w_r, preferred_element_type=jnp.float32) + params.br
    )
    c_new = r * c_star + (1.0 - r) * c_gen
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_encode(
    params: LSTMParams,
    emb: jax.Array,  # [B, T, E] embedded tokens
    lengths: jax.Array,  # [B]
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Run an LSTM over a padded sequence with lax.scan, freezing (h, c) at
    padding steps so the final state equals the state at each row's true
    length (torch pack_padded semantics, SURVEY.md §3.2 encoders).

    Returns (hs, cs): [B, T, H] hidden and cell states per step. Padding
    positions hold the frozen (last valid) state; attention layers mask them
    out by length, and SCMA's memory pool masks the same way.
    """
    B, T, _ = emb.shape
    H = params.wh.shape[0]
    dt = compute_dtype
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    # The input-side gate matmul depends only on the (fully known) input
    # sequence — run it for all timesteps as ONE batched contraction so
    # the scan carries only the recurrent h-matmul. In the backward pass
    # this also turns T per-step dWx accumulations into a single matmul
    # over B·T rows (see ModelDef.forward_seq for the same restructuring
    # of the decoders).
    z_x = (
        jnp.einsum(
            "bte,ef->btf", emb.astype(dt), params.wx.astype(dt),
            preferred_element_type=jnp.float32,
        )
        + params.b
    )  # [B, T, 4H] fp32
    wh = params.wh.astype(dt)

    def step(carry, inp):
        h, c = carry
        z_t, valid_t = inp  # [B, 4H], [B]
        z = z_t + jnp.dot(h.astype(dt), wh,
                          preferred_element_type=jnp.float32)
        h_new, c_new = lstm_gates(z, c)
        keep = valid_t[:, None]
        h = jnp.where(keep, h_new, h)
        c = jnp.where(keep, c_new, c)
        return (h, c), (h, c)

    valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    (_, _), (hs, cs) = jax.lax.scan(
        step,
        (h0, c0),
        (jnp.swapaxes(z_x, 0, 1), jnp.swapaxes(valid, 0, 1)),
    )
    return jnp.swapaxes(hs, 0, 1), jnp.swapaxes(cs, 0, 1)
