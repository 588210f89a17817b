"""Hand-written deferred-dW backward for EditNet teacher forcing.

The problem (docs/DESIGN.md round-3 table; VERDICT r2 weak #3): inside
`lax.scan`, autodiff accumulates every scan-constant cotangent — the
~130MB of weight-gradient buffers (w_rec 32MB, Copy-LSTM base 64MB, copy
gate 20MB, …) plus the attention context constants — with a read+write
per TIMESTEP: ~5.7GB of pure HBM accumulate traffic per B=256 step,
~6ms of the 45.6ms step.

The fix: a `jax.custom_vjp` around the recurrent segment whose backward
scan carries ONLY the 4 recurrent state cotangents (plus two key-grad
accumulators), emits the per-step matmul-output cotangents (dz, dz2,
drpre, dq, …) as stacked ys, and computes every big dW as ONE batched
einsum over the stacks after the scan:

    dW = sum_t x_t^T dz_t  ==  reshape([T*B, in])^T @ reshape([T*B, out])

Same FLOPs, none of the per-step accumulate traffic. The big per-image
context constants get the same treatment via their rank-1 factors
(d_features = einsum(alpha_t, dctx_t); d_enc_cs = einsum(beta_t,
dc_star_t)).

Scope: soft SCMA only (the straight-through hard path falls back to the
autodiff scan — `forward_seq` in editnet.py). Dropout is supported: the
backward regenerates each step's mask from the same fold_in(rng, t)
stream the forward used.

Numerics mirror the forward exactly (same dtype casts around each
matmul); grad parity vs autodiff is pinned by
tests/test_deferred_backward.py at fp32 and spot-checked at bf16.

Reference: the torch original simply pays cuDNN's per-step dW
accumulation (SURVEY.md §4.1-4.2 hot loops ⟦cite: mount empty⟧).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from captionkit.models.base import dropout


def _sig(x):
    return jax.nn.sigmoid(x)


def _gates(z):
    i, f, g, o = jnp.split(z, 4, axis=-1)
    return _sig(i), _sig(f), jnp.tanh(g), _sig(o)


def _attention_fwd(keys, values, q_lin, v, b):
    """Non-grouped additive attention given the already-projected query
    q_lin = query @ w_q (fp32). Returns (ctx fp32, weights fp32, e)."""
    e = jnp.tanh(keys + q_lin[:, None, :] + b)  # [B, N, A] fp32
    scores = jnp.einsum("bna,a->bn", e, v)
    return scores, e


def _softmax_bwd(w, dw):
    """d_scores of softmax(scores) given weights w and dL/dw."""
    return w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _recurrent_seq(static, ins):
    """outs [T, B, H] for the scanned recurrent segment.

    static: (dt_name, drop_rate, train, T) — hashable config.
    ins: dict of every differentiable input (weights, context, state0,
    zx [T, B, 4H], rng key array)."""
    outs, _ = _recurrent_seq_fwd(static, ins)
    return outs


def _cast(x, dt):
    return x.astype(dt)


def _dt(dt_name):
    # float64 is test-only (x64 grad-exactness checks)
    return {"bfloat16": jnp.bfloat16,
            "float64": jnp.float64}.get(dt_name, jnp.float32)


def _pf(dt):
    """Matmul accumulation dtype: fp32 in production, fp64 under x64."""
    return jnp.float64 if dt == jnp.float64 else jnp.float32


def _step_forward(static, ins, state, z_t, t):
    """One forward step from the pre-assembled gate pre-activation z_t
    (= zx_t + hh @ w_rec, fp32). Returns (state', out, stash)."""
    dt_name, drop_rate, train, _T = static
    dt = _dt(dt_name)
    h_att_in, c_att_in, h_lang_in, c_lang_in = state

    i, f, g, o = _gates(z_t)
    c_att = f * c_att_in + i * g
    h_att = o * jnp.tanh(c_att)

    # visual attention (fp32 score math; bf16 value mix like the model)
    qv = jnp.dot(_cast(h_att, dt), _cast(ins["vis_wq"], dt),
                 preferred_element_type=_pf(dt))
    sc_v, _e = _attention_fwd(ins["vis_keys"], ins["features"], qv,
                              ins["vis_v"], ins["vis_b"])
    alpha = jax.nn.softmax(sc_v, axis=-1)  # [B, R]
    ctx_v = jnp.einsum(
        "br,brf->bf", alpha.astype(ins["features"].dtype),
        ins["features"], preferred_element_type=_pf(dt),
    )
    g_v = _sig(jnp.dot(_cast(h_att, dt), _cast(ins["gate_w"], dt),
                       preferred_element_type=_pf(dt))
               + ins["gate_b"])
    # Match the model's source cast (editnet._finish_step): the attended
    # read is rounded to dt before the gate multiply and the product is
    # rounded again, so the two forwards stay bitwise-comparable at bf16.
    # Both casts are no-ops at fp32/fp64.
    v_hat = _cast(g_v * _cast(ctx_v, dt), dt)

    # SCMA (soft): same attention form over the encoder cell pool
    qs = jnp.dot(_cast(h_att, dt), _cast(ins["scma_wq"], dt),
                 preferred_element_type=_pf(dt))
    sc_s, _ = _attention_fwd(ins["scma_keys"], ins["enc_cs"], qs,
                             ins["scma_v"], ins["scma_b"])
    sc_s = jnp.where(ins["mask"], sc_s, -1e9)
    beta = jax.nn.softmax(sc_s, axis=-1)  # [B, Tm]
    c_star = jnp.einsum(
        "bt,bth->bh", beta.astype(ins["enc_cs"].dtype), ins["enc_cs"],
        preferred_element_type=_pf(dt),
    )

    # Copy-LSTM
    x_lang = jnp.concatenate([v_hat, h_att], axis=-1)
    xh = jnp.concatenate([_cast(x_lang, dt), _cast(h_lang_in, dt)],
                         axis=-1)
    w_base = jnp.concatenate(
        [_cast(ins["lang_wx"], dt), _cast(ins["lang_wh"], dt)], axis=0
    )
    z2 = jnp.dot(xh, w_base,
                 preferred_element_type=_pf(dt)) + ins["lang_b"]
    i2, f2, g2, o2 = _gates(z2)
    c_gen = f2 * c_lang_in + i2 * g2
    xhc = jnp.concatenate([xh, _cast(c_star, dt)], axis=-1)
    w_r = jnp.concatenate(
        [_cast(ins["lang_wrx"], dt), _cast(ins["lang_wrh"], dt),
         _cast(ins["lang_wrc"], dt)], axis=0
    )
    rpre = jnp.dot(xhc, w_r,
                   preferred_element_type=_pf(dt)) + ins["lang_br"]
    r = _sig(rpre)
    c_lang = r * c_star + (1.0 - r) * c_gen
    h_lang = o2 * jnp.tanh(c_lang)

    step_rng = (jax.random.fold_in(ins["rng"], t)
                if train and drop_rate > 0.0 else None)
    out = dropout(h_lang, drop_rate, step_rng, train)

    new_state = (h_att, c_att, h_lang, c_lang)
    stash = {"z": z_t, "z2": z2, "rpre": rpre, "alpha": alpha,
             "beta": beta}
    return new_state, out, stash


def _w_rec(ins, dt):
    return jnp.concatenate(
        [_cast(ins["w_rec_lang"], dt), _cast(ins["w_rec_att"], dt)],
        axis=0,
    )  # [2H, 4H]


def _recurrent_seq_fwd(static, ins):
    dt_name = static[0]
    dt = _dt(dt_name)
    w_rec = _w_rec(ins, dt)

    def body(state, inp):
        z_x_t, t = inp
        hh = jnp.concatenate(
            [_cast(state[2], dt), _cast(state[0], dt)], axis=-1
        )  # [B, H_lang|H_att] — matches forward_seq's [h_lang; h_att]
        z_t = z_x_t + jnp.dot(hh, w_rec,
                              preferred_element_type=_pf(dt))
        new_state, out, stash = _step_forward(static, ins, state, z_t, t)
        return new_state, (out, state, stash)

    T = ins["zx"].shape[0]
    state0 = tuple(ins["state0"])
    _, (outs, states_in, stashes) = jax.lax.scan(
        body, state0, (ins["zx"], jnp.arange(T))
    )
    return outs, (ins, states_in, stashes)


def _recurrent_seq_bwd(static, res, d_outs):
    dt_name, drop_rate, train, T = static
    dt = _dt(dt_name)
    ins, states_in, stashes = res
    B = d_outs.shape[1]
    H = ins["lang_wh"].shape[0]
    Fdim = ins["features"].shape[-1]
    w_rec = _w_rec(ins, dt)
    w_base = jnp.concatenate(
        [_cast(ins["lang_wx"], dt), _cast(ins["lang_wh"], dt)], axis=0
    )
    w_r = jnp.concatenate(
        [_cast(ins["lang_wrx"], dt), _cast(ins["lang_wrh"], dt),
         _cast(ins["lang_wrc"], dt)], axis=0
    )

    def body(carry, inp):
        (dh_att_n, dc_att_n, dh_lang_n, dc_lang_n,
         d_vis_keys, d_scma_keys) = carry
        d_out, state_in, stash, t = inp
        h_att_in, c_att_in, h_lang_in, c_lang_in = state_in

        # ---- recompute forward intermediates from the stash ------------
        z, z2, rpre = stash["z"], stash["z2"], stash["rpre"]
        alpha, beta = stash["alpha"], stash["beta"]
        i, f, g, o = _gates(z)
        c_att = f * c_att_in + i * g
        tc_att = jnp.tanh(c_att)
        h_att = o * tc_att
        qv = jnp.dot(_cast(h_att, dt), _cast(ins["vis_wq"], dt),
                     preferred_element_type=_pf(dt))
        e_v = jnp.tanh(ins["vis_keys"] + qv[:, None, :] + ins["vis_b"])
        ctx_v = jnp.einsum(
            "br,brf->bf", alpha.astype(ins["features"].dtype),
            ins["features"], preferred_element_type=_pf(dt),
        )
        g_v = _sig(jnp.dot(_cast(h_att, dt), _cast(ins["gate_w"], dt),
                       preferred_element_type=_pf(dt))
               + ins["gate_b"])
        # same source cast as the forward (see _step_forward)
        v_hat = _cast(g_v * _cast(ctx_v, dt), dt)
        qs = jnp.dot(_cast(h_att, dt), _cast(ins["scma_wq"], dt),
                     preferred_element_type=_pf(dt))
        e_s = jnp.tanh(ins["scma_keys"] + qs[:, None, :] + ins["scma_b"])
        c_star = jnp.einsum(
            "bt,bth->bh", beta.astype(ins["enc_cs"].dtype),
            ins["enc_cs"], preferred_element_type=_pf(dt),
        )
        i2, f2, g2, o2 = _gates(z2)
        c_gen = f2 * c_lang_in + i2 * g2
        r = _sig(rpre)
        c_lang = r * c_star + (1.0 - r) * c_gen
        tc_lang = jnp.tanh(c_lang)

        # ---- dropout ---------------------------------------------------
        if train and drop_rate > 0.0:
            step_rng = jax.random.fold_in(ins["rng"], t)
            keep = 1.0 - drop_rate
            mask = jax.random.bernoulli(step_rng, keep, d_out.shape)
            dh_lang = dh_lang_n + jnp.where(mask, d_out / keep, 0.0)
        else:
            dh_lang = dh_lang_n + d_out

        # ---- Copy-LSTM backward ---------------------------------------
        do2 = dh_lang * tc_lang
        dc_lang = dc_lang_n + dh_lang * o2 * (1.0 - tc_lang * tc_lang)
        dr = dc_lang * (c_star - c_gen)
        dc_star = dc_lang * r
        dc_gen = dc_lang * (1.0 - r)
        drpre = dr * r * (1.0 - r)
        df2 = dc_gen * c_lang_in
        dc_lang_prev = dc_gen * f2
        di2 = dc_gen * g2
        dg2 = dc_gen * i2
        dz2 = jnp.concatenate(
            [di2 * i2 * (1.0 - i2), df2 * f2 * (1.0 - f2),
             dg2 * (1.0 - g2 * g2), do2 * o2 * (1.0 - o2)], axis=-1
        )
        dxhc = jnp.dot(_cast(drpre, dt), w_r.T,
                       preferred_element_type=_pf(dt))
        dxh = jnp.dot(_cast(dz2, dt), w_base.T,
                      preferred_element_type=_pf(dt))
        in_dim = Fdim + H
        dx_lang = dxh[:, :in_dim] + dxhc[:, :in_dim]
        dh_lang_prev = dxh[:, in_dim:] + dxhc[:, in_dim:in_dim + H]
        dc_star = dc_star + dxhc[:, in_dim + H:]
        dv_hat = dx_lang[:, :Fdim]
        dh_att = dh_att_n + dx_lang[:, Fdim:]

        # ---- SCMA backward (soft) -------------------------------------
        dbeta = jnp.einsum(
            "bh,bth->bt", dc_star.astype(ins["enc_cs"].dtype),
            ins["enc_cs"], preferred_element_type=_pf(dt),
        )
        dsc_s = _softmax_bwd(beta, dbeta)
        dtanh_s = (dsc_s[:, :, None] * ins["scma_v"]
                   * (1.0 - e_s * e_s))  # [B, Tm, A]
        dqs = jnp.sum(dtanh_s, axis=1)  # [B, A]
        dh_att = dh_att + jnp.dot(
            _cast(dqs, dt), _cast(ins["scma_wq"], dt).T,
            preferred_element_type=_pf(dt),
        )
        d_scma_keys = d_scma_keys + dtanh_s
        dv_s = jnp.einsum("bt,bta->a", dsc_s, e_s)
        db_s = jnp.sum(dtanh_s, axis=(0, 1))

        # ---- visual gate + attention backward -------------------------
        dg_v = dv_hat * ctx_v
        dctx_v = dv_hat * g_v
        dgpre = dg_v * g_v * (1.0 - g_v)
        dh_att = dh_att + jnp.dot(
            _cast(dgpre, dt), _cast(ins["gate_w"], dt).T,
            preferred_element_type=_pf(dt),
        )
        dalpha = jnp.einsum(
            "bf,brf->br", dctx_v.astype(ins["features"].dtype),
            ins["features"], preferred_element_type=_pf(dt),
        )
        dsc_v = _softmax_bwd(alpha, dalpha)
        dtanh_v = (dsc_v[:, :, None] * ins["vis_v"]
                   * (1.0 - e_v * e_v))  # [B, R, A]
        dqv = jnp.sum(dtanh_v, axis=1)
        dh_att = dh_att + jnp.dot(
            _cast(dqv, dt), _cast(ins["vis_wq"], dt).T,
            preferred_element_type=_pf(dt),
        )
        d_vis_keys = d_vis_keys + dtanh_v
        dv_v = jnp.einsum("br,bra->a", dsc_v, e_v)
        db_v = jnp.sum(dtanh_v, axis=(0, 1))

        # ---- att-LSTM backward ----------------------------------------
        do = dh_att * tc_att
        dc_att = dc_att_n + dh_att * o * (1.0 - tc_att * tc_att)
        df = dc_att * c_att_in
        dc_att_prev = dc_att * f
        di = dc_att * g
        dg = dc_att * i
        dz = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1
        )
        dhh = jnp.dot(_cast(dz, dt), w_rec.T,
                      preferred_element_type=_pf(dt))
        dh_lang_prev = dh_lang_prev + dhh[:, :H]
        dh_att_prev = dhh[:, H:]

        new_carry = (dh_att_prev, dc_att_prev, dh_lang_prev,
                     dc_lang_prev, d_vis_keys, d_scma_keys)
        emit = {"dz": dz, "dz2": dz2, "drpre": drpre, "dqv": dqv,
                "dqs": dqs, "dgpre": dgpre, "dctx_v": dctx_v,
                "dc_star": dc_star, "dv_v": dv_v, "db_v": db_v,
                "dv_s": dv_s, "db_s": db_s,
                "v_hat": v_hat, "h_att": h_att, "c_star": c_star}
        return new_carry, emit

    acc_dt = d_outs.dtype  # fp32 in production; fp64 under x64 tests
    zeros_keys_v = jnp.zeros(ins["vis_keys"].shape, acc_dt)
    zeros_keys_s = jnp.zeros(ins["scma_keys"].shape, acc_dt)
    z4 = jnp.zeros((B, H), acc_dt)
    carry0 = (z4, z4, z4, z4, zeros_keys_v, zeros_keys_s)
    (dh_att0, dc_att0, dh_lang0, dc_lang0, d_vis_keys, d_scma_keys), em = (
        jax.lax.scan(
            body, carry0,
            (d_outs, states_in, stashes, jnp.arange(T)),
            reverse=True,
        )
    )

    # ---- deferred dW einsums over the stacks ---------------------------
    h_att_in_st, c_att_in_st, h_lang_in_st, c_lang_in_st = states_in
    hh_st = jnp.concatenate(
        [_cast(h_lang_in_st, dt), _cast(h_att_in_st, dt)], axis=-1
    )  # [T, B, 2H]
    alpha_st = stashes["alpha"]  # [T, B, R]
    beta_st = stashes["beta"]  # [T, B, Tm]

    def mm(a, b):  # [T,B,i] x [T,B,j] -> [i,j] fp32
        return jnp.einsum(
            "tbi,tbj->ij", _cast(a, dt), _cast(b, dt),
            preferred_element_type=_pf(dt),
        )

    d_w_rec = mm(hh_st, em["dz"])  # [2H, 4H]
    x_lang_st = jnp.concatenate([em["v_hat"], em["h_att"]], axis=-1)
    d_features = jnp.einsum(
        "tbr,tbf->brf", alpha_st, em["dctx_v"],
        preferred_element_type=_pf(dt),
    ).astype(ins["features"].dtype)
    d_enc_cs = jnp.einsum(
        "tbm,tbh->bmh", beta_st, em["dc_star"],
        preferred_element_type=_pf(dt),
    ).astype(ins["enc_cs"].dtype)

    def f0(x):
        """float0 cotangent for integer/bool primals (JAX convention)."""
        import numpy as np

        return np.zeros(x.shape, jax.dtypes.float0)

    d_ins = {
        "w_rec_lang": d_w_rec[:H],
        "w_rec_att": d_w_rec[H:],
        "lang_wx": mm(x_lang_st, em["dz2"]),
        "lang_wh": mm(_cast(h_lang_in_st, dt), em["dz2"]),
        "lang_b": jnp.sum(em["dz2"], axis=(0, 1)),
        "lang_wrx": mm(x_lang_st, em["drpre"]),
        "lang_wrh": mm(_cast(h_lang_in_st, dt), em["drpre"]),
        "lang_wrc": mm(em["c_star"], em["drpre"]),
        "lang_br": jnp.sum(em["drpre"], axis=(0, 1)),
        "vis_wq": mm(em["h_att"], em["dqv"]),
        "vis_v": jnp.sum(em["dv_v"], axis=0),
        "vis_b": jnp.sum(em["db_v"], axis=0),
        "gate_w": mm(em["h_att"], em["dgpre"]),
        "gate_b": jnp.sum(em["dgpre"], axis=(0, 1)),
        "scma_wq": mm(em["h_att"], em["dqs"]),
        "scma_v": jnp.sum(em["dv_s"], axis=0),
        "scma_b": jnp.sum(em["db_s"], axis=0),
        "vis_keys": d_vis_keys.astype(ins["vis_keys"].dtype),
        "features": d_features,
        "scma_keys": d_scma_keys.astype(ins["scma_keys"].dtype),
        "enc_cs": d_enc_cs,
        "mask": f0(ins["mask"]),
        "state0": (dh_att0, dc_att0, dh_lang0, dc_lang0),
        "zx": em["dz"],
        "rng": f0(ins["rng"]),
    }
    return (d_ins,)


_recurrent_seq.defvjp(_recurrent_seq_fwd, _recurrent_seq_bwd)
