"""Hand-written deferred-dW backward for DCNet teacher forcing.

Sibling of models/editnet_backward.py (see its docstring for the why):
DCNet's scan body is one attention read (gated) + one LSTM, so the
in-scan accumulates are smaller (~40MB of dW buffers: w_rec 32MB,
gate_w 4MB, attention w_q 2MB, plus the [B,T,A]/[B,T,H] context
constants) but the same per-timestep read+write tax applies.

Scope: the text-only DCNet (cfg.dcnet_use_visual=False — the reference
model per the paper). The visual-conditioned variant falls back to the
autodiff scan. Gradients match autodiff to 1e-15 at float64
(tests/test_deferred_backward.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from captionkit.models.base import dropout
from captionkit.models.editnet_backward import (
    _cast,
    _dt,
    _gates,
    _pf,
    _softmax_bwd,
)
from captionkit.nn.masking import NEG_INF


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def dcnet_recurrent_seq(static, ins):
    """outs [T, B, H] for DCNet's scanned recurrent segment.

    static: (dt_name, drop_rate, train, T).
    ins: dict of weights / context / state0 / zx [T, B, 4H] / rng."""
    outs, _ = _fwd(static, ins)
    return outs


def _attention(ins, h, dt):
    """Masked additive attention over encoder states, entry-h query.
    Returns (att_ctx fp32, omega fp32, q fp32, e fp32)."""
    q = jnp.dot(_cast(h, dt), _cast(ins["att_wq"], dt),
                preferred_element_type=_pf(dt))
    e = jnp.tanh(ins["att_keys"] + q[:, None, :] + ins["att_b"])
    scores = jnp.einsum("bma,a->bm", e, ins["att_v"])
    scores = jnp.where(ins["mask"], scores, NEG_INF)
    omega = jax.nn.softmax(scores, axis=-1)  # [B, Tm]
    att_ctx = jnp.einsum(
        "bm,bmh->bh", omega.astype(ins["enc_hs"].dtype), ins["enc_hs"],
        preferred_element_type=_pf(dt),
    )
    return att_ctx, omega, q, e


def _step(static, ins, state, z_x_t, t):
    dt_name, drop_rate, train, _T = static
    dt = _dt(dt_name)
    h_in, c_in = state
    att_ctx, omega, _q, _e = _attention(ins, h_in, dt)
    g = jax.nn.sigmoid(
        jnp.dot(_cast(h_in, dt), _cast(ins["gate_w"], dt),
                preferred_element_type=_pf(dt))
        + ins["gate_b"])
    part = g * att_ctx
    x_rec = jnp.concatenate([part, h_in], axis=-1)
    z = z_x_t + jnp.dot(_cast(x_rec, dt), _w_rec(ins, dt),
                        preferred_element_type=_pf(dt))
    i, f, gg, o = _gates(z)
    c = f * c_in + i * gg
    h = o * jnp.tanh(c)
    step_rng = (jax.random.fold_in(ins["rng"], t)
                if train and drop_rate > 0.0 else None)
    out = dropout(h, drop_rate, step_rng, train)
    return (h, c), out, {"z": z, "omega": omega}


def _w_rec(ins, dt):
    return jnp.concatenate(
        [_cast(ins["w_rec_ctx"], dt), _cast(ins["w_rec_h"], dt)], axis=0
    )  # [2H, 4H]


def _fwd(static, ins):
    T = ins["zx"].shape[0]

    def body(state, inp):
        z_x_t, t = inp
        new_state, out, stash = _step(static, ins, state, z_x_t, t)
        return new_state, (out, state, stash)

    _, (outs, states_in, stashes) = jax.lax.scan(
        body, tuple(ins["state0"]), (ins["zx"], jnp.arange(T))
    )
    return outs, (ins, states_in, stashes)


def _bwd(static, res, d_outs):
    dt_name, drop_rate, train, T = static
    dt = _dt(dt_name)
    ins, states_in, stashes = res
    B = d_outs.shape[1]
    H = ins["w_rec_h"].shape[0]
    w_rec = _w_rec(ins, dt)
    acc_dt = d_outs.dtype

    def body(carry, inp):
        dh_n, dc_n, d_att_keys = carry
        d_out, state_in, stash, t = inp
        h_in, c_in = state_in
        z, omega = stash["z"], stash["omega"]

        # recompute step internals
        i, f, gg, o = _gates(z)
        c = f * c_in + i * gg
        tc = jnp.tanh(c)
        att_ctx, _, q, e = _attention(ins, h_in, dt)
        g = jax.nn.sigmoid(
        jnp.dot(_cast(h_in, dt), _cast(ins["gate_w"], dt),
                preferred_element_type=_pf(dt))
        + ins["gate_b"])

        if train and drop_rate > 0.0:
            step_rng = jax.random.fold_in(ins["rng"], t)
            keep = 1.0 - drop_rate
            mask = jax.random.bernoulli(step_rng, keep, d_out.shape)
            dh = dh_n + jnp.where(mask, d_out / keep, 0.0)
        else:
            dh = dh_n + d_out

        # LSTM backward
        do = dh * tc
        dc = dc_n + dh * o * (1.0 - tc * tc)
        df = dc * c_in
        dc_prev = dc * f
        di = dc * gg
        dg_ = dc * i
        dz = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dg_ * (1.0 - gg * gg), do * o * (1.0 - o)], axis=-1
        )
        dx_rec = jnp.dot(_cast(dz, dt), w_rec.T,
                         preferred_element_type=_pf(dt))
        dpart = dx_rec[:, :H]
        dh_prev = dx_rec[:, H:]

        # gated attention backward
        dgate = dpart * att_ctx
        datt_ctx = dpart * g
        dgpre = dgate * g * (1.0 - g)
        dh_prev = dh_prev + jnp.dot(
            _cast(dgpre, dt), _cast(ins["gate_w"], dt).T,
            preferred_element_type=_pf(dt),
        )
        domega = jnp.einsum(
            "bh,bmh->bm", datt_ctx.astype(ins["enc_hs"].dtype),
            ins["enc_hs"], preferred_element_type=_pf(dt),
        )
        dscores = _softmax_bwd(omega, domega)
        dtanh = dscores[:, :, None] * ins["att_v"] * (1.0 - e * e)
        dq = jnp.sum(dtanh, axis=1)
        dh_prev = dh_prev + jnp.dot(
            _cast(dq, dt), _cast(ins["att_wq"], dt).T,
            preferred_element_type=_pf(dt),
        )
        d_att_keys = d_att_keys + dtanh
        dv_t = jnp.einsum("bm,bma->a", dscores, e)
        db_t = jnp.sum(dtanh, axis=(0, 1))

        emit = {"dz": dz, "dgpre": dgpre, "dq": dq,
                "datt_ctx": datt_ctx, "dv": dv_t, "db": db_t,
                "att_ctx": att_ctx, "g": g}
        return (dh_prev, dc_prev, d_att_keys), emit

    z2 = jnp.zeros((B, H), acc_dt)
    keys0 = jnp.zeros(ins["att_keys"].shape, acc_dt)
    (dh0, dc0, d_att_keys), em = jax.lax.scan(
        body, (z2, z2, keys0),
        (d_outs, states_in, stashes, jnp.arange(T)),
        reverse=True,
    )

    h_in_st, c_in_st = states_in
    part_st = em["g"] * em["att_ctx"]
    x_rec_st = jnp.concatenate([part_st, h_in_st], axis=-1)

    def mm(a, b):
        return jnp.einsum(
            "tbi,tbj->ij", _cast(a, dt), _cast(b, dt),
            preferred_element_type=_pf(dt),
        )

    d_w_rec = mm(x_rec_st, em["dz"])
    omega_st = stashes["omega"]
    d_enc_hs = jnp.einsum(
        "tbm,tbh->bmh", omega_st, em["datt_ctx"],
        preferred_element_type=_pf(dt),
    ).astype(ins["enc_hs"].dtype)

    def f0(x):
        import numpy as np

        return np.zeros(x.shape, jax.dtypes.float0)

    d_ins = {
        "w_rec_ctx": d_w_rec[:H],
        "w_rec_h": d_w_rec[H:],
        "att_wq": mm(h_in_st, em["dq"]),
        "att_v": jnp.sum(em["dv"], axis=0),
        "att_b": jnp.sum(em["db"], axis=0),
        "gate_w": mm(h_in_st, em["dgpre"]),
        "gate_b": jnp.sum(em["dgpre"], axis=(0, 1)),
        "att_keys": d_att_keys.astype(ins["att_keys"].dtype),
        "enc_hs": d_enc_hs,
        "mask": f0(ins["mask"]),
        "state0": (dh0, dc0),
        "zx": em["dz"],
        "rng": f0(ins["rng"]),
    }
    return (d_ins,)


dcnet_recurrent_seq.defvjp(_fwd, _bwd)
