"""Torch checkpoint -> captionkit parameter pytree (SURVEY.md §8.1 step 5).

Name mapping follows the tutorial-family module layout documented in
convert.torch_ref (the expected reference checkpoint shape; real released
checkpoints must be re-verified against this map when the mount is fixed —
SURVEY.md §0 citation-backfill note). Conversion rules:

* torch Linear weight [out, in] -> transposed [in, out].
* torch LSTM gate blocks stay in (i, f, g, o) order; bias_ih + bias_hh sum
  into one bias (identical math).
* additive attention: our single in-tanh bias b := encoder_att.bias +
  decoder_att.bias; full_att.bias shifts every score by a constant and is
  softmax-invariant, so it is checked-and-dropped.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from captionkit.nn.attention import AdditiveAttentionParams
from captionkit.nn.cells import CopyLSTMParams, LSTMParams


def _device_tree(tree):
    """Converted params must be jax arrays (numpy leaves cannot be indexed
    by tracers inside scan/while loops)."""
    return jax.tree.map(
        lambda x: jnp.asarray(x) if x is not None else None,
        tree,
        is_leaf=lambda x: x is None,
    )


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy().astype(np.float32)
    except AttributeError:
        return np.asarray(t, np.float32)


class StateDict:
    """Tracks consumed keys so unmapped parameters are loud, not silent."""

    def __init__(self, raw: Mapping[str, object]):
        self.raw = dict(raw)
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.raw:
            raise KeyError(
                f"checkpoint is missing {key!r}; available keys include "
                f"{sorted(self.raw)[:8]}..."
            )
        self.used.add(key)
        return _np(self.raw[key])

    def take_optional(self, key: str):
        if key in self.raw:
            return self.take(key)
        return None

    def assert_exhausted(self, ignore_prefixes: tuple[str, ...] = ()):
        left = [
            k for k in self.raw
            if k not in self.used
            and not any(k.startswith(p) for p in ignore_prefixes)
        ]
        if left:
            raise ValueError(f"unconverted checkpoint keys: {sorted(left)}")


def lstm_from(sd: StateDict, prefix: str) -> LSTMParams:
    wih = sd.take(f"{prefix}.weight_ih")
    whh = sd.take(f"{prefix}.weight_hh")
    b = sd.take(f"{prefix}.bias_ih") + sd.take(f"{prefix}.bias_hh")
    return LSTMParams(wx=wih.T.copy(), wh=whh.T.copy(), b=b)


def attention_from(sd: StateDict, prefix: str,
                   enc_name: str = "encoder_att") -> AdditiveAttentionParams:
    w_enc = sd.take(f"{prefix}.{enc_name}.weight").T.copy()
    b_enc = sd.take(f"{prefix}.{enc_name}.bias")
    w_q = sd.take(f"{prefix}.decoder_att.weight").T.copy()
    b_q = sd.take(f"{prefix}.decoder_att.bias")
    v = sd.take(f"{prefix}.full_att.weight").reshape(-1)
    sd.take_optional(f"{prefix}.full_att.bias")  # softmax-invariant shift
    return AdditiveAttentionParams(w_enc=w_enc, w_q=w_q, v=v, b=b_enc + b_q)


def copy_lstm_from(sd: StateDict, prefix: str) -> CopyLSTMParams:
    base = lstm_from(sd, f"{prefix}.base")
    return CopyLSTMParams(
        base=base,
        wrx=sd.take(f"{prefix}.weight_rx").T.copy(),
        wrh=sd.take(f"{prefix}.weight_rh").T.copy(),
        wrc=sd.take(f"{prefix}.weight_rc").T.copy(),
        br=sd.take(f"{prefix}.bias_r"),
    )


def dcnet_params_from_state_dict(raw: Mapping[str, object]):
    from captionkit.models.dcnet import DCNetParams

    sd = StateDict(raw)
    params = DCNetParams(
        embedding=sd.take("embedding.weight"),
        encoder=lstm_from(sd, "encoder"),
        attention=attention_from(sd, "attention"),
        gate_w=sd.take("f_beta.weight").T.copy(),
        gate_b=sd.take("f_beta.bias"),
        decoder=lstm_from(sd, "decode_step"),
        fc_w=sd.take("fc.weight").T.copy(),
        fc_b=sd.take("fc.bias"),
        vis_attention=None,
        init_h_w=sd.take("init_h.weight").T.copy(),
        init_c_w=sd.take("init_c.weight").T.copy(),
        init_h_b=sd.take("init_h.bias"),
        init_c_b=sd.take("init_c.bias"),
    )
    sd.assert_exhausted()
    return _device_tree(params)


def editnet_params_from_state_dict(raw: Mapping[str, object]):
    from captionkit.models.editnet import EditNetParams

    sd = StateDict(raw)
    params = EditNetParams(
        embedding=sd.take("embedding.weight"),
        encoder=lstm_from(sd, "encoder"),
        att_lstm=lstm_from(sd, "att_lstm"),
        vis_attention=attention_from(sd, "vis_attention"),
        vis_gate_w=sd.take("f_beta.weight").T.copy(),
        vis_gate_b=sd.take("f_beta.bias"),
        scma=attention_from(sd, "scma"),
        lang_lstm=copy_lstm_from(sd, "lang_lstm"),
        fc_w=sd.take("fc.weight").T.copy(),
        fc_b=sd.take("fc.bias"),
    )
    sd.assert_exhausted()
    return _device_tree(params)


def convert_torch_checkpoint(path: str, arch: str, out_path: str) -> str:
    """Load a torch .pth/.pth.tar checkpoint and write a params .npz.

    Accepts either a bare state_dict or the reference's training dict
    {epoch, model/state_dict, optimizer, ...} (SURVEY.md §3.3
    'Checkpointing')."""
    import torch

    from captionkit.train.checkpoint import save_params_npz

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(blob, "state_dict"):  # whole nn.Module saved
        raw = blob.state_dict()
    elif isinstance(blob, dict) and not any(
        hasattr(v, "detach") for v in blob.values()
    ):
        for key in ("state_dict", "model", "decoder"):
            if key in blob:
                raw = blob[key]
                if hasattr(raw, "state_dict"):
                    raw = raw.state_dict()
                break
        else:
            raise ValueError(
                f"could not find a state_dict in checkpoint keys "
                f"{sorted(blob)}"
            )
    else:
        raw = blob
    if arch == "dcnet":
        params = dcnet_params_from_state_dict(raw)
    elif arch == "editnet":
        params = editnet_params_from_state_dict(raw)
    else:
        raise ValueError(f"unknown arch {arch!r}")
    save_params_npz(params, out_path)
    return out_path
