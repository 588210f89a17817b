"""Torch checkpoint -> captionkit parameter pytree (SURVEY.md §8.1 step 5).

Name mapping follows the tutorial-family module layout documented in
convert.torch_ref (the expected reference checkpoint shape; real released
checkpoints must be re-verified against this map when the mount is fixed —
SURVEY.md §0 citation-backfill note). The module names are an overridable
*data table* (DEFAULT_NAME_MAPS + a JSON/dict override), so fitting a real
checkpoint layout is a data edit, not a code change (VERDICT r1 #5).
Conversion rules:

* torch Linear weight [out, in] -> transposed [in, out].
* torch LSTM gate blocks stay in (i, f, g, o) order; bias_ih + bias_hh sum
  into one bias (identical math).
* additive attention: our single in-tanh bias b := encoder_att.bias +
  decoder_att.bias; full_att.bias shifts every score by a constant and is
  softmax-invariant, so it is checked-and-dropped.
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from captionkit.nn.attention import AdditiveAttentionParams
from captionkit.nn.cells import CopyLSTMParams, LSTMParams

# -- name-map indirection ----------------------------------------------------
# Logical component -> checkpoint module prefix. '__'-keys customize
# cross-cutting conventions: a global key prefix to strip, LSTM leaf names,
# attention sub-module names. Override any subset via `name_map=` (or the
# CLI's --name-map JSON file).

_COMMON = {
    "__strip_prefix__": "",
    "__lstm_wih__": "weight_ih",
    "__lstm_whh__": "weight_hh",
    "__lstm_bih__": "bias_ih",
    "__lstm_bhh__": "bias_hh",
    "__att_enc__": "encoder_att",
    "__att_dec__": "decoder_att",
    "__att_full__": "full_att",
    "__linear_w__": "weight",
    "__linear_b__": "bias",
    "__ignore_prefixes__": [],
}

DEFAULT_NAME_MAPS: dict[str, dict[str, object]] = {
    "dcnet": {
        **_COMMON,
        "embedding": "embedding.weight",
        "encoder": "encoder",
        "attention": "attention",
        "gate": "f_beta",
        "decoder": "decode_step",
        "fc": "fc",
        "init_h": "init_h",
        "init_c": "init_c",
        # Visual variant (cfg.dcnet_use_visual): converted when the
        # checkpoint carries the module, absent otherwise.
        "vis_attention": "vis_attention",
    },
    "editnet": {
        **_COMMON,
        "embedding": "embedding.weight",
        "encoder": "encoder",
        "att_lstm": "att_lstm",
        "vis_attention": "vis_attention",
        "vis_gate": "f_beta",
        "scma": "scma",
        "lang_lstm": "lang_lstm",
        "lang_lstm.base": "base",
        "lang_lstm.wrx": "weight_rx",
        "lang_lstm.wrh": "weight_rh",
        "lang_lstm.wrc": "weight_rc",
        "lang_lstm.br": "bias_r",
        "fc": "fc",
    },
}


def resolve_name_map(
    arch: str, override: Optional[Mapping[str, object]] = None
) -> dict[str, object]:
    """Default map for `arch`, with `override` entries layered on top."""
    if arch not in DEFAULT_NAME_MAPS:
        raise ValueError(f"unknown arch {arch!r}")
    out = dict(DEFAULT_NAME_MAPS[arch])
    if override:
        unknown = set(override) - set(out)
        if unknown:
            raise KeyError(
                f"name-map override has unknown entries {sorted(unknown)}; "
                f"valid entries: {sorted(out)}"
            )
        out.update(override)
    return out


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

    def __init__(self, raw: Mapping[str, object], strip_prefix: str = ""):
        if strip_prefix:
            raw = {
                (k[len(strip_prefix):] if k.startswith(strip_prefix) else k):
                    v
                for k, v in raw.items()
            }
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


def lstm_from(sd: StateDict, prefix: str, nm: Mapping[str, object]
              ) -> LSTMParams:
    wih = sd.take(f"{prefix}.{nm['__lstm_wih__']}")
    whh = sd.take(f"{prefix}.{nm['__lstm_whh__']}")
    b = (sd.take(f"{prefix}.{nm['__lstm_bih__']}")
         + sd.take(f"{prefix}.{nm['__lstm_bhh__']}"))
    return LSTMParams(wx=wih.T.copy(), wh=whh.T.copy(), b=b)


def _linear(sd: StateDict, prefix: str, nm: Mapping[str, object]):
    return (sd.take(f"{prefix}.{nm['__linear_w__']}").T.copy(),
            sd.take(f"{prefix}.{nm['__linear_b__']}"))


def attention_from(sd: StateDict, prefix: str, nm: Mapping[str, object]
                   ) -> AdditiveAttentionParams:
    w, b = nm["__linear_w__"], nm["__linear_b__"]
    w_enc = sd.take(f"{prefix}.{nm['__att_enc__']}.{w}").T.copy()
    b_enc = sd.take(f"{prefix}.{nm['__att_enc__']}.{b}")
    w_q = sd.take(f"{prefix}.{nm['__att_dec__']}.{w}").T.copy()
    b_q = sd.take(f"{prefix}.{nm['__att_dec__']}.{b}")
    v = sd.take(f"{prefix}.{nm['__att_full__']}.{w}").reshape(-1)
    # softmax-invariant score shift: checked-and-dropped
    sd.take_optional(f"{prefix}.{nm['__att_full__']}.{b}")
    return AdditiveAttentionParams(w_enc=w_enc, w_q=w_q, v=v, b=b_enc + b_q)


def copy_lstm_from(sd: StateDict, prefix: str, nm: Mapping[str, object]
                   ) -> CopyLSTMParams:
    base = lstm_from(sd, f"{prefix}.{nm['lang_lstm.base']}", nm)
    return CopyLSTMParams(
        base=base,
        wrx=sd.take(f"{prefix}.{nm['lang_lstm.wrx']}").T.copy(),
        wrh=sd.take(f"{prefix}.{nm['lang_lstm.wrh']}").T.copy(),
        wrc=sd.take(f"{prefix}.{nm['lang_lstm.wrc']}").T.copy(),
        br=sd.take(f"{prefix}.{nm['lang_lstm.br']}"),
    )


def dcnet_params_from_state_dict(
    raw: Mapping[str, object],
    name_map: Optional[Mapping[str, object]] = None,
):
    from captionkit.models.dcnet import DCNetParams

    nm = resolve_name_map("dcnet", name_map)
    sd = StateDict(raw, strip_prefix=str(nm["__strip_prefix__"]))
    gate_w, gate_b = _linear(sd, str(nm["gate"]), nm)
    fc_w, fc_b = _linear(sd, str(nm["fc"]), nm)
    init_h_w, init_h_b = _linear(sd, str(nm["init_h"]), nm)
    init_c_w, init_c_b = _linear(sd, str(nm["init_c"]), nm)
    # Visual variant: convert the module when the checkpoint has it
    # (cfg.dcnet_use_visual decides at model-build time; a text-only
    # checkpoint simply lacks these keys).
    vis_prefix = f"{nm['vis_attention']}.{nm['__att_enc__']}"
    has_visual = any(k.startswith(vis_prefix + ".") for k in sd.raw)
    params = DCNetParams(
        embedding=sd.take(str(nm["embedding"])),
        encoder=lstm_from(sd, str(nm["encoder"]), nm),
        attention=attention_from(sd, str(nm["attention"]), nm),
        gate_w=gate_w,
        gate_b=gate_b,
        decoder=lstm_from(sd, str(nm["decoder"]), nm),
        fc_w=fc_w,
        fc_b=fc_b,
        vis_attention=(attention_from(sd, str(nm["vis_attention"]), nm)
                       if has_visual else None),
        init_h_w=init_h_w,
        init_c_w=init_c_w,
        init_h_b=init_h_b,
        init_c_b=init_c_b,
    )
    sd.assert_exhausted(tuple(nm["__ignore_prefixes__"]))
    return _device_tree(params)


def editnet_params_from_state_dict(
    raw: Mapping[str, object],
    name_map: Optional[Mapping[str, object]] = None,
):
    from captionkit.models.editnet import EditNetParams

    nm = resolve_name_map("editnet", name_map)
    sd = StateDict(raw, strip_prefix=str(nm["__strip_prefix__"]))
    vis_gate_w, vis_gate_b = _linear(sd, str(nm["vis_gate"]), nm)
    fc_w, fc_b = _linear(sd, str(nm["fc"]), nm)
    params = EditNetParams(
        embedding=sd.take(str(nm["embedding"])),
        encoder=lstm_from(sd, str(nm["encoder"]), nm),
        att_lstm=lstm_from(sd, str(nm["att_lstm"]), nm),
        vis_attention=attention_from(sd, str(nm["vis_attention"]), nm),
        vis_gate_w=vis_gate_w,
        vis_gate_b=vis_gate_b,
        scma=attention_from(sd, str(nm["scma"]), nm),
        lang_lstm=copy_lstm_from(sd, str(nm["lang_lstm"]), nm),
        fc_w=fc_w,
        fc_b=fc_b,
    )
    sd.assert_exhausted(tuple(nm["__ignore_prefixes__"]))
    return _device_tree(params)


def load_torch_state_dict(path: str) -> Mapping[str, object]:
    """Load a torch .pth/.pth.tar checkpoint and return its state dict.

    Accepts either a bare state_dict, a whole saved nn.Module, or the
    reference's training dict {epoch, model/state_dict/decoder, optimizer,
    ...} (SURVEY.md §3.3 'Checkpointing')."""
    import torch

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
    return raw


def params_from_state_dict(
    raw: Mapping[str, object],
    arch: str,
    name_map: Optional[Mapping[str, object]] = None,
):
    if arch == "dcnet":
        return dcnet_params_from_state_dict(raw, name_map)
    if arch == "editnet":
        return editnet_params_from_state_dict(raw, name_map)
    raise ValueError(f"unknown arch {arch!r}")


def convert_torch_checkpoint(
    path: str,
    arch: str,
    out_path: str,
    name_map: Optional[Mapping[str, object]] = None,
) -> str:
    """torch checkpoint file -> params .npz file (one-step conversion)."""
    from captionkit.train.checkpoint import save_params_npz

    raw = load_torch_state_dict(path)
    params = params_from_state_dict(raw, arch, name_map)
    save_params_npz(params, out_path)
    return out_path
