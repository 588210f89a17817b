"""Model registry: config.arch -> ModelDef."""

from __future__ import annotations

from captionkit.models import dcnet, editnet
from captionkit.models.base import ModelDef
from captionkit.utils.config import ModelConfig

_REGISTRY = {
    "dcnet": dcnet.make_model,
    "editnet": editnet.make_model,
}


def get_model(cfg: ModelConfig) -> ModelDef:
    try:
        factory = _REGISTRY[cfg.arch]
    except KeyError:
        raise KeyError(
            f"unknown model arch {cfg.arch!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return factory(cfg)
