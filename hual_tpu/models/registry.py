"""Model registry.

The reference instantiates models by evaluating the config name string
(``eval(configs.model.name)``, main.py:52) — replaced with an explicit
registry so configs stay data, not code.
"""

from __future__ import annotations

from typing import Callable, Type

_REGISTRY: dict[str, type] = {}


def register_model(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY[name] = cls
        return cls
    return deco


def get_model_class(name: str) -> type:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


from hual_tpu.models.seqpan import SeqPAN  # noqa: E402

_REGISTRY.setdefault("SeqPAN", SeqPAN)
