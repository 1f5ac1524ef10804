"""Model factory: name -> (init, apply) pair.

Equivalent of /root/reference/models/master.py:9-46, minus the hard-coded
"cuda:0" device placement (device layout is the mesh's concern here) and the
global cfg singleton. The reference forces cholesky=True iff dataset==ADP
(:32); callers encode that in ModelConfig.cholesky.
"""

from __future__ import annotations

from typing import Callable, Tuple

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.models.comformer import (ecomformer_apply, ecomformer_init,
                                          icomformer_apply, icomformer_init)

_REGISTRY = {
    "cartnet": (cartnet_init, cartnet_apply),
    "ecomformer": (ecomformer_init, ecomformer_apply),
    "icomformer": (icomformer_init, icomformer_apply),
}


def create_model(cfg: ModelConfig) -> Tuple[Callable, Callable]:
    name = cfg.name.lower()
    if name not in _REGISTRY:
        raise ValueError(f"model '{cfg.name}' not implemented; "
                         f"available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def register_model(name: str, init: Callable, apply: Callable):
    """Plugin point for new model families (the reference has no registry)."""
    _REGISTRY[name.lower()] = (init, apply)
