"""Adapter parameter identification + tree partitioning.

Parity: reference rl_training/param_utils.py:10-55 (name-keyword adapter
identification, grad zeroing, adapter extraction). TPU-native difference: the
optimizer runs on the *adapter sub-tree only* (a partitioned pytree), so
non-adapter grads are never computed in the first place; ``zero_non_adapter_
grads`` is kept for API parity and safety.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..core import params as P

ADAPTER_KEYWORDS: Tuple[str, ...] = ("lora", "adapter", "dora", "magnitude")


def is_adapter_param(name: str) -> bool:
    low = name.lower()
    return any(k in low for k in ADAPTER_KEYWORDS)


def split_adapter_params(params: Dict[str, Any]):
    """Partition a nested param tree into (adapter_flat, frozen_flat)."""
    flat = P.flatten(params)
    adapter = {k: v for k, v in flat.items() if is_adapter_param(k)}
    frozen = {k: v for k, v in flat.items() if not is_adapter_param(k)}
    return adapter, frozen


def merge_adapter_params(adapter_flat: Dict[str, Any], frozen_flat: Dict[str, Any]):
    merged = dict(frozen_flat)
    merged.update(adapter_flat)
    return P.unflatten(merged)


def zero_non_adapter_grads(grads_flat: Dict[str, Any]) -> Dict[str, Any]:
    """Safety: zero gradients of any non-adapter leaves
    (parity: reference param_utils.py:25-38)."""
    return {
        k: (g if is_adapter_param(k) else jnp.zeros_like(g))
        for k, g in grads_flat.items()
    }


def adapter_weights(params: Dict[str, Any]) -> Dict[str, Any]:
    """Extract adapter-only weights (flat names) for checkpointing.
    ``lora_scale`` scalars are config, not weights — excluded."""
    adapter, _ = split_adapter_params(params)
    return {k: v for k, v in adapter.items() if not k.endswith("lora_scale")}


def has_lora_params(params: Dict[str, Any]) -> bool:
    return any(is_adapter_param(k) for k in P.flatten(params))


def is_quantized_model(params: Dict[str, Any]) -> bool:
    """Heuristic parity with reference lora_init.py:26-43 (scans for
    quantization scale params)."""
    return any(k.endswith(".scales") for k in P.flatten(params))
