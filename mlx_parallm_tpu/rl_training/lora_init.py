"""Auto-LoRA initialization on quantized models.

Parity: reference rl_training/lora_init.py:63-156 — freeze base weights,
inject rank-r LoRA on the last N layers' target projections, **zero-init
lora_b** so the adapted model initially matches the base (the reference's
garbled-output mitigation, LORA_TRAINING.md:26-45), and persist an
``initial_adapter/`` directory with ``adapters.safetensors`` +
MLX-LM-compatible ``adapter_config.json``.

TPU-native: "freezing" is structural — the optimizer only ever sees the
adapter sub-tree (see param_utils.split_adapter_params), so base weights
cannot drift.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import params as P
from ..core.loader import Model
from .param_utils import has_lora_params, is_quantized_model

logger = logging.getLogger(__name__)

DEFAULT_RANK = 16
DEFAULT_NUM_LAYERS = 8
DEFAULT_DROPOUT = 0.05
DEFAULT_SCALE = 10.0
DEFAULT_KEYS = ("self_attn.q_proj", "self_attn.v_proj")


def _linear_in_out(lin: dict, qcfg) -> tuple:
    """(in_features, out_features) of a (possibly quantized) linear dict."""
    if "weight" not in lin and "scales" in lin:
        # Kernel-layout-only linear (tiled ``wk`` without the packed
        # ``weight`` mirror): dims come from the (N, G) scales.
        gs, bits = qcfg if qcfg else (64, 4)
        s = lin["scales"]
        return s.shape[1] * gs, s.shape[0]
    w = lin["weight"]
    n = w.shape[0]
    if "scales" in lin:
        gs, bits = qcfg if qcfg else (64, 4)
        k = w.shape[1] * (32 // bits)
        return k, n
    return w.shape[1], n


def inject_lora(
    model: Model,
    *,
    rank: int = DEFAULT_RANK,
    num_layers: int = DEFAULT_NUM_LAYERS,
    scale: float = DEFAULT_SCALE,
    keys: List[str] = list(DEFAULT_KEYS),
    seed: int = 0,
) -> int:
    """Add lora_a/lora_b/lora_scale leaves to the target linears of the last
    ``num_layers`` layers. Returns the number of linears adapted."""
    layers = model.params["model"]["layers"]
    start = max(0, len(layers) - num_layers)
    key = jax.random.PRNGKey(seed)
    qcfg = None
    if model.quantization:
        qcfg = (
            model.quantization.get("group_size", 64),
            model.quantization.get("bits", 4),
        )
    n_adapted = 0
    for li in range(start, len(layers)):
        for target in keys:
            parts = target.split(".")
            node = layers[li]
            for part in parts[:-1]:
                node = node.get(part)
                if node is None:
                    break
            if node is None or parts[-1] not in node:
                continue
            lin = node[parts[-1]]
            in_f, out_f = _linear_in_out(lin, qcfg)
            key, sub = jax.random.split(key)
            # Kaiming-style init for A, zeros for B (base-preserving).
            lin["lora_a"] = (
                jax.random.normal(sub, (rank, in_f), dtype=jnp.float32)
                * (1.0 / np.sqrt(in_f))
            ).astype(jnp.bfloat16)
            lin["lora_b"] = jnp.zeros((out_f, rank), dtype=jnp.bfloat16)
            # mlx_lm semantics: the effective delta is ``scale * B @ A``
            # (NOT scale/rank) — one convention across init, adapter
            # loading (weight_updater) and merging (tools/merge_lora), so
            # checkpoints serve at the strength they trained at and
            # reference-ecosystem adapters load correctly.
            lin["lora_scale"] = jnp.float32(scale)
            n_adapted += 1
    if n_adapted:
        model.version += 1
    return n_adapted


def save_initial_adapter(
    model: Model,
    out_dir: str,
    *,
    rank: int,
    num_layers: int,
    scale: float,
    keys: List[str],
    dropout: float = DEFAULT_DROPOUT,
    save_npz: bool = False,
) -> str:
    """Write adapters.safetensors + adapter_config.json
    (parity: reference lora_init.py:128-156)."""
    os.makedirs(out_dir, exist_ok=True)
    from .param_utils import adapter_weights

    flat = adapter_weights(model.params)
    np_weights = {k: np.asarray(v, dtype=np.float32) for k, v in flat.items()}
    from safetensors.numpy import save_file

    save_file(np_weights, os.path.join(out_dir, "adapters.safetensors"))
    if save_npz:
        np.savez(os.path.join(out_dir, "adapter.npz"), **np_weights)

    adapter_config = {
        "fine_tune_type": "lora",
        "num_layers": num_layers,
        "lora_parameters": {
            "rank": rank,
            "scale": scale,
            "dropout": dropout,
            "keys": list(keys),
        },
    }
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(adapter_config, f, indent=2)
    return out_dir


def init_lora_if_needed(
    model: Model,
    output_dir: str,
    *,
    rank: int = DEFAULT_RANK,
    num_layers: int = DEFAULT_NUM_LAYERS,
    scale: float = DEFAULT_SCALE,
    keys: Optional[List[str]] = None,
    allow_unquantized: bool = False,
) -> Optional[str]:
    """If the model has no adapter params, inject zero-init LoRA and persist
    ``initial_adapter/``. Returns the adapter dir (or None if already
    adapted). Refuses non-quantized models unless overridden (parity:
    reference lora_init.py:85-88 'full-weight training not supported')."""
    if has_lora_params(model.params):
        logger.info("Model already has adapter params; skipping LoRA init")
        return None
    if not is_quantized_model(model.params) and not allow_unquantized:
        raise ValueError(
            "Auto-LoRA init requires a quantized model (full-weight training "
            "not supported); pass allow_unquantized=True to override."
        )
    keys = list(keys or DEFAULT_KEYS)
    n = inject_lora(
        model, rank=rank, num_layers=num_layers, scale=scale, keys=keys
    )
    if n == 0:
        raise ValueError("No target linears found for LoRA injection")
    adapter_dir = os.path.join(output_dir, "initial_adapter")
    save_initial_adapter(
        model, adapter_dir, rank=rank, num_layers=num_layers, scale=scale, keys=keys
    )
    logger.info("Initialized LoRA on %d linears; saved %s", n, adapter_dir)
    return adapter_dir
