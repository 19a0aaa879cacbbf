"""Model-family registry: config ``model_type`` -> implementation module.

Mirrors the reference's importlib dispatch + remap table
(reference: /root/reference/mlx_parallm/utils.py:33-67).
"""

from __future__ import annotations

import importlib

MODEL_REMAPPING = {
    "mistral": "llama",  # mistral is compatible with llama
    "qwen2": "llama",  # qwen2 layout matches llama with attention bias
}


def get_model_module(model_type: str):
    model_type = MODEL_REMAPPING.get(model_type, model_type)
    try:
        return importlib.import_module(f"mlx_parallm_tpu.models.{model_type}")
    except ImportError as e:
        raise ValueError(f"Model type {model_type} not supported.") from e
