"""Adapter checkpointing (parity: reference rl_training/checkpoint.py).

Artifact layout is byte-compatible with the reference so its inspector /
resume flows work unchanged: ``metadata.json`` at the checkpoint root
(:16-40), ``step_N/`` dirs containing ``adapters.safetensors`` (+ optional
``adapter.npz``), ``adapter_config.json``, and ``adapter.json`` step metadata
(:62-162). Additionally (beyond the reference, which never persists optimizer
state — SURVEY §5) the Adam state can be saved for true resume.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
import pickle
import shutil
from typing import Any, Dict, Optional

import numpy as np


def save_checkpoint(
    checkpoint_dir: str,
    step: int,
    config: Any,
    adapter_path: Optional[str] = None,
) -> str:
    """Write root metadata.json (parity: reference checkpoint.py:16-40)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    if dataclasses.is_dataclass(config):
        config = dataclasses.asdict(config)
    metadata = {
        "step": step,
        "created_at": datetime.datetime.now().isoformat(),
        "config": config,
        "adapter_path": adapter_path,
    }
    path = os.path.join(checkpoint_dir, "metadata.json")
    with open(path, "w") as f:
        json.dump(metadata, f, indent=2)
    return path


def save_adapter_checkpoint(
    checkpoint_dir: str,
    step: int,
    adapter_weights: Dict[str, Any],
    *,
    source_adapter_dir: Optional[str] = None,
    lora_config: Optional[dict] = None,
    save_npz: bool = False,
    optimizer_state: Any = None,
) -> str:
    """Write ``step_N/`` with adapters.safetensors + adapter_config.json +
    adapter.json (parity: reference checkpoint.py:62-162)."""
    step_dir = os.path.join(checkpoint_dir, f"step_{step}")
    os.makedirs(step_dir, exist_ok=True)

    np_weights = {
        k: np.asarray(v, dtype=np.float32) for k, v in adapter_weights.items()
    }
    from safetensors.numpy import save_file

    save_file(np_weights, os.path.join(step_dir, "adapters.safetensors"))
    if save_npz:
        np.savez(os.path.join(step_dir, "adapter.npz"), **np_weights)

    # adapter_config.json: copy from source, else synthesize from config.
    cfg_path = os.path.join(step_dir, "adapter_config.json")
    copied = False
    if source_adapter_dir:
        src = os.path.join(source_adapter_dir, "adapter_config.json")
        if os.path.exists(src):
            shutil.copy(src, cfg_path)
            copied = True
    if not copied:
        cfg = lora_config or {
            "fine_tune_type": "lora",
            "lora_parameters": {"rank": 16, "scale": 10.0, "dropout": 0.05},
        }
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=2)

    meta = {
        "step": step,
        "created_at": datetime.datetime.now().isoformat(),
        "num_tensors": len(np_weights),
        "format": "safetensors",
    }
    with open(os.path.join(step_dir, "adapter.json"), "w") as f:
        json.dump(meta, f, indent=2)

    if optimizer_state is not None:
        import jax

        host_state = jax.device_get(optimizer_state)
        with open(os.path.join(step_dir, "optimizer_state.pkl"), "wb") as f:
            pickle.dump(host_state, f)
    return step_dir


def load_optimizer_state(step_dir: str):
    path = os.path.join(step_dir, "optimizer_state.pkl")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_step_dir(checkpoint_dir: str) -> Optional[str]:
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = []
    for name in os.listdir(checkpoint_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    if not steps:
        return None
    steps.sort()
    return os.path.join(checkpoint_dir, steps[-1][1])
