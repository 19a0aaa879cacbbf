"""Adapter weight hot-swap: load LoRA/adapter weights into a live model.

Functional counterpart of the reference's in-place partial weight swap
(reference: /root/reference/mlx_parallm/rl_training/weight_updater.py:17-91).
Accepted artifact layouts, in order: ``adapters.safetensors`` (MLX-LM style,
with ``adapter_config.json``), ``adapter.npz``, or full ``model*.safetensors``
shards whose keys intersect the model tree.

On TPU the swap is a *functional* tree update: a brand-new params pytree is
built (device_put of only the small adapter leaves) and atomically installed
with a version bump; running decode engines pick up the new tree at the next
step boundary. No lock over the whole model is needed — concurrent readers
keep using the old tree until they re-read ``model.params``.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core import params as P

logger = logging.getLogger(__name__)

# LoRA param names in checkpoints use mlx_lm convention "...lora_a"/"lora_b";
# our tree stores them per-linear dict under the same leaf names.
_ADAPTER_SUFFIXES = ("lora_a", "lora_b", "lora_scale", "magnitude")


def _load_adapter_flat(adapter_path: str) -> Dict[str, np.ndarray]:
    """Load adapter weights from any accepted artifact layout."""
    apath = adapter_path
    candidates = []
    if os.path.isdir(apath):
        candidates = [
            os.path.join(apath, "adapters.safetensors"),
            os.path.join(apath, "adapter.npz"),
        ]
        candidates += sorted(glob.glob(os.path.join(apath, "model*.safetensors")))
    else:
        candidates = [apath]

    for cand in candidates:
        if not os.path.exists(cand):
            continue
        if cand.endswith(".npz"):
            with np.load(cand) as z:
                return {k: z[k] for k in z.files}
        if cand.endswith(".safetensors"):
            from safetensors import safe_open

            out = {}
            with safe_open(cand, framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
            return out
    raise FileNotFoundError(f"No adapter weights found under {adapter_path}")


def _read_adapter_config(adapter_path: str) -> Optional[dict]:
    if os.path.isdir(adapter_path):
        cfg = os.path.join(adapter_path, "adapter_config.json")
        if os.path.exists(cfg):
            with open(cfg) as f:
                return json.load(f)
    return None


def _normalize_key(key: str) -> str:
    """Map mlx_lm adapter keys ('model.layers.N.self_attn.q_proj.lora_a')
    into our tree addressing. They already match; strip any 'base_model.'
    PEFT-style prefixes."""
    for pre in ("base_model.model.", "base_model."):
        if key.startswith(pre):
            key = key[len(pre) :]
    key = key.replace(".lora_A.weight", ".lora_a").replace(".lora_B.weight", ".lora_b")
    key = key.replace(".lora_magnitude_vector", ".magnitude")
    return key


def apply_lora_update(model, adapter_path: str) -> int:
    """Merge adapter weights into ``model.params`` (functional swap).

    Returns the number of leaves updated. Unknown keys are skipped with a
    warning (parity with the reference's intersect-then-load_weights
    strict=False behavior)."""
    flat_new = {
        _normalize_key(k): v for k, v in _load_adapter_flat(adapter_path).items()
    }
    cfg = _read_adapter_config(adapter_path)
    scale = None
    if cfg:
        lp = cfg.get("lora_parameters", {})
        if "scale" in lp:
            scale = float(lp["scale"])

    current = P.flatten(model.params)
    updated = dict(current)
    n = 0
    touched_linears = set()
    for key, val in flat_new.items():
        arr = jnp.asarray(val, dtype=jnp.bfloat16 if np.issubdtype(val.dtype, np.floating) else None)
        if key in current or key.rsplit(".", 1)[-1] in _ADAPTER_SUFFIXES:
            updated[key] = arr
            n += 1
            if key.endswith(("lora_a", "lora_b")):
                touched_linears.add(key.rsplit(".", 1)[0])
        else:
            logger.warning("Skipping unknown adapter tensor %s", key)
    if scale is not None:
        for lin in touched_linears:
            updated[f"{lin}.lora_scale"] = jnp.float32(scale)

    # DoRA: adapters carrying per-channel magnitudes ("m" / "magnitude")
    # rescale the combined weight's columns. Precompute the effective
    # per-output scale m / ||W0 + lora_scale·B@A||_row once per swap (the
    # quantized base is dequantized transiently, per adapted linear only).
    dora_mags = {
        k: v for k, v in flat_new.items()
        if k.endswith((".m", ".magnitude"))
    }
    qz = (model.config or {}).get("quantization") or {}
    gs_bits = (int(qz.get("group_size", 64)), int(qz.get("bits", 4)))
    for mag_key, mag in dora_mags.items():
        lin = mag_key.rsplit(".", 1)[0]
        ds = _compute_dora_scale(updated, lin, np.asarray(mag, np.float32), gs_bits)
        if ds is not None:
            updated[f"{lin}.dora_scale"] = jnp.asarray(ds, dtype=jnp.bfloat16)
            n += 1

    if n:
        model.swap_params(P.unflatten(updated))
        logger.info("Applied adapter update from %s (%d tensors)", adapter_path, n)
    return n


def _compute_dora_scale(
    flat: Dict[str, Any], lin: str, mag: np.ndarray, gs_bits=(64, 4)
):
    """m / row-norm(W0 + lora_scale·B@A) for a (possibly quantized) linear."""
    from ..ops import quant

    wkey = f"{lin}.weight"
    if wkey not in flat:
        return None
    w = flat[wkey]
    if f"{lin}.scales" in flat:
        w = quant.dequantize(
            jnp.asarray(w),
            jnp.asarray(flat[f"{lin}.scales"]),
            jnp.asarray(flat[f"{lin}.biases"]),
            gs_bits[0],
            gs_bits[1],
        )
    w = np.asarray(w, np.float32)
    if f"{lin}.lora_a" in flat and f"{lin}.lora_b" in flat:
        a = np.asarray(flat[f"{lin}.lora_a"], np.float32)
        b = np.asarray(flat[f"{lin}.lora_b"], np.float32)
        s = float(np.asarray(flat.get(f"{lin}.lora_scale", 1.0), np.float32))
        w = w + s * (b @ a)
    norms = np.linalg.norm(w, axis=1)
    return mag.reshape(-1) / np.maximum(norms, 1e-8)


def apply_lora_update_for_record(record, adapter_path: str) -> int:
    """Update a server registry record's model + adapter_path
    (parity: reference weight_updater.py:81-91)."""
    n = apply_lora_update(record.model_instance, adapter_path)
    record.adapter_path = adapter_path
    return n
