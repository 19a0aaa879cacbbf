"""Functional parameter trees + layer apply functions.

The framework represents model weights as plain nested pytrees (dicts / lists
of jax arrays) mirroring HF/MLX checkpoint naming, instead of stateful module
objects. This is the idiomatic JAX shape: params flow through ``jit``/``pjit``
explicitly, sharding is annotated on the tree, and LoRA/adapter hot-swap is a
functional tree update (no in-place mutation under a lock as in the reference —
see /root/reference/mlx_parallm/rl_training/weight_updater.py:17-91).

A linear layer is a dict with:
  * float:     {"weight": (N, K) [, "bias": (N,)]}
  * quantized: {"weight": packed uint32, "scales": (N, G), "biases": (N, G)
                [, "q8": unpacked int8 mirror (N, K)]}
  * + LoRA:    {"lora_a": (r, K), "lora_b": (N, r), "lora_scale": scalar}
Quantization hyperparams (group_size/bits) are static model config, matching
the reference's config.json contract ({"quantization": {group_size, bits}}).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from ..ops import qmm, quant

QuantCfg = Optional[Tuple[int, int]]  # (group_size, bits)


def is_quantized_layer(p: Dict[str, Any]) -> bool:
    return "scales" in p


def linear(p: Dict[str, Any], x: jnp.ndarray, qcfg: QuantCfg = None) -> jnp.ndarray:
    """Apply a (possibly quantized, possibly LoRA-augmented) linear layer."""
    if is_quantized_layer(p):
        gs, bits = qcfg if qcfg else (quant.DEFAULT_GROUP_SIZE, quant.DEFAULT_BITS)
        # Per-layer group size from the scales' width: the per-column
        # repack (loader ``quant_layout="column"``) stores G == 1 scales
        # (group == the whole input dim) while the model config still says
        # the wire-format group size.
        g = p["scales"].shape[-1]
        if g * gs != x.shape[-1] and x.shape[-1] % g == 0:
            gs = x.shape[-1] // g
        y = qmm.qmm(
            x,
            p.get("weight"),
            p["scales"],
            p["biases"],
            group_size=gs,
            bits=bits,
            q_int8=p.get("q8"),
            q_kernel=p.get("wk"),
            q_scales_t=p.get("sk"),
            q_biases_t=p.get("bk"),
        )
        # Vocab-padded kernel mirrors (quant.plan_n_tile) emit extra
        # all-zero rows; slice back to the checkpoint width.
        n_orig = p["scales"].shape[0]
        if y.shape[-1] != n_orig:
            y = y[..., :n_orig]
    else:
        y = x @ p["weight"].T.astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    if "lora_a" in p:
        scale = p.get("lora_scale", jnp.float32(1.0))
        delta = (x @ p["lora_a"].T.astype(x.dtype)) @ p["lora_b"].T.astype(x.dtype)
        y = y + delta * scale.astype(y.dtype)
    if "dora_scale" in p:
        # DoRA: per-output-channel magnitude rescale m / ||W0 + scale·BA||,
        # precomputed at adapter load (see rl_training/weight_updater.py).
        y = y * p["dora_scale"].astype(y.dtype)
    return y


def lora_delta(p: Dict[str, Any], x: jnp.ndarray) -> Optional[jnp.ndarray]:
    """The LoRA contribution of a linear's adapter leaves, or None.

    Used by fused-projection paths: the base matmul runs on a fused weight
    while adapters stay attached to the original per-projection dicts."""
    if "lora_a" not in p:
        return None
    scale = p.get("lora_scale", jnp.float32(1.0))
    delta = (x @ p["lora_a"].T.astype(x.dtype)) @ p["lora_b"].T.astype(x.dtype)
    return delta * scale.astype(x.dtype)


def embedding(p: Dict[str, Any], ids: jnp.ndarray, qcfg: QuantCfg = None) -> jnp.ndarray:
    """Token embedding lookup; supports MLX-style quantized embeddings."""
    if is_quantized_layer(p):
        gs, bits = qcfg if qcfg else (quant.DEFAULT_GROUP_SIZE, quant.DEFAULT_BITS)
        rows = jnp.take(p["weight"], ids, axis=0)
        sc = jnp.take(p["scales"], ids, axis=0)
        bi = jnp.take(p["biases"], ids, axis=0)
        return quant.dequantize(rows, sc, bi, gs, bits, dtype=jnp.bfloat16)
    return jnp.take(p["weight"], ids, axis=0)


def embedding_as_linear(p: Dict[str, Any], x: jnp.ndarray, qcfg: QuantCfg = None):
    """Tied-embedding lm_head projection (``x @ E^T``)."""
    return linear({k: v for k, v in p.items() if k != "bias"}, x, qcfg)


def rms_norm(w: jnp.ndarray, x: jnp.ndarray, eps: float, plus_one: bool = False):
    xf = x.astype(jnp.float32)
    nrm = xf * jnp.reciprocal(
        jnp.sqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    )
    wf = w.astype(jnp.float32)
    if plus_one:
        wf = 1.0 + wf
    return (nrm * wf).astype(x.dtype)


_LAYER_RE = re.compile(r"^(\d+)$")


def unflatten(flat: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
    """'model.layers.0.self_attn.q_proj.weight' -> nested dicts with integer
    list indices for 'layers.N'."""
    nested: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        cur = nested
        for i, part in enumerate(parts[:-1]):
            nxt_is_idx = _LAYER_RE.match(parts[i + 1]) is not None if i + 1 < len(parts) else False
            if _LAYER_RE.match(part):
                idx = int(part)
                while len(cur) <= idx:
                    cur.append({})
                cur = cur[idx]
            else:
                if part not in cur:
                    cur[part] = [] if nxt_is_idx else {}
                cur = cur[part]
        last = parts[-1]
        if _LAYER_RE.match(last) and isinstance(cur, list):
            idx = int(last)
            while len(cur) <= idx:
                cur.append(None)
            cur[idx] = val
        else:
            cur[last] = val
    return nested


def flatten(nested: Any, prefix: str = "") -> Dict[str, jnp.ndarray]:
    flat: Dict[str, jnp.ndarray] = {}
    if isinstance(nested, dict):
        for k, v in nested.items():
            flat.update(flatten(v, f"{prefix}{k}."))
    elif isinstance(nested, (list, tuple)):
        for i, v in enumerate(nested):
            flat.update(flatten(v, f"{prefix}{i}."))
    else:
        flat[prefix[:-1]] = nested
    return flat
