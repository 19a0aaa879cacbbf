"""Mixtral MoE family.

Parity: reference /root/reference/mlx_parallm/models/mixtral.py — top-k router
with softmax over the selected experts' scores (:108-119), SwitchGLU expert
MLPs, and ``sanitize`` stacking per-expert HF ``w1/w2/w3`` weights into
batched ``switch_mlp.{gate,down,up}_proj`` tensors including quantized
scales/biases (:198-215). The reference's mixtral only supports uniform
cache offsets; here it gets full per-row offsets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import params as P
from ..ops import attention, rope
from . import switch_layers
from .base import BaseModelArgs, KVCache, make_positions


@dataclasses.dataclass
class ModelArgs(BaseModelArgs):
    model_type: str = "mixtral"
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    intermediate_size: int = 14336
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    vocab_size: int = 32000
    rope_theta: float = 1000000.0
    num_local_experts: int = 8
    num_experts_per_tok: int = 2
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    quantization: Optional[Dict[str, int]] = None

    @property
    def resolved_head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def qcfg(self):
        if self.quantization:
            return (
                self.quantization.get("group_size", 64),
                self.quantization.get("bits", 4),
            )
        return None


def _attention_block(args: ModelArgs, p, x, cache, layer: int, positions):
    b, t, _ = x.shape
    h, hkv = args.num_attention_heads, args.num_key_value_heads
    d = args.resolved_head_dim
    qcfg = args.qcfg

    q = P.linear(p["q_proj"], x, qcfg).reshape(b, t, h, d)
    k = P.linear(p["k_proj"], x, qcfg).reshape(b, t, hkv, d)
    v = P.linear(p["v_proj"], x, qcfg).reshape(b, t, hkv, d)

    q = rope.apply_rope(q, positions, base=args.rope_theta)
    k = rope.apply_rope(k, positions, base=args.rope_theta)

    if cache is None:
        offsets = jnp.zeros((b,), dtype=jnp.int32)
        out = attention.sdpa(q, k, v, q_offsets=offsets, scale=d**-0.5)
    else:
        out, cache = attention.update_and_attend(
            q, k, v, cache, layer, scale=d**-0.5
        )
    out = out.reshape(b, t, h * d)
    return P.linear(p["o_proj"], out, qcfg), cache


def _moe_block(args: ModelArgs, p, x):
    """Top-k routed expert MLP (parity: reference mixtral.py:96-135)."""
    qcfg = args.qcfg
    k = args.num_experts_per_tok
    gates = P.linear(p["gate"], x, None).astype(jnp.float32)  # router stays fp
    scores, indices = jax.lax.top_k(gates, k)  # (..., k)
    weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    expert_out = switch_layers.switch_glu(
        p["switch_mlp"], x, indices, qcfg
    )  # (..., k, N)
    return jnp.sum(expert_out * weights[..., None], axis=-2)


def apply(
    args: ModelArgs,
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cache: Optional[KVCache],
    return_hidden: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    qcfg = args.qcfg
    model_p = params["model"]
    b, t = tokens.shape
    if cache is None:
        positions = make_positions(jnp.zeros((b,), dtype=jnp.int32), t)
    else:
        positions = make_positions(cache.lengths, t)

    x = P.embedding(model_p["embed_tokens"], tokens, qcfg)
    for i, layer_p in enumerate(model_p["layers"]):
        h = P.rms_norm(layer_p["input_layernorm"]["weight"], x, args.rms_norm_eps)
        attn_out, cache = _attention_block(
            args, layer_p["self_attn"], h, cache, i, positions
        )
        x = x + attn_out
        h = P.rms_norm(
            layer_p["post_attention_layernorm"]["weight"], x, args.rms_norm_eps
        )
        x = x + _moe_block(args, layer_p["block_sparse_moe"], h)


    x = P.rms_norm(model_p["norm"]["weight"], x, args.rms_norm_eps)
    if return_hidden:
        if cache is not None:
            cache = cache.advance(jnp.full((b,), t, dtype=jnp.int32))
        return x, cache
    if "lm_head" in params:
        logits = P.linear(params["lm_head"], x, qcfg)
    else:
        logits = P.embedding_as_linear(model_p["embed_tokens"], x, qcfg)
    if cache is not None:
        cache = cache.advance(jnp.full((b,), t, dtype=jnp.int32))
    return logits, cache


def sanitize(weights: Dict[str, Any]) -> Dict[str, Any]:
    """Stack per-expert HF weights ``experts.N.w1/w2/w3`` into batched
    ``switch_mlp.{gate,down,up}_proj`` tensors incl. quantized scales/biases
    (parity: reference mixtral.py:198-215). Pre-stacked MLX checkpoints pass
    through unchanged."""
    if not any("experts.0.w1" in k for k in weights):
        return {k: v for k, v in weights.items() if "rotary_emb.inv_freq" not in k}

    out: Dict[str, Any] = {}
    for k, v in weights.items():
        if "rotary_emb.inv_freq" in k or ".experts." in k:
            continue
        out[k] = v

    mapping = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}
    # Group expert tensors: prefix...block_sparse_moe.experts.<e>.<wX>.<leaf>
    layers = set()
    for k in weights:
        if ".experts.0.w1." in k:
            layers.add(k.split(".block_sparse_moe.")[0])
    for lp in sorted(layers):
        n_experts = 0
        while f"{lp}.block_sparse_moe.experts.{n_experts}.w1.weight" in weights:
            n_experts += 1
        for wname, proj in mapping.items():
            for leaf in ("weight", "scales", "biases"):
                key0 = f"{lp}.block_sparse_moe.experts.0.{wname}.{leaf}"
                if key0 not in weights:
                    continue
                stacked = np.stack(
                    [
                        np.asarray(
                            weights[
                                f"{lp}.block_sparse_moe.experts.{e}.{wname}.{leaf}"
                            ]
                        )
                        for e in range(n_experts)
                    ]
                )
                out[f"{lp}.block_sparse_moe.switch_mlp.{proj}.{leaf}"] = stacked
    return out


def n_kv_heads(args: ModelArgs) -> int:
    return args.num_key_value_heads


def head_dim(args: ModelArgs) -> int:
    return args.resolved_head_dim
