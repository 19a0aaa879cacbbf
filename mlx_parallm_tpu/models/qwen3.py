"""Qwen3 family: llama-style blocks + per-head q/k RMSNorm.

Parity: reference /root/reference/mlx_parallm/models/qwen3.py — attention with
q_norm/k_norm applied on the head dimension (:42-43,65-71), explicit
``head_dim`` config, per-row KV offsets + variable masks like llama
(:74-96,168-177), tied or separate lm_head with ``sanitize`` popping
``lm_head.weight`` when tied (:211-214).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import params as P
from ..ops import attention, rope
from .base import BaseModelArgs, KVCache, make_positions


@dataclasses.dataclass
class ModelArgs(BaseModelArgs):
    model_type: str = "qwen3"
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    intermediate_size: int = 11008
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    vocab_size: int = 151936
    max_position_embeddings: Optional[int] = None
    rope_theta: float = 1000000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    tie_word_embeddings: bool = False
    quantization: Optional[Dict[str, int]] = None

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
    h, hkv, d = args.num_attention_heads, args.num_key_value_heads, args.head_dim
    qcfg = args.qcfg

    if "qkv_proj" in p:
        # Load-time fused projection (see llama.py); LoRA deltas post-split.
        qkv = P.linear(p["qkv_proj"], x, qcfg)
        q, k, v = jnp.split(qkv, [h * d, h * d + hkv * d], axis=-1)
        for name in ("q_proj", "k_proj", "v_proj"):
            if name in p:
                delta = P.lora_delta(p[name], x)
                if delta is not None:
                    if name == "q_proj":
                        q = q + delta
                    elif name == "k_proj":
                        k = k + delta
                    else:
                        v = v + delta
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, hkv, d)
        v = v.reshape(b, t, hkv, d)
    else:
        q = P.linear(p["q_proj"], x, qcfg).reshape(b, t, h, d)
        k = P.linear(p["k_proj"], x, qcfg).reshape(b, t, hkv, d)
        v = P.linear(p["v_proj"], x, qcfg).reshape(b, t, hkv, d)

    # Per-head RMSNorm (the Qwen3 signature feature).
    q = P.rms_norm(p["q_norm"]["weight"], q, args.rms_norm_eps)
    k = P.rms_norm(p["k_norm"]["weight"], k, args.rms_norm_eps)

    q = rope.apply_rope(q, positions, base=args.rope_theta, rope_scaling=args.rope_scaling)
    k = rope.apply_rope(k, positions, base=args.rope_theta, rope_scaling=args.rope_scaling)

    if cache is None:
        offsets = jnp.zeros((b,), dtype=jnp.int32)
        out = attention.sdpa(q, k, v, q_offsets=offsets, scale=d**-0.5)
    else:
        out, cache = attention.update_and_attend(
            q, k, v, cache, layer, scale=d**-0.5
        )
    out = out.reshape(b, t, h * d)
    return P.linear(p["o_proj"], out, qcfg), cache


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
        mlp_p = layer_p["mlp"]
        if "gate_up_proj" in mlp_p:
            gu = P.linear(mlp_p["gate_up_proj"], h, qcfg)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = P.linear(mlp_p["gate_proj"], h, qcfg)
            up = P.linear(mlp_p["up_proj"], h, qcfg)
        x = x + P.linear(mlp_p["down_proj"], jax.nn.silu(gate) * up, qcfg)


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


def sanitize(weights: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Drop rotary buffers; drop lm_head when embeddings are tied
    (parity: reference qwen3.py:211-214)."""
    return {k: v for k, v in weights.items() if "rotary_emb.inv_freq" not in k}


def n_kv_heads(args: ModelArgs) -> int:
    return args.num_key_value_heads


def head_dim(args: ModelArgs) -> int:
    return args.head_dim
