"""Phi-3 family: fused qkv projection, fused gate_up MLP, su-scaled long rope.

Parity: reference /root/reference/mlx_parallm/models/phi3.py — fused
``qkv_proj`` split (:56-95), fused ``gate_up_proj`` (:117-126), SuScaled
("su"/"longrope") rope support (:60-71). The reference's phi3 only supports
uniform cache offsets (:102-108); here it gets full per-row offsets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import params as P
from ..ops import attention, rope
from .base import BaseModelArgs, KVCache, make_positions
from .su_rope import SuScaledRotaryEmbedding


@dataclasses.dataclass
class ModelArgs(BaseModelArgs):
    model_type: str = "phi3"
    hidden_size: int = 3072
    num_hidden_layers: int = 32
    intermediate_size: int = 8192
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    rms_norm_eps: float = 1e-5
    vocab_size: int = 32064
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 4096
    original_max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    quantization: Optional[Dict[str, int]] = None

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads
        if self.rope_scaling:
            required = {"long_factor", "short_factor", "type"}
            if not required.issubset(self.rope_scaling.keys()):
                raise ValueError(f"rope_scaling must contain keys {required}")
            if self.rope_scaling["type"] not in ("su", "longrope"):
                raise ValueError("rope_scaling 'type' must be 'su' or 'longrope'")

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


def _make_rope(args: ModelArgs):
    if args.rope_scaling and args.rope_scaling["type"] in ("su", "longrope"):
        return SuScaledRotaryEmbedding(
            args.resolved_head_dim,
            base=args.rope_theta,
            max_position_embeddings=args.max_position_embeddings,
            original_max_position_embeddings=args.original_max_position_embeddings,
            short_factor=args.rope_scaling["short_factor"],
            long_factor=args.rope_scaling["long_factor"],
        )
    return None


def _attention_block(args: ModelArgs, p, x, cache, layer: int, positions, su):
    b, t, _ = x.shape
    h, hkv = args.num_attention_heads, args.num_key_value_heads
    d = args.resolved_head_dim
    qcfg = args.qcfg

    qkv = P.linear(p["qkv_proj"], x, qcfg)
    q, k, v = jnp.split(qkv, [h * d, h * d + hkv * d], axis=-1)
    q = q.reshape(b, t, h, d)
    k = k.reshape(b, t, hkv, d)
    v = v.reshape(b, t, hkv, d)

    if su is not None:
        q = su(q, positions)
        k = su(k, positions)
    else:
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
    su = _make_rope(args)

    x = P.embedding(model_p["embed_tokens"], tokens, qcfg)
    for i, layer_p in enumerate(model_p["layers"]):
        h = P.rms_norm(layer_p["input_layernorm"]["weight"], x, args.rms_norm_eps)
        attn_out, cache = _attention_block(
            args, layer_p["self_attn"], h, cache, i, positions, su
        )
        x = x + attn_out
        h = P.rms_norm(
            layer_p["post_attention_layernorm"]["weight"], x, args.rms_norm_eps
        )
        gate_up = P.linear(layer_p["mlp"]["gate_up_proj"], h, qcfg)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        x = x + P.linear(layer_p["mlp"]["down_proj"], jax.nn.silu(gate) * up, qcfg)


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
    return {k: v for k, v in weights.items() if "rotary_emb.inv_freq" not in k}


def n_kv_heads(args: ModelArgs) -> int:
    return args.num_key_value_heads


def head_dim(args: ModelArgs) -> int:
    return args.resolved_head_dim
