"""Gemma family.

Parity: reference /root/reference/mlx_parallm/models/gemma.py — RMSNorm with
``1 + weight`` (:24-31), embeddings scaled by ``hidden_size ** 0.5`` (:141),
GELU MLP, tied embeddings as lm head (:170). The reference's gemma only
supports uniform cache offsets (:71-74); here gemma gets the same per-row
offset support as every other family (strict upgrade).
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
    model_type: str = "gemma"
    hidden_size: int = 2048
    num_hidden_layers: int = 18
    intermediate_size: int = 16384
    num_attention_heads: int = 8
    num_key_value_heads: int = 1
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    vocab_size: int = 256000
    rope_theta: float = 10000.0
    rope_traditional: bool = False
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
    x = x * jnp.asarray(args.hidden_size**0.5, dtype=x.dtype)  # gemma scaling

    for i, layer_p in enumerate(model_p["layers"]):
        h = P.rms_norm(
            layer_p["input_layernorm"]["weight"], x, args.rms_norm_eps, plus_one=True
        )
        attn_out, cache = _attention_block(
            args, layer_p["self_attn"], h, cache, i, positions
        )
        x = x + attn_out
        h = P.rms_norm(
            layer_p["post_attention_layernorm"]["weight"],
            x,
            args.rms_norm_eps,
            plus_one=True,
        )
        gate = P.linear(layer_p["mlp"]["gate_proj"], h, qcfg)
        up = P.linear(layer_p["mlp"]["up_proj"], h, qcfg)
        x = x + P.linear(
            layer_p["mlp"]["down_proj"],
            jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(x.dtype) * up,
            qcfg,
        )


    x = P.rms_norm(model_p["norm"]["weight"], x, args.rms_norm_eps, plus_one=True)
    if return_hidden:
        if cache is not None:
            cache = cache.advance(jnp.full((b,), t, dtype=jnp.int32))
        return x, cache
    # Gemma always ties embeddings as the lm head (reference gemma.py:170).
    logits = P.embedding_as_linear(model_p["embed_tokens"], x, qcfg)
    if cache is not None:
        cache = cache.advance(jnp.full((b,), t, dtype=jnp.int32))
    return logits, cache


def sanitize(weights: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {
        k: v
        for k, v in weights.items()
        if "rotary_emb.inv_freq" not in k and not k.startswith("lm_head")
    }


def n_kv_heads(args: ModelArgs) -> int:
    return args.num_key_value_heads


def head_dim(args: ModelArgs) -> int:
    return args.head_dim
