"""Llama-family transformer (also serves Mistral via model_type remap).

Functional TPU-native implementation of the reference's llama module
(reference: /root/reference/mlx_parallm/models/llama.py). Capabilities matched:
GQA attention with RoPE (linear + llama3 scaling), per-row KV offsets
(reference :100-125 does this with a Python loop over rows; here it is a
vectorized position matrix), variable causal masking from cache offsets
(reference :214-223), tied or separate lm_head (reference :243-253), and
``sanitize`` dropping ``rotary_emb.inv_freq`` (reference :255-259).

Params follow HF checkpoint naming unflattened into a nested tree; quantized
linears are dicts with {weight, scales, biases} (see core/params.py).
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
    model_type: str = "llama"
    hidden_size: int = 4096
    num_hidden_layers: int = 32
    intermediate_size: int = 14336
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    rms_norm_eps: float = 1e-5
    vocab_size: int = 32000
    head_dim: Optional[int] = None
    max_position_embeddings: Optional[int] = None
    rope_theta: float = 10000.0
    rope_traditional: bool = False
    rope_scaling: Optional[Dict[str, Any]] = None
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    mlp_bias: bool = False
    quantization: Optional[Dict[str, int]] = None

    def __post_init__(self):
        if self.num_key_value_heads is None:
            self.num_key_value_heads = self.num_attention_heads

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def qcfg(self):
        if self.quantization:
            return (
                self.quantization.get("group_size", 64),
                self.quantization.get("bits", 4),
            )
        return None


def _attention_block(
    args: ModelArgs, p, x, cache: Optional[KVCache], layer: int, positions
):
    b, t, _ = x.shape
    h, hkv, d = args.num_attention_heads, args.num_key_value_heads, args.resolved_head_dim
    qcfg = args.qcfg

    if "qkv_proj" in p:
        # Load-time fused projection (one kernel launch instead of three);
        # LoRA adapters stay on the per-projection dicts and add post-hoc.
        qkv = P.linear(p["qkv_proj"], x, qcfg)
        q, k, v = jnp.split(qkv, [h * d, h * d + hkv * d], axis=-1)
        for name, part in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
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

    q = rope.apply_rope(q, positions, base=args.rope_theta, rope_scaling=args.rope_scaling)
    k = rope.apply_rope(k, positions, base=args.rope_theta, rope_scaling=args.rope_scaling)

    if cache is None:
        # Cache-free forward (training / scoring): attend within the window.
        offsets = jnp.zeros((b,), dtype=jnp.int32)
        out = attention.sdpa(q, k, v, q_offsets=offsets, scale=d**-0.5)
    else:
        out, cache = attention.update_and_attend(
            q, k, v, cache, layer, scale=d**-0.5
        )
    out = out.reshape(b, t, h * d)
    return P.linear(p["o_proj"], out, qcfg), cache


def _mlp_block(args: ModelArgs, p, x):
    qcfg = args.qcfg
    if "gate_up_proj" in p:
        gu = P.linear(p["gate_up_proj"], x, qcfg)
        gate, up = jnp.split(gu, 2, axis=-1)
        for name in ("gate_proj", "up_proj"):
            if name in p:
                delta = P.lora_delta(p[name], x)
                if delta is not None:
                    if name == "gate_proj":
                        gate = gate + delta
                    else:
                        up = up + delta
    else:
        gate = P.linear(p["gate_proj"], x, qcfg)
        up = P.linear(p["up_proj"], x, qcfg)
    return P.linear(p["down_proj"], jax.nn.silu(gate) * up, qcfg)


def apply(
    args: ModelArgs,
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cache: Optional[KVCache],
    return_hidden: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Forward pass. tokens: (B, T) int32. Returns (logits (B, T, V), cache
    with ``lengths`` advanced by T — callers with ragged rows re-adjust).
    ``cache=None`` runs a cache-free forward (training / scoring)."""
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
        x = x + _mlp_block(args, layer_p["mlp"], h)

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
        cache = cache.advance(jnp.full((tokens.shape[0],), t, dtype=jnp.int32))
    return logits, cache


def sanitize(weights: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Drop buffers not used by this implementation
    (parity: reference models/llama.py:255-259)."""
    return {k: v for k, v in weights.items() if "rotary_emb.inv_freq" not in k}


def n_kv_heads(args: ModelArgs) -> int:
    return args.num_key_value_heads


def head_dim(args: ModelArgs) -> int:
    return args.resolved_head_dim
