"""Rotary position embeddings with per-sequence position offsets.

TPU-native replacement for MLX ``nn.RoPE(offset=...)`` plus the reference's
per-row offset loop (reference: /root/reference/mlx_parallm/models/llama.py:100-125).
Here offsets are a vector and the rotation is fully vectorized over the batch —
no Python loop over rows.

Supports: plain RoPE, linear scaling, and Llama-3 frequency scaling
(reference: /root/reference/mlx_parallm/models/llama.py:36-46).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def compute_inv_freq(dims: int, base: float, rope_scaling: Optional[dict] = None):
    """Per-dimension inverse frequencies, with optional llama3-style scaling."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dims, 2, dtype=jnp.float32) / dims))
    if rope_scaling:
        rtype = rope_scaling.get("type") or rope_scaling.get("rope_type")
        if rtype == "linear":
            inv_freq = inv_freq / float(rope_scaling["factor"])
        elif rtype == "llama3":
            factor = float(rope_scaling.get("factor", 8.0))
            low_factor = float(rope_scaling.get("low_freq_factor", 1.0))
            high_factor = float(rope_scaling.get("high_freq_factor", 4.0))
            orig_ctx = float(
                rope_scaling.get("original_max_position_embeddings", 8192)
            )
            wavelens = 2 * math.pi / inv_freq
            low_wl = orig_ctx / low_factor
            high_wl = orig_ctx / high_factor
            smooth = (orig_ctx / wavelens - low_factor) / (high_factor - low_factor)
            scaled = jnp.where(
                wavelens > low_wl,
                inv_freq / factor,
                jnp.where(
                    wavelens < high_wl,
                    inv_freq,
                    inv_freq / ((1 - smooth) + smooth * factor) * 1.0,
                ),
            )
            # mid band: interpolate between scaled and unscaled
            mid = (1 - smooth) * inv_freq / factor + smooth * inv_freq
            scaled = jnp.where(
                (wavelens <= low_wl) & (wavelens >= high_wl), mid, scaled
            )
            inv_freq = scaled
    return inv_freq


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    *,
    base: float = 10000.0,
    inv_freq: Optional[jnp.ndarray] = None,
    rope_scaling: Optional[dict] = None,
    attn_scale: float = 1.0,
) -> jnp.ndarray:
    """Apply non-interleaved (HF rotate-half) RoPE.

    ``x``: (B, T, H, D); ``positions``: (B, T) absolute positions per token.
    ``attn_scale`` multiplies cos/sin (used by su-scaled long rope).
    """
    b, t, h, d = x.shape
    if inv_freq is None:
        inv_freq = compute_inv_freq(d, base, rope_scaling)
    theta = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, D/2)
    cos = (jnp.cos(theta) * attn_scale)[:, :, None, :]  # (B, T, 1, D/2)
    sin = (jnp.sin(theta) * attn_scale)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    out = jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    )
    return out.astype(x.dtype)
