"""Su-scaled (long) rotary embeddings for Phi-3.

Parity: reference /root/reference/mlx_parallm/models/su_rope.py:7-79 — dual
inverse-frequency tables (short_factor / long_factor), switching to the long
factors when ``offset + L`` exceeds ``original_max_position_embeddings``, with
cos/sin scaled by ``sqrt(1 + log(max/orig) / log(orig))``.

TPU-native difference: the factor switch must be jit-friendly, so both tables
are computed and selected with ``jnp.where`` on the (traced) max position.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax.numpy as jnp


class SuScaledRotaryEmbedding:
    def __init__(
        self,
        dims: int,
        base: float = 10000.0,
        max_position_embeddings: int = 131072,
        original_max_position_embeddings: int = 4096,
        short_factor: Optional[List[float]] = None,
        long_factor: Optional[List[float]] = None,
    ):
        self.dims = dims
        self.base = base
        self.original_max = original_max_position_embeddings
        freqs = base ** (jnp.arange(0, dims, 2, dtype=jnp.float32) / dims)
        short = jnp.asarray(short_factor or [1.0] * (dims // 2), jnp.float32)
        long = jnp.asarray(long_factor or [1.0] * (dims // 2), jnp.float32)
        self._inv_freq_short = 1.0 / (short * freqs)
        self._inv_freq_long = 1.0 / (long * freqs)
        scale = max_position_embeddings / original_max_position_embeddings
        if scale <= 1.0:
            self.scaling_factor = 1.0
        else:
            self.scaling_factor = math.sqrt(
                1 + math.log(scale) / math.log(original_max_position_embeddings)
            )

    def __call__(self, x: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, H, D); positions: (B, T) absolute positions."""
        b, t, h, d = x.shape
        max_pos = jnp.max(positions) + 1
        use_long = max_pos > self.original_max
        inv_freq = jnp.where(use_long, self._inv_freq_long, self._inv_freq_short)
        theta = positions[..., None].astype(jnp.float32) * inv_freq
        cos = (jnp.cos(theta) * self.scaling_factor)[:, :, None, :]
        sin = (jnp.sin(theta) * self.scaling_factor)[:, :, None, :]
        x1 = x[..., : d // 2].astype(jnp.float32)
        x2 = x[..., d // 2 :].astype(jnp.float32)
        out = jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )
        return out.astype(x.dtype)
