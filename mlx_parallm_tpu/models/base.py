"""Model-layer foundations: config base + static-capacity KV cache slab.

TPU-native redesign of the reference's cache hierarchy (reference:
/root/reference/mlx_parallm/models/base.py:42-149). The reference grows caches
by concatenating 256-token zero blocks and loops over batch rows in Python for
per-row offsets; under XLA both are non-starters (dynamic shapes / host loops).
Here the cache is ONE preallocated slab per K and V,

    k, v: (num_layers, B, n_kv_heads, capacity, head_dim)

with a per-row ``lengths`` vector. Writes use a vmapped
``lax.dynamic_update_slice`` at each row's own offset — the static-shape
equivalent of the reference's ``PagedKVCache.update_and_fetch`` — and validity
is enforced in the attention mask from ``lengths``/offsets, replacing the
host-built (B, N, S) additive masks of ``create_additive_causal_mask_variable``
(reference: /root/reference/mlx_parallm/models/base.py:17-40).

The slab layout is chosen for the hardware: heads ahead of positions makes
each head's (S, D) plane one contiguous HBM region — the flash-decode
Pallas kernel streams whole (SBLK, D) blocks with zero striding — and
``n_kv_heads`` maps onto the tensor-parallel mesh axis so decode attention
stays local per TP rank.
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class BaseModelArgs:
    @classmethod
    def from_dict(cls, params: Dict[str, Any]):
        """Filter a config.json dict down to this dataclass's fields
        (parity with reference models/base.py:151-161)."""
        sig = inspect.signature(cls)
        return cls(**{k: v for k, v in params.items() if k in sig.parameters})


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Static-capacity batched KV slab with per-row valid lengths.

    ``k``/``v``: (L, B, H_kv, S, D). ``lengths``: (B,) int32 — number of valid
    cache entries per row; equivalently, the absolute position offset at which
    the next token of that row will be written.
    """

    k: jax.Array
    v: jax.Array
    lengths: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def n_kv_heads(self) -> int:
        return self.k.shape[2]

    @staticmethod
    def init(
        num_layers: int,
        batch_size: int,
        capacity: int,
        n_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (num_layers, batch_size, n_kv_heads, capacity, head_dim)
        return KVCache(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            lengths=jnp.zeros((batch_size,), dtype=jnp.int32),
        )

    def update_layer(
        self, layer: int, k_new: jax.Array, v_new: jax.Array
    ) -> "KVCache":
        """Write (B, T, H, D) new keys/values at each row's current offset.

        Does NOT advance ``lengths`` — the model apply advances once per
        forward via ``advance`` so every layer writes at the same offsets.

        Decode steps (T == 1) use a broadcast masked write — a contiguous
        elementwise pass XLA fuses well — instead of a vmapped
        ``dynamic_update_slice`` (which lowers to a slow scatter on TPU).
        Prefill (T > 1) keeps the per-row dynamic slice path.
        """
        t = k_new.shape[1]
        k_new = k_new.transpose(0, 2, 1, 3)  # (B, H, T, D) slab order
        v_new = v_new.transpose(0, 2, 1, 3)
        if t == 1:
            sel = (
                jnp.arange(self.capacity)[None, :] == self.lengths[:, None]
            )[:, None, :, None]  # (B, 1, S, 1)
            k_l = jnp.where(sel, k_new.astype(self.k.dtype), self.k[layer])
            v_l = jnp.where(sel, v_new.astype(self.v.dtype), self.v[layer])
        else:

            def write_row(buf_row, new_row, off):
                # buf_row: (H, S, D); new_row: (H, T, D)
                return jax.lax.dynamic_update_slice(buf_row, new_row, (0, off, 0))

            k_l = jax.vmap(write_row)(
                self.k[layer], k_new.astype(self.k.dtype), self.lengths
            )
            v_l = jax.vmap(write_row)(
                self.v[layer], v_new.astype(self.v.dtype), self.lengths
            )
        return KVCache(
            k=self.k.at[layer].set(k_l),
            v=self.v.at[layer].set(v_l),
            lengths=self.lengths,
        )

    def advance(self, step_lengths: jax.Array) -> "KVCache":
        """Advance per-row valid lengths by ``step_lengths`` (B,) tokens."""
        return KVCache(k=self.k, v=self.v, lengths=self.lengths + step_lengths)

    def layer_raw(self, layer: int):
        """Raw slab views for attention: (k (B,H,S,D), v, k_scale, v_scale)
        — scales are None for the float cache."""
        return self.k[layer], self.v[layer], None, None

    def layer_view(self, layer: int):
        """(k, v) dense slabs for attention: (B, H, S, D) each."""
        return self.k[layer], self.v[layer]

    def select_rows(self, row_idx: jax.Array) -> "KVCache":
        return KVCache(
            k=self.k[:, row_idx], v=self.v[:, row_idx], lengths=self.lengths[row_idx]
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedKVCache:
    """INT8-quantized KV slab with per-(position, head) scales.

    North-star capability absent from the reference (BASELINE.json config #5):
    halves KV memory so a chip holds 2x the context/batch. Keys/values are
    quantized along the head dimension at write time
    (``scale = max|x| / 127``) and dequantized in the attention read path.

    Same interface as :class:`KVCache` (``update_layer`` / ``advance`` /
    ``layer_view`` / ``lengths``), so engines and models are storage-agnostic.
    """

    k: jax.Array  # int8 (L, B, H, S, D)
    v: jax.Array
    k_scale: jax.Array  # bf16 (L, B, H, S)
    v_scale: jax.Array
    lengths: jax.Array

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]

    @property
    def n_kv_heads(self) -> int:
        return self.k.shape[2]

    @staticmethod
    def init(
        num_layers: int,
        batch_size: int,
        capacity: int,
        n_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "QuantizedKVCache":
        shape = (num_layers, batch_size, n_kv_heads, capacity, head_dim)
        sshape = shape[:-1]
        return QuantizedKVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape, dtype=jnp.int8),
            k_scale=jnp.zeros(sshape, dtype=jnp.bfloat16),
            v_scale=jnp.zeros(sshape, dtype=jnp.bfloat16),
            lengths=jnp.zeros((batch_size,), dtype=jnp.int32),
        )

    @staticmethod
    def _quantize(x: jax.Array):
        """x: (B, H, T, D) float -> (int8 values, (B, H, T) scales)."""
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        return q, scale.astype(jnp.bfloat16)

    def update_layer(
        self, layer: int, k_new: jax.Array, v_new: jax.Array
    ) -> "QuantizedKVCache":
        t = k_new.shape[1]
        kq, ks = self._quantize(k_new.transpose(0, 2, 1, 3))  # (B, H, T, D)
        vq, vs = self._quantize(v_new.transpose(0, 2, 1, 3))
        if t == 1:
            # Broadcast masked write (see KVCache.update_layer).
            sel2 = (
                jnp.arange(self.capacity)[None, :] == self.lengths[:, None]
            )  # (B, S)
            sel4 = sel2[:, None, :, None]
            k_l = jnp.where(sel4, kq, self.k[layer])
            v_l = jnp.where(sel4, vq, self.v[layer])
            ks_l = jnp.where(sel2[:, None, :], ks, self.k_scale[layer])
            vs_l = jnp.where(sel2[:, None, :], vs, self.v_scale[layer])
        else:

            def write_row(buf_row, new_row, off):
                # (H, S, D) <- (H, T, D) at position off
                return jax.lax.dynamic_update_slice(buf_row, new_row, (0, off, 0))

            def write_row_s(buf_row, new_row, off):
                # (H, S) <- (H, T)
                return jax.lax.dynamic_update_slice(buf_row, new_row, (0, off))

            k_l = jax.vmap(write_row)(self.k[layer], kq, self.lengths)
            v_l = jax.vmap(write_row)(self.v[layer], vq, self.lengths)
            ks_l = jax.vmap(write_row_s)(self.k_scale[layer], ks, self.lengths)
            vs_l = jax.vmap(write_row_s)(self.v_scale[layer], vs, self.lengths)
        return QuantizedKVCache(
            k=self.k.at[layer].set(k_l),
            v=self.v.at[layer].set(v_l),
            k_scale=self.k_scale.at[layer].set(ks_l),
            v_scale=self.v_scale.at[layer].set(vs_l),
            lengths=self.lengths,
        )

    def advance(self, step_lengths: jax.Array) -> "QuantizedKVCache":
        return QuantizedKVCache(
            k=self.k,
            v=self.v,
            k_scale=self.k_scale,
            v_scale=self.v_scale,
            lengths=self.lengths + step_lengths,
        )

    def layer_raw(self, layer: int):
        """Raw int8 slab views + scales for the fused attention read path:
        (k int8 (B,H,S,D), v int8, k_scale (B,H,S), v_scale). The int8 slab
        is NEVER dequantized to a bf16 slab in HBM — the flash-decode kernel
        folds the scales into its score/probability rows in VMEM."""
        return (
            self.k[layer],
            self.v[layer],
            self.k_scale[layer],
            self.v_scale[layer],
        )

    def layer_view(self, layer: int):
        """Dequantized (k, v) slabs for attention: (B, H, S, D) bf16.

        Fallback path only (prefill / non-TPU); the decode hot loop uses
        ``layer_raw`` + the fused kernel."""
        k = self.k[layer].astype(jnp.bfloat16) * self.k_scale[layer][..., None]
        v = self.v[layer].astype(jnp.bfloat16) * self.v_scale[layer][..., None]
        return k, v


def make_positions(offsets: jax.Array, t: int) -> jax.Array:
    """(B,) offsets -> (B, T) absolute positions for a length-T step."""
    return offsets[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
