"""Batched causal attention over a static-capacity KV slab with per-row offsets.

TPU-native replacement for ``mx.fast.scaled_dot_product_attention`` + the
reference's variable additive mask (reference:
/root/reference/mlx_parallm/models/base.py:17-40,
/root/reference/mlx_parallm/models/llama.py:130-141). Instead of building a
(B, N, S) additive mask on the host, validity is computed from per-row offset
vectors inside the jitted op, with static shapes throughout (XLA requirement).

The XLA path below is the universal implementation; a Pallas flash-decode
kernel slots in behind the same signature for long-context TPU serving.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_offsets: jnp.ndarray,
    scale: float,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Grouped-query causal attention.

    q: (B, T, Hq, D); k, v: (B, S, Hkv, D) KV slab (may be larger than the
    valid region); q_offsets: (B,) absolute position of the first query token
    per row. Query token i of row b may attend kv slots s where
    ``s <= q_offsets[b] + i``. Returns (B, T, Hq, D).
    """
    b, t, hq, d = q.shape
    _, s, hkv, _ = k.shape
    assert hq % hkv == 0
    rep = hq // hkv

    # Keep K/V in their storage dtype (bf16) — the MXU accumulates in fp32
    # via preferred_element_type, so casting the whole slab to fp32 (which
    # doubles HBM traffic and materializes fp32 copies) is unnecessary.
    qg = (q * scale).reshape(b, t, hkv, rep, d)
    scores = jnp.einsum(
        "bthrd,bshd->bhrts", qg, k, preferred_element_type=jnp.float32
    )
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap

    kv_pos = jnp.arange(s)[None, None, :]  # (1, 1, S)
    q_pos = q_offsets[:, None, None] + jnp.arange(t)[None, :, None]  # (B, T, 1)
    valid = kv_pos <= q_pos
    if sliding_window is not None:
        valid &= kv_pos > q_pos - sliding_window
    scores = jnp.where(valid[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    # Probabilities in bf16 for the PV matmul (standard flash-attention
    # practice) — avoids upcasting the V slab to fp32.
    out = jnp.einsum(
        "bhrts,bshd->bthrd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, hq, d).astype(q.dtype)
