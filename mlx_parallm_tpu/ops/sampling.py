"""Vectorized batched sampling: greedy / temperature / top-p, per-row params.

Replaces the reference's sampler closure + top_p_sampling (reference:
/root/reference/mlx_parallm/utils.py:345-364,
/root/reference/mlx_parallm/sample_utils.py:3-38) with a fully vectorized,
jit-friendly implementation where every row of the batch carries its own
temperature / top_p / RNG stream — fixing the reference's "params from the
first request in the batch" limitation (SURVEY §7.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sample_tokens(
    logits: jnp.ndarray,
    key: jax.Array,
    temps: jnp.ndarray,
    top_ps: jnp.ndarray,
    logit_bias: Optional[jnp.ndarray] = None,
):
    """Sample one token per row.

    logits: (B, V) float; temps/top_ps: (B,); logit_bias: optional (B, V)
    additive bias. Rows with ``temps == 0`` take argmax. Returns
    (tokens (B,), logprobs (B,)) where logprobs are log-softmax values of the
    chosen token under the (biased, untempered) distribution.
    """
    if logit_bias is not None:
        logits = logits + logit_bias
    logits = logits.astype(jnp.float32)
    b, v = logits.shape

    base_logprobs = jax.nn.log_softmax(logits, axis=-1)

    # Temperature (guard zero for the greedy rows).
    safe_t = jnp.where(temps > 0, temps, 1.0)[:, None]
    scaled = logits / safe_t

    # Per-row top-p filtering in sorted order.
    sort_idx = jnp.argsort(-scaled, axis=-1)
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # Keep tokens while the cumulative mass *before* them is < top_p
    # (always keeps the top token).
    keep = (cum - sorted_probs) < top_ps[:, None]
    filtered_sorted = jnp.where(keep, sorted_logits, NEG_INF)

    gumbel = jax.random.gumbel(key, (b, v), dtype=jnp.float32)
    sampled_pos = jnp.argmax(filtered_sorted + gumbel, axis=-1)
    sampled = jnp.take_along_axis(sort_idx, sampled_pos[:, None], axis=-1)[:, 0]

    greedy = jnp.argmax(logits, axis=-1)
    tokens = jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)
    logprobs = jnp.take_along_axis(base_logprobs, tokens[:, None], axis=-1)[:, 0]
    return tokens, logprobs


def top_p_sampling(logits, top_p: float, temperature: float, key):
    """Single-distribution top-p sampling (library-API parity with the
    reference's ``sample_utils.top_p_sampling``)."""
    if logits.ndim == 1:
        logits = logits[None, :]
    b = logits.shape[0]
    temps = jnp.full((b,), temperature, dtype=jnp.float32)
    tps = jnp.full((b,), top_p, dtype=jnp.float32)
    tokens, _ = sample_tokens(logits, key, temps, tps)
    return tokens
