"""MoE expert compute: batched expert-indexed (quantized) matmuls.

TPU-native replacement for MLX's ``gather_mm`` / ``gather_qmm``
(reference: /root/reference/mlx_parallm/models/switch_layers.py:58-67,101).
The reference relies on fused gather+matmul primitives; XLA has no direct
equivalent, so expert compute is expressed as an einsum over stacked expert
weights plus a top-k selection — static shapes, MXU-batched over experts
(dense-dispatch; a megablocks-style ragged kernel is the planned upgrade for
large expert counts).

Weight layout matches the reference exactly: stacked ``(num_experts, N, K)``
tensors (quantized: packed weight + per-expert scales/biases), produced by
``mixtral.sanitize`` from per-expert HF checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import params as P
from ..ops import quant

QuantCfg = Optional[Tuple[int, int]]


def _dequant_stacked(p: Dict[str, Any], qcfg: QuantCfg, dtype) -> jnp.ndarray:
    """(E, N, K) float expert weights from a possibly quantized stack."""
    if "scales" in p:
        gs, bits = qcfg if qcfg else (64, 4)
        return quant.dequantize(
            p["weight"], p["scales"], p["biases"], gs, bits, dtype=dtype
        )
    return p["weight"].astype(dtype)


def switch_linear(
    p: Dict[str, Any],
    x: jnp.ndarray,
    indices: jnp.ndarray,
    qcfg: QuantCfg = None,
) -> jnp.ndarray:
    """Expert-indexed linear: out[..., j, :] = x[...] @ W[indices[..., j]]^T.

    x: (..., K); indices: (..., top_k) int expert ids. Returns
    (..., top_k, N). Dense-dispatch: computes all experts batched on the MXU
    and gathers by one-hot — exact and static-shaped.
    """
    *lead, k = x.shape
    top_k = indices.shape[-1]
    xf = x.reshape(-1, k)
    idx = indices.reshape(-1, top_k)
    w = _dequant_stacked(p, qcfg, x.dtype)  # (E, N, K)
    e = w.shape[0]
    # (T, K) x (E, N, K) -> (T, E, N)
    all_out = jnp.einsum("tk,enk->ten", xf, w)
    onehot = jax.nn.one_hot(idx, e, dtype=x.dtype)  # (T, top_k, E)
    out = jnp.einsum("tje,ten->tjn", onehot, all_out)
    return out.reshape(*lead, top_k, w.shape[1])


def switch_glu(
    p: Dict[str, Any],
    x: jnp.ndarray,
    indices: jnp.ndarray,
    qcfg: QuantCfg = None,
    activation=jax.nn.silu,
) -> jnp.ndarray:
    """SwitchGLU (parity: reference switch_layers.py:117-143):
    down( act(gate(x)) * up(x) ) with expert-indexed projections."""
    gate = switch_linear(p["gate_proj"], x, indices, qcfg)
    up = switch_linear(p["up_proj"], x, indices, qcfg)
    return switch_mlp_down(p, activation(gate) * up, indices, qcfg)


def switch_mlp_down(p, h, indices, qcfg):
    """Down-projection applied per already-selected expert.

    h: (..., top_k, F); indices: (..., top_k). Returns (..., top_k, N)."""
    *lead, top_k, f = h.shape
    hf = h.reshape(-1, top_k, f)
    idx = indices.reshape(-1, top_k)
    w = _dequant_stacked(p["down_proj"], qcfg, h.dtype)  # (E, N, F)
    e = w.shape[0]
    all_out = jnp.einsum("tjf,enf->tjen", hf, w)
    onehot = jax.nn.one_hot(idx, e, dtype=h.dtype)  # (T, top_k, E)
    out = jnp.einsum("tje,tjen->tjn", onehot, all_out)
    return out.reshape(*lead, top_k, w.shape[1])
