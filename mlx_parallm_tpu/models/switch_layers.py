"""MoE expert compute: grouped per-expert (quantized) matmuls.

TPU-native replacement for MLX's ``gather_mm`` / ``gather_qmm``
(reference: /root/reference/mlx_parallm/models/switch_layers.py:58-67,101).

Design: a static loop over experts, each expert a single (quantized) matmul
over the tokens routed to it, wrapped in ``lax.cond`` so an expert with NO
routed tokens is skipped at runtime — its weights are never read from HBM
(decode batches hit only a few experts, so weight traffic tracks the routed
set, which is what ``gather_qmm`` buys the reference). Quantized expert
weights stay packed end-to-end: each expert's matmul goes through the
``ops.qmm`` dispatch (Pallas fused dequant-matmul on TPU, grouped-int8 /
dequant fallbacks elsewhere), so peak memory is bounded by ONE expert's
weights — the (E, N, K) float stack is never materialized (round-1
verdict item: dense dispatch dequantized the whole stack per forward).

Weight layout matches the reference exactly: stacked ``(num_experts, N, K)``
tensors (quantized: packed weight + per-expert scales/biases), produced by
``mixtral.sanitize`` from per-expert HF checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import params as P
from ..ops import qmm, quant

QuantCfg = Optional[Tuple[int, int]]


def _expert_dims(p: Dict[str, Any], qcfg: QuantCfg) -> Tuple[int, int]:
    """(num_experts, out_features) of a stacked expert linear."""
    if "scales" in p:
        return p["scales"].shape[0], p["scales"].shape[1]
    return p["weight"].shape[0], p["weight"].shape[1]


def _expert_matmul(p: Dict[str, Any], e: int, xf: jnp.ndarray, qcfg: QuantCfg):
    """One expert's ``xf @ W_e^T`` with weights consumed in packed form."""
    if "scales" in p:
        gs, bits = qcfg if qcfg else (
            quant.DEFAULT_GROUP_SIZE, quant.DEFAULT_BITS
        )
        return qmm.qmm(
            xf,
            p["weight"][e] if "weight" in p else None,
            p["scales"][e],
            p["biases"][e],
            group_size=gs,
            bits=bits,
            q_int8=p["q8"][e] if "q8" in p else None,
            q_kernel=p["wk3"][e] if "wk3" in p else None,
            # Mirrors make the kernel path differentiable (training) and
            # serve kernel-layout-only trees off-TPU.
            q_scales_t=p["sk3"][e] if "sk3" in p else None,
            q_biases_t=p["bk3"][e] if "bk3" in p else None,
        )
    return xf @ p["weight"][e].T.astype(xf.dtype)


def switch_linear(
    p: Dict[str, Any],
    x: jnp.ndarray,
    indices: jnp.ndarray,
    qcfg: QuantCfg = None,
) -> jnp.ndarray:
    """Expert-indexed linear: out[..., j, :] = x[...] @ W[indices[..., j]]^T.

    x: (..., K); indices: (..., top_k) int expert ids. Returns
    (..., top_k, N). Grouped dispatch: one masked matmul per expert,
    runtime-skipped (lax.cond) when no token routes to it.
    """
    *lead, k = x.shape
    top_k = indices.shape[-1]
    xf = x.reshape(-1, k)
    idx = indices.reshape(-1, top_k)
    t = xf.shape[0]
    e, n = _expert_dims(p, qcfg)
    out = jnp.zeros((t, top_k, n), dtype=x.dtype)
    for ei in range(e):
        hit = idx == ei  # (T, top_k)

        def compute(ei=ei):
            return _expert_matmul(p, ei, xf, qcfg).astype(x.dtype)

        y = jax.lax.cond(
            jnp.any(hit),
            compute,
            lambda: jnp.zeros((t, n), dtype=x.dtype),
        )
        out = out + jnp.where(hit[..., None], y[:, None, :], 0)
    return out.reshape(*lead, top_k, n)


RAGGED_MIN_ROWS = 64  # decode-size batches keep the cond-skip path


def _ragged_ok(pp: Dict[str, Any], k: int, qcfg: QuantCfg) -> bool:
    from ..ops import qmm_ragged

    if "wk3" not in pp or "sk3" not in pp:
        return False
    gs, bits = qcfg if qcfg else (
        quant.DEFAULT_GROUP_SIZE, quant.DEFAULT_BITS
    )
    return qmm_ragged.supported(k, pp["wk3"].shape, gs, bits)


def switch_glu(
    p: Dict[str, Any],
    x: jnp.ndarray,
    indices: jnp.ndarray,
    qcfg: QuantCfg = None,
    activation=jax.nn.silu,
) -> jnp.ndarray:
    """SwitchGLU (parity: reference switch_layers.py:117-143):
    down( act(gate(x)) * up(x) ) with expert-indexed projections.

    Prefill-shaped inputs on TPU take the ragged grouped-matmul kernel
    (ops/qmm_ragged.py — FLOPs proportional to T*top_k, one sort shared by
    gate/up/down); decode-shaped inputs keep the per-expert cond-skip path
    (weight traffic already tracks the routed set there)."""
    *lead, k = x.shape
    top_k = indices.shape[-1]
    n_rows = 1
    for d in lead:
        n_rows *= d
    n_rows *= top_k
    f = None
    if "sk3" in p.get("gate_proj", {}):
        f = p["gate_proj"]["sk3"].shape[2]
    use_ragged = (
        n_rows >= RAGGED_MIN_ROWS
        and jax.default_backend() == "tpu"
        and f is not None
        and _ragged_ok(p["gate_proj"], k, qcfg)
        and _ragged_ok(p["up_proj"], k, qcfg)
        and _ragged_ok(p["down_proj"], f, qcfg)
    )
    if use_ragged:
        return switch_glu_ragged(p, x, indices, qcfg, activation)
    gate = switch_linear(p["gate_proj"], x, indices, qcfg)
    up = switch_linear(p["up_proj"], x, indices, qcfg)
    return switch_mlp_down(p, activation(gate) * up, indices, qcfg)


def switch_glu_ragged(
    p: Dict[str, Any],
    x: jnp.ndarray,
    indices: jnp.ndarray,
    qcfg: QuantCfg = None,
    activation=jax.nn.silu,
    interpret: bool = False,
) -> jnp.ndarray:
    """SwitchGLU via the ragged grouped kernel: one expert-sort shared by
    gate/up/down (identical routing), sorted/padded rows flowing through
    all three matmuls, one unsort at the end."""
    from ..ops import qmm_ragged

    gs, bits = qcfg if qcfg else (
        quant.DEFAULT_GROUP_SIZE, quant.DEFAULT_BITS
    )
    *lead, k = x.shape
    top_k = indices.shape[-1]
    xf = x.reshape(-1, k)
    ids = indices.reshape(-1)  # row r = (token r//top_k, slot r%top_k)
    x_rows = jnp.repeat(xf, top_k, axis=0)
    e_cnt = p["gate_proj"]["sk3"].shape[0]

    def dims(pp):
        _, _, kw, nt = pp["wk3"].shape
        g = pp["sk3"].shape[1]
        return kw, nt, g

    tm = min(
        qmm_ragged.choose_tm(x_rows.shape[0], *dims(p["gate_proj"]), bits),
        qmm_ragged.choose_tm(x_rows.shape[0], *dims(p["up_proj"]), bits),
        qmm_ragged.choose_tm(x_rows.shape[0], *dims(p["down_proj"]), bits),
    )
    layout = qmm_ragged.make_layout(ids, e_cnt, tm)
    x_pad = qmm_ragged.pad_rows(layout, x_rows)

    def run(pp, rows):
        return qmm_ragged.ragged_qmm_padded(
            rows, layout.e_of_tile, pp["wk3"], pp["sk3"], pp["bk3"],
            group_size=gs, bits=bits, tm=tm, interpret=interpret,
        )

    gate = run(p["gate_proj"], x_pad)
    up = run(p["up_proj"], x_pad)
    h_pad = (activation(gate) * up).astype(x.dtype)
    y_pad = run(p["down_proj"], h_pad)
    y = qmm_ragged.unpad_rows(layout, y_pad).astype(x.dtype)
    return y.reshape(*lead, top_k, y.shape[-1])


def switch_mlp_down(p, h, indices, qcfg):
    """Down-projection applied per already-selected expert.

    h: (..., top_k, F); indices: (..., top_k). Returns (..., top_k, N)."""
    *lead, top_k, f = h.shape
    hf = h.reshape(-1, f)  # (T*top_k, F) — slot j of token t at t*top_k+j
    idx = indices.reshape(-1)  # (T*top_k,)
    rows = hf.shape[0]
    pd = p["down_proj"]
    e, n = _expert_dims(pd, qcfg)
    out = jnp.zeros((rows, n), dtype=h.dtype)
    for ei in range(e):
        hit = idx == ei

        def compute(ei=ei):
            return _expert_matmul(pd, ei, hf, qcfg).astype(h.dtype)

        y = jax.lax.cond(
            jnp.any(hit),
            compute,
            lambda: jnp.zeros((rows, n), dtype=h.dtype),
        )
        out = out + jnp.where(hit[:, None], y, 0)
    return out.reshape(*lead, top_k, n)


# ------------------------------------------------------- dense reference


def switch_linear_dense(
    p: Dict[str, Any],
    x: jnp.ndarray,
    indices: jnp.ndarray,
    qcfg: QuantCfg = None,
) -> jnp.ndarray:
    """Round-1 dense-dispatch implementation (computes EVERY expert for
    every token from a dequantized (E, N, K) stack). Kept as the numerics
    reference for tests."""
    *lead, k = x.shape
    top_k = indices.shape[-1]
    xf = x.reshape(-1, k)
    idx = indices.reshape(-1, top_k)
    if "scales" in p:
        gs, bits = qcfg if qcfg else (
            quant.DEFAULT_GROUP_SIZE, quant.DEFAULT_BITS
        )
        w = quant.dequantize(
            p["weight"], p["scales"], p["biases"], gs, bits, dtype=x.dtype
        )
    else:
        w = p["weight"].astype(x.dtype)
    e = w.shape[0]
    all_out = jnp.einsum("tk,enk->ten", xf, w)
    onehot = jax.nn.one_hot(idx, e, dtype=x.dtype)
    out = jnp.einsum("tje,ten->tjn", onehot, all_out)
    return out.reshape(*lead, top_k, w.shape[1])
