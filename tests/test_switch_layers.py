"""Grouped MoE dispatch tests: the per-expert grouped path (packed weights,
runtime expert skipping) must match the dense-dispatch reference that
computes every expert from a dequantized stack."""

import numpy as np

import jax
import jax.numpy as jnp

from mlx_parallm_tpu.models import switch_layers as SL
from mlx_parallm_tpu.ops import quant


def _stacked_quantized(e, n, k, gs=16, bits=4, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((e, n, k)).astype(np.float32) * 0.1
    packed, scales, biases = [], [], []
    for i in range(e):
        p, s, b = quant.quantize(jnp.asarray(w[i]), group_size=gs, bits=bits)
        packed.append(p)
        scales.append(s)
        biases.append(b)
    return {
        "weight": jnp.stack(packed),
        "scales": jnp.stack(scales),
        "biases": jnp.stack(biases),
    }


def test_grouped_matches_dense_quantized():
    e, n, k, top_k, t = 4, 32, 64, 2, 6
    p = _stacked_quantized(e, n, k)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, (t, top_k)), jnp.int32)
    qcfg = (16, 4)
    dense = SL.switch_linear_dense(p, x, idx, qcfg)
    grouped = SL.switch_linear(p, x, idx, qcfg)
    np.testing.assert_allclose(
        np.asarray(dense, np.float32),
        np.asarray(grouped, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_grouped_matches_dense_float():
    e, n, k, top_k, t = 3, 16, 32, 2, 5
    rng = np.random.default_rng(2)
    p = {"weight": jnp.asarray(rng.standard_normal((e, n, k)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, (t, top_k)), jnp.int32)
    dense = SL.switch_linear_dense(p, x, idx, None)
    grouped = SL.switch_linear(p, x, idx, None)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(grouped), rtol=1e-4, atol=1e-4
    )


def test_unrouted_expert_contributes_nothing():
    """All tokens route to expert 0; experts 1.. are runtime-skipped and
    must not affect the output (their cond branch returns zeros)."""
    e, n, k, t = 4, 16, 32, 4
    rng = np.random.default_rng(3)
    w = rng.standard_normal((e, n, k)).astype(np.float32)
    p = {"weight": jnp.asarray(w)}
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    idx = jnp.zeros((t, 1), jnp.int32)
    out = SL.switch_linear(p, x, idx, None)
    expected = np.asarray(x, np.float32) @ w[0].T
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), expected, rtol=1e-4, atol=1e-4
    )
    # Poisoning unused experts with NaN must not leak into the output —
    # their matmuls run (if at all) behind a cond whose result is unused.
    w_bad = w.copy()
    w_bad[1:] = np.nan
    p_bad = {"weight": jnp.asarray(w_bad)}
    out_bad = SL.switch_linear(p_bad, x, idx, None)
    assert np.isfinite(np.asarray(out_bad)).all()


def test_switch_glu_grouped():
    e, f, k, top_k, t = 4, 48, 32, 2, 5
    rng = np.random.default_rng(4)
    p = {
        "gate_proj": _stacked_quantized(e, f, k, seed=5),
        "up_proj": _stacked_quantized(e, f, k, seed=6),
        "down_proj": _stacked_quantized(e, k, f, seed=7),
    }
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, (t, top_k)), jnp.int32)
    qcfg = (16, 4)
    out = SL.switch_glu(p, x, idx, qcfg)
    assert out.shape == (t, top_k, k)
    # Reference composition via the dense path.
    gate = SL.switch_linear_dense(p["gate_proj"], x, idx, qcfg)
    up = SL.switch_linear_dense(p["up_proj"], x, idx, qcfg)
    h = jax.nn.silu(gate) * up
    # Dense down: per-slot expert application.
    import dataclasses

    down_dense = []
    w = quant.dequantize(
        p["down_proj"]["weight"],
        p["down_proj"]["scales"],
        p["down_proj"]["biases"],
        16,
        4,
        dtype=jnp.float32,
    )
    hn = np.asarray(h, np.float32)
    idxn = np.asarray(idx)
    ref = np.zeros((t, top_k, k), np.float32)
    for ti in range(t):
        for j in range(top_k):
            ref[ti, j] = hn[ti, j] @ np.asarray(w[idxn[ti, j]]).T
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=3e-2, atol=3e-2
    )
