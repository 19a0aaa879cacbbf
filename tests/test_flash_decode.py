"""Flash-decode attention kernel tests (Pallas interpret mode on CPU) vs
the XLA slab attention reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_parallm_tpu.ops import attention, flash_decode


def _mk(b, hkv, rep, s, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, hkv * rep, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    return q, k, v


def _quant(x):
    xf = np.asarray(x, np.float32)
    amax = np.abs(xf).max(-1)
    sc = np.maximum(amax / 127.0, 1e-8)
    q8 = np.clip(np.round(xf / sc[..., None]), -127, 127).astype(np.int8)
    return jnp.asarray(q8), jnp.asarray(sc, jnp.bfloat16)


def _err(a, b):
    return np.abs(
        np.asarray(a, np.float32) - np.asarray(b, np.float32)
    ).max()


def test_flash_decode_matches_sdpa_ragged_gqa():
    b, hkv, rep, s, d = 4, 4, 2, 512, 128
    q, k, v = _mk(b, hkv, rep, s, d)
    lengths = jnp.asarray([0, 100, 511, 130], jnp.int32)
    ref = attention.sdpa_slab(q, k, v, q_offsets=lengths, scale=d**-0.5)
    out = flash_decode.flash_decode(
        q, k, v, lengths, scale=d**-0.5, interpret=True
    )
    assert _err(ref, out) < 0.05
    assert flash_decode.supported(q, k, lengths)


def test_flash_decode_int8_fused():
    b, hkv, rep, s, d = 2, 4, 1, 256, 128
    q, k, v = _mk(b, hkv, rep, s, d, seed=1)
    k8, ks = _quant(k)
    v8, vs = _quant(v)
    kd = k8.astype(jnp.bfloat16) * ks[..., None]
    vd = v8.astype(jnp.bfloat16) * vs[..., None]
    lengths = jnp.asarray([200, 255], jnp.int32)
    ref = attention.sdpa_slab(q, kd, vd, q_offsets=lengths, scale=d**-0.5)
    out = flash_decode.flash_decode(
        q, k8, v8, lengths, scale=d**-0.5,
        k_scale=ks, v_scale=vs, interpret=True,
    )
    assert _err(ref, out) < 0.06


def test_flash_decode_softcap_and_window():
    b, hkv, rep, s, d = 2, 2, 2, 512, 128
    q, k, v = _mk(b, hkv, rep, s, d, seed=2)
    lengths = jnp.asarray([300, 511], jnp.int32)
    ref = attention.sdpa_slab(
        q, k, v, q_offsets=lengths, scale=d**-0.5,
        logit_softcap=30.0, sliding_window=128,
    )
    out = flash_decode.flash_decode(
        q, k, v, lengths, scale=d**-0.5,
        logit_softcap=30.0, sliding_window=128, interpret=True,
    )
    assert _err(ref, out) < 0.05


def test_supported_gate():
    q, k, _ = _mk(2, 2, 1, 256, 128)
    lengths = jnp.zeros((2,), jnp.int32)
    assert flash_decode.supported(q, k, lengths)
    # head dim not lane-aligned
    q2, k2, _ = _mk(2, 2, 1, 256, 64)
    assert not flash_decode.supported(q2, k2, lengths)
    # prefill (T>1) unsupported
    qp = jnp.zeros((2, 4, 2, 128), jnp.bfloat16)
    assert not flash_decode.supported(qp, k, lengths)
