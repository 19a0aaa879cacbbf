"""Fused append+attend kernel tests (Pallas interpret mode on CPU).

Reference is the eager path the kernel replaces: ``KVCache.update_layer``
(masked rewrite) followed by XLA slab attention with inclusive validity.
Checks BOTH halves of the fusion — the attention output and the committed
slab contents (including the int8 quantization + scale write)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlx_parallm_tpu.models.base import KVCache, QuantizedKVCache
from mlx_parallm_tpu.ops import attention, flash_append


def _mk(nl, b, hkv, rep, s, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, hkv * rep, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((nl, b, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((nl, b, hkv, s, d)), jnp.bfloat16)
    return q, kn, vn, k, v


def _err(a, b):
    return np.abs(
        np.asarray(a, np.float32) - np.asarray(b, np.float32)
    ).max()


def _eager_ref(cache, q, kn, vn, layer, scale, **kw):
    """The path the kernel replaces: masked-rewrite commit, then attend."""
    cache = cache.update_layer(layer, kn, vn)
    out = attention.cached_attention(q, cache, layer, scale=scale, **kw)
    return out, cache


@pytest.mark.parametrize("lengths", [[0, 63, 64, 255], [511, 130, 256, 1]])
def test_append_attend_bf16(lengths):
    nl, b, hkv, rep, s, d = 3, 4, 4, 2, 512, 128
    layer = 1
    q, kn, vn, k, v = _mk(nl, b, hkv, rep, s, d)
    lengths = jnp.asarray(lengths, jnp.int32)
    cache = KVCache(k=k, v=v, lengths=lengths)
    assert flash_append.supported(q, cache.k, lengths)

    ref_out, ref_cache = _eager_ref(cache, q, kn, vn, layer, d**-0.5)
    out, k2, v2 = flash_append.flash_append_attend(
        q, k, v, lengths, kn, vn, layer=layer, scale=d**-0.5, interpret=True
    )
    assert _err(ref_out, out) < 0.05
    # slab: the new rows landed, everything else untouched
    np.testing.assert_array_equal(
        np.asarray(k2), np.asarray(ref_cache.k)
    )
    np.testing.assert_array_equal(
        np.asarray(v2), np.asarray(ref_cache.v)
    )


def test_append_attend_int8():
    nl, b, hkv, rep, s, d = 2, 2, 2, 4, 256, 128
    layer = 0
    q, kn, vn, _, _ = _mk(nl, b, hkv, rep, s, d, seed=1)
    rng = np.random.default_rng(2)
    base = jnp.asarray(
        rng.standard_normal((nl, b, hkv, s, d)), jnp.bfloat16
    )
    cache = QuantizedKVCache.init(nl, b, s, hkv, d)
    # populate via the eager write path so scales are realistic
    for l in range(nl):
        cache = cache.update_layer(
            l,
            base[l, :, :, :160].transpose(0, 2, 1, 3),
            base[l, :, :, :160].transpose(0, 2, 1, 3),
        )
    lengths = jnp.asarray([100, 160], jnp.int32)
    cache = jax.tree_util.tree_map(lambda x: x, cache)
    cache = cache.__class__(
        k=cache.k, v=cache.v, k_scale=cache.k_scale,
        v_scale=cache.v_scale, lengths=lengths,
    )

    ref_out, ref_cache = _eager_ref(cache, q, kn, vn, layer, d**-0.5)
    out, k2, v2, ks2, vs2 = flash_append.flash_append_attend(
        q, cache.k, cache.v, lengths, kn, vn,
        layer=layer, scale=d**-0.5,
        cache_ks=cache.k_scale, cache_vs=cache.v_scale, interpret=True,
    )
    # The kernel attends the current token EXACTLY (pre-quantization),
    # the eager reference through the int8 roundtrip — small tolerance.
    assert _err(ref_out, out) < 0.08
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_cache.k))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref_cache.v))
    np.testing.assert_allclose(
        np.asarray(ks2, np.float32),
        np.asarray(ref_cache.k_scale, np.float32),
        rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(vs2, np.float32),
        np.asarray(ref_cache.v_scale, np.float32),
        rtol=1e-2,
    )


def test_append_attend_softcap_window():
    nl, b, hkv, rep, s, d = 2, 2, 2, 2, 512, 128
    layer = 1
    q, kn, vn, k, v = _mk(nl, b, hkv, rep, s, d, seed=3)
    lengths = jnp.asarray([300, 509], jnp.int32)
    cache = KVCache(k=k, v=v, lengths=lengths)
    kw = dict(logit_softcap=30.0, sliding_window=128)
    ref_out, ref_cache = _eager_ref(cache, q, kn, vn, layer, d**-0.5, **kw)
    out, k2, v2 = flash_append.flash_append_attend(
        q, k, v, lengths, kn, vn, layer=layer, scale=d**-0.5,
        interpret=True, **kw,
    )
    assert _err(ref_out, out) < 0.05
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_cache.k))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref_cache.v))


def test_supported_gate():
    q = jnp.zeros((2, 1, 8, 128), jnp.bfloat16)
    k = jnp.zeros((3, 2, 4, 256, 128), jnp.bfloat16)
    lengths = jnp.zeros((2,), jnp.int32)
    assert flash_append.supported(q, k, lengths)
    # prefill queries unsupported
    assert not flash_append.supported(
        jnp.zeros((2, 4, 8, 128), jnp.bfloat16), k, lengths
    )
    # head dim not lane-aligned
    assert not flash_append.supported(
        jnp.zeros((2, 1, 8, 64), jnp.bfloat16),
        jnp.zeros((3, 2, 4, 256, 64), jnp.bfloat16),
        lengths,
    )
