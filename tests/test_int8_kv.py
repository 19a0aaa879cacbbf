"""INT8-quantized KV cache tests."""

import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.models.base import KVCache, QuantizedKVCache


def test_quantized_cache_roundtrip():
    import jax
    import jax.numpy as jnp

    cache = QuantizedKVCache.init(2, 3, 32, 2, 16)
    rng = np.random.default_rng(0)
    k_new = jnp.asarray(rng.standard_normal((3, 4, 2, 16)).astype(np.float32))
    v_new = jnp.asarray(rng.standard_normal((3, 4, 2, 16)).astype(np.float32))
    cache = cache.update_layer(0, k_new, v_new)
    # layer_view is slab-layout (B, H, S, D); compare against the (B, T,
    # H, D) inputs transposed to match.
    k_view, v_view = cache.layer_view(0)
    np.testing.assert_allclose(
        np.asarray(k_view[:, :, :4], np.float32),
        np.asarray(k_new.transpose(0, 2, 1, 3), np.float32),
        rtol=0.03,
        atol=0.03,
    )
    np.testing.assert_allclose(
        np.asarray(v_view[:, :, :4], np.float32),
        np.asarray(v_new.transpose(0, 2, 1, 3), np.float32),
        rtol=0.03,
        atol=0.03,
    )
    # int8 storage really is int8
    assert cache.k.dtype == jnp.int8


def test_int8_kv_decode_close_to_fp(tiny_model_dir):
    """Greedy decode with INT8 KV should match bf16-KV decode (tiny model,
    short sequence — quantization noise shouldn't flip argmax often; require
    first tokens to match and run to completion)."""
    model, tok = loader.load(tiny_model_dir)
    prompt = tok.encode("The quick brown fox jumps over")
    sp = [SamplingParams(temperature=0.0, max_tokens=6)]

    def run(engine):
        return [
            s.tokens[0]
            for s in engine.decode_batch([prompt], sp)
            if s.tokens[0] is not None
        ]

    fp = run(DecodeEngine(model, tok, disable_prefix_cache=True))
    q8 = run(DecodeEngine(model, tok, disable_prefix_cache=True, kv_bits=8))
    assert len(q8) >= 1
    assert fp[0] == q8[0]


def test_int8_kv_memory_halved():
    fp = KVCache.init(2, 2, 64, 2, 16)
    q8 = QuantizedKVCache.init(2, 2, 64, 2, 16)
    fp_bytes = fp.k.nbytes + fp.v.nbytes
    q8_bytes = q8.k.nbytes + q8.v.nbytes + q8.k_scale.nbytes + q8.v_scale.nbytes
    assert q8_bytes < 0.6 * fp_bytes
