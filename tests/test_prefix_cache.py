"""Prefix-KV cache + KV pool tests."""

import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.cache import (
    GlobalPrefixCache,
    KVPool,
    common_prefix_length,
)
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams


def test_common_prefix_length():
    assert common_prefix_length([[1, 2, 3], [1, 2, 4]]) == 2
    assert common_prefix_length([[1, 2, 3]]) == 3
    assert common_prefix_length([[1], [2]]) == 0
    assert common_prefix_length([[1, 2], [1, 2, 3]]) == 2


def test_kv_pool_reuse():
    pool = KVPool()
    c1 = pool.acquire(2, 4, 64, 2, 16)
    pool.release(c1)
    c2 = pool.acquire(2, 4, 64, 2, 16)
    assert c2.k.shape == c1.k.shape
    assert float(np.asarray(c2.lengths).sum()) == 0


def test_prefix_cache_hit_matches_cold(tiny_model_dir):
    """Decode with a warm prefix cache must produce identical tokens to the
    cold path."""
    model, tok = loader.load(tiny_model_dir)

    # Long shared prefix (> 64 tokens) + distinct suffixes.
    base = tok.encode(
        "You are a helpful assistant. " * 20
    )
    assert len(base) >= 80
    p1 = base + tok.encode("What is 1+2?")
    p2 = base + tok.encode("Tell me a story.")
    sp = [SamplingParams(temperature=0.0, max_tokens=5)] * 2

    def run(engine):
        rows = [[], []]
        for step in engine.decode_batch([p1, p2], sp):
            for i, t in enumerate(step.tokens):
                if t is not None:
                    rows[i].append(t)
        return rows

    cold_engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    cold = run(cold_engine)

    warm_engine = DecodeEngine(model, tok)
    first = run(warm_engine)  # miss; stores snapshot
    assert warm_engine.prefix_cache.misses >= 1
    second = run(warm_engine)  # hit; seeds from snapshot
    assert warm_engine.prefix_cache.hits >= 1

    assert first == cold
    assert second == cold


def test_prefix_cache_lru_eviction():
    pc = GlobalPrefixCache(capacity=2, min_tokens=1)
    import jax.numpy as jnp

    snap = {"k": jnp.zeros((1, 1, 4, 1, 2)), "v": jnp.zeros((1, 1, 4, 1, 2))}
    pc.store((1, 2, 3, 4), snap)
    pc.store((5, 6, 7, 8), snap)
    pc.store((9, 10, 11, 12), snap)
    assert pc.lookup((1, 2, 3, 4)) is None  # evicted
    assert pc.lookup((9, 10, 11, 12)) is not None
