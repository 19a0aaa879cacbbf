"""Every model family loads, runs greedy decode, and matches incremental vs
full forward — the universal family contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.models.base import KVCache
from mlx_parallm_tpu.tools.tiny_model import build_tiny_model

FAMILIES = ["llama", "qwen3", "gemma", "gemma2", "phi3", "mixtral", "mistral"]


@pytest.fixture(scope="module", params=FAMILIES)
def family_model(request, tmp_path_factory):
    out = tmp_path_factory.mktemp(f"tiny_{request.param}")
    path = build_tiny_model(str(out), model_type=request.param)
    model, tok = loader.load(path)
    return request.param, model, tok


def test_forward_and_decode(family_model):
    name, model, tok = family_model
    engine = DecodeEngine(model, tok)
    prompt = tok.encode("The quick brown fox")
    sp = [SamplingParams(temperature=0.0, max_tokens=5)]
    toks = [
        s.tokens[0]
        for s in engine.decode_batch([prompt], sp)
        if s.tokens[0] is not None
    ]
    assert 1 <= len(toks) <= 5, name
    assert all(0 <= t < model.args.vocab_size for t in toks), name


def test_incremental_matches_full(family_model):
    name, model, tok = family_model
    fn = jax.jit(model.apply_fn())
    seq = jnp.array([[3, 14, 15, 9, 2, 6]], dtype=jnp.int32)

    def mkcache():
        return KVCache.init(
            model.num_layers, 1, 64, model.n_kv_heads(), model.head_dim()
        )

    full_logits, _ = fn(model.params, seq, mkcache())
    cache = mkcache()
    pre, cache = fn(model.params, seq[:, :4], cache)
    step5, cache = fn(model.params, seq[:, 4:5], cache)
    step6, cache = fn(model.params, seq[:, 5:6], cache)
    inc = jnp.concatenate([step5, step6], axis=1)
    np.testing.assert_allclose(
        np.asarray(inc, dtype=np.float32),
        np.asarray(full_logits[:, 4:6], dtype=np.float32),
        rtol=3e-2,
        atol=3e-2,
        err_msg=name,
    )


def test_cache_free_forward_matches(family_model):
    """cache=None (training path) must agree with the slab-cache forward."""
    name, model, tok = family_model
    fn = jax.jit(model.apply_fn())
    seq = jnp.array([[5, 9, 2, 6]], dtype=jnp.int32)
    cache = KVCache.init(
        model.num_layers, 1, 64, model.n_kv_heads(), model.head_dim()
    )
    with_cache, _ = fn(model.params, seq, cache)
    without, _ = fn(model.params, seq, None)
    np.testing.assert_allclose(
        np.asarray(with_cache, dtype=np.float32),
        np.asarray(without, dtype=np.float32),
        rtol=3e-2,
        atol=3e-2,
        err_msg=name,
    )
