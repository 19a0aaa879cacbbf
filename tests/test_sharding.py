"""Tensor-parallel sharding correctness on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.models.base import KVCache
from mlx_parallm_tpu.parallel import mesh as M
from mlx_parallm_tpu.tools.tiny_model import build_tiny_model


@pytest.fixture(scope="module")
def shardable_model_dir(tmp_path_factory):
    """Tiny model whose head/ffn/vocab dims divide tp=4 (and whose quant
    group count divides tp for row-parallel layers)."""
    out = tmp_path_factory.mktemp("tiny_shard")
    return build_tiny_model(
        str(out),
        hidden_size=128,
        num_layers=2,
        num_heads=8,
        num_kv_heads=8,
        intermediate_size=256,
        vocab_size=512,
        group_size=16,
        bits=4,
    )


def test_mesh_creation():
    mesh = M.make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_sharded_forward_matches_single_device(shardable_model_dir):
    model, tok = loader.load(shardable_model_dir)
    tokens = jnp.array([[1, 5, 9, 13]], dtype=jnp.int32)

    def fwd(params, cache):
        logits, _ = model.apply_fn()(params, tokens, cache)
        return logits

    cache = KVCache.init(
        model.num_layers, 1, 64, model.n_kv_heads(), model.head_dim()
    )
    ref = np.asarray(jax.jit(fwd)(model.params, cache), dtype=np.float32)

    mesh = M.make_mesh(tp=4, dp=2)
    sharded_params = M.shard_params(model.params, mesh)
    cache2 = M.shard_cache(
        KVCache.init(
            model.num_layers, 1, 64, model.n_kv_heads(), model.head_dim()
        ),
        mesh,
    )
    got = np.asarray(jax.jit(fwd)(sharded_params, cache2), dtype=np.float32)
    np.testing.assert_allclose(ref, got, rtol=2e-2, atol=2e-2)


def test_sharded_decode_engine_matches(shardable_model_dir):
    """Full engine greedy decode must produce identical tokens sharded vs
    unsharded."""
    model, tok = loader.load(shardable_model_dir)
    engine = DecodeEngine(model, tok)
    prompt = tok.encode("The quick brown fox")
    sp = [SamplingParams(temperature=0.0, max_tokens=6)]

    def collect():
        return [
            s.tokens[0]
            for s in engine.decode_batch([prompt], sp)
            if s.tokens[0] is not None
        ]

    ref_tokens = collect()

    mesh = M.make_mesh(tp=4, dp=2)
    M.shard_model(model, mesh)
    engine2 = DecodeEngine(model, tok)
    got_tokens = [
        s.tokens[0]
        for s in engine2.decode_batch([prompt], sp)
        if s.tokens[0] is not None
    ]
    assert ref_tokens == got_tokens


def test_partition_specs():
    from jax.sharding import PartitionSpec as P

    assert M.partition_spec_for(
        "model.layers.0.self_attn.q_proj.weight"
    ) == P("tp", None)
    assert M.partition_spec_for(
        "model.layers.0.self_attn.o_proj.scales"
    ) == P(None, "tp")
    assert M.partition_spec_for("model.layers.0.mlp.down_proj.q8") == P(None, "tp")
    assert M.partition_spec_for("model.embed_tokens.weight") == P("tp", None)
    assert M.partition_spec_for("model.norm.weight") == P()
    assert M.partition_spec_for(
        "model.layers.0.self_attn.q_proj.lora_a"
    ) == P()


def test_shard_cache_quantized():
    """Quantized KV slabs shard like float ones: heads over tp on both the
    int8 slabs and the scale planes; lengths replicated."""
    import jax
    from jax.sharding import PartitionSpec as P

    from mlx_parallm_tpu.models.base import QuantizedKVCache

    mesh = M.make_mesh(tp=8, dp=1)
    cache = QuantizedKVCache.init(2, 4, 64, 8, 16)
    sharded = M.shard_cache(cache, mesh)
    assert sharded.k.sharding.spec == P(None, "dp", "tp", None, None)
    assert sharded.k_scale.sharding.spec == P(None, "dp", "tp", None)
    assert sharded.lengths.sharding.spec == P()
    # Heads not divisible by tp: replicate instead of erroring.
    cache3 = QuantizedKVCache.init(2, 4, 64, 3, 16)
    sharded3 = M.shard_cache(cache3, mesh)
    assert sharded3.k.sharding.spec == P(None, "dp", None, None, None)
