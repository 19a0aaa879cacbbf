"""Model load + forward-pass tests on the tiny quantized checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.models.base import KVCache


def _make_cache(model, batch_size=2, capacity=64):
    return KVCache.init(
        model.num_layers, batch_size, capacity, model.n_kv_heads(), model.head_dim()
    )


def test_load_tiny_model(tiny_model_dir):
    model, tokenizer = loader.load(tiny_model_dir)
    assert model.num_layers == 4
    assert model.quantization == {"group_size": 64, "bits": 4}
    ids = tokenizer.encode("hello world")
    assert isinstance(ids, list) and len(ids) > 0
    assert tokenizer.decode(ids)  # round-trips to non-empty text


def test_forward_shapes_and_cache(tiny_model_dir):
    model, _ = loader.load(tiny_model_dir)
    cache = _make_cache(model)
    tokens = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=jnp.int32)
    logits, cache = model.apply_fn()(model.params, tokens, cache)
    assert logits.shape == (2, 4, model.args.vocab_size)
    np.testing.assert_array_equal(np.asarray(cache.lengths), [4, 4])

    # One decode step advances per-row lengths by 1.
    step = jnp.array([[9], [10]], dtype=jnp.int32)
    logits2, cache = model.apply_fn()(model.params, step, cache)
    assert logits2.shape == (2, 1, model.args.vocab_size)
    np.testing.assert_array_equal(np.asarray(cache.lengths), [5, 5])


def test_incremental_matches_full_forward(tiny_model_dir):
    """Prefill+decode over the KV cache must match a single full forward."""
    model, _ = loader.load(tiny_model_dir)
    fn = jax.jit(model.apply_fn())
    seq = jnp.array([[3, 14, 15, 9, 2, 6]], dtype=jnp.int32)

    full_logits, _ = fn(model.params, seq, _make_cache(model, 1))

    cache = _make_cache(model, 1)
    pre_logits, cache = fn(model.params, seq[:, :3], cache)
    outs = [pre_logits[:, -1]]
    for i in range(3, 6):
        step_logits, cache = fn(model.params, seq[:, i : i + 1], cache)
        outs.append(step_logits[:, 0])

    inc = jnp.stack(outs, axis=1)  # positions 2..5
    np.testing.assert_allclose(
        np.asarray(inc, dtype=np.float32),
        np.asarray(full_logits[:, 2:6], dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_ragged_batch_offsets(tiny_model_dir):
    """Rows with different lengths decode independently and match their
    single-row results (the per-row-offset contract)."""
    model, _ = loader.load(tiny_model_dir)
    fn = jax.jit(model.apply_fn())

    a = [3, 14, 15, 9]
    b = [2, 6, 5]

    # Single-row references.
    ca = _make_cache(model, 1)
    la, _ = fn(model.params, jnp.array([a], dtype=jnp.int32), ca)
    cb = _make_cache(model, 1)
    lb, _ = fn(model.params, jnp.array([b], dtype=jnp.int32), cb)

    # Batched with ragged lengths: prefill row-by-row content using separate
    # calls (row b padded); emulate the engine by prefilling each row at its
    # own length via two steps.
    cache = _make_cache(model, 2)
    # Step 1: both rows get their first 3 tokens.
    l3, cache = fn(
        model.params, jnp.array([a[:3], b[:3]], dtype=jnp.int32), cache
    )
    # Step 2: only row a has a 4th token; feed row b a dummy and roll back its
    # length afterwards (engines mask instead; here we check offsets math).
    l4, cache = fn(model.params, jnp.array([[a[3]], [0]], dtype=jnp.int32), cache)

    np.testing.assert_allclose(
        np.asarray(l4[0, 0], dtype=np.float32),
        np.asarray(la[0, -1], dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(l3[1, -1], dtype=np.float32),
        np.asarray(lb[0, -1], dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )
