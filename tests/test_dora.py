"""DoRA adapter loading tests (magnitude-rescaled LoRA)."""

import json
import os

import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core import params as P
from mlx_parallm_tpu.ops import quant
from mlx_parallm_tpu.rl_training import weight_updater


def _write_adapter(tmp_path, weights, cfg=None):
    from safetensors.numpy import save_file

    d = tmp_path / "dora_adapter"
    os.makedirs(d, exist_ok=True)
    save_file(weights, str(d / "adapters.safetensors"))
    with open(d / "adapter_config.json", "w") as f:
        json.dump(
            cfg
            or {
                "fine_tune_type": "dora",
                "lora_parameters": {"rank": 4, "scale": 4.0},
            },
            f,
        )
    return str(d)


def _row_norms_of(model, lin_path):
    node = model.params["model"]["layers"][0]["self_attn"]["q_proj"]
    w = quant.dequantize(
        node["weight"], node["scales"], node["biases"], 64, 4
    )
    return np.linalg.norm(np.asarray(w, np.float32), axis=1)


def test_dora_identity_magnitude_preserves_output(tiny_model_dir, tmp_path):
    """magnitude == row norms of the (unadapted) weight => dora_scale == 1
    => outputs unchanged."""
    import jax.numpy as jnp

    from mlx_parallm_tpu.models.base import KVCache

    model, tok = loader.load(tiny_model_dir)
    norms = _row_norms_of(model, "q_proj")
    rank, in_f, out_f = 4, 64, 64
    adapter = {
        "model.layers.0.self_attn.q_proj.lora_a": np.zeros(
            (rank, in_f), np.float32
        ),
        "model.layers.0.self_attn.q_proj.lora_b": np.zeros(
            (out_f, rank), np.float32
        ),
        "model.layers.0.self_attn.q_proj.magnitude": norms.astype(np.float32),
    }
    tokens = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)

    def fwd():
        cache = KVCache.init(
            model.num_layers, 1, 64, model.n_kv_heads(), model.head_dim()
        )
        logits, _ = model.apply_fn()(model.params, tokens, cache)
        return np.asarray(logits, np.float32)

    before = fwd()
    n = weight_updater.apply_lora_update(
        model, _write_adapter(tmp_path, adapter)
    )
    assert n >= 3
    node = model.params["model"]["layers"][0]["self_attn"]["q_proj"]
    assert "dora_scale" in node
    np.testing.assert_allclose(
        np.asarray(node["dora_scale"], np.float32), 1.0, rtol=2e-2
    )
    after = fwd()
    np.testing.assert_allclose(before, after, rtol=5e-2, atol=5e-2)


def test_dora_magnitude_rescales(tiny_model_dir, tmp_path):
    model, tok = loader.load(tiny_model_dir)
    norms = _row_norms_of(model, "q_proj")
    adapter = {
        "model.layers.0.self_attn.q_proj.lora_a": np.zeros((4, 64), np.float32),
        "model.layers.0.self_attn.q_proj.lora_b": np.zeros((64, 4), np.float32),
        "model.layers.0.self_attn.q_proj.magnitude": (2.0 * norms).astype(
            np.float32
        ),
    }
    weight_updater.apply_lora_update(model, _write_adapter(tmp_path, adapter))
    node = model.params["model"]["layers"][0]["self_attn"]["q_proj"]
    np.testing.assert_allclose(
        np.asarray(node["dora_scale"], np.float32), 2.0, rtol=2e-2
    )
