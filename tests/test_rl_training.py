"""RL stack tests: LoRA init, GRPO step, checkpoints, adapter hot-swap."""

import json
import os

import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core import params as P
from mlx_parallm_tpu.rl_training import checkpoint as ckpt
from mlx_parallm_tpu.rl_training import weight_updater
from mlx_parallm_tpu.rl_training.grpo_trainer import (
    GRPOConfig,
    GRPOTrainer,
    _collate,
)
from mlx_parallm_tpu.rl_training.lora_init import init_lora_if_needed
from mlx_parallm_tpu.rl_training.param_utils import (
    adapter_weights,
    has_lora_params,
    split_adapter_params,
)
from mlx_parallm_tpu.rl_training.types import ScoredDataGroup


@pytest.fixture()
def lora_model(tiny_model_dir, tmp_path):
    model, tok = loader.load(tiny_model_dir)
    adapter_dir = init_lora_if_needed(
        model, str(tmp_path), rank=4, num_layers=2
    )
    return model, tok, adapter_dir


def _fake_batch(tok) -> list:
    ids1 = tok.encode("What is 1 + 2? The answer is \\boxed{3}.")
    ids2 = tok.encode("What is 1 + 2? I have no idea, maybe seven.")
    k1 = max(1, len(ids1) // 2)
    k2 = max(1, len(ids2) // 2)
    return [
        ScoredDataGroup(
            tokens=[ids1, ids2],
            masks=[
                [0] * k1 + [1] * (len(ids1) - k1),
                [0] * k2 + [1] * (len(ids2) - k2),
            ],
            scores=[1.0, 0.0],
        )
    ]


def test_lora_init_artifacts(lora_model):
    model, _, adapter_dir = lora_model
    assert has_lora_params(model.params)
    assert os.path.exists(os.path.join(adapter_dir, "adapters.safetensors"))
    cfg_path = os.path.join(adapter_dir, "adapter_config.json")
    assert os.path.exists(cfg_path)
    with open(cfg_path) as f:
        cfg = json.load(f)
    assert cfg["lora_parameters"]["rank"] == 4


def test_lora_zero_init_preserves_base(tiny_model_dir, tmp_path):
    """Zero-initialized lora_b must leave outputs bit-identical."""
    import jax.numpy as jnp

    from mlx_parallm_tpu.models.base import KVCache

    model, tok = loader.load(tiny_model_dir)
    tokens = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)

    def fwd():
        cache = KVCache.init(
            model.num_layers, 1, 64, model.n_kv_heads(), model.head_dim()
        )
        logits, _ = model.apply_fn()(model.params, tokens, cache)
        return np.asarray(logits, dtype=np.float32)

    before = fwd()
    init_lora_if_needed(model, str(tmp_path), rank=4, num_layers=2)
    after = fwd()
    np.testing.assert_allclose(before, after, rtol=1e-5, atol=1e-5)


def test_collate_shapes(lora_model):
    _, tok, _ = lora_model
    data = _collate(_fake_batch(tok))
    assert data["tokens"].shape == data["masks"].shape
    assert data["tokens"].shape[1] % 64 == 0
    assert data["advantages"].shape == data["tokens"].shape
    # Sequence scores broadcast: row 0 all 1.0, row 1 all 0.0.
    assert np.all(data["advantages"][0] == 1.0)
    assert np.all(data["advantages"][1] == 0.0)


def test_grpo_step_updates_adapter_only(lora_model):
    model, tok, _ = lora_model
    frozen_before = {
        k: np.asarray(v, dtype=np.float32)
        for k, v in split_adapter_params(model.params)[1].items()
        if hasattr(v, "dtype") and "float" in str(v.dtype)
    }
    adapter_before = {
        k: np.asarray(v, dtype=np.float32)
        for k, v in adapter_weights(model.params).items()
    }

    trainer = GRPOTrainer(
        model, tok, GRPOConfig(learning_rate=1e-2, kl_beta=0.1, entropy_weight=0.01)
    )
    metrics = trainer.step(_fake_batch(tok))
    assert np.isfinite(metrics["loss"])
    assert metrics["tokens"] > 0
    assert "kl" in metrics and "clip_frac_hi" in metrics

    adapter_after = adapter_weights(model.params)
    changed = any(
        not np.allclose(adapter_before[k], np.asarray(adapter_after[k], dtype=np.float32))
        for k in adapter_before
    )
    assert changed, "adapter params did not change after a GRPO step"

    frozen_after = split_adapter_params(model.params)[1]
    for k, v in frozen_before.items():
        np.testing.assert_array_equal(
            v, np.asarray(frozen_after[k], dtype=np.float32), err_msg=k
        )


def test_grpo_kl_estimators(lora_model):
    model, tok, _ = lora_model
    for est in ("k3", "mse", "abs"):
        trainer = GRPOTrainer(
            model, tok, GRPOConfig(learning_rate=1e-4, kl_beta=0.05, kl_estimator=est)
        )
        m = trainer.step(_fake_batch(tok))
        assert np.isfinite(m["loss"]), est
        assert m["kl"] >= 0, est


def test_grpo_ref_ema(lora_model):
    model, tok, _ = lora_model
    trainer = GRPOTrainer(
        model, tok, GRPOConfig(learning_rate=1e-3, kl_beta=0.1, ref_ema=0.9)
    )
    m1 = trainer.step(_fake_batch(tok))
    m2 = trainer.step(_fake_batch(tok))
    assert np.isfinite(m2["loss"])


def test_checkpoint_roundtrip_and_hot_swap(lora_model, tmp_path):
    model, tok, adapter_dir = lora_model
    trainer = GRPOTrainer(model, tok, GRPOConfig(learning_rate=1e-2))
    trainer.step(_fake_batch(tok))

    ck_dir = str(tmp_path / "ckpt")
    step_dir = ckpt.save_adapter_checkpoint(
        ck_dir,
        1,
        adapter_weights(model.params),
        source_adapter_dir=adapter_dir,
        optimizer_state=trainer._opt_state,
    )
    assert os.path.exists(os.path.join(step_dir, "adapters.safetensors"))
    assert os.path.exists(os.path.join(step_dir, "adapter_config.json"))
    assert os.path.exists(os.path.join(step_dir, "adapter.json"))
    ckpt.save_checkpoint(ck_dir, 1, GRPOConfig(), adapter_path=step_dir)
    assert os.path.exists(os.path.join(ck_dir, "metadata.json"))
    assert ckpt.latest_step_dir(ck_dir) == step_dir

    # Load the checkpoint back into a FRESH model (normal path).
    fresh, _ = loader.load(model.model_path)
    n = weight_updater.apply_lora_update(fresh, step_dir)
    assert n > 0
    for k, v in adapter_weights(model.params).items():
        got = adapter_weights(fresh.params)[k]
        np.testing.assert_allclose(
            np.asarray(v, dtype=np.float32),
            np.asarray(got, dtype=np.float32),
            rtol=1e-2,
            atol=1e-2,
        )

    # Fallback path: delete adapter_config.json (reference test strategy,
    # tests/test_checkpoint_and_weight_update.py).
    os.remove(os.path.join(step_dir, "adapter_config.json"))
    fresh2, _ = loader.load(model.model_path)
    version_before = fresh2.version
    n2 = weight_updater.apply_lora_update(fresh2, step_dir)
    assert n2 == n
    assert fresh2.version == version_before + 1


def test_optimizer_state_checkpoint(lora_model, tmp_path):
    model, tok, _ = lora_model
    trainer = GRPOTrainer(model, tok, GRPOConfig(learning_rate=1e-2))
    trainer.step(_fake_batch(tok))
    step_dir = ckpt.save_adapter_checkpoint(
        str(tmp_path), 5, adapter_weights(model.params),
        optimizer_state=trainer._opt_state,
    )
    st = ckpt.load_optimizer_state(step_dir)
    assert st is not None
