"""RL resume-from-checkpoint test."""

import numpy as np

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.rl_training import checkpoint as ckpt
from mlx_parallm_tpu.rl_training import weight_updater
from mlx_parallm_tpu.rl_training.grpo_trainer import GRPOConfig, GRPOTrainer
from mlx_parallm_tpu.rl_training.lora_init import init_lora_if_needed
from mlx_parallm_tpu.rl_training.param_utils import adapter_weights
from mlx_parallm_tpu.rl_training.types import ScoredDataGroup


def _batch(tok):
    ids = tok.encode("What is 1 + 2? The answer is \\boxed{3}.")
    k = max(1, len(ids) // 2)
    return [
        ScoredDataGroup(
            tokens=[ids], masks=[[0] * k + [1] * (len(ids) - k)], scores=[1.0]
        )
    ]


def test_resume_roundtrip(tiny_model_dir, tmp_path):
    model, tok = loader.load(tiny_model_dir)
    init_lora_if_needed(model, str(tmp_path), rank=4, num_layers=2)
    trainer = GRPOTrainer(model, tok, GRPOConfig(learning_rate=1e-2))
    trainer.step(_batch(tok))
    trainer.step(_batch(tok))
    step_dir = ckpt.save_adapter_checkpoint(
        str(tmp_path / "ck"),
        2,
        adapter_weights(model.params),
        optimizer_state=trainer._opt_state,
    )
    expected = {
        k: np.asarray(v, np.float32)
        for k, v in adapter_weights(model.params).items()
    }

    # Fresh process equivalent: reload model, apply checkpoint, restore.
    model2, tok2 = loader.load(tiny_model_dir)
    init_lora_if_needed(model2, str(tmp_path / "again"), rank=4, num_layers=2)
    weight_updater.apply_lora_update(model2, step_dir)
    trainer2 = GRPOTrainer(model2, tok2, GRPOConfig(learning_rate=1e-2))
    step = trainer2.restore(step_dir)
    assert step == 2
    got = {
        k: np.asarray(v, np.float32)
        for k, v in adapter_weights(model2.params).items()
    }
    for k in expected:
        np.testing.assert_allclose(expected[k], got[k], rtol=1e-2, atol=1e-2)

    # Training continues from the restored state.
    m = trainer2.step(_batch(tok2))
    assert np.isfinite(m["loss"])
    assert trainer2.step_count == 3
