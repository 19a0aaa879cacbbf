"""One LoRA scale convention everywhere (mlx_lm semantics: effective delta
is ``scale * B @ A``): train → checkpoint → reload must serve IDENTICAL
logits, and merge → serve must match adapter-serving. Round 1 carried a 16x
inconsistency between init (scale/rank) and checkpoint reload (scale)."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.rl_training import checkpoint as ckpt
from mlx_parallm_tpu.rl_training import weight_updater
from mlx_parallm_tpu.rl_training.lora_init import inject_lora, save_initial_adapter
from mlx_parallm_tpu.rl_training.param_utils import adapter_weights


def _logits(model, tok, text="The quick brown fox"):
    ids = jnp.asarray([tok.encode(text)], jnp.int32)
    apply_fn = model.apply_fn()
    out, _ = apply_fn(model.params, ids, None)
    return np.asarray(out, np.float32)


def _perturb_lora_b(model, seed=0):
    """Give lora_b nonzero values (as training would) so the scale actually
    matters."""
    rng = np.random.default_rng(seed)
    flat = {}
    from mlx_parallm_tpu.core import params as P

    for k, v in P.flatten(model.params).items():
        if k.endswith("lora_b"):
            flat[k] = jnp.asarray(
                rng.standard_normal(v.shape) * 0.02, v.dtype
            )
        else:
            flat[k] = v
    model.params = P.unflatten(flat)
    model.version += 1


def test_checkpoint_reload_identical_logits(tiny_model_dir, tmp_path):
    model, tok = loader.load(tiny_model_dir)
    inject_lora(model, rank=4, num_layers=2, scale=10.0)
    save_initial_adapter(
        model, str(tmp_path / "init"), rank=4, scale=10.0, num_layers=2,
        keys=["q_proj", "v_proj"],
    )
    _perturb_lora_b(model)
    trained = _logits(model, tok)

    # The perturbed adapter must actually change the outputs (otherwise the
    # scale assertion below is vacuous).
    base_model, _ = loader.load(tiny_model_dir)
    assert np.abs(trained - _logits(base_model, tok)).max() > 1e-3

    step_dir = ckpt.save_adapter_checkpoint(
        str(tmp_path / "ck"),
        1,
        adapter_weights(model.params),
        source_adapter_dir=str(tmp_path / "init"),
    )
    # The persisted config carries the raw mlx_lm-style scale.
    with open(f"{step_dir}/adapter_config.json") as f:
        cfg = json.load(f)
    assert cfg["lora_parameters"]["scale"] == 10.0

    # Fresh model + adapter load (the --lora-path / --resume serving path)
    # must produce bit-identical logits to the just-trained model.
    model2, tok2 = loader.load(tiny_model_dir)
    inject_lora(model2, rank=4, num_layers=2, scale=10.0)
    weight_updater.apply_lora_update(model2, step_dir)
    reloaded = _logits(model2, tok2)
    np.testing.assert_array_equal(trained, reloaded)


def test_merge_matches_adapter_serving(tiny_model_dir, tmp_path):
    from mlx_parallm_tpu.tools.merge_lora import merge_lora

    model, tok = loader.load(tiny_model_dir)
    inject_lora(model, rank=4, num_layers=2, scale=10.0)
    save_initial_adapter(
        model, str(tmp_path / "init"), rank=4, scale=10.0, num_layers=2,
        keys=["q_proj", "v_proj"],
    )
    _perturb_lora_b(model, seed=3)
    adapter_dir = str(tmp_path / "adapter")
    import os

    os.makedirs(adapter_dir, exist_ok=True)
    from safetensors.numpy import save_file

    save_file(
        {
            k: np.asarray(v, np.float32)
            for k, v in adapter_weights(model.params).items()
        },
        f"{adapter_dir}/adapters.safetensors",
    )
    import shutil

    shutil.copy(
        f"{tmp_path}/init/adapter_config.json",
        f"{adapter_dir}/adapter_config.json",
    )

    adapter_logits = _logits(model, tok)
    out_dir = merge_lora(tiny_model_dir, adapter_dir, str(tmp_path / "merged"))
    merged, tokm = loader.load(out_dir)
    merged_logits = _logits(merged, tokm)
    # Requantization of the merged weights adds int4 noise (enough to flip
    # argmax between near-tied logits on this random fixture); require the
    # merged logits to track adapter-serving closely. A wrong scale
    # convention (e.g. the old scale/rank = 16x-off merge) fails this by an
    # order of magnitude.
    diff = np.abs(adapter_logits - merged_logits)
    assert diff.max() < 1.0, diff.max()
    a = adapter_logits[:, -1].ravel()
    m = merged_logits[:, -1].ravel()
    cos = float(
        (a @ m) / (np.linalg.norm(a) * np.linalg.norm(m) + 1e-9)
    )
    assert cos > 0.99, cos
