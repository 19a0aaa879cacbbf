"""Conversion pipeline + tools tests."""

import json
import os

import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.tools import convert as C
from mlx_parallm_tpu.tools import convert_adapter, merge_lora, show_checkpoint


def _greedy_tokens(model, tok, text="The quick brown", n=5):
    engine = DecodeEngine(model, tok)
    sp = [SamplingParams(temperature=0.0, max_tokens=n)]
    return [
        s.tokens[0]
        for s in engine.decode_batch([tok.encode(text)], sp)
        if s.tokens[0] is not None
    ]


def test_convert_quantize_roundtrip(tiny_fp_model_dir, tmp_path):
    """fp checkpoint -> int4 quantize -> loads and decodes; dequantize back
    -> close to original outputs."""
    qdir = C.convert(
        tiny_fp_model_dir, str(tmp_path / "q4"), quantize=True, q_bits=4
    )
    with open(os.path.join(qdir, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["quantization"] == {"group_size": 64, "bits": 4}

    model_q, tok = loader.load(qdir)
    toks_q = _greedy_tokens(model_q, tok)
    assert len(toks_q) >= 1

    ddir = C.convert(qdir, str(tmp_path / "deq"), dequantize=True)
    with open(os.path.join(ddir, "config.json")) as f:
        cfg2 = json.load(f)
    assert "quantization" not in cfg2
    model_d, tok_d = loader.load(ddir)
    toks_d = _greedy_tokens(model_d, tok_d)
    # Dequantized model should match the quantized model's decode exactly
    # (same effective weights).
    assert toks_q == toks_d


def test_make_shards():
    w = {f"k{i}": np.zeros((1024, 1024), np.float32) for i in range(6)}
    shards = C.make_shards(w, max_file_size_gb=0.01)  # ~10MB shards, 4MB each
    assert len(shards) > 1
    total = sum(len(s) for s in shards)
    assert total == 6


def test_convert_adapter_npz(tmp_path):
    npz = tmp_path / "adapter.npz"
    np.savez(npz, **{"layers.0.lora_a": np.ones((4, 8), np.float32)})
    out = convert_adapter.convert_adapter(str(npz), str(tmp_path / "out"))
    assert os.path.exists(out)
    from safetensors import safe_open

    with safe_open(out, framework="np") as f:
        assert "layers.0.lora_a" in f.keys()


def test_merge_lora(tiny_model_dir, tmp_path):
    """Train-free merge: zero-init adapter merge must preserve outputs; a
    nonzero adapter must change them and the merged model must match the
    adapter-applied model."""
    import jax.numpy as jnp

    from mlx_parallm_tpu.rl_training.lora_init import (
        init_lora_if_needed,
        save_initial_adapter,
    )

    model, tok = loader.load(tiny_model_dir)
    adapter_dir = init_lora_if_needed(model, str(tmp_path), rank=4, num_layers=2)

    # Give lora_b a nonzero value so the merge does something.
    layer = model.params["model"]["layers"][-1]["self_attn"]["q_proj"]
    layer["lora_b"] = jnp.ones_like(layer["lora_b"]) * 0.01
    save_initial_adapter(
        model, str(tmp_path / "adapter2"), rank=4, num_layers=2, scale=10.0,
        keys=["self_attn.q_proj", "self_attn.v_proj"],
    )
    adapted_toks = _greedy_tokens(model, tok)

    merged_dir = merge_lora.merge_lora(
        tiny_model_dir, str(tmp_path / "adapter2"), str(tmp_path / "merged")
    )
    model_m, tok_m = loader.load(merged_dir)
    merged_toks = _greedy_tokens(model_m, tok_m)
    assert merged_toks == adapted_toks


def test_show_checkpoint(tmp_path, capsys):
    os.makedirs(tmp_path / "step_3")
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump({"step": 3}, f)
    with open(tmp_path / "step_3" / "adapter.json", "w") as f:
        json.dump({"step": 3, "format": "safetensors"}, f)
    with open(tmp_path / "step_3" / "adapters.safetensors", "wb") as f:
        f.write(b"x" * 100)
    show_checkpoint.show_checkpoint(str(tmp_path))
    out = capsys.readouterr().out
    assert "step_3" in out
    assert '"step": 3' in out
