"""Tiny random-weight quantized checkpoint factory — the universal test fixture.

Parity with the reference's ``scripts/build_tiny_model.py`` (reference:
/root/reference/scripts/build_tiny_model.py:104-160), which generates a tiny
int4-quantized llama-style checkpoint reusing a real tokenizer. Since this
environment has no network and no local tokenizer assets, this factory also
*builds* a small byte-level BPE tokenizer from scratch with a ChatML chat
template, so the full chat/completions/streaming path is exercised end-to-end
on the real quantized compute path.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import numpy as np

CHATML_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] + '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)

_CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Hello world, this is a tiny test corpus for the tokenizer.",
    "What is 1 + 2? The answer is \\boxed{3}.",
    "TPU pods run JAX programs compiled by XLA across many chips.",
    "def main():\n    print('hello')\n",
    "Streaming tokens one at a time requires UTF-8 safe detokenization: é ñ 漢字 🙂.",
    "You are a helpful assistant. Answer concisely and correctly.",
]


def build_tokenizer(out_dir: Path, vocab_size: int = 512) -> None:
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size - 8,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(_CORPUS * 16, trainer)
    tok.save(str(out_dir / "tokenizer.json"))

    tokenizer_config = {
        "tokenizer_class": "PreTrainedTokenizerFast",
        "eos_token": "<|im_end|>",
        "pad_token": "<|endoftext|>",
        "unk_token": None,
        "model_max_length": 2048,
        "chat_template": CHATML_TEMPLATE,
    }
    with open(out_dir / "tokenizer_config.json", "w") as f:
        json.dump(tokenizer_config, f, indent=2)


def build_tiny_model(
    out_dir: str,
    *,
    hidden_size: int = 64,
    num_layers: int = 4,
    num_heads: int = 4,
    num_kv_heads: int = 2,
    intermediate_size: int = 128,
    vocab_size: int = 512,
    group_size: int = 64,
    bits: Optional[int] = 4,
    seed: int = 0,
    model_type: str = "llama",
) -> str:
    """Write a random-weight (optionally int4/int8-quantized) llama-style
    checkpoint + tokenizer to ``out_dir``. Returns ``out_dir``."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    build_tokenizer(out, vocab_size=vocab_size)

    config = {
        "model_type": model_type,
        "hidden_size": hidden_size,
        "num_hidden_layers": num_layers,
        "num_attention_heads": num_heads,
        "num_key_value_heads": num_kv_heads,
        "intermediate_size": intermediate_size,
        "vocab_size": vocab_size,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,
        "max_position_embeddings": 2048,
        "torch_dtype": "bfloat16",
    }
    if bits:
        config["quantization"] = {"group_size": group_size, "bits": bits}

    def randw(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    weights: dict = {}

    def add_linear(name: str, out_f: int, in_f: int, quantize: bool = True):
        w = randw(out_f, in_f)
        if bits and quantize and in_f % group_size == 0:
            packed, scales, biases = _np_quantize(w, group_size, bits)
            weights[f"{name}.weight"] = packed
            weights[f"{name}.scales"] = scales.astype(np.float32)
            weights[f"{name}.biases"] = biases.astype(np.float32)
        else:
            weights[f"{name}.weight"] = w

    head_dim = hidden_size // num_heads
    add_linear("model.embed_tokens", vocab_size, hidden_size)

    if model_type in ("llama", "mistral", "qwen2"):
        for i in range(num_layers):
            p = f"model.layers.{i}"
            add_linear(f"{p}.self_attn.q_proj", num_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.k_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.v_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.o_proj", hidden_size, num_heads * head_dim)
            add_linear(f"{p}.mlp.gate_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.up_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.down_proj", hidden_size, intermediate_size)
            weights[f"{p}.input_layernorm.weight"] = np.ones(hidden_size, np.float32)
            weights[f"{p}.post_attention_layernorm.weight"] = np.ones(hidden_size, np.float32)
    elif model_type == "qwen3":
        config["head_dim"] = head_dim
        for i in range(num_layers):
            p = f"model.layers.{i}"
            add_linear(f"{p}.self_attn.q_proj", num_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.k_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.v_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.o_proj", hidden_size, num_heads * head_dim)
            weights[f"{p}.self_attn.q_norm.weight"] = np.ones(head_dim, np.float32)
            weights[f"{p}.self_attn.k_norm.weight"] = np.ones(head_dim, np.float32)
            add_linear(f"{p}.mlp.gate_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.up_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.down_proj", hidden_size, intermediate_size)
            weights[f"{p}.input_layernorm.weight"] = np.ones(hidden_size, np.float32)
            weights[f"{p}.post_attention_layernorm.weight"] = np.ones(hidden_size, np.float32)
    elif model_type == "gemma":
        config["head_dim"] = head_dim
        for i in range(num_layers):
            p = f"model.layers.{i}"
            add_linear(f"{p}.self_attn.q_proj", num_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.k_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.v_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.o_proj", hidden_size, num_heads * head_dim)
            add_linear(f"{p}.mlp.gate_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.up_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.down_proj", hidden_size, intermediate_size)
            weights[f"{p}.input_layernorm.weight"] = np.zeros(hidden_size, np.float32)
            weights[f"{p}.post_attention_layernorm.weight"] = np.zeros(hidden_size, np.float32)
    elif model_type == "gemma2":
        config["head_dim"] = head_dim
        config["query_pre_attn_scalar"] = float(head_dim)
        config["sliding_window"] = 32
        config["attn_logit_softcapping"] = 50.0
        config["final_logit_softcapping"] = 30.0
        for i in range(num_layers):
            p = f"model.layers.{i}"
            add_linear(f"{p}.self_attn.q_proj", num_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.k_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.v_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.o_proj", hidden_size, num_heads * head_dim)
            add_linear(f"{p}.mlp.gate_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.up_proj", intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.down_proj", hidden_size, intermediate_size)
            for nname in ("input_layernorm", "post_attention_layernorm",
                          "pre_feedforward_layernorm", "post_feedforward_layernorm"):
                weights[f"{p}.{nname}.weight"] = np.zeros(hidden_size, np.float32)
    elif model_type == "phi3":
        for i in range(num_layers):
            p = f"model.layers.{i}"
            add_linear(
                f"{p}.self_attn.qkv_proj",
                (num_heads + 2 * num_kv_heads) * head_dim,
                hidden_size,
            )
            add_linear(f"{p}.self_attn.o_proj", hidden_size, num_heads * head_dim)
            add_linear(f"{p}.mlp.gate_up_proj", 2 * intermediate_size, hidden_size)
            add_linear(f"{p}.mlp.down_proj", hidden_size, intermediate_size)
            weights[f"{p}.input_layernorm.weight"] = np.ones(hidden_size, np.float32)
            weights[f"{p}.post_attention_layernorm.weight"] = np.ones(hidden_size, np.float32)
    elif model_type == "mixtral":
        config["num_local_experts"] = 4
        config["num_experts_per_tok"] = 2
        for i in range(num_layers):
            p = f"model.layers.{i}"
            add_linear(f"{p}.self_attn.q_proj", num_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.k_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.v_proj", num_kv_heads * head_dim, hidden_size)
            add_linear(f"{p}.self_attn.o_proj", hidden_size, num_heads * head_dim)
            # Router stays float (reference keeps gate unquantized).
            add_linear(f"{p}.block_sparse_moe.gate", 4, hidden_size, quantize=False)
            for e in range(4):
                ep = f"{p}.block_sparse_moe.experts.{e}"
                add_linear(f"{ep}.w1", intermediate_size, hidden_size)
                add_linear(f"{ep}.w2", hidden_size, intermediate_size)
                add_linear(f"{ep}.w3", intermediate_size, hidden_size)
            weights[f"{p}.input_layernorm.weight"] = np.ones(hidden_size, np.float32)
            weights[f"{p}.post_attention_layernorm.weight"] = np.ones(hidden_size, np.float32)
    else:
        raise ValueError(f"tiny model factory: unknown model_type {model_type}")
    weights["model.norm.weight"] = (
        np.zeros(hidden_size, np.float32)
        if model_type in ("gemma", "gemma2")
        else np.ones(hidden_size, np.float32)
    )

    from safetensors.numpy import save_file

    save_file(weights, str(out / "model.safetensors"))
    with open(out / "config.json", "w") as f:
        json.dump(config, f, indent=2)
    return str(out)


def _np_quantize(w: np.ndarray, group_size: int, bits: int):
    """NumPy mirror of ops.quant.quantize (host-side, no device needed)."""
    n, k = w.shape
    levels = (1 << bits) - 1
    per_word = 32 // bits
    wg = w.reshape(n, k // group_size, group_size)
    w_min = wg.min(axis=-1)
    w_max = wg.max(axis=-1)
    scale = (w_max - w_min) / levels
    scale = np.where(scale <= 1e-10, 1.0, scale)
    q = np.clip(np.round((wg - w_min[..., None]) / scale[..., None]), 0, levels)
    q = q.astype(np.uint32).reshape(n, k // per_word, per_word)
    shifts = (np.arange(per_word, dtype=np.uint32) * bits).astype(np.uint32)
    packed = np.bitwise_or.reduce(q << shifts, axis=-1).astype(np.uint32)
    return packed, scale, w_min


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--fp", action="store_true", help="no quantization")
    args = ap.parse_args()
    path = build_tiny_model(args.out, bits=None if args.fp else args.bits)
    print(path)
