"""Merge a LoRA adapter into base weights, producing a standalone checkpoint.

The reference ships only a stub here (reference:
/root/reference/mlx_parallm/tools/merge_lora.py:11-14 prints "not implemented
yet"); the capability is documented as planned (RL_TRAINER.md:809). This is
the real implementation: for float linears ``W' = W + scale * B @ A``; for
quantized linears the base is dequantized, the delta added, and the result
requantized at the same group size / bits.
"""

from __future__ import annotations

import argparse
import json
import logging
import shutil
from pathlib import Path

import numpy as np

from ..core import loader as loader_mod
from ..rl_training.weight_updater import _load_adapter_flat, _normalize_key, _read_adapter_config
from .convert import save_weights
from .tiny_model import _np_quantize

logger = logging.getLogger(__name__)


def _np_dequant(packed, scales, biases, gs, bits):
    per_word = 32 // bits
    mask = np.uint32((1 << bits) - 1)
    shifts = (np.arange(per_word, dtype=np.uint32) * bits).astype(np.uint32)
    n, kw = packed.shape
    vals = ((packed.astype(np.uint32)[..., None] >> shifts) & mask).reshape(n, -1)
    g = vals.shape[1] // gs
    return (
        vals.reshape(n, g, gs).astype(np.float32)
        * scales.astype(np.float32)[..., None]
        + biases.astype(np.float32)[..., None]
    ).reshape(n, -1)


def merge_lora(model_path: str, adapter_path: str, out_dir: str) -> str:
    src = loader_mod.get_model_path(model_path)
    config = loader_mod.load_config(src)
    weights = dict(loader_mod._load_safetensors(src))
    adapter = {_normalize_key(k): v for k, v in _load_adapter_flat(adapter_path).items()}

    acfg = _read_adapter_config(adapter_path) or {}
    scale = float(acfg.get("lora_parameters", {}).get("scale", 10.0))
    rank = None

    qz = config.get("quantization")
    gs = int(qz["group_size"]) if qz else None
    bits = int(qz["bits"]) if qz else None

    merged_count = 0
    lora_bases = sorted(
        {k[: -len(".lora_a")] for k in adapter if k.endswith(".lora_a")}
    )
    for base in lora_bases:
        a = adapter[f"{base}.lora_a"].astype(np.float32)  # (r, K)
        b = adapter[f"{base}.lora_b"].astype(np.float32)  # (N, r)
        # mlx_lm scale semantics: delta = scale * B @ A (matches lora_init
        # and weight_updater — one convention everywhere).
        delta = scale * (b @ a)  # (N, K)
        wkey = f"{base}.weight"
        if wkey not in weights:
            logger.warning("No base weight for adapter target %s; skipping", base)
            continue
        if f"{base}.scales" in weights:
            w = _np_dequant(
                weights[wkey],
                weights[f"{base}.scales"],
                weights[f"{base}.biases"],
                gs,
                bits,
            )
            packed, scales, biases = _np_quantize(w + delta, gs, bits)
            weights[wkey] = packed
            weights[f"{base}.scales"] = scales.astype(
                weights[f"{base}.scales"].dtype
            )
            weights[f"{base}.biases"] = biases.astype(
                weights[f"{base}.biases"].dtype
            )
        else:
            weights[wkey] = (weights[wkey].astype(np.float32) + delta).astype(
                weights[wkey].dtype
            )
        merged_count += 1

    out = Path(out_dir)
    save_weights(out, weights)
    with open(out / "config.json", "w") as f:
        json.dump(config, f, indent=2)
    import glob

    for pattern in ("tokenizer*", "generation_config.json", "special_tokens_map.json"):
        for fp in glob.glob(str(src / pattern)):
            shutil.copy(fp, out)
    logger.info("Merged %d adapted linears into %s", merged_count, out)
    return str(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mlx_parallm_merge_lora")
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--adapter-path", required=True)
    ap.add_argument("--out-dir", required=True)
    ns = ap.parse_args(argv)
    print(merge_lora(ns.model_path, ns.adapter_path, ns.out_dir))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
