"""Checkpoint conversion / quantization pipeline.

Parity: reference ``convert()`` (reference: /root/reference/mlx_parallm/utils.py:759-981)
— fetch a HF model, cast dtype, group-quantize (writing the
``{"quantization": {group_size, bits}}`` config contract) or dequantize, save
sharded safetensors (≤5 GB shards + ``model.safetensors.index.json``), copy
tokenizer files, optionally upload to hub.
"""

from __future__ import annotations

import glob
import json
import logging
import shutil
from pathlib import Path
from typing import Optional

import numpy as np

from ..core import loader as loader_mod
from .tiny_model import _np_quantize

logger = logging.getLogger(__name__)

MAX_FILE_SIZE_GB = 5

QUANT_SKIP_SUBSTRINGS = (
    "norm",
    "ln_",
    "layernorm",
    "rotary",
    "bias",
    "gate.weight",  # MoE routers stay float
)


def _should_quantize(name: str, arr: np.ndarray, group_size: int) -> bool:
    if not name.endswith(".weight"):
        return False
    low = name.lower()
    if any(s in low for s in QUANT_SKIP_SUBSTRINGS):
        return False
    if arr.ndim != 2 or arr.shape[-1] % group_size != 0:
        return False
    return True


def quantize_model_weights(
    weights: dict, config: dict, group_size: int = 64, bits: int = 4
) -> dict:
    """Group-quantize eligible 2D float weights
    (parity: reference quantize_model utils.py:888-908)."""
    out = {}
    for name, arr in weights.items():
        if np.issubdtype(arr.dtype, np.floating) and _should_quantize(
            name, arr, group_size
        ):
            packed, scales, biases = _np_quantize(
                arr.astype(np.float32), group_size, bits
            )
            base = name[: -len(".weight")]
            out[f"{base}.weight"] = packed
            out[f"{base}.scales"] = scales.astype(np.float16)
            out[f"{base}.biases"] = biases.astype(np.float16)
        else:
            out[name] = arr
    config = dict(config)
    config["quantization"] = {"group_size": group_size, "bits": bits}
    return out, config


def dequantize_model_weights(weights: dict, config: dict) -> dict:
    """Inverse transform for quantized checkpoints."""
    qz = config.get("quantization")
    if not qz:
        return weights, config
    gs, bits = int(qz.get("group_size", 64)), int(qz.get("bits", 4))
    per_word = 32 // bits
    out = {}
    for name, arr in weights.items():
        if name.endswith(".scales") or name.endswith(".biases"):
            continue
        base = name[: -len(".weight")] if name.endswith(".weight") else None
        if base is not None and f"{base}.scales" in weights:
            packed = arr.astype(np.uint32)
            scales = weights[f"{base}.scales"].astype(np.float32)
            biases = weights[f"{base}.biases"].astype(np.float32)
            n, kw = packed.shape
            shifts = (np.arange(per_word, dtype=np.uint32) * bits).astype(np.uint32)
            mask = np.uint32((1 << bits) - 1)
            vals = ((packed[..., None] >> shifts) & mask).reshape(n, kw * per_word)
            g = vals.shape[1] // gs
            deq = (
                vals.reshape(n, g, gs).astype(np.float32) * scales[..., None]
                + biases[..., None]
            ).reshape(n, -1)
            out[name] = deq.astype(np.float16)
        else:
            out[name] = arr
    config = dict(config)
    config.pop("quantization", None)
    return out, config


def make_shards(weights: dict, max_file_size_gb: float = MAX_FILE_SIZE_GB):
    """Split weights into ≤N GB shards (parity: reference utils.py:759-780)."""
    max_bytes = int(max_file_size_gb * (1 << 30))
    shards, shard, size = [], {}, 0
    for k, v in weights.items():
        nbytes = v.nbytes
        if shard and size + nbytes > max_bytes:
            shards.append(shard)
            shard, size = {}, 0
        shard[k] = v
        size += nbytes
    if shard:
        shards.append(shard)
    return shards


def save_weights(out_dir: Path, weights: dict) -> None:
    """Sharded safetensors + index (parity: reference utils.py:836-885)."""
    from safetensors.numpy import save_file

    out_dir.mkdir(parents=True, exist_ok=True)
    shards = make_shards(weights)
    n = len(shards)
    total = sum(v.nbytes for v in weights.values())
    index = {"metadata": {"total_size": total}, "weight_map": {}}
    for i, shard in enumerate(shards, 1):
        name = (
            "model.safetensors"
            if n == 1
            else f"model-{i:05d}-of-{n:05d}.safetensors"
        )
        save_file(shard, str(out_dir / name))
        for k in shard:
            index["weight_map"][k] = name
    if n > 1:
        with open(out_dir / "model.safetensors.index.json", "w") as f:
            json.dump(index, f, indent=2)


def convert(
    hf_path: str,
    tpu_path: str = "tpu_model",
    quantize: bool = False,
    q_group_size: int = 64,
    q_bits: int = 4,
    dtype: str = "float16",
    dequantize: bool = False,
    upload_repo: Optional[str] = None,
) -> str:
    """HF/MLX checkpoint -> native checkpoint, optionally (de)quantized
    (parity: reference utils.py:934-981)."""
    if quantize and dequantize:
        raise ValueError("Choose either quantize or dequantize, not both.")
    src = loader_mod.get_model_path(hf_path)
    config = loader_mod.load_config(src)
    weights = loader_mod._load_safetensors(src)

    # dtype cast for float tensors (skip quantized artifacts).
    np_dtype = {"float16": np.float16, "bfloat16": np.float32, "float32": np.float32}[dtype]
    casted = {}
    for k, v in weights.items():
        if np.issubdtype(v.dtype, np.floating) and not (
            k.endswith(".scales") or k.endswith(".biases")
        ):
            casted[k] = v.astype(np_dtype)
        else:
            casted[k] = v
    weights = casted

    if quantize:
        logger.info("Quantizing to %d bits (group %d)", q_bits, q_group_size)
        weights, config = quantize_model_weights(
            weights, config, q_group_size, q_bits
        )
    elif dequantize:
        weights, config = dequantize_model_weights(weights, config)

    out = Path(tpu_path)
    save_weights(out, weights)
    with open(out / "config.json", "w") as f:
        json.dump(config, f, indent=2)
    # Copy tokenizer + aux files.
    for pattern in ("tokenizer*", "*.py", "generation_config.json", "special_tokens_map.json"):
        for fp in glob.glob(str(src / pattern)):
            shutil.copy(fp, out)
    if upload_repo:
        upload_to_hub(str(out), upload_repo, hf_path)
    return str(out)



def generate_model_card(upload_repo: str, hf_path: str) -> str:
    """Model-card markdown for an uploaded conversion (parity: reference
    utils.py:798-820 builds the same structure via huggingface ModelCard)."""
    from .. import __version__

    return f"""---
tags:
- mlx-parallm-tpu
---

# {upload_repo}

The model [{upload_repo}](https://huggingface.co/{upload_repo}) was
converted to the mlx_parallm_tpu native format from
[{hf_path}](https://huggingface.co/{hf_path}) using mlx_parallm_tpu
version **{__version__}**.

## Use with mlx_parallm_tpu

```python
from mlx_parallm_tpu.core.loader import load
from mlx_parallm_tpu.core.generate import generate

model, tokenizer = load("{upload_repo}")
print(generate(model, tokenizer, prompt="hello"))
```
"""


def upload_to_hub(path: str, upload_repo: str, hf_path: str, api=None) -> bool:
    """Upload a converted checkpoint to the Hugging Face hub (parity:
    reference utils.py:783-831). Writes a model card into ``path`` first.

    ``api``: optional pre-built client (tests inject a mock). Without one,
    huggingface_hub is imported lazily; if it is unavailable or the network
    is unreachable the upload degrades gracefully to a warning and returns
    False — the local conversion output is complete either way."""
    card_path = Path(path) / "README.md"
    card_path.write_text(generate_model_card(upload_repo, hf_path))
    if api is None:
        try:
            from huggingface_hub import HfApi

            api = HfApi()
        except Exception as e:  # pragma: no cover - env without hub client
            logger.warning("upload_to_hub skipped (no hub client): %s", e)
            return False
    try:
        api.create_repo(repo_id=upload_repo, exist_ok=True)
        api.upload_folder(
            folder_path=str(path),
            repo_id=upload_repo,
            repo_type="model",
        )
        logger.info("Uploaded %s to %s", path, upload_repo)
        return True
    except Exception as e:
        logger.warning("upload_to_hub failed (offline?): %s", e)
        return False


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="mlx_parallm_convert")
    ap.add_argument("--hf-path", required=True)
    ap.add_argument("--tpu-path", default="tpu_model")
    ap.add_argument("-q", "--quantize", action="store_true")
    ap.add_argument("--q-group-size", type=int, default=64)
    ap.add_argument("--q-bits", type=int, default=4)
    ap.add_argument("--dtype", default="float16")
    ap.add_argument("--dequantize", action="store_true")
    ns = ap.parse_args(argv)
    out = convert(
        ns.hf_path,
        ns.tpu_path,
        quantize=ns.quantize,
        q_group_size=ns.q_group_size,
        q_bits=ns.q_bits,
        dtype=ns.dtype,
        dequantize=ns.dequantize,
    )
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
