"""Standalone LoRA initialization: write an adapter dir for a model BEFORE
launching the server/trainer.

Parity: reference /root/reference/init_lora_standalone.py:26-128 (superset
target keys q/k/v/o).

Usage: python init_lora_standalone.py --model-path <dir> --output-dir <dir>
       [--rank 16] [--num-layers 8] [--keys q_proj,k_proj,v_proj,o_proj]
"""

from __future__ import annotations

import argparse
import logging

from mlx_parallm_tpu.core.loader import load
from mlx_parallm_tpu.rl_training.lora_init import (
    inject_lora,
    save_initial_adapter,
)

logging.basicConfig(level=logging.INFO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--num-layers", type=int, default=8)
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument(
        "--keys",
        default="q_proj,v_proj",
        help="comma-separated projection names (prefixed with self_attn.)",
    )
    ns = ap.parse_args()

    model, _ = load(ns.model_path)
    keys = [f"self_attn.{k.strip()}" for k in ns.keys.split(",")]
    n = inject_lora(
        model, rank=ns.rank, num_layers=ns.num_layers, scale=ns.scale, keys=keys
    )
    if n == 0:
        print("No target linears found; nothing to do")
        return 1
    out = save_initial_adapter(
        model,
        ns.output_dir,
        rank=ns.rank,
        num_layers=ns.num_layers,
        scale=ns.scale,
        keys=keys,
    )
    print(f"Initialized LoRA on {n} linears -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
