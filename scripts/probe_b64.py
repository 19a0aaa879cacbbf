"""Batch-64 decode step probe (INT8 KV, S_hot 512) — the batch-scale lever.

SOL at b64 is 2x b32's; KV slab at S=512 int8 is ~8.6 GB and must coexist
with the 4 GB weights on one v5e chip.

Run: PROBE_B=64 JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 3600 python scripts/probe_b64.py
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402

from probe_step_fused import run_variant, B  # noqa: E402


def main():
    print(f"backend={jax.default_backend()} B={B}")
    full = run_variant("full kv8", kv_bits=8)
    print(f"tok/s at b{B}: {B / full:.1f}")
    noattn = run_variant("noattn kv8", ua=False, kv_bits=8)
    print(f"fused kernel total: {1000 * (full - noattn):.3f} ms/step")


if __name__ == "__main__":
    main()
