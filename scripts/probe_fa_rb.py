"""A/B the flash_append multi-row grid (rb) and VMEM budget at b32.

Measures full-step time and the fused-kernel delta (full - noattn) for
combinations of kv_bits x (FA_RB, FA_VMEM). Same-process comparisons only
(cross-run variance ~15%, docs/PERF_NOTES.md).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 3600 python scripts/probe_fa_rb.py
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402

from probe_step_fused import run_variant  # noqa: E402


def main():
    print(f"backend={jax.default_backend()}")
    for kv_bits, rb, vmem_mb in [
        (8, 1, 8),
        (8, 4, 8),
        (8, 8, 12),
        (16, 2, 8),
        (16, 4, 14),
    ]:
        os.environ["MLX_PARALLM_FA_RB"] = str(rb)
        os.environ["MLX_PARALLM_FA_VMEM"] = str(vmem_mb * 2**20)
        tag = f"kv{kv_bits} rb{rb} v{vmem_mb}M"
        try:
            full = run_variant(f"full {tag}", kv_bits=kv_bits)
        except Exception as e:  # Mosaic VMEM OOM etc.
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
    os.environ.pop("MLX_PARALLM_FA_RB", None)
    os.environ.pop("MLX_PARALLM_FA_VMEM", None)


if __name__ == "__main__":
    main()
