"""qmm rates at m=64 (the b64 batch-scale config) vs m=16/32 and mt forcing.

b64's noattn step implied ~380 GB/s of qmm — far below the m=16/32 ~530.
Hunt where m=64 loses: mt=64 (auto) vs mt=32 vs nt variants.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 3000 python scripts/probe_qmm_m64.py
"""

import sys

import jax

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from probe_qmm_m32 import time_shape  # noqa: E402


def main():
    print(f"backend={jax.default_backend()}")
    for m in (32, 64):
        time_shape(m, 4096, 28672, 1024)
        time_shape(m, 4096, 28672, 512)
        time_shape(m, 14336, 4096, 512)
        time_shape(m, 4096, 4096, 1024)
    # mt forcing at m=64
    time_shape(64, 4096, 28672, 1024, mt=32)
    time_shape(64, 4096, 28672, 512, mt=32)
    time_shape(64, 14336, 4096, 512, mt=32)


if __name__ == "__main__":
    main()
