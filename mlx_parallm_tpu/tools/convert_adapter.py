"""Adapter format conversion: ``adapter.npz`` -> ``adapters.safetensors``.

Parity: reference /root/reference/mlx_parallm/tools/convert_adapter.py:22-35.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def convert_adapter(npz_path: str, out_dir: str) -> str:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    with np.load(npz_path) as z:
        weights = {k: z[k] for k in z.files}
    out_path = os.path.join(out_dir, "adapters.safetensors")
    save_file(weights, out_path)
    return out_path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mlx_parallm_convert_adapter")
    ap.add_argument("npz_path")
    ap.add_argument("out_dir")
    ns = ap.parse_args(argv)
    print(convert_adapter(ns.npz_path, ns.out_dir))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
