"""Checkpoint inspector CLI.

Parity: reference /root/reference/mlx_parallm/tools/show_checkpoint.py:31-88 —
prints root ``metadata.json``, enumerates ``step_*`` dirs, shows the latest
adapter metadata.
"""

from __future__ import annotations

import argparse
import json
import os


def show_checkpoint(checkpoint_dir: str) -> None:
    meta_path = os.path.join(checkpoint_dir, "metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        print("=== Checkpoint metadata ===")
        print(json.dumps(meta, indent=2))
    else:
        print(f"(no metadata.json in {checkpoint_dir})")

    steps = []
    for name in sorted(os.listdir(checkpoint_dir)):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    steps.sort()
    print(f"\n=== Adapter checkpoints ({len(steps)}) ===")
    for step, name in steps:
        step_dir = os.path.join(checkpoint_dir, name)
        files = sorted(os.listdir(step_dir))
        size = sum(
            os.path.getsize(os.path.join(step_dir, f)) for f in files
        )
        print(f"  {name}: {len(files)} files, {size / 1e6:.1f} MB")

    if steps:
        latest = os.path.join(checkpoint_dir, steps[-1][1], "adapter.json")
        if os.path.exists(latest):
            with open(latest) as f:
                print("\n=== Latest adapter ===")
                print(json.dumps(json.load(f), indent=2))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mlx_parallm_show_checkpoint")
    ap.add_argument("checkpoint_dir")
    ns = ap.parse_args(argv)
    show_checkpoint(ns.checkpoint_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
