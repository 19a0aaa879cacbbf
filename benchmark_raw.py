"""Baseline comparison: sequential single-request generation through the
library API (no server, no batching).

Parity: reference /root/reference/benchmark_raw_mlx.py — the number the
batched server is compared against.

Usage: python benchmark_raw.py --model-path <dir> [--num-requests 4]
"""

from __future__ import annotations

import argparse
import time

from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.core.generate import get_engine
from mlx_parallm_tpu.core.loader import load

PROMPTS = [
    "Explain the difference between a list and a tuple in Python.",
    "What causes the seasons on Earth?",
    "Write a limerick about coffee.",
    "How does a hash map achieve O(1) lookup?",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--num-requests", type=int, default=4)
    ap.add_argument("--max-tokens", type=int, default=100)
    ns = ap.parse_args()

    model, tokenizer = load(ns.model_path)
    engine = get_engine(model, tokenizer)

    prompts = (PROMPTS * ((ns.num_requests // len(PROMPTS)) + 1))[: ns.num_requests]
    # Warmup / compile.
    warm = [SamplingParams(temperature=0.0, max_tokens=4)]
    for _ in engine.decode_batch([tokenizer.encode("warmup")], warm):
        pass

    total_tokens = 0
    t0 = time.perf_counter()
    for i, prompt in enumerate(prompts):
        ids = tokenizer.encode(prompt)
        sp = [SamplingParams(temperature=0.0, max_tokens=ns.max_tokens)]
        t_req = time.perf_counter()
        n = 0
        for step in engine.decode_batch([ids], sp):
            if step.tokens[0] is not None:
                n += 1
        dt = time.perf_counter() - t_req
        total_tokens += n
        print(f"request {i}: {n} tokens in {dt:.2f}s = {n/dt:.1f} tok/s")
    wall = time.perf_counter() - t0
    print(
        f"\nsequential total: {total_tokens} tokens in {wall:.2f}s "
        f"= {total_tokens/wall:.1f} tok/s"
    )


if __name__ == "__main__":
    main()
