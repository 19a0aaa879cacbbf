"""Library-usage demo of batch_generate (parity: reference demo.py).

Usage: python demo.py --model-path <dir>
"""

import argparse

from mlx_parallm_tpu.core.generate import batch_generate
from mlx_parallm_tpu.core.loader import load


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--max-tokens", type=int, default=50)
    ns = ap.parse_args()

    model, tokenizer = load(ns.model_path)
    prompts = [
        "What is the capital of France?",
        "Write a one-line poem about the sea.",
        "Name three prime numbers.",
    ]
    responses = batch_generate(
        model, tokenizer, prompts, max_tokens=ns.max_tokens, verbose=True
    )
    for prompt, response in zip(prompts, responses):
        print(f"\n>>> {prompt}\n{response}")


if __name__ == "__main__":
    main()
