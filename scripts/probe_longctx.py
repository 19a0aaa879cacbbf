"""Isolate the ctx-2k INT8-KV decode slowness (bench recorded 289 tok/s =
27.7 ms/step vs ~9 ms expected). Variants via env:

  MLX_PARALLM_DEFER_KV=1  -> deferred commit + flash-stats merge (experiment)
  MLX_PARALLM_NO_FLASH=1  -> XLA attention (dequant fallback)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _BenchTokenizer, build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams  # noqa: E402

B = 8
PROMPT = 2048
STEPS = 96


def run(tag):
    from mlx_parallm_tpu.ops import attention as ATT

    model = build_random_quantized_llama(layers=32)
    tok = _BenchTokenizer()
    engine = DecodeEngine(
        model, tok, max_batch_size=B, max_context_length=4096,
        kv_bits=8, decode_steps_per_call=16,
    )
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(1, 30000, size=PROMPT)]
        for _ in range(B)
    ]
    os.environ.setdefault("MLX_PARALLM_PREFILL_CHUNK", "512")

    def once():
        sp = [
            SamplingParams(temperature=0.0, max_tokens=STEPS)
            for _ in range(B)
        ]
        for _ in engine.decode_batch(prompts, sp):
            pass
        return engine.metrics["last_decode_tps"]

    n0 = ATT.FLASH_DISPATCHES
    once()
    tps = once()
    print(
        f"{tag}: {tps:8.1f} tok/s  ({B/ tps*1e3:6.2f} ms/step)  "
        f"flash_traced={ATT.FLASH_DISPATCHES > n0}",
        flush=True,
    )


if __name__ == "__main__":
    tag = os.environ.get("TAG", "run")
    run(tag)
