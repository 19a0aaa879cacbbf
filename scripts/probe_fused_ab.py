"""Same-process A/B: fused append+attend decode kernel vs the eager
masked-rewrite + XLA attention path, on the real chip.

Builds the bench's 7B-class INT4 model once, then times b8/b32 decode with
MLX_PARALLM_NO_FUSED toggled between engine builds (the env var is read at
trace time; each DecodeEngine owns fresh jit wrappers, so both variants
trace and compile in this one process — the only trustworthy comparison on
the tunnel, cross-run variance is up to 60%).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 2400 python scripts/probe_fused_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.ops import attention as ATT


def run_engine(model, tok, prompts, batch, steps, chunk):
    eng = DecodeEngine(
        model, tok, max_batch_size=batch, max_context_length=8192,
        decode_steps_per_call=chunk,
    )
    sp = [SamplingParams(temperature=0.0, max_tokens=steps) for _ in prompts]

    def once():
        for _ in eng.decode_batch(prompts, sp):
            pass
        return eng.metrics["last_decode_tps"]

    once()  # compile at identical shapes
    tps = once()
    return tps


def main():
    steps = int(os.environ.get("AB_STEPS", 128))
    model = bench.build_random_quantized_llama(layers=32)
    tok = bench._BenchTokenizer()
    rng = np.random.default_rng(0)

    for batch, chunk in ((8, 8), (32, 16)):
        prompts = [
            [int(x) for x in rng.integers(1, 30000, size=128)]
            for _ in range(batch)
        ]
        results = {}
        for label, env in (("eager", "1"), ("fused", "0")):
            os.environ["MLX_PARALLM_NO_FUSED"] = env
            n0 = ATT.FUSED_DISPATCHES
            t0 = time.perf_counter()
            tps = run_engine(model, tok, prompts, batch, steps, chunk)
            wall = time.perf_counter() - t0
            used = ATT.FUSED_DISPATCHES - n0
            results[label] = tps
            print(
                f"b{batch} {label}: {tps:.1f} tok/s "
                f"(fused dispatches {used}, wall {wall:.0f}s)",
                flush=True,
            )
        if results["eager"]:
            print(
                f"b{batch} fused/eager = "
                f"{results['fused'] / results['eager']:.3f}",
                flush=True,
            )
    os.environ.pop("MLX_PARALLM_NO_FUSED", None)


if __name__ == "__main__":
    main()
