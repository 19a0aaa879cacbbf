"""Attribute the gap between the raw prefill forward (~120 ms at b8/p128)
and the engine's TTFT (~225 ms): host-side arrays, cache acquire, prefill
dispatch, sampling, sync, and the first-token device->host pulls.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 2400 python scripts/probe_ttft.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.ops import sampling


def sync(x):
    return np.asarray(jax.device_get(x))


def main():
    model = bench.build_random_quantized_llama(layers=32)
    tok = bench._BenchTokenizer()
    engine = DecodeEngine(
        model, tok, max_batch_size=8, max_context_length=8192
    )
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(1, 30000, size=128)] for _ in range(8)
    ]
    sp = [SamplingParams(temperature=0.0, max_tokens=128) for _ in range(8)]

    # engine-level TTFT (as bench measures it)
    def engine_ttft():
        t0 = time.perf_counter()
        it = engine.decode_batch(prompts, sp)
        next(it)
        ttft = time.perf_counter() - t0
        for _ in it:
            pass
        return ttft

    engine_ttft()  # compile
    vals = [engine_ttft() for _ in range(3)]
    print(f"engine TTFT: {[round(1000 * v, 1) for v in vals]} ms", flush=True)

    # manual decomposition of the same path
    b_pad, t_pad, cap = 8, 128, 512
    tokens_np = np.zeros((b_pad, t_pad), dtype=np.int32)
    for i, p in enumerate(prompts):
        tokens_np[i, : len(p)] = p
    lengths_np = np.full((b_pad,), 128, dtype=np.int32)
    temps = jnp.zeros((b_pad,), jnp.float32)
    top_ps = jnp.ones((b_pad,), jnp.float32)

    def stages():
        marks = [("start", time.perf_counter())]
        cache = engine._make_cache(b_pad, cap)
        marks.append(("make_cache", time.perf_counter()))
        feed = jnp.asarray(tokens_np)
        lens = jnp.asarray(lengths_np)
        marks.append(("h2d", time.perf_counter()))
        last, cache = engine._prefill(model.params, feed, lens, cache)
        marks.append(("prefill_dispatch", time.perf_counter()))
        key = jax.random.PRNGKey(0)
        toks, lps = sampling.sample_tokens(
            last, key, temps, top_ps, None, mode="greedy"
        )
        marks.append(("sample_dispatch", time.perf_counter()))
        toks.block_until_ready()
        marks.append(("block_until_ready", time.perf_counter()))
        th = np.asarray(jax.device_get(toks))
        marks.append(("device_get tok", time.perf_counter()))
        lh = np.asarray(jax.device_get(lps))
        marks.append(("device_get lp", time.perf_counter()))
        engine.kv_pool.release(cache)
        out = []
        for (n0, v0), (n1, v1) in zip(marks, marks[1:]):
            out.append(f"{n1}: {1000 * (v1 - v0):6.1f}")
        return "  ".join(out)

    stages()  # compile
    for _ in range(3):
        print(stages(), flush=True)

    # fused single-transfer variant of the tail
    def fused_tail():
        cache = engine._make_cache(b_pad, cap)
        feed = jnp.asarray(tokens_np)
        lens = jnp.asarray(lengths_np)
        t0 = time.perf_counter()
        last, cache = engine._prefill(model.params, feed, lens, cache)
        key = jax.random.PRNGKey(0)
        toks, lps = sampling.sample_tokens(
            last, key, temps, top_ps, None, mode="greedy"
        )
        both = jnp.concatenate(
            [toks.astype(jnp.float32)[:, None], lps[:, None]], axis=1
        )
        bh = np.asarray(jax.device_get(both))
        dt = time.perf_counter() - t0
        engine.kv_pool.release(cache)
        return dt

    fused_tail()
    vals = [fused_tail() for _ in range(3)]
    print(
        f"prefill+sample+ONE fused pull: "
        f"{[round(1000 * v, 1) for v in vals]} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
