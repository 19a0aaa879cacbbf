"""Microprofile of the decode path on the live backend.

Times: trivial-op round trip, one fused qmm on decode shapes, one full
decode_chunk dispatch at several chunk sizes, and sampling alone.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_random_quantized_llama, _BenchTokenizer  # noqa: E402
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams  # noqa: E402
from mlx_parallm_tpu.ops import qmm, sampling  # noqa: E402


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        r = fn()
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print("backend:", jax.default_backend(), jax.devices())

    # 1. round-trip latency of a trivial op
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a + 1)
    t = timeit(lambda: f(x), n=20)
    print(f"trivial dispatch+sync: {t*1e3:.3f} ms")

    # 2. device_get latency
    y = f(x)
    t0 = time.perf_counter()
    for _ in range(20):
        np.asarray(jax.device_get(y))
    print(f"device_get 8x8: {(time.perf_counter()-t0)/20*1e3:.3f} ms")

    model = build_random_quantized_llama(layers=layers)
    p0 = model.params["model"]["layers"][0]

    # 3. single qmm decode shapes (batch, 4096) x gate_up (4096 -> 28672)
    xa = jnp.ones((batch, 4096), jnp.bfloat16)
    gu = p0["mlp"]["gate_up_proj"]

    def run_qmm():
        return qmm.qmm(
            xa, None, gu["scales"], gu["biases"],
            group_size=64, bits=4, q_kernel=gu["wk"],
        )

    t = timeit(run_qmm, n=20)
    gb = (gu["wk"].size * 4) / 1e9
    print(f"qmm gate_up (4096->28672) m={batch}: {t*1e3:.3f} ms  "
          f"({gb/t:.1f} GB/s weight stream)")

    down = p0["mlp"]["down_proj"]
    xb = jnp.ones((batch, 14336), jnp.bfloat16)

    def run_qmm2():
        return qmm.qmm(
            xb, None, down["scales"], down["biases"],
            group_size=64, bits=4, q_kernel=down["wk"],
        )

    t = timeit(run_qmm2, n=20)
    gb = (down["wk"].size * 4) / 1e9
    print(f"qmm down (14336->4096) m={batch}: {t*1e3:.3f} ms  "
          f"({gb/t:.1f} GB/s weight stream)")

    # 4. lm_head bf16 matmul (tied embedding)
    emb = model.params["model"]["embed_tokens"]["weight"]
    xh = jnp.ones((batch, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, w: a @ w.T)
    t = timeit(lambda: mm(xh, emb), n=20)
    print(f"lm_head bf16 (4096->32000): {t*1e3:.3f} ms "
          f"({emb.size*2/1e9/t:.1f} GB/s)")

    # 5. sampling alone (with argsort) vs greedy argmax
    logits = jnp.ones((batch, 32000), jnp.float32)
    key = jax.random.PRNGKey(0)
    temps = jnp.zeros((batch,))
    top_ps = jnp.ones((batch,))
    samp = jax.jit(lambda l, k: sampling.sample_tokens(l, k, temps, top_ps))
    t = timeit(lambda: samp(logits, key), n=20)
    print(f"sample_tokens (argsort path): {t*1e3:.3f} ms")
    am = jax.jit(lambda l: jnp.argmax(l, axis=-1))
    t = timeit(lambda: am(logits), n=20)
    print(f"pure argmax: {t*1e3:.3f} ms")

    # 6. full decode_chunk at chunk sizes
    tok = _BenchTokenizer()
    for chunk in (1, 8, 32):
        engine = DecodeEngine(
            model, tok, max_batch_size=batch, max_context_length=8192,
            decode_steps_per_call=chunk,
        )
        rng = np.random.default_rng(0)
        prompts = [
            [int(v) for v in rng.integers(1, 30000, size=128)]
            for _ in range(batch)
        ]
        sp = [SamplingParams(temperature=0.0, max_tokens=64) for _ in range(batch)]
        # warm
        n = 0
        t0 = time.perf_counter()
        first = None
        for step in engine.decode_batch(prompts, sp):
            if first is None:
                first = time.perf_counter() - t0
            n += sum(1 for x in step.tokens if x is not None)
        tot = time.perf_counter() - t0
        # timed second pass (compiled)
        n = 0
        t0 = time.perf_counter()
        first = None
        for step in engine.decode_batch(prompts, sp):
            if first is None:
                first = time.perf_counter() - t0
            n += sum(1 for x in step.tokens if x is not None)
        tot = time.perf_counter() - t0
        print(f"chunk={chunk}: ttft={first:.3f}s total={tot:.3f}s "
              f"decode={(n-batch)/(tot-first):.1f} tok/s  ({n} toks)")


if __name__ == "__main__":
    main()
