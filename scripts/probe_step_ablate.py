"""Ablate the decode step's non-qmm components (b8, 7B, s_hot=512).

Variants of a bare 64-step hidden scan (patched BEFORE first trace —
jit caches ignore later monkeypatching):

  full    - unmodified transformer body (baseline; ~10.7 ms/step)
  noattn  - cached_attention returns q (skips QK/softmax/PV reads)
  nokv    - noattn + update_layer skips the KV slab write
  int8kv  - full body but the cache quantized (kv_bits=8): halves both
            the masked-rewrite and attention slab traffic

Deltas attribute the per-step cost of attention reads vs KV writes vs
everything else (op-chain latency).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import _BenchTokenizer, build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.core.engine import DecodeEngine  # noqa: E402
from mlx_parallm_tpu.models import base as MB  # noqa: E402
from mlx_parallm_tpu.ops import attention as ATT  # noqa: E402

B = 8
S_HOT = 512
PROMPT = 128
STEPS = 64

_ORIG_ATTN = ATT.cached_attention
_ORIG_UPD_F = MB.KVCache.update_layer
_ORIG_UPD_Q = MB.QuantizedKVCache.update_layer


def run_variant(name, *, attn=True, kv_write=True, kv_bits=16, no_defer=False):
    import os

    if no_defer:
        os.environ.pop("MLX_PARALLM_DEFER_KV", None)
    else:
        os.environ["MLX_PARALLM_DEFER_KV"] = "1"
    ATT.cached_attention = (
        _ORIG_ATTN if attn else (lambda q, cache, layer, **kw: q)
    )
    MB.KVCache.update_layer = (
        _ORIG_UPD_F if kv_write else (lambda self, layer, k, v: self)
    )
    MB.QuantizedKVCache.update_layer = (
        _ORIG_UPD_Q if kv_write else (lambda self, layer, k, v: self)
    )

    model = build_random_quantized_llama(layers=32)
    tok = _BenchTokenizer()
    engine = DecodeEngine(
        model, tok, max_batch_size=B, max_context_length=8192,
        kv_bits=kv_bits,
    )
    rng = np.random.default_rng(0)
    tokens_np = rng.integers(1, 30000, size=(B, PROMPT)).astype(np.int32)
    cache = engine._make_cache(B, S_HOT)
    last, cache = engine._prefill(
        model.params, jnp.asarray(tokens_np),
        jnp.full((B,), PROMPT, jnp.int32), cache,
    )
    tok0 = jnp.argmax(last, axis=-1).astype(jnp.int32)
    hidden_fn = model.apply_fn_hidden()

    def outer(params, c, t):
        def body(carry, _):
            c, t = carry
            out, c2 = hidden_fn(params, t[:, None], c)
            t2 = t + jnp.sum(out[:, 0, :1]).astype(jnp.int32) * 0
            return (c2, t2), None

        (c, t), _ = jax.lax.scan(body, (c, t), None, length=STEPS)
        return c, t

    jf = jax.jit(outer, donate_argnums=(1,))
    state = {"cache": cache}

    def run():
        c, t = jf(model.params, state["cache"], tok0)
        np.asarray(jax.device_get(t))  # real sync (block_until_ready lies)
        state["cache"] = c

    run()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:8s} {best/STEPS*1e3:7.3f} ms/step", flush=True)
    return best / STEPS


def main():
    print(f"backend={jax.default_backend()} B={B} S_HOT={S_HOT}")
    t_defer = run_variant("deferred")
    t_eager = run_variant("eager", no_defer=True)
    t_i8 = run_variant("int8kv-defer", kv_bits=8)
    t_i8e = run_variant("int8kv-eager", kv_bits=8, no_defer=True)
    print(f"defer vs eager (bf16): {(t_eager-t_defer)*1e3:7.3f} ms/step")
    print(f"defer vs eager (int8): {(t_i8e-t_i8)*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
