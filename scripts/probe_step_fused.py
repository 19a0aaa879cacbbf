"""Decode-step decomposition in the fused-kernel era (b8, 7B, s_hot=512).

Variants of a bare 64-step hidden scan, patched BEFORE first trace:

  full     - transformer body with the fused append+attend kernel
  eager    - MLX_PARALLM_NO_FUSED=1 (masked rewrite + XLA attention)
  noattn   - update_and_attend returns (q, cache): no KV write, no attend
             -> delta vs full = total fused-kernel cost/step
  norope   - rope.apply_rope returns x unchanged
  nonorm   - params.rms_norm returns x unchanged (numerics-invalid,
             time-valid: same shapes/dtypes)
  int8kv   - full with kv_bits=8 (halved kernel slab traffic)

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 3600 python scripts/probe_step_fused.py
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _BenchTokenizer, build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.core import params as P  # noqa: E402
from mlx_parallm_tpu.core.engine import DecodeEngine  # noqa: E402
from mlx_parallm_tpu.ops import attention as ATT  # noqa: E402
from mlx_parallm_tpu.ops import rope as R  # noqa: E402

B = int(os.environ.get("PROBE_B", 8))
S_HOT = int(os.environ.get("PROBE_SHOT", 512))
PROMPT = 128
STEPS = 64

_ORIG_UA = ATT.update_and_attend
_ORIG_ROPE = R.apply_rope
_ORIG_NORM = P.rms_norm


def run_variant(name, *, ua=True, rope=True, norm=True, kv_bits=16,
                fused=True):
    os.environ.pop("MLX_PARALLM_NO_FUSED", None)
    if not fused:
        os.environ["MLX_PARALLM_NO_FUSED"] = "1"
    ATT.update_and_attend = (
        _ORIG_UA if ua else (lambda q, k, v, cache, layer, **kw: (q, cache))
    )
    R.apply_rope = _ORIG_ROPE if rope else (lambda x, positions, **kw: x)
    P.rms_norm = _ORIG_NORM if norm else (lambda w, x, eps: x)

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
            # Data-dependent (not constant-foldable) ~zero term: `* 0`
            # would let XLA DCE the whole body when the cache carry is
            # unchanged (the noattn variant measured 0.38 ms/step of
            # nothing).
            t2 = t + (
                jnp.sum(out[:, 0, :1].astype(jnp.float32)) * 1e-30
            ).astype(jnp.int32)
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
    print(f"{name:8s} {best / STEPS * 1e3:7.3f} ms/step", flush=True)
    ATT.update_and_attend = _ORIG_UA
    R.apply_rope = _ORIG_ROPE
    P.rms_norm = _ORIG_NORM
    os.environ.pop("MLX_PARALLM_NO_FUSED", None)
    return best / STEPS


def main():
    print(f"backend={jax.default_backend()}")
    full = run_variant("full")
    noattn = run_variant("noattn", ua=False)
    print(
        f"fused kernel total: {1000 * (full - noattn):.3f} ms/step",
        flush=True,
    )


if __name__ == "__main__":
    main()
