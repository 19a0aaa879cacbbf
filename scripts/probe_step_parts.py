"""Decompose the b8 decode step: where do the non-qmm milliseconds go?

Times (bench 7B model, batch 8, s_hot=512):
  chunk8   - engine._decode_chunk with n_steps=8, sequential dispatches
             (includes per-dispatch host/tunnel overhead every 8 steps)
  chunk64  - n_steps=64 (amortizes dispatch 8x)
  hidden64 - bare 64-step scan of apply_fn_hidden only (transformer body +
             KV, no lm_head, no sampling, no eos bookkeeping)
  logits64 - same but apply_fn (adds the lm_head projection)

per-step deltas: (logits64 - hidden64) = lm_head; (chunk64 - logits64) =
sampling + bookkeeping; (chunk8 - chunk64) = dispatch overhead.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import _BenchTokenizer, build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.core.engine import DecodeEngine  # noqa: E402

B = 8
S_HOT = 512
PROMPT = 128


class Bench:
    def __init__(self):
        self.model = build_random_quantized_llama(layers=32)
        tok = _BenchTokenizer()
        self.engine = DecodeEngine(
            self.model, tok, max_batch_size=B, max_context_length=8192
        )
        rng = np.random.default_rng(0)
        tokens_np = rng.integers(1, 30000, size=(B, PROMPT)).astype(np.int32)
        self.cache = self.engine._make_cache(B, S_HOT)
        last, self.cache = self.engine._prefill(
            self.model.params,
            jnp.asarray(tokens_np),
            jnp.full((B,), PROMPT, jnp.int32),
            self.cache,
        )
        self.tok0 = jnp.argmax(last, axis=-1).astype(jnp.int32)
        self.max_toks = jnp.full((B,), 10_000, jnp.int32)
        self.temps = jnp.zeros((B,), jnp.float32)
        self.top_ps = jnp.ones((B,), jnp.float32)
        self.eos = jnp.zeros((0,), jnp.int32)

    def run_chunks(self, n_steps, total=64):
        c, t = self.cache, self.tok0
        a = jnp.ones((B,), bool)
        cnt = jnp.ones((B,), jnp.int32)
        key = jax.random.PRNGKey(0)
        toks = None
        for _ in range(total // n_steps):
            toks, lps, t, a, cnt, key, c, _tc = self.engine._decode_chunk(
                self.model.params, c, t, a, cnt, self.max_toks,
                self.temps, self.top_ps, key, None, self.eos,
                n_steps, None, None, None, None, "greedy", S_HOT,
            )
        # block_until_ready returns early through the axon tunnel; a
        # device_get is the only real sync.
        np.asarray(jax.device_get(toks))
        self.cache = c

    def make_scan(self, use_logits):
        fn = (
            self.model.apply_fn()
            if use_logits
            else self.model.apply_fn_hidden()
        )

        def outer(params, c, t):
            # params MUST flow through the jit arg — closing over the 4.4GB
            # tree bakes it in as constants (25GB constant-folding hang).
            def body(carry, _):
                c, t = carry
                out, c2 = fn(params, t[:, None], c)
                if use_logits:
                    t2 = jnp.argmax(out[:, 0], axis=-1).astype(jnp.int32)
                else:
                    t2 = t + jnp.sum(out[:, 0, :1]).astype(jnp.int32) * 0
                return (c2, t2), None

            (c, t), _ = jax.lax.scan(body, (c, t), None, length=64)
            return c, t

        jf = jax.jit(outer, donate_argnums=(1,))

        def run():
            c, t = jf(self.model.params, self.cache, self.tok0)
            np.asarray(jax.device_get(t))
            self.cache = c

        return run

    def timeit(self, fn, iters=3):
        fn()  # compile/warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best


def main():
    b = Bench()
    t8 = b.timeit(lambda: b.run_chunks(8))
    t64 = b.timeit(lambda: b.run_chunks(64))
    th = b.timeit(b.make_scan(False))
    tl = b.timeit(b.make_scan(True))
    print(f"chunk8   per-step: {t8/64*1e3:7.3f} ms")
    print(f"chunk64  per-step: {t64/64*1e3:7.3f} ms")
    print(f"hidden64 per-step: {th/64*1e3:7.3f} ms")
    print(f"logits64 per-step: {tl/64*1e3:7.3f} ms")
    print(f"lm_head           {(tl-th)/64*1e3:7.3f} ms/step")
    print(f"sampling+book     {(t64-tl)/64*1e3:7.3f} ms/step")
    print(f"dispatch overhead {(t8-t64)/64*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
