"""Can XLA's native int4 dot beat the custom qmm kernel body (~530 GB/s)?

Variants at decode shape m=16, K=4096, N=28672 (marginal GB/s of the
int4/bf16 weight bytes, chained big-stream method):

  bf16    - dense bf16 dot (traffic 4x int4; rate in BF16 bytes)
  int4    - w stored jnp.int4, dot(x, w.astype(bf16)) — does XLA fuse the
            upcast into the dot or materialize a bf16 copy in HBM?
  int4s   - + groupwise scale multiply (the full dequant semantics)
  int8    - same from int8 storage

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 3000 python scripts/probe_xla_int4.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 24
M, K, N = 16, 4096, 28672
GS = 64


def run_chain(make_w, body, wbytes, chain=6, label=""):
    ws = [make_w(i) for i in range(chain)]

    def run(n_chain):
        sel = ws[:n_chain]

        def fn2(x, *flat):
            per = len(sel[0])
            trip = [flat[i : i + per] for i in range(0, per * n_chain, per)]

            def step(c, _):
                acc = c.astype(jnp.float32)
                for w in trip:
                    y = body(c, *w)
                    acc = acc + jnp.sum(y) * 1e-12
                return acc.astype(jnp.bfloat16), None

            return jax.lax.scan(step, x, None, length=ITERS)[0]

        flat = [a for w in sel for a in w]
        jf = jax.jit(fn2)
        x0 = jnp.ones((M, K), jnp.bfloat16)
        r = jf(x0, *flat)
        np.asarray(jax.device_get(r))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = jf(x0, *flat)
            np.asarray(jax.device_get(r))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best

    t1 = run(1)
    tc = run(len(ws))
    rate = wbytes * (len(ws) - 1) / 1e9 / max(tc - t1, 1e-9)
    print(
        f"{label:6s}: t1={t1 * 1e3:7.3f} tc={tc * 1e3:8.3f} "
        f"marginal {rate:6.1f} GB/s of stored weight bytes",
        flush=True,
    )


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    g = K // GS

    def mk_bf16(i):
        return (
            jnp.asarray(
                rng.standard_normal((K, N)).astype(np.float32) * 0.02
            ).astype(jnp.bfloat16),
        )

    def body_bf16(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def mk_int4(i):
        vals = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
        return (jnp.asarray(vals).astype(jnp.int4),)

    def body_int4(x, w):
        return jnp.dot(
            x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )

    def mk_int4s(i):
        vals = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
        sc = jnp.asarray(
            rng.uniform(0.01, 0.02, size=(g, N)).astype(np.float32)
        ).astype(jnp.bfloat16)
        return (jnp.asarray(vals).astype(jnp.int4), sc)

    def body_int4s(x, w, sc):
        wd = w.astype(jnp.bfloat16).reshape(g, GS, N) * sc[:, None, :]
        return jnp.dot(
            x, wd.reshape(K, N), preferred_element_type=jnp.float32
        )

    def mk_int8(i):
        vals = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
        sc = jnp.asarray(
            rng.uniform(0.01, 0.02, size=(g, N)).astype(np.float32)
        ).astype(jnp.bfloat16)
        return (jnp.asarray(vals), sc)

    def body_int8(x, w, sc):
        wd = w.astype(jnp.bfloat16).reshape(g, GS, N) * sc[:, None, :]
        return jnp.dot(
            x, wd.reshape(K, N), preferred_element_type=jnp.float32
        )

    run_chain(mk_bf16, body_bf16, K * N * 2, label="bf16")
    run_chain(mk_int4, body_int4, K * N // 2, label="int4")
    run_chain(mk_int4s, body_int4s, K * N // 2, label="int4s")
    run_chain(mk_int8, body_int8, K * N, label="int8")


if __name__ == "__main__":
    main()
