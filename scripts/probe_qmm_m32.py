"""Hunt the m=32 and down_proj qmm rate laggards (VERDICT r4 #2).

Variants over (m, K, N, nt, mt), chained big-stream measurement with a
1-chain subtract (the only reliable method on the tunnel). mt is forced by
monkeypatching qmm_pallas._m_tile + clear_cache() per variant (jit reuses
traces across monkeypatches otherwise).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 3000 python scripts/probe_qmm_m32.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mlx_parallm_tpu.ops import qmm_pallas, quant  # noqa: E402

ITERS = 24
GS = 64
BITS = 4


def time_shape(m, k, n, nt, mt=None, chain=6):
    per_word = 32 // BITS
    if n % nt or (k * BITS // 32) % 8:
        print(f"skip m={m} {k}x{n} nt={nt}")
        return
    ws = []
    for i in range(chain):
        wk = jax.random.bits(
            jax.random.PRNGKey(i), (n // nt, k // per_word, nt), jnp.uint32
        )
        s = jnp.full((n, k // GS), 0.01, jnp.bfloat16)
        b = jnp.zeros((n, k // GS), jnp.bfloat16)
        sk, bk = quant.kernel_scale_mirrors(s, b, BITS)
        ws.append((wk, sk, bk))

    orig_mt = qmm_pallas._m_tile
    if mt is not None:
        qmm_pallas._m_tile = lambda m_pad: mt
    qmm_pallas.qmm_pallas.clear_cache()
    try:
        def run(n_chain):
            def fn(x, *flat):
                trip = [flat[i : i + 3] for i in range(0, 3 * n_chain, 3)]

                def step(c, _):
                    acc = c.astype(jnp.float32)
                    for wk, sk, bk in trip:
                        y = qmm_pallas.qmm_pallas(
                            c, wk, None, None, group_size=GS, bits=BITS,
                            scales_t=sk, biases_t=bk,
                        )
                        acc = acc + jnp.sum(y) * 1e-12
                    return acc.astype(jnp.bfloat16), None

                return jax.lax.scan(step, x, None, length=ITERS)[0]

            flat = [a for trio in ws[:n_chain] for a in trio]
            jf = jax.jit(fn)
            x0 = jnp.ones((m, k), jnp.bfloat16)
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
        tc = run(chain)
        wb = ws[0][0].size * 4
        rate = wb * (chain - 1) / 1e9 / max(tc - t1, 1e-9)
        print(
            f"m={m:3d} {k:5d}x{n:5d} nt={nt:4d} mt={mt or 'auto'}: "
            f"marginal {rate:6.1f} GB/s",
            flush=True,
        )
        return rate
    finally:
        qmm_pallas._m_tile = orig_mt
        qmm_pallas.qmm_pallas.clear_cache()


def main():
    print(f"backend={jax.default_backend()}")
    # head-to-head vs the CURRENT defaults (nt=1024 for K=4096 shapes,
    # nt=512 for down_proj)
    time_shape(16, 4096, 28672, 1024)
    time_shape(16, 4096, 28672, 512)
    time_shape(32, 4096, 28672, 1024)
    time_shape(32, 4096, 28672, 512)
    time_shape(16, 14336, 4096, 512)
    time_shape(32, 14336, 4096, 512)
    time_shape(32, 14336, 4096, 256)
    time_shape(16, 4096, 32768, 1024)
    time_shape(16, 4096, 32768, 512)


if __name__ == "__main__":
    main()
