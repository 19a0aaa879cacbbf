"""Verify + time the PRODUCTION qmm pallas kernel on TPU.

1. Numerics: qmm(impl=pallas) vs qmm(impl=dequant) for int4 and int8 on a
   real layer shape (random weights, MLX wire format via quant.quantize).
2. Rate: chained big-stream measurement of qmm.qmm on the 7B layer shapes
   at decode m (16) and throughput m (32), reporting achieved GB/s of
   packed-weight streaming (net of fixed overhead via small-call subtract).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mlx_parallm_tpu.ops import qmm, quant  # noqa: E402

ITERS = 24


def check_numerics(k=1024, n=1024, bits=4, gs=64):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32) * 0.05)
    packed, scales, biases = quant.quantize(w, gs, bits)
    nt = quant.choose_n_tile(k, n, bits, group_size=gs)
    wk = quant.tile_kernel(quant.kernel_pack(packed, gs, bits), nt)
    x = jnp.asarray(rng.normal(size=(8, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    y_ref = qmm.qmm(
        x, packed, scales, biases, group_size=gs, bits=bits, impl="dequant"
    )
    y_pal = qmm.qmm(
        x, packed, scales, biases, group_size=gs, bits=bits,
        q_kernel=wk, impl="pallas",
    )
    sk, bk = quant.kernel_scale_mirrors(scales, biases, bits)
    y_mir = qmm.qmm(
        x, packed, scales, biases, group_size=gs, bits=bits,
        q_kernel=wk, q_scales_t=sk, q_biases_t=bk, impl="pallas",
    )
    for tag, y in (("pallas", y_pal), ("pallas+mirrors", y_mir)):
        err = float(
            jnp.max(
                jnp.abs(y.astype(jnp.float32) - y_ref.astype(jnp.float32))
            )
        )
        scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-9
        rel = err / scale
        print(f"int{bits} {tag}: max_abs_err={err:.5f} rel={rel:.5f}", flush=True)
        assert rel < 2e-2, f"{tag} numerics off: rel={rel}"


def time_shape(m, k, n, bits=4, gs=64, chain=6, nt=None):
    """Chained qmm over `chain` distinct weight tensors per scan iter."""
    per_word = 32 // bits
    if nt is None:
        nt = quant.choose_n_tile(k, n, bits, group_size=gs)
    ws = []
    for i in range(chain):
        wk = jax.random.bits(
            jax.random.PRNGKey(i), (n // nt, k // per_word, nt), jnp.uint32
        )
        s = jnp.full((n, k // gs), 0.01, jnp.bfloat16)
        b = jnp.zeros((n, k // gs), jnp.bfloat16)
        sk, bk = quant.kernel_scale_mirrors(s, b, bits)
        ws.append((wk, s, b, sk, bk))

    def run(n_chain):
        def fn(x, *flat):
            trip = [flat[i : i + 5] for i in range(0, 5 * n_chain, 5)]

            def step(c, _):
                acc = c.astype(jnp.float32)
                for wk, s, b, sk, bk in trip:
                    y = qmm.qmm(
                        c, None, s, b, group_size=gs, bits=bits,
                        q_kernel=wk, q_scales_t=sk, q_biases_t=bk,
                        impl="pallas",
                    )
                    acc = acc + jnp.sum(y) * 1e-12
                return acc.astype(jnp.bfloat16), None

            return jax.lax.scan(step, x, None, length=ITERS)[0]

        flat = [a for trio in ws[:n_chain] for a in trio]
        jf = jax.jit(fn)
        x0 = jnp.ones((m, k), jnp.bfloat16)
        r = jf(x0, *flat)
        np.asarray(jax.device_get(r))  # block_until_ready lies (tunnel)
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
        f"m={m:3d} {k}x{n} int{bits} nt={nt}: t1={t1*1e3:7.3f} "
        f"tc={tc*1e3:8.3f} marginal {rate:6.1f} GB/s",
        flush=True,
    )
    return rate


def main():
    print(f"backend={jax.default_backend()}")
    check_numerics(bits=4)
    check_numerics(bits=8)
    time_shape(16, 4096, 28672)
    time_shape(16, 14336, 4096)            # nt=1024: kw split (n_kt=2)
    time_shape(16, 14336, 4096, nt=512)    # whole-K blocks
    time_shape(16, 4096, 6144)
    time_shape(16, 4096, 4096)
    time_shape(32, 4096, 28672)


if __name__ == "__main__":
    main()
