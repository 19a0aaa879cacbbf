"""Validate + time the vocab-padded lm_head kernel path.

N=32000 only tiles at nt=256 (measured 169 GB/s — small blocks); padding
to 32768 enables nt=1024. Checks numerics vs the dequant reference and
measures the streaming rate of both layouts at decode m=16.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mlx_parallm_tpu.ops import qmm, quant  # noqa: E402

K, N, GS, BITS = 4096, 32000, 64, 4
ITERS = 24


def build(padded: bool):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
    packed, scales, biases = quant.quantize(w, GS, BITS)
    if padded:
        nt, n_pad = quant.plan_n_tile(K, N, BITS, group_size=GS)
        pk, ps, pb = quant.pad_quantized_rows(packed, scales, biases, n_pad)
    else:
        nt, n_pad = 256, N
        pk, ps, pb = packed, scales, biases
    wk = quant.tile_kernel(quant.kernel_pack(pk, GS, BITS), nt)
    sk, bk = quant.kernel_scale_mirrors(ps, pb, BITS)
    return packed, scales, biases, wk, sk, bk, nt, n_pad


def check_and_time(padded: bool):
    packed, scales, biases, wk, sk, bk, nt, n_pad = build(padded)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    y = qmm.qmm(
        x, packed, scales, biases, group_size=GS, bits=BITS,
        q_kernel=wk, q_scales_t=sk, q_biases_t=bk, impl="pallas",
    )
    assert y.shape[-1] == n_pad, y.shape
    y_ref = qmm.qmm(
        x, packed, scales, biases, group_size=GS, bits=BITS, impl="dequant"
    )
    err = float(
        jnp.max(
            jnp.abs(
                y[:, :N].astype(jnp.float32) - y_ref.astype(jnp.float32)
            )
        )
    )
    ref_mag = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-9
    if padded:
        pad_mag = float(jnp.max(jnp.abs(y[:, N:].astype(jnp.float32))))
        assert pad_mag == 0.0, f"padded logits nonzero: {pad_mag}"

    def fn(xc, wk_, sk_, bk_):
        def step(c, _):
            yy = qmm.qmm(
                c, None, scales, biases, group_size=GS, bits=BITS,
                q_kernel=wk_, q_scales_t=sk_, q_biases_t=bk_, impl="pallas",
            )
            return (
                c.astype(jnp.float32) + jnp.sum(yy) * 1e-12
            ).astype(jnp.bfloat16), None

        return jax.lax.scan(step, xc, None, length=ITERS)[0]

    jf = jax.jit(fn)
    r = jf(x, wk, sk, bk)
    np.asarray(jax.device_get(r))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = jf(x, wk, sk, bk)
        np.asarray(jax.device_get(r))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    wb = wk.size * 4
    print(
        f"padded={padded} nt={nt} n_pad={n_pad} rel_err={err/ref_mag:.5f} "
        f"raw {wb/1e9/best:6.1f} GB/s ({best*1e3:.3f} ms incl ~fixed)",
        flush=True,
    )


def main():
    print(f"backend={jax.default_backend()}")
    check_and_time(False)
    check_and_time(True)


if __name__ == "__main__":
    main()
