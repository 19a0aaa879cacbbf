"""Isolate the fused dequant-matmul kernel's VPU dequant cost: time the
real INT4 kernel vs variants with the scale-map multiply and/or the
int8->bf16 cast removed (wrong numerics — pure speed probes). If the
no-dequant variant is much faster, the kernel is VPU-bound and a
restructured scale application is the next perf lever."""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from bench import build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.ops import qmm, qmm_pallas  # noqa: E402


def make_variant(mode):
    """mode: 'full' | 'noscale' (cast, no multiply) | 'raw' (no cast path:
    int8 planes summed via dot in bf16 without scale)"""

    def _kernel4(xe_ref, xo_ref, xg_ref, w_ref, s_ref, b_ref, out_ref, *, reps):
        kt = pl.program_id(2)
        w = w_ref[0]
        even = pltpu.bitcast(w & jnp.uint32(0x0F0F0F0F), jnp.int8)
        odd = pltpu.bitcast((w >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F), jnp.int8)
        if mode == "full":
            s_map = pltpu.repeat(s_ref[:], reps, axis=0)
            we = even.astype(jnp.bfloat16) * s_map
            wo = odd.astype(jnp.bfloat16) * s_map
        else:
            we = even.astype(jnp.bfloat16)
            wo = odd.astype(jnp.bfloat16)
        acc = jnp.dot(xe_ref[:], we, preferred_element_type=jnp.float32)
        acc += jnp.dot(xo_ref[:], wo, preferred_element_type=jnp.float32)

        @pl.when(kt == 0)
        def _():
            out_ref[:] = acc + jnp.dot(
                xg_ref[:], b_ref[:], preferred_element_type=jnp.float32
            )

        @pl.when(kt != 0)
        def _():
            out_ref[:] = out_ref[:] + acc

    return _kernel4


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    model = build_random_quantized_llama(layers=1)
    p = model.params["model"]["layers"][0]["mlp"]["gate_up_proj"]
    k, n = 4096, 28672
    x0 = jnp.ones((batch, k), jnp.bfloat16)
    wb = p["wk"].size * 4

    for mode in ("full", "noscale"):
        qmm_pallas._kernel4 = make_variant(mode)

        def step(x):
            y = qmm.qmm(x, None, p["scales"], p["biases"], group_size=64,
                        bits=4, q_kernel=p["wk"])
            return jnp.tile(y[:, :k], (1, 1))

        def body(carry, _):
            return step(carry), None

        f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=64)[0])
        r = f(x0)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = f(x0)
        jax.block_until_ready(r)
        t = (time.perf_counter() - t0) / 64
        print(f"{mode}: {t*1e3:.3f} ms  {wb/1e9/t:.0f} GB/s")


if __name__ == "__main__":
    main()
