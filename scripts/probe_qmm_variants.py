"""Speed-probe alternative INT4 dequant-matmul kernel structures on random
data (numerics irrelevant; layouts simulated by shape):

  A: current production kernel (weight-side s_map multiply), via qmm.qmm
  B: per-group dots + output-side scaling (no weight-side multiply):
     groups contiguous in plane rows; for each group g, a
     (mt, reps) @ (reps, NT) bf16 dot, scaled into the accumulator by
     s[g, :] — weight elements get a CAST but no multiply.
  C: like B but coarser: GB groups per dot with the scale approximated
     uniform across the block — measures the small-K dot overhead curve.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from bench import build_random_quantized_llama  # noqa: E402
from mlx_parallm_tpu.ops import qmm  # noqa: E402

ITERS = 64
K, N = 4096, 28672
GS = 64
NT = 2048
KW_T = 512  # whole K in one grid step (matches production for this shape)
ROWS = 4 * KW_T  # 2048 plane rows per plane pair? (int4: 2 planes x K/2)


def kernel_groupdots(xe_ref, xo_ref, w_ref, s_ref, out_ref, *, reps, gb):
    """Per-group(-block) dots with output-side scaling. Plane rows assumed
    group-contiguous. gb = groups per dot block."""
    w = w_ref[0]
    even = pltpu.bitcast(w & jnp.uint32(0x0F0F0F0F), jnp.int8)
    odd = pltpu.bitcast((w >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F), jnp.int8)
    g = K // GS
    rows_half = K // 2  # rows per plane
    acc = None
    for gi in range(0, g, gb):
        r0 = gi * (rows_half // g)
        r1 = (gi + gb) * (rows_half // g)
        pe = jax.lax.dot_general(
            xe_ref[:, r0:r1],
            even[r0:r1, :].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        po = jax.lax.dot_general(
            xo_ref[:, r0:r1],
            odd[r0:r1, :].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = s_ref[0, gi : gi + 1, :].astype(jnp.float32)  # (1, NT)
        contrib = (pe + po) * sc
        acc = contrib if acc is None else acc + contrib
    out_ref[:] = acc


def run_variant(name, kernel, mt, x_cols):
    rng = jax.random.PRNGKey(0)
    n_t = N // NT
    w = jax.random.bits(rng, (n_t, KW_T, NT), jnp.uint32)
    s = jax.random.uniform(rng, (K // GS, N), jnp.bfloat16)
    s3 = s.reshape(K // GS, n_t, NT).transpose(1, 0, 2)  # (n_t, g, NT)
    xe = jnp.ones((mt, x_cols), jnp.bfloat16)
    xo = jnp.ones((mt, x_cols), jnp.bfloat16)

    grid = (1, n_t)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mt, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mt, x_cols), lambda i, j: (i, 0)),
            pl.BlockSpec((mt, x_cols), lambda i, j: (i, 0)),
            pl.BlockSpec((1, KW_T, NT), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, K // GS, NT), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((mt, NT), lambda i, j: (i, j)),
    )
    def body(c, _):
        new = (f(c[0], c[1], w, s3)[:, :x_cols] * 1e-9 + c[0]).astype(
            jnp.bfloat16
        )
        return (new, c[1]), None

    jf = jax.jit(
        lambda xe, xo, w, s3: jax.lax.scan(
            body, (xe, xo), None, length=ITERS
        )[0][0]
    )
    r = jf(xe, xo, w, s3)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = jf(xe, xo, w, s3)
    jax.block_until_ready(r)
    t = (time.perf_counter() - t0) / ITERS
    wb = w.size * 4
    print(f"{name}: {t*1e3:.3f} ms  {wb/1e9/t:.0f} GB/s")


def run_baseline(mt):
    model = build_random_quantized_llama(layers=1)
    p = model.params["model"]["layers"][0]["mlp"]["gate_up_proj"]
    x0 = jnp.ones((mt, K), jnp.bfloat16)

    def body(c, _):
        y = qmm.qmm(c, None, p["scales"], p["biases"], group_size=64,
                    bits=4, q_kernel=p["wk"])
        return (y[:, :K] * 1e-9 + c).astype(jnp.bfloat16), None

    f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=ITERS)[0])
    r = f(x0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(x0)
    jax.block_until_ready(r)
    t = (time.perf_counter() - t0) / ITERS
    wb = p["wk"].size * 4
    print(f"A-baseline: {t*1e3:.3f} ms  {wb/1e9/t:.0f} GB/s")


def main():
    mt = 16
    run_baseline(mt)
    for gb in (1, 2, 4):
        run_variant(
            f"B-groupdots gb={gb}",
            functools.partial(kernel_groupdots, reps=32, gb=gb),
            mt,
            K // 2,
        )


if __name__ == "__main__":
    main()
