"""Round 2 of kernel bottleneck probes (see probe_bottleneck.py).

Questions:
  * Are the dot variants MXU-bound or DMA-bound? -> single-plane dots
    (half the MXU work, same DMA). If rate ~doubles: MXU-bound.
  * How much of the scale cost is the pltpu.repeat materialization?
    -> full_rs uses a reshape-broadcast multiply (rows are group-interleaved:
    row t belongs to group t%G, so (rows,NT)->(reps,G,NT) broadcasts s (G,NT)
    without materializing the repeated map).
  * dimension_semantics and NT=2048 interactions.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

ITERS = 24
K = 4096
N_LAYER = 28672
BIGX = 8
GS = 64
KW = K // 8
G = K // GS
MT = 16
_MASK_VAL = 0x0F0F0F0F
ARB = ("arbitrary", "arbitrary")


def body_i8_single(xe_ref, xo_ref, w_ref, s_ref, out_ref):
    w = w_ref[0]
    even = pltpu.bitcast(w & jnp.uint32(_MASK_VAL), jnp.int8)
    out_ref[:] = jnp.dot(
        xe_ref[:], even, preferred_element_type=jnp.int32
    ).astype(jnp.float32)


def body_bf16_single(xe_ref, xo_ref, w_ref, s_ref, out_ref):
    w = w_ref[0]
    even = pltpu.bitcast(w & jnp.uint32(_MASK_VAL), jnp.int8)
    out_ref[:] = jnp.dot(
        xe_ref[:], even.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )


def make_full_rs(nt):
    reps = (K // 2) // G

    def body(xe_ref, xo_ref, w_ref, s_ref, out_ref):
        w = w_ref[0]
        even = pltpu.bitcast(w & jnp.uint32(_MASK_VAL), jnp.int8)
        odd = pltpu.bitcast(
            (w >> jnp.uint32(4)) & jnp.uint32(_MASK_VAL), jnp.int8
        )
        s3 = s_ref[:][None, :, :]  # (1, G, NT)
        ev = (
            even.astype(jnp.bfloat16).reshape(reps, G, nt) * s3
        ).reshape(K // 2, nt)
        od = (
            odd.astype(jnp.bfloat16).reshape(reps, G, nt) * s3
        ).reshape(K // 2, nt)
        acc = jnp.dot(xe_ref[:], ev, preferred_element_type=jnp.float32)
        acc += jnp.dot(xo_ref[:], od, preferred_element_type=jnp.float32)
        out_ref[:] = acc

    return body


def make_full_repeat(nt):
    reps = (K // 2) // G

    def body(xe_ref, xo_ref, w_ref, s_ref, out_ref):
        w = w_ref[0]
        even = pltpu.bitcast(w & jnp.uint32(_MASK_VAL), jnp.int8)
        odd = pltpu.bitcast(
            (w >> jnp.uint32(4)) & jnp.uint32(_MASK_VAL), jnp.int8
        )
        s_map = pltpu.repeat(s_ref[:], reps, axis=0)
        acc = jnp.dot(
            xe_ref[:],
            even.astype(jnp.bfloat16) * s_map,
            preferred_element_type=jnp.float32,
        )
        acc += jnp.dot(
            xo_ref[:],
            odd.astype(jnp.bfloat16) * s_map,
            preferred_element_type=jnp.float32,
        )
        out_ref[:] = acc

    return body


def make_call(body, n_t, nt, ds=None):
    params = {}
    if ds is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=ds
        )
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((MT, n_t * nt), jnp.float32),
        grid=(1, n_t),
        in_specs=[
            pl.BlockSpec((MT, K // 2), lambda i, j: (i, 0)),
            pl.BlockSpec((MT, K // 2), lambda i, j: (i, 0)),
            pl.BlockSpec((1, KW, nt), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((G, nt), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((MT, nt), lambda i, j: (i, j)),
        **params,
    )


def time_call(body, x_dtype, n_t, nt, ds=None):
    w = jax.random.bits(jax.random.PRNGKey(0), (n_t, KW, nt), jnp.uint32)
    s = jnp.ones((G, nt), jnp.bfloat16)
    f = make_call(body, n_t, nt, ds)

    def fn(x, w_):
        def step(c, _):
            xe = c.astype(x_dtype)
            y = f(xe, xe, w_, s)
            c2 = (c.astype(jnp.float32) + jnp.sum(y) * 1e-12).astype(
                jnp.bfloat16
            )
            return c2, None

        return jax.lax.scan(step, x, None, length=ITERS)[0]

    jf = jax.jit(fn)
    x0 = jnp.ones((MT, K // 2), jnp.bfloat16)
    r = jf(x0, w)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = jf(x0, w)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best, w.size * 4


def run(name, body, x_dtype, nt, ds=None):
    n_big = BIGX * N_LAYER // nt
    t_small, b_small = time_call(body, x_dtype, 1, nt, ds)
    t_big, b_big = time_call(body, x_dtype, n_big, nt, ds)
    dt, db = t_big - t_small, b_big - b_small
    print(
        f"{name:16s} net={dt*1e3:8.3f} ms  {db/1e9/max(dt,1e-9):7.1f} GB/s",
        flush=True,
    )


def main():
    print(f"backend={jax.default_backend()} K={K} MT={MT}")
    run("i8_single", body_i8_single, jnp.int8, 1024)
    run("bf16_single", body_bf16_single, jnp.bfloat16, 1024)
    run("full_rs", make_full_rs(1024), jnp.bfloat16, 1024)
    run("full_rs_ds", make_full_rs(1024), jnp.bfloat16, 1024, ARB)
    run("full_rs_2048", make_full_rs(2048), jnp.bfloat16, 2048)
    run("full_rs_2048ds", make_full_rs(2048), jnp.bfloat16, 2048, ARB)
    run("full_rep_ds", make_full_repeat(1024), jnp.bfloat16, 1024, ARB)


if __name__ == "__main__":
    main()
