"""Isolate the qmm kernel bottleneck at decode shapes (m=16).

Variants stream the SAME tiled (T, Kw, NT) uint32 weight layout, differing
only in the kernel body:

  dma    - DMA only: block copied to VMEM, 16 rows written out (no compute).
           => pipeline/HBM ceiling.
  i8dot  - bitcast planes -> int8 x int8 MXU dots (no convert, no scale).
           => MXU int8 skinny-dot ceiling.
  bf16   - bitcast -> astype(bf16) -> dots (no scale multiply).
           => MXU bf16 skinny-dot ceiling + convert cost.
  full   - production body: convert + s_map multiply + bf16 dots.
  full_ds- production body + dimension_semantics=("arbitrary","arbitrary").

Measurement: the weight tensor is BIG (BIGX x the 4096x28672 layer shape,
~470 MB) so per-call streaming time dominates; a `null` run with a tiny
weight tensor measures the fixed scan-glue + launch overhead, which is
subtracted. Weights are jit ARGUMENTS (closure constants re-upload through
the axon tunnel).

Run (one TPU process at a time, under timeout):
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache timeout 2400 \
    python scripts/probe_bottleneck.py
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
N_LAYER = 28672  # 7B gate_up shape
BIGX = 8
GS = 64
NT = 1024
KW = K // 8  # uint32 words per column of packed int4
G = K // GS
MT = 16
_MASK_VAL = 0x0F0F0F0F


def body_dma(xe, xo, w_ref, s_ref, out_ref):
    w = pltpu.bitcast(w_ref[0], jnp.int8)  # (4*KW, NT)
    out_ref[:] = w[:MT, :].astype(jnp.float32)


def body_i8dot(xe_ref, xo_ref, w_ref, s_ref, out_ref):
    w = w_ref[0]
    even = pltpu.bitcast(w & jnp.uint32(_MASK_VAL), jnp.int8)
    odd = pltpu.bitcast((w >> jnp.uint32(4)) & jnp.uint32(_MASK_VAL), jnp.int8)
    acc = jnp.dot(xe_ref[:], even, preferred_element_type=jnp.int32)
    acc += jnp.dot(xo_ref[:], odd, preferred_element_type=jnp.int32)
    out_ref[:] = acc.astype(jnp.float32)


def body_bf16(xe_ref, xo_ref, w_ref, s_ref, out_ref):
    w = w_ref[0]
    even = pltpu.bitcast(w & jnp.uint32(_MASK_VAL), jnp.int8)
    odd = pltpu.bitcast((w >> jnp.uint32(4)) & jnp.uint32(_MASK_VAL), jnp.int8)
    acc = jnp.dot(
        xe_ref[:], even.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    acc += jnp.dot(
        xo_ref[:], odd.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    out_ref[:] = acc


def body_full(xe_ref, xo_ref, w_ref, s_ref, out_ref):
    w = w_ref[0]
    even = pltpu.bitcast(w & jnp.uint32(_MASK_VAL), jnp.int8)
    odd = pltpu.bitcast((w >> jnp.uint32(4)) & jnp.uint32(_MASK_VAL), jnp.int8)
    s_map = pltpu.repeat(s_ref[:], (K // 2) // G, axis=0)
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


def make_call(body, n_t, dimension_semantics=None):
    params = {}
    if dimension_semantics is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=dimension_semantics
        )
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((MT, n_t * NT), jnp.float32),
        grid=(1, n_t),
        in_specs=[
            pl.BlockSpec((MT, K // 2), lambda i, j: (i, 0)),
            pl.BlockSpec((MT, K // 2), lambda i, j: (i, 0)),
            pl.BlockSpec((1, KW, NT), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((G, NT), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((MT, NT), lambda i, j: (i, j)),
        **params,
    )


def time_call(body, x_dtype, n_t, ds=None, seed=0):
    """Mean per-iteration time of a scan chaining ITERS dependent calls."""
    w = jax.random.bits(jax.random.PRNGKey(seed), (n_t, KW, NT), jnp.uint32)
    s = jnp.ones((G, NT), jnp.bfloat16)
    f = make_call(body, n_t, ds)

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


def main():
    print(
        f"backend={jax.default_backend()} K={K} NT={NT} MT={MT} "
        f"big={BIGX * N_LAYER // NT} tiles small=1 tile"
    )
    n_big = BIGX * N_LAYER // NT
    variants = [
        ("dma", body_dma, jnp.bfloat16, None),
        ("i8dot", body_i8dot, jnp.int8, None),
        ("bf16", body_bf16, jnp.bfloat16, None),
        ("full", body_full, jnp.bfloat16, None),
        ("full_ds", body_full, jnp.bfloat16, ("arbitrary", "arbitrary")),
    ]
    for name, body, x_dtype, ds in variants:
        t_small, b_small = time_call(body, x_dtype, 1, ds)
        t_big, b_big = time_call(body, x_dtype, n_big, ds)
        dt = t_big - t_small
        db = b_big - b_small
        print(
            f"{name:10s} t_small={t_small*1e3:7.3f} ms  "
            f"t_big={t_big*1e3:8.3f} ms  net={dt*1e3:8.3f} ms  "
            f"{db/1e9/max(dt,1e-9):7.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
