"""Decompose the qmm INT4 kernel's in-program rate at decode shapes.

Variants (same tiled layout, same grid, same DMA pattern; only the body
changes) isolate which stage binds the ~530-650 GB/s in-program rate:

  prod     mask+bitcast -> astype bf16 -> * s_map -> 2 MXU dots  (real body)
  noscale  drop repeat+scale-mult (numerically wrong; scale-mult cost)
  noconv   drop astype: int8 x int8 MXU dots (conversion cost)
  nodot    full VPU dequant, dots replaced by a row-slice add (MXU cost)
  dma      touch the weight block minimally (DMA/pipeline ceiling)

Marginal-rate methodology copied from probe_qmm_prod: chained distinct
weights inside a lax.scan, rate = extra weight bytes / extra time.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from mlx_parallm_tpu.ops import qmm_pallas  # noqa: E402

ITERS = 192
MASK = 0x0F0F0F0F


def make_kernel(variant, reps):
    def body(xe_ref, xo_ref, xe8_ref, xo8_ref, w_ref, s_ref, out_ref):
        kt = pl.program_id(2)
        w = w_ref[0]
        if variant in ("gdot", "gdotn", "gdotb"):
            # Group-batched UNSCALED dots + scale applied to the small
            # (G, mt, nt) accumulator: trades the per-weight scale-mult
            # (the binding VPU cost) for G batched K=gs/2 MXU dots and a
            # G*mt*nt f32 scale-sum. Assumes a group-major plane layout
            # (rows of group g contiguous) — random weights here, rate
            # probe only.
            even = pltpu.bitcast(w & jnp.uint32(MASK), jnp.int8)
            odd = pltpu.bitcast(
                (w >> jnp.uint32(4)) & jnp.uint32(MASK), jnp.int8
            )
            nt_ = even.shape[1]
            gg = even.shape[0] // reps
            er = even.astype(jnp.bfloat16).reshape(gg, reps, nt_)
            orr = odd.astype(jnp.bfloat16).reshape(gg, reps, nt_)
            dn = (((2,), (1,)), ((0,), (0,)))
            te = jax.lax.dot_general(
                xe_ref[:], er, dn, preferred_element_type=jnp.float32
            )
            to = jax.lax.dot_general(
                xo_ref[:], orr, dn, preferred_element_type=jnp.float32
            )
            if variant == "gdotn":
                # Diagnostic: batched-dot cost WITHOUT the scale-sum.
                acc = (te[0] + to[0]).astype(jnp.float32)
            elif variant == "gdotb":
                # bf16 combine: cast each f32 dot output once (fusable
                # into the matmul output write), then run the add/scale
                # passes at bf16 lane rate, reducing in f32.
                s3 = s_ref[:][:, None, :]
                t16 = te.astype(jnp.bfloat16) + to.astype(jnp.bfloat16)
                acc = jnp.sum(t16 * s3, axis=0, dtype=jnp.float32)
            else:
                s3 = s_ref[:].astype(jnp.float32)[:, None, :]
                acc = jnp.sum((te + to) * s3, axis=0)
        elif variant == "bscale":
            # Same math as prod but WITHOUT materializing the repeated
            # scale map: rows are group-interleaved (row r -> group
            # r mod G), so a (reps, G, nt) reshape view aligns a
            # broadcast multiply against the (G, nt) scales directly.
            even = pltpu.bitcast(w & jnp.uint32(MASK), jnp.int8)
            odd = pltpu.bitcast(
                (w >> jnp.uint32(4)) & jnp.uint32(MASK), jnp.int8
            )
            rows, nt_ = even.shape
            gg = s_ref.shape[0]
            sb = s_ref[:][None, :, :]
            we = (
                even.astype(jnp.bfloat16).reshape(rows // gg, gg, nt_) * sb
            ).reshape(rows, nt_)
            wo = (
                odd.astype(jnp.bfloat16).reshape(rows // gg, gg, nt_) * sb
            ).reshape(rows, nt_)
            acc = jnp.dot(
                xe_ref[:], we, preferred_element_type=jnp.float32
            )
            acc += jnp.dot(
                xo_ref[:], wo, preferred_element_type=jnp.float32
            )
        elif variant == "dma":
            # Block is DMA'd per the BlockSpec regardless; touch 4 rows.
            acc = pltpu.bitcast(w[:4], jnp.int8).astype(jnp.float32)
        else:
            even = pltpu.bitcast(w & jnp.uint32(MASK), jnp.int8)
            odd = pltpu.bitcast(
                (w >> jnp.uint32(4)) & jnp.uint32(MASK), jnp.int8
            )
            if variant == "noconv":
                acc = jax.lax.dot(
                    xe8_ref[:], even, preferred_element_type=jnp.int32
                )
                acc += jax.lax.dot(
                    xo8_ref[:], odd, preferred_element_type=jnp.int32
                )
                acc = acc.astype(jnp.float32)
            elif variant == "noscale":
                acc = jnp.dot(
                    xe_ref[:], even.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                acc += jnp.dot(
                    xo_ref[:], odd.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                s_map = pltpu.repeat(s_ref[:], reps, axis=0)
                we = even.astype(jnp.bfloat16) * s_map
                wo = odd.astype(jnp.bfloat16) * s_map
                if variant == "nodot":
                    mt = out_ref.shape[0]
                    acc = (we[:mt] + wo[:mt]).astype(jnp.float32)
                else:  # prod
                    acc = jnp.dot(
                        xe_ref[:], we, preferred_element_type=jnp.float32
                    )
                    acc += jnp.dot(
                        xo_ref[:], wo, preferred_element_type=jnp.float32
                    )

        @pl.when(kt == 0)
        def _():
            out_ref[:] = acc

        @pl.when(kt != 0)
        def _():
            out_ref[:] = out_ref[:] + acc

    return body


@functools.partial(
    jax.jit, static_argnames=("variant", "gs", "nt", "gsize")
)
def run_variant(xe, xo, xe8, xo8, wk, st, *, variant, gs, nt, gsize=64):
    m, half_k = xe.shape
    k = half_k * 2
    n_t, kw, nt_ = wk.shape
    n = n_t * nt_
    g = k // gsize
    mt = 16
    kw_tile = qmm_pallas._kw_tile(kw, g, mt, nt_, 4)
    n_kt = kw // kw_tile
    rows_t = 4 * kw_tile
    if variant in ("gdot", "gdotn", "gdotb"):
        reps = (4 * kw) // g  # plane rows per group = gs/2
        g_t = rows_t // reps  # groups per K tile
        kernel = make_kernel(variant, reps)
        xeg = xe.reshape(m, g, reps).transpose(1, 0, 2)
        xog = xo.reshape(m, g, reps).transpose(1, 0, 2)
        x_inputs = [xeg, xog, xeg, xog]
        x_spec = pl.BlockSpec(
            (g_t, mt, reps),
            lambda i, j, kt: (kt, i, 0),
            memory_space=pltpu.VMEM,
        )
        s_spec = pl.BlockSpec(
            (g_t, nt_), lambda i, j, kt: (kt, j), memory_space=pltpu.VMEM
        )
    else:
        kernel = make_kernel(variant, rows_t // g)
        x_inputs = [xe, xo, xe8, xo8]
        x_spec = pl.BlockSpec(
            (mt, rows_t), lambda i, j, kt: (i, kt), memory_space=pltpu.VMEM
        )
        s_spec = pl.BlockSpec(
            (g, nt_), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=(m // mt, n_t, n_kt),
        in_specs=[x_spec, x_spec, x_spec, x_spec]
        + [
            pl.BlockSpec(
                (1, kw_tile, nt_),
                lambda i, j, kt: (j, kt, 0),
                memory_space=pltpu.VMEM,
            ),
            s_spec,
        ],
        out_specs=pl.BlockSpec(
            (mt, nt_), lambda i, j, kt: (i, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=n * kw * 4 + m * k * 2 + m * n * 4,
            transcendentals=0,
        ),
    )(*x_inputs, wk, st)
    return out


def time_variant(variant, m, k, n, nt, gs=64, chain=8):
    g = k // gs
    ws = []
    for i in range(chain):
        wk = jax.random.bits(
            jax.random.PRNGKey(i), (n // nt, k // 8, nt), jnp.uint32
        )
        st = jnp.full((g, n), 0.01, jnp.bfloat16)
        ws.append((wk, st))
    def run(n_chain):
        def fn(c, *flat):
            trip = [flat[i : i + 2] for i in range(0, 2 * n_chain, 2)]

            def step(carry, _):
                # Carry-dependent activations: without this the qmm is
                # loop-invariant and XLA hoists it out of the scan
                # (PERF_NOTES harness lesson).
                x = carry
                for wk, st in trip:
                    y = run_variant(
                        x, x, x.astype(jnp.int8), x.astype(jnp.int8),
                        wk, st, variant=variant, gs=gs, nt=nt,
                    )
                    x = (
                        x.astype(jnp.float32) + y[:, :1] * 1e-30
                    ).astype(jnp.bfloat16)
                return x, None

            return jax.lax.scan(step, c, None, length=ITERS)[0]

        flat = [a for pair in ws[:n_chain] for a in pair]
        jf = jax.jit(fn)
        x0 = jnp.ones((16, k // 2), jnp.bfloat16)
        r = jf(x0, *flat)
        np.asarray(jax.device_get(r))
        best = float("inf")
        for _ in range(4):
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
        f"{variant:8s} m=16 {k:6d}x{n:6d} nt={nt}: t1={t1*1e3:7.3f} "
        f"tc={tc*1e3:8.3f} marginal {rate:6.1f} GB/s",
        flush=True,
    )
    return rate


def main():
    print(f"backend={jax.default_backend()}")
    import os

    shapes = [
        (4096, 4096, 1024),
        (4096, 4096, 512),
        (14336, 4096, 512),
        (4096, 28672, 1024),
        (4096, 28672, 512),
    ]
    variants = tuple(
        (os.environ.get("VARIANTS") or "prod,noscale,noconv,nodot,dma")
        .split(",")
    )
    for k, n, nt in shapes:
        for variant in variants:
            try:
                time_variant(variant, 16, k, n, nt)
            except Exception as e:
                print(f"{variant}: FAILED {type(e).__name__}: {e}")
        print()


if __name__ == "__main__":
    main()
