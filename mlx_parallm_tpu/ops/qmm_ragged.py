"""Ragged (expert-grouped) fused dequant-matmul — the TPU-native gather_qmm.

Replaces the per-expert ``lax.cond`` masked-matmul chain for MoE PREFILL
shapes (reference semantics: ``mx.gather_qmm``,
/root/reference/mlx_parallm/models/switch_layers.py:58-67). Megablocks-style
layout with quantized weights kept packed end-to-end:

  1. Sort the R = T*top_k (token, slot) rows by routed expert.
  2. Pad each expert's contiguous segment up to a multiple of the row-tile
     TM. Total padded rows R_pad = round_up(R, TM) + E*TM is STATIC (each
     nonempty expert adds at most one partial tile).
  3. One Pallas kernel, grid (N-tiles, row-tiles) with row-tiles innermost:
     a scalar-prefetched ``expert_of_tile`` map lets each row-tile's
     BlockSpec DMA exactly its expert's packed weight / scale blocks.
     Consecutive same-expert row tiles map to the SAME weight block, which
     the pipeline does not refetch; experts with no routed tokens get no
     tiles at all — weight traffic tracks the routed set, FLOPs track
     T*top_k (not T*E_hit, the round-2 masked-chain cost; VERDICT r2 #6).
  4. Unsort once at the end. ``switch_glu`` shares one layout across its
     gate/up/down matmuls (identical routing), sorting/unsorting once.

Whole-K weight blocks only (no K-split): callers fall back to the masked
chain when the shape's whole-K block does not fit VMEM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qmm_pallas import _NIBBLE_MASK

_VMEM_BUDGET = 11 * 2**20


def _vmem(tm: int, kw: int, nt: int, g: int, bits: int) -> int:
    nplanes = 2 if bits == 4 else 1
    w = 2 * kw * nt * 4
    x = 2 * nplanes * tm * (4 * kw) * 2
    xg = 2 * tm * g * 2
    out = 2 * tm * nt * 4
    sb = 2 * 2 * g * nt * 2  # scales + biases blocks, double-buffered
    return w + x + xg + out + sb


def choose_tm(r: int, kw: int, nt: int, g: int, bits: int) -> int:
    """Largest row tile that fits VMEM and matches the row count scale."""
    for tm in (128, 64, 32, 16):
        if tm > max(16, r // 4):
            continue
        if _vmem(tm, kw, nt, g, bits) <= _VMEM_BUDGET:
            return tm
    return 16 if _vmem(16, kw, nt, g, bits) <= _VMEM_BUDGET else 0


def supported(k: int, wk3_shape, group_size: int, bits: int) -> bool:
    """Whole-K single-block feasibility for the stacked (E, T, Kw, NT)
    expert kernel layout."""
    if bits not in (4, 8) or len(wk3_shape) != 4:
        return False
    e, t, kw, nt = wk3_shape
    per_word = 32 // bits
    if kw * per_word != k or k % group_size != 0:
        return False
    g = k // group_size
    rows = k // 2 if bits == 4 else k
    if rows % g != 0 or nt % 256 != 0:
        return False
    return choose_tm(16, kw, nt, g, bits) > 0


class RaggedLayout(NamedTuple):
    """Sorted/padded row layout (shared across a MoE block's matmuls)."""

    order: jax.Array  # (R,)  sorted-row -> original-row permutation
    pos: jax.Array  # (R,)  sorted-row -> padded-row position
    e_of_tile: jax.Array  # (R_pad/TM,) expert id per row tile
    tm: int
    r_pad: int


def make_layout(expert_ids: jax.Array, num_experts: int, tm: int) -> RaggedLayout:
    r = expert_ids.shape[0]
    r_pad = ((r + tm - 1) // tm) * tm + num_experts * tm
    order = jnp.argsort(expert_ids)  # stable
    ids_sorted = jnp.take(expert_ids, order)
    counts = jnp.bincount(expert_ids, length=num_experts)
    padded = ((counts + tm - 1) // tm) * tm
    p_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    seg_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    pos = jnp.take(p_start, ids_sorted) + (
        jnp.arange(r, dtype=jnp.int32) - jnp.take(seg_start, ids_sorted)
    )
    total = jnp.sum(padded).astype(jnp.int32)
    tile_start = jnp.arange(r_pad // tm, dtype=jnp.int32) * tm
    base = (
        jnp.searchsorted(p_start, tile_start, side="right").astype(jnp.int32)
        - 1
    )
    # Tiles past the used range re-target the last nonempty expert: its
    # weight block is already resident from the preceding tile, so the
    # pipeline skips the fetch (their zero rows produce discarded output).
    has = padded > 0
    e_last = jnp.max(jnp.where(has, jnp.arange(num_experts), 0)).astype(
        jnp.int32
    )
    e_of_tile = jnp.where(
        tile_start < total, jnp.clip(base, 0, num_experts - 1), e_last
    )
    return RaggedLayout(order, pos, e_of_tile, tm, r_pad)


def pad_rows(layout: RaggedLayout, rows: jax.Array) -> jax.Array:
    """Scatter (R, K) rows into the (R_pad, K) sorted/padded array."""
    r, k = rows.shape
    out = jnp.zeros((layout.r_pad, k), dtype=rows.dtype)
    return out.at[layout.pos].set(jnp.take(rows, layout.order, axis=0))


def unpad_rows(layout: RaggedLayout, y_pad: jax.Array) -> jax.Array:
    """Gather padded results back to original row order, (R, N)."""
    y_sorted = jnp.take(y_pad, layout.pos, axis=0)
    r = layout.order.shape[0]
    out = jnp.zeros((r, y_pad.shape[1]), dtype=y_pad.dtype)
    return out.at[layout.order].set(y_sorted)


def _rk4(
    e_ref, xe_ref, xo_ref, xg_ref, w_ref, s_ref, b_ref, out_ref, *, reps, cdt
):
    w = w_ref[0, 0]
    even = pltpu.bitcast(w & jnp.uint32(_NIBBLE_MASK), jnp.int8)
    odd = pltpu.bitcast(
        (w >> jnp.uint32(4)) & jnp.uint32(_NIBBLE_MASK), jnp.int8
    )
    s_map = pltpu.repeat(s_ref[0], reps, axis=0).astype(cdt)
    acc = jnp.dot(
        xe_ref[:],
        even.astype(cdt) * s_map,
        preferred_element_type=jnp.float32,
    )
    acc += jnp.dot(
        xo_ref[:],
        odd.astype(cdt) * s_map,
        preferred_element_type=jnp.float32,
    )
    # Per-expert affine bias term stays in-kernel (it is expert-indexed;
    # the dense kernel's XLA epilogue would need a (R_pad, G, N) gather).
    out_ref[:] = acc + jnp.dot(
        xg_ref[:], b_ref[0], preferred_element_type=jnp.float32
    )


def _rk8(e_ref, xp_ref, xg_ref, w_ref, s_ref, b_ref, out_ref, *, reps, cdt):
    w = w_ref[0, 0]
    vals = pltpu.bitcast(w, jnp.int8)  # stored -128-biased
    s_map = pltpu.repeat(s_ref[0], reps, axis=0).astype(cdt)
    acc = jnp.dot(
        xp_ref[:],
        vals.astype(cdt) * s_map,
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc + jnp.dot(
        xg_ref[:], b_ref[0], preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("group_size", "bits", "tm", "interpret")
)
def ragged_qmm_padded(
    x_pad,
    e_of_tile,
    wk3,
    sk3,
    bk3,
    *,
    group_size: int,
    bits: int,
    tm: int,
    interpret: bool = False,
):
    """Grouped matmul over the padded/sorted row array.

    x_pad: (R_pad, K); e_of_tile: (R_pad/tm,) int32; wk3: (E, T, Kw, NT)
    stacked tiled kernel weights; sk3/bk3: (E, G, N) stacked transposed
    scale/bias mirrors (for INT8, bk3 carries the +128*scale correction).
    Returns (R_pad, N) float32.
    """
    r_pad, k = x_pad.shape
    e_cnt, n_t, kw, nt = wk3.shape
    n = n_t * nt
    g = k // group_size
    rows = k // 2 if bits == 4 else k
    reps = rows // g

    # CPU interpret mode (tests) lacks bf16 dot support.
    cdt = jnp.float32 if interpret else jnp.bfloat16
    xf = x_pad.astype(cdt)
    xg = jnp.sum(
        xf.reshape(r_pad, g, group_size).astype(jnp.float32), axis=-1
    ).astype(cdt)

    if bits == 4:
        x4 = xf.reshape(r_pad, g, group_size // 2, 2)
        xp = x4.transpose(3, 0, 2, 1).reshape(2, r_pad, k // 2)
        kernel = functools.partial(_rk4, reps=reps, cdt=cdt)
        x_inputs = [xp[0], xp[1]]
        x_specs = [
            pl.BlockSpec((tm, rows), lambda j, i, e: (i, 0)),
            pl.BlockSpec((tm, rows), lambda j, i, e: (i, 0)),
        ]
    else:
        xp = xf.reshape(r_pad, g, group_size).transpose(0, 2, 1).reshape(
            r_pad, k
        )
        kernel = functools.partial(_rk8, reps=reps, cdt=cdt)
        x_inputs = [xp]
        x_specs = [pl.BlockSpec((tm, rows), lambda j, i, e: (i, 0))]

    grid = (n_t, r_pad // tm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=x_specs
        + [
            pl.BlockSpec((tm, g), lambda j, i, e: (i, 0)),
            pl.BlockSpec((1, 1, kw, nt), lambda j, i, e: (e[i], j, 0, 0)),
            pl.BlockSpec((1, g, nt), lambda j, i, e: (e[i], 0, j)),
            pl.BlockSpec((1, g, nt), lambda j, i, e: (e[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, nt), lambda j, i, e: (i, j)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r_pad, n), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * k * n,
            bytes_accessed=r_pad // tm * kw * nt * 4 + r_pad * k * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(e_of_tile, *x_inputs, xg, wk3, sk3, bk3)


def ragged_qmm(
    x_rows,
    expert_ids,
    wk3,
    sk3,
    bk3,
    *,
    group_size: int,
    bits: int,
    num_experts: int,
    interpret: bool = False,
):
    """y[r] = x_rows[r] @ dequant(W[expert_ids[r]])^T — one-shot API."""
    kw, nt = wk3.shape[2], wk3.shape[3]
    g = x_rows.shape[1] // group_size
    tm = choose_tm(x_rows.shape[0], kw, nt, g, bits)
    layout = make_layout(expert_ids, num_experts, tm)
    x_pad = pad_rows(layout, x_rows)
    y_pad = ragged_qmm_padded(
        x_pad, layout.e_of_tile, wk3, sk3, bk3,
        group_size=group_size, bits=bits, tm=tm, interpret=interpret,
    )
    return unpad_rows(layout, y_pad).astype(x_rows.dtype)
