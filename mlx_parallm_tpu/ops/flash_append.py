"""Fused append+attend decode kernel: one Pallas launch per layer that
COMMITS the current token's K/V into the cache slab AND attends over it.

This is the decode-path analogue of the reference's single fused attention
op (reference: /root/reference/mlx_parallm/models/llama.py:139
``mx.fast.scaled_dot_product_attention`` after ``cache.update_and_fetch``),
collapsed one step further: the KV-cache write happens INSIDE the attention
kernel, so the per-layer decode step is

    qkv matmuls -> [this kernel] -> o_proj matmul

with no separate masked slab rewrite (measured 2.06 ms/step at b8 S=512 in
isolation) and no XLA attention chain (~0.85 ms/step).

Mechanics (extends ``ops/flash_decode.py``'s online-softmax design):

  * The kernel takes the FULL (L, B, H_kv, S, D) cache slabs; the static
    ``layer`` index is baked into every BlockSpec index map, so no
    per-layer slice of the slab is ever materialized.
  * MULTI-ROW GRID: ``rb`` batch rows are packed per grid step (grid
    ``(B/rb, ng, ns)``). The per-grid-step fixed cost (~1 us of block
    DMAs + phase overhead) dominated this kernel at large batch — 3.3 ms
    of attention per step at b32 S=512 vs a ~1.3 ms INT8 DMA floor with
    one row per step — so the layout chooser packs all KV heads FIRST,
    caps the S block at 512 (keeps per-group dead-block DMA elision
    alive at long contexts), then fills the remaining VMEM block budget
    with batch rows.
  * The slabs are ``input_output_aliases``-donated ANY-space outputs; the
    commit is an in-kernel ``pltpu.make_async_copy`` per (row, kv-group):
    the new token's row is merged into the HBM tile-aligned (TILE, D)
    window of the streamed K/V block (read-modify-write of 8 slab rows
    for bf16, 32 for int8 — Mosaic requires HBM slices tile-aligned) and
    copied back at ``lengths[b]``. DMAs start before the attention dots
    and are awaited on the row-group's last grid step.
  * The current token's K/V rows arrive as separate (B, Hkv, D) operands
    (exact bf16); their attention term seeds the online softmax at grid
    step 0, so no stale-slot read, no XLA-side merge, and validity is the
    strict ``kv_pos < lengths[b]``.
  * INT8 KV: new rows are quantized in-kernel (head-dim absmax, matching
    ``QuantizedKVCache._quantize``) and the per-(head, position) scale is
    committed the same way through a (hg, 128) lane-window RMW.
  * Per-group DMA skipping, logit softcap, and sliding windows carry over
    from flash_decode (with ``rb`` rows per step the elision clamp uses
    the group's max length — exact for lockstep decode, conservative for
    ragged serving batches).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_decode import _choose_sblk, choose_hg_sblk

NEG_INF = -1e30

# HBM write-tile rows per commit: Mosaic requires slab slices aligned to the
# (sublane) tile — 8 rows for bf16, 32 for int8.
_TILE = {2: 8, 1: 32}


def _choose_layout(hkv: int, b: int, s: int, d: int, kv_bytes: int):
    """(hg, sblk, rb) minimizing grid steps under the VMEM block budget.

    Priority: pack ALL KV heads per step first (hg), cap the S block at 512
    so dead-block DMA elision keeps working at long contexts, then pack as
    many batch rows (rb) as the double-buffered block budget allows. Every
    axis multiplies the per-step block volume identically, but hg/sblk also
    set the dot shapes and rb multiplies the manual commit DMAs — so rb is
    filled last.
    """
    hg, sblk = choose_hg_sblk(hkv, s, d, kv_bytes)
    if sblk == 0:
        return 1, 0, 1
    budget = int(os.environ.get("MLX_PARALLM_FA_VMEM", 8 * 2**20))
    rb_env = os.environ.get("MLX_PARALLM_FA_RB")
    if rb_env:
        rb = max(1, min(int(rb_env), b))
        while b % rb != 0:
            rb -= 1
        return hg, sblk, rb
    rb = 1
    for cand in (8, 4, 2):
        if b % cand != 0:
            continue
        if 2 * 2 * cand * hg * sblk * d * kv_bytes <= budget:
            rb = cand
            break
    return hg, sblk, rb


def supported(q, cache_k, lengths) -> bool:
    """Shape gate: T==1 query over a full (L, B, Hkv, S, D) slab."""
    if q.ndim != 4 or q.shape[1] != 1 or cache_k.ndim != 5:
        return False
    b, _, hq, d = q.shape
    _, bk, hkv, s, dk = cache_k.shape
    if b != bk or d != dk or d % 128 != 0 or hq % hkv != 0:
        return False
    kv_bytes = 1 if cache_k.dtype == jnp.int8 else 2
    if s % _TILE[kv_bytes] != 0 or s % 128 != 0:
        return False
    if kv_bytes == 1:
        # The int8 scale commit slices an (hg, 128) window from a VMEM
        # scratch — Mosaic requires the sublane slice be a multiple of 8.
        hg, sblk, _ = _choose_layout(hkv, b, s, d, kv_bytes)
        if hg % 8 != 0:
            return False
    return _choose_sblk(s, d, kv_bytes, 1) > 0


def _kernel(
    len_ref,
    q_ref,
    k_ref,
    v_ref,
    kn_ref,
    vn_ref,
    ks_ref,
    vs_ref,
    o_ref,
    ko_ref,
    vo_ref,
    *rest,
    layer: int,
    sblk: int,
    rep: int,
    hg: int,
    rb: int,
    quantized: bool,
    softcap: Optional[float],
    window: Optional[int],
    compute_dtype=jnp.bfloat16,
):
    if quantized:
        kso_ref, vso_ref, m_ref, l_ref, acc_ref, kw_ref, vw_ref, ksw_ref, vsw_ref, sem = rest
    else:
        m_ref, l_ref, acc_ref, kw_ref, vw_ref, sem = rest
    bi = pl.program_id(0)
    gi = pl.program_id(1)
    si = pl.program_id(2)
    ns = pl.num_programs(2)
    d = q_ref.shape[-1]
    tile = kw_ref.shape[2]

    kn = kn_ref[...].astype(jnp.float32).reshape(rb, hg, d)  # exact new rows
    vn = vn_ref[...].astype(jnp.float32).reshape(rb, hg, d)

    @pl.when(si == 0)
    def _init():
        # Seed the online softmax with the current token's own term: its
        # score row is exact (bf16 K_new, no quantization roundtrip) and
        # the stale slab slot at q_pos never contributes.
        q4 = q_ref[...].astype(jnp.float32).reshape(rb, hg, rep, d)
        s_new = jnp.sum(q4 * kn[:, :, None, :], axis=3).reshape(
            rb * hg * rep, 1
        )
        if softcap is not None:
            s_new = jnp.tanh(s_new / softcap) * softcap
        m_ref[...] = jnp.broadcast_to(s_new, m_ref.shape)
        l_ref[...] = jnp.ones_like(l_ref)
        acc_ref[...] = jnp.broadcast_to(
            vn[:, :, None, :], (rb, hg, rep, d)
        ).reshape(rb * hg * rep, d)

    # ---- commit: merge each row's new K/V into the tile-aligned window of
    # its streamed block and DMA it back to the aliased slab. Start the
    # copies BEFORE the attention dots so completion hides under compute.
    if quantized:
        ksc = jnp.maximum(
            jnp.max(jnp.abs(kn), axis=2, keepdims=True) / 127.0, 1e-8
        )  # (rb, hg, 1)
        vsc = jnp.maximum(
            jnp.max(jnp.abs(vn), axis=2, keepdims=True) / 127.0, 1e-8
        )
        k_rows = jnp.clip(jnp.round(kn / ksc), -127, 127).astype(jnp.int8)
        v_rows = jnp.clip(jnp.round(vn / vsc), -127, 127).astype(jnp.int8)
    else:
        k_rows = kn
        v_rows = vn

    def _row_dmas(r):
        """The four descriptors for row r (recomputed identically for
        start at the commit step and wait at the last step)."""
        row = bi * rb + r
        pos = len_ref[row]
        w0 = pl.multiple_of(pos // tile * tile, tile)
        # One semaphore slot per copy type: copies sharing a slot must have
        # identical sizes for out-of-order waits to balance.
        dmas = [
            pltpu.make_async_copy(
                kw_ref.at[r],
                ko_ref.at[layer, row, pl.ds(gi * hg, hg), pl.ds(w0, tile), :],
                sem.at[0],
            ),
            pltpu.make_async_copy(
                vw_ref.at[r],
                vo_ref.at[layer, row, pl.ds(gi * hg, hg), pl.ds(w0, tile), :],
                sem.at[1],
            ),
        ]
        if quantized:
            w128 = pl.multiple_of(pos // 128 * 128, 128)
            dmas += [
                pltpu.make_async_copy(
                    ksw_ref.at[r],
                    kso_ref.at[layer, row, gi, :, pl.ds(w128, 128)],
                    sem.at[2],
                ),
                pltpu.make_async_copy(
                    vsw_ref.at[r],
                    vso_ref.at[layer, row, gi, :, pl.ds(w128, 128)],
                    sem.at[3],
                ),
            ]
        return dmas

    for r in range(rb):
        pos = len_ref[bi * rb + r]

        @pl.when(si == pos // sblk)
        def _commit(r=r, pos=pos):
            w0l = pl.multiple_of((pos % sblk) // tile * tile, tile)
            rowmask = (
                jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
                == pos % tile
            )
            cur_k = k_ref[0, r, :, pl.ds(w0l, tile), :]  # (hg, tile, d)
            cur_v = v_ref[0, r, :, pl.ds(w0l, tile), :]
            kw_ref[r] = jnp.where(
                rowmask[None], k_rows[r][:, None, :].astype(cur_k.dtype), cur_k
            )
            vw_ref[r] = jnp.where(
                rowmask[None], v_rows[r][:, None, :].astype(cur_v.dtype), cur_v
            )
            if quantized:
                w128l = pl.multiple_of((pos % sblk) // 128 * 128, 128)
                lanemask = (
                    jax.lax.broadcasted_iota(jnp.int32, (hg, 128), 1)
                    == pos % 128
                )
                cur_ks = ks_ref[0, r, 0, :, pl.ds(w128l, 128)]  # (hg, 128)
                cur_vs = vs_ref[0, r, 0, :, pl.ds(w128l, 128)]
                ksw_ref[r] = jnp.where(
                    lanemask, ksc[r].astype(cur_ks.dtype), cur_ks
                )
                vsw_ref[r] = jnp.where(
                    lanemask, vsc[r].astype(cur_vs.dtype), cur_vs
                )
            for dma in _row_dmas(r):
                dma.start()

    # ---- attention over the streamed blocks.
    base = si * sblk
    max_pos = len_ref[bi * rb]
    for r in range(1, rb):
        max_pos = jnp.maximum(max_pos, len_ref[bi * rb + r])
    run = base < max_pos + 1  # the block holding any row's q_pos is live
    if window is not None:
        min_pos = len_ref[bi * rb]
        for r in range(1, rb):
            min_pos = jnp.minimum(min_pos, len_ref[bi * rb + r])
        run = jnp.logical_and(run, base + sblk > min_pos - window)

    @pl.when(run)
    def _compute():
        # ONE batched dot over the (row, head-group) dims instead of tiny
        # per-head dots — the per-call fixed cost of small MXU ops
        # dominated this kernel at large batch.
        q3 = (
            q_ref[...].astype(compute_dtype).reshape(rb * hg, rep, d)
        )
        # Mosaic's matmul supports at most ONE batch dim: collapse (rb, hg)
        # into a single leading batch axis (free leading-dim reshapes).
        k3 = k_ref[0].astype(compute_dtype).reshape(rb * hg, -1, d)
        scores3 = jax.lax.dot_general(
            q3,
            k3,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (rb*hg, rep, SBLK)
        if quantized:
            scores3 = scores3 * ks_ref[0, :, 0].reshape(
                rb * hg, 1, scores3.shape[-1]
            ).astype(jnp.float32)
        scores = scores3.reshape(rb * hg * rep, scores3.shape[-1])
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap

        q_pos = jnp.concatenate(
            [
                jnp.full((hg * rep, 1), len_ref[bi * rb + r], jnp.int32)
                for r in range(rb)
            ],
            axis=0,
        )  # (rb*hg*rep, 1)
        kv_pos = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = kv_pos < q_pos  # strict: slot q_pos is stale
        if window is not None:
            valid = jnp.logical_and(valid, kv_pos > q_pos - window)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[...]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])
        p = jnp.exp(scores - m_new[:, :1])
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_new

        p3 = p.reshape(rb * hg, rep, p.shape[-1])
        if quantized:
            p3 = p3 * vs_ref[0, :, 0].reshape(
                rb * hg, 1, p.shape[-1]
            ).astype(jnp.float32)
        v3 = v_ref[0].astype(compute_dtype).reshape(rb * hg, -1, d)
        pv = jax.lax.dot_general(
            p3.astype(v3.dtype),
            v3,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(rb * hg * rep, d)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(si == ns - 1)
    def _final():
        for r in range(rb):
            for dma in _row_dmas(r):
                dma.wait()
        o_ref[...] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-20)
        ).reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "layer", "scale", "logit_softcap", "sliding_window", "interpret",
    ),
)
def flash_append_attend(
    q,
    cache_k,
    cache_v,
    lengths,
    k_new,
    v_new,
    *,
    layer: int,
    scale: float,
    cache_ks=None,
    cache_vs=None,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
):
    """Commit k_new/v_new at each row's ``lengths[b]`` slot of layer
    ``layer`` and attend.

    q: (B, 1, Hq, D); cache_k/cache_v: FULL slabs (L, B, Hkv, S, D), bf16 —
    or int8 with cache_ks/cache_vs (L, B, Hkv, S); k_new/v_new:
    (B, 1, Hkv, D); lengths: (B,) int32.

    Returns ``(out (B, 1, Hq, D), new_k, new_v[, new_ks, new_vs])`` where
    the slab outputs alias the inputs (only the written (TILE, D) windows
    move through HBM). ``lengths`` are NOT advanced — callers advance once
    per forward as with ``update_layer``.
    """
    b, t, hq, d = q.shape
    nl, _, hkv, s, _ = cache_k.shape
    assert t == 1 and hq % hkv == 0 and 0 <= layer < nl
    rep = hq // hkv
    quantized = cache_ks is not None
    kv_bytes = 1 if quantized else 2
    hg, sblk, rb = _choose_layout(hkv, b, s, d, kv_bytes)
    assert sblk > 0, (s, d)
    ns = s // sblk
    ng = hkv // hg
    tile = _TILE[kv_bytes]

    q2 = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    q2 = q2.reshape(b, ng, hg * rep, d)
    kn = k_new.astype(jnp.bfloat16).reshape(b, 1, ng, hg, d).transpose(
        0, 2, 1, 3, 4
    )  # (B, ng, 1, hg, D) — block (rb,1,1,hg,d) spans full trailing dims
    vn = v_new.astype(jnp.bfloat16).reshape(b, 1, ng, hg, d).transpose(
        0, 2, 1, 3, 4
    )

    if quantized:
        # Scale slabs reshaped (L, B, ng, hg, S): Pallas requires the last
        # two block dims be tile-multiples OR span the full array dim; a
        # (.., hg, 128) block over the raw (L, B, Hkv, S) slab violates
        # that whenever hg < Hkv. The reshape is a bitcast; aliasing holds
        # through it.
        ks_shape = cache_ks.shape
        cache_ks = cache_ks.reshape(nl, b, ng, hg, s)
        cache_vs = cache_vs.reshape(nl, b, ng, hg, s)
    else:
        # Dead placeholder operands keep one kernel signature.
        cache_ks = jnp.zeros((1, rb, 1, hg, 128), dtype=jnp.bfloat16)
        cache_vs = cache_ks

    def group_max(bi, len_ref):
        m = len_ref[bi * rb]
        for r in range(1, rb):
            m = jnp.maximum(m, len_ref[bi * rb + r])
        return m

    def live_fn(bi, si, len_ref):
        live = si * sblk < group_max(bi, len_ref) + 1
        if sliding_window is not None:
            mn = len_ref[bi * rb]
            for r in range(1, rb):
                mn = jnp.minimum(mn, len_ref[bi * rb + r])
            live = jnp.logical_and(live, (si + 1) * sblk > mn - sliding_window)
        return live

    def kv_idx(bi, gi, si, len_ref):
        # Clamp dead blocks to the previous live index: the pipeline elides
        # the repeated DMA, so traffic tracks the group's live context.
        return (
            layer, bi, gi, jnp.where(live_fn(bi, si, len_ref), si, 0), 0
        )

    if quantized:

        def sc_idx(bi, gi, si, len_ref):
            return (
                layer, bi, gi, 0,
                jnp.where(live_fn(bi, si, len_ref), si, 0),
            )

    else:

        def sc_idx(bi, gi, si, len_ref):
            return (0, 0, 0, 0, 0)

    out_shape = [
        jax.ShapeDtypeStruct((b, ng, hg * rep, d), q.dtype),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
    ]
    out_specs = [
        pl.BlockSpec(
            (rb, 1, hg * rep, d), lambda bi, gi, si, L: (bi, gi, 0, 0)
        ),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    # Flattened operand order (incl. the scalar-prefetch lengths at 0):
    # 0=lengths 1=q 2=k 3=v 4=k_new 5=v_new 6=k_scale 7=v_scale.
    aliases = {2: 1, 3: 2}
    scratch = [
        pltpu.VMEM((rb * hg * rep, 128), jnp.float32),  # running max
        pltpu.VMEM((rb * hg * rep, 128), jnp.float32),  # running denominator
        pltpu.VMEM((rb * hg * rep, d), jnp.float32),  # running numerator
        pltpu.VMEM((rb, hg, tile, d), cache_k.dtype),  # K commit windows
        pltpu.VMEM((rb, hg, tile, d), cache_v.dtype),  # V commit windows
    ]
    if quantized:
        out_shape += [
            jax.ShapeDtypeStruct(cache_ks.shape, cache_ks.dtype),
            jax.ShapeDtypeStruct(cache_vs.shape, cache_vs.dtype),
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        aliases.update({6: 3, 7: 4})
        scratch += [
            pltpu.VMEM((rb, hg, 128), cache_ks.dtype),  # K scale windows
            pltpu.VMEM((rb, hg, 128), cache_vs.dtype),  # V scale windows
        ]
    scratch.append(pltpu.SemaphoreType.DMA((4,)))

    sblk_sc = sblk if quantized else 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // rb, ng, ns),
        in_specs=[
            pl.BlockSpec(
                (rb, 1, hg * rep, d), lambda bi, gi, si, L: (bi, gi, 0, 0)
            ),
            pl.BlockSpec((1, rb, hg, sblk, d), kv_idx),
            pl.BlockSpec((1, rb, hg, sblk, d), kv_idx),
            pl.BlockSpec(
                (rb, 1, 1, hg, d), lambda bi, gi, si, L: (bi, gi, 0, 0, 0)
            ),
            pl.BlockSpec(
                (rb, 1, 1, hg, d), lambda bi, gi, si, L: (bi, gi, 0, 0, 0)
            ),
            pl.BlockSpec((1, rb, 1, hg, sblk_sc), sc_idx),
            pl.BlockSpec((1, rb, 1, hg, sblk_sc), sc_idx),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _kernel,
        layer=layer,
        sblk=sblk,
        rep=rep,
        hg=hg,
        rb=rb,
        quantized=quantized,
        softcap=logit_softcap,
        window=sliding_window,
        # CPU interpret mode (tests) lacks bf16 dot support.
        compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
    )
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * d * s,
            bytes_accessed=2 * b * s * hkv * d * kv_bytes + b * hq * d * 4,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q2, cache_k, cache_v, kn, vn, cache_ks, cache_vs)
    out = res[0].reshape(b, 1, hq, d).astype(q.dtype)
    if quantized:
        return (
            out, res[1], res[2],
            res[3].reshape(ks_shape), res[4].reshape(ks_shape),
        )
    return out, res[1], res[2]
