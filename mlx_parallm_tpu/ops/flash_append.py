"""Fused append+attend decode kernel: one Pallas launch per layer that
COMMITS the current token's K/V into the cache slab AND attends over it.

This is the decode-path analogue of the reference's single fused attention
op (reference: /root/reference/mlx_parallm/models/llama.py:139
``mx.fast.scaled_dot_product_attention`` after ``cache.update_and_fetch``),
collapsed one step further: the KV-cache write happens INSIDE the attention
kernel, so the per-layer decode step is

    qkv matmuls -> [this kernel] -> o_proj matmul

with no separate masked slab rewrite (measured 2.06 ms/step at b8 S=512 in
isolation) and no XLA attention chain (~0.85 ms/step) — the two items
``docs/PERF_NOTES.md`` ranks as the top fusion lever.

Mechanics (extends ``ops/flash_decode.py``'s online-softmax design):

  * The kernel takes the FULL (L, B, H_kv, S, D) cache slabs; the static
    ``layer`` index is baked into every BlockSpec index map, so no
    per-layer slice of the slab is ever materialized.
  * The slabs are ``input_output_aliases``-donated: the kernel's only HBM
    writes are one (WBLK, D) block per (row, kv-head) containing the new
    token — ~64/S of the masked-rewrite traffic — verified in-place on TPU
    (scripts/probe_alias_semantics.py).
  * The current token's K/V rows arrive as separate (B, Hkv, D) operands
    (exact bf16); their attention term seeds the online softmax at grid
    step 0, so no stale-slot read, no XLA-side merge, and validity is the
    strict ``kv_pos < lengths[b]``.
  * INT8 KV: new rows are quantized in-kernel (head-dim absmax, matching
    ``QuantizedKVCache._quantize``) and the per-(head, position) scale is
    written into a 128-lane window of the scale slab.
  * Per-row DMA skipping, logit softcap, and sliding windows carry over
    from flash_decode unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_decode import _choose_sblk


def _choose_layout(hkv: int, rep: int, s: int, d: int, kv_bytes: int):
    """(hg, sblk) minimizing grid steps: the per-grid-step fixed cost
    (~0.5 us) dominated this kernel at large batch — 4.6 ms/step of
    attention at b32 S=512 with the old hg=2 layout vs a ~1.3 ms DMA
    floor — so pack as many KV heads per step as the double-buffered
    block budget allows. The S block is then capped at 512 so per-row
    dead-block DMA elision (the ``kv_idx`` clamp) keeps working at long
    contexts; an uncapped block spans the whole slab (ns=1) and silently
    reads every row's full capacity."""
    for hg in range(hkv, 0, -1):
        if hkv % hg != 0:
            continue
        sblk = _choose_sblk(s, d, kv_bytes, hg)
        if sblk == 0:
            continue
        if sblk > 512 and s % 512 == 0:
            sblk = 512
        return hg, sblk
    return 1, 0

NEG_INF = -1e30

# KV write-back block: rows written back to HBM per (row, kv-head). Must be
# a multiple of the int8 sublane tile (32) and divide the slab capacity
# (capacities are multiples of 256).
WBLK = 32


def supported(q, cache_k, lengths) -> bool:
    """Shape gate: T==1 query over a full (L, B, Hkv, S, D) slab."""
    if q.ndim != 4 or q.shape[1] != 1 or cache_k.ndim != 5:
        return False
    b, _, hq, d = q.shape
    _, bk, hkv, s, dk = cache_k.shape
    if b != bk or d != dk or d % 128 != 0 or hq % hkv != 0:
        return False
    if s % WBLK != 0 or s % 128 != 0:
        return False
    kv_bytes = 1 if cache_k.dtype == jnp.int8 else 2
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
    sblk: int,
    rep: int,
    hg: int,
    quantized: bool,
    softcap: Optional[float],
    window: Optional[int],
    compute_dtype=jnp.bfloat16,
):
    if quantized:
        kso_ref, vso_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    si = pl.program_id(2)
    ns = pl.num_programs(2)
    q_pos = len_ref[b]  # current token's slab position == row valid length
    d = q_ref.shape[-1]

    kn = kn_ref[0, 0, 0].astype(jnp.float32)  # (hg, D) exact new rows
    vn = vn_ref[0, 0, 0].astype(jnp.float32)

    @pl.when(si == 0)
    def _init():
        # Seed the online softmax with the current token's own term: its
        # score row is exact (bf16 K_new, no quantization roundtrip) and
        # the stale slab slot at q_pos never contributes. All heads in
        # one shot: (hg, rep, D) views are free leading-dim reshapes.
        q3 = q_ref[0, 0].astype(jnp.float32).reshape(hg, rep, d)
        s_new = jnp.sum(q3 * kn[:, None, :], axis=2).reshape(
            hg * rep, 1
        )
        if softcap is not None:
            s_new = jnp.tanh(s_new / softcap) * softcap
        m_ref[...] = jnp.broadcast_to(s_new, m_ref.shape)
        l_ref[...] = jnp.ones_like(l_ref)
        acc_ref[...] = jnp.broadcast_to(
            vn[:, None, :], (hg, rep, d)
        ).reshape(hg * rep, d)

    base = si * sblk
    run = base < q_pos + 1  # the block holding q_pos is always live
    if window is not None:
        run = jnp.logical_and(run, base + sblk > q_pos - window)

    @pl.when(run)
    def _compute():
        # ONE batched dot over the head-group dim instead of hg tiny
        # (rep, SBLK) dots + concatenates — the per-call fixed cost of
        # small MXU ops dominated this kernel at large batch (measured
        # 4.65 ms/step of attention at b32, ~28% of the DMA floor).
        q3 = (
            q_ref[0, 0].astype(compute_dtype).reshape(hg, rep, d)
        )
        k3 = k_ref[0, 0].astype(compute_dtype)  # (hg, SBLK, D)
        scores3 = jax.lax.dot_general(
            q3,
            k3,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (hg, rep, SBLK)
        if quantized:
            scores3 = scores3 * ks_ref[0, 0, 0][:, None, :].astype(
                jnp.float32
            )
        scores = scores3.reshape(hg * rep, scores3.shape[-1])
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap

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

        p3 = p.reshape(hg, rep, p.shape[-1])
        if quantized:
            p3 = p3 * vs_ref[0, 0, 0][:, None, :].astype(jnp.float32)
        v3 = v_ref[0, 0].astype(compute_dtype)  # (hg, SBLK, D)
        pv = jax.lax.dot_general(
            p3.astype(v3.dtype),
            v3,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hg * rep, d)
        acc_ref[...] = acc_ref[...] * alpha + pv

    # ---- commit: write the new token's K/V into the aliased slab. The out
    # blocks cover rows [q_pos//WBLK*WBLK, +WBLK); source rows come from the
    # attention stream's block at si == wb (always live, see `run`).
    wb = q_pos // sblk

    @pl.when(si == wb)
    def _write():
        # Mosaic must statically prove the sublane slice offset aligned;
        # the hint is sound because WBLK divides sblk.
        w0 = pl.multiple_of(
            ((q_pos % sblk) // WBLK) * WBLK, WBLK
        )
        r = q_pos % WBLK
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (WBLK, 1), 0) == r
        if quantized:
            ksc = jnp.maximum(
                jnp.max(jnp.abs(kn), axis=1, keepdims=True) / 127.0, 1e-8
            )  # (hg, 1)
            vsc = jnp.maximum(
                jnp.max(jnp.abs(vn), axis=1, keepdims=True) / 127.0, 1e-8
            )
            k_rows = jnp.clip(jnp.round(kn / ksc), -127, 127).astype(jnp.int8)
            v_rows = jnp.clip(jnp.round(vn / vsc), -127, 127).astype(jnp.int8)
        else:
            k_rows = kn
            v_rows = vn
        sub_k = k_ref[0, 0, :, pl.ds(w0, WBLK), :]  # (hg, WBLK, D)
        sub_v = v_ref[0, 0, :, pl.ds(w0, WBLK), :]
        ko_ref[0, 0] = jnp.where(
            rowmask[None], k_rows[:, None, :].astype(sub_k.dtype), sub_k
        )
        vo_ref[0, 0] = jnp.where(
            rowmask[None], v_rows[:, None, :].astype(sub_v.dtype), sub_v
        )
        if quantized:
            l0 = pl.multiple_of(((q_pos % sblk) // 128) * 128, 128)
            lanemask = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                == q_pos % 128
            )
            sub_ks = ks_ref[0, 0, 0, :, pl.ds(l0, 128)]  # (hg, 128)
            sub_vs = vs_ref[0, 0, 0, :, pl.ds(l0, 128)]
            kso_ref[0, 0, 0] = jnp.where(
                lanemask, ksc.astype(sub_ks.dtype), sub_ks
            )
            vso_ref[0, 0, 0] = jnp.where(
                lanemask, vsc.astype(sub_vs.dtype), sub_vs
            )

    @pl.when(si == ns - 1)
    def _final():
        o_ref[0, 0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-20)
        ).astype(o_ref.dtype)


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
    the slab outputs alias the inputs (only the written (WBLK, D) blocks
    move through HBM). ``lengths`` are NOT advanced — callers advance once
    per forward as with ``update_layer``.
    """
    b, t, hq, d = q.shape
    nl, _, hkv, s, _ = cache_k.shape
    assert t == 1 and hq % hkv == 0 and 0 <= layer < nl
    rep = hq // hkv
    quantized = cache_ks is not None
    kv_bytes = 1 if quantized else 2
    hg, sblk = _choose_layout(hkv, rep, s, d, kv_bytes)
    assert sblk > 0, (s, d)
    ns = s // sblk
    ng = hkv // hg

    q2 = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    q2 = q2.reshape(b, ng, hg * rep, d)
    kn = k_new.astype(jnp.bfloat16).reshape(b, 1, ng, hg, d).transpose(
        0, 2, 1, 3, 4
    )  # (B, ng, 1, hg, D) — block (1,1,1,hg,d) spans full trailing dims
    vn = v_new.astype(jnp.bfloat16).reshape(b, 1, ng, hg, d).transpose(
        0, 2, 1, 3, 4
    )

    if quantized:
        # Scale slabs reshaped (L, B, ng, hg, S): Pallas requires the last
        # two block dims be tile-multiples OR span the full array dim; a
        # (. , hg, 128) block over the raw (L, B, Hkv, S) slab violates
        # that whenever hg < Hkv. The reshape is a bitcast; aliasing holds
        # through it.
        ks_shape = cache_ks.shape
        cache_ks = cache_ks.reshape(nl, b, ng, hg, s)
        cache_vs = cache_vs.reshape(nl, b, ng, hg, s)
    else:
        # Dead placeholder operands keep one kernel signature.
        cache_ks = jnp.zeros((1, 1, 1, hg, 128), dtype=jnp.bfloat16)
        cache_vs = cache_ks

    def live_fn(bi, si, len_ref):
        live = si * sblk < len_ref[bi] + 1
        if sliding_window is not None:
            live = jnp.logical_and(
                live, (si + 1) * sblk > len_ref[bi] - sliding_window
            )
        return live

    def kv_idx(bi, gi, si, len_ref):
        # Clamp dead blocks to the previous live index: the pipeline elides
        # the repeated DMA, so traffic tracks each row's live context.
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
            (1, 1, hg * rep, d), lambda bi, gi, si, L: (bi, gi, 0, 0)
        ),
        pl.BlockSpec(
            (1, 1, hg, WBLK, d),
            lambda bi, gi, si, L: (layer, bi, gi, L[bi] // WBLK, 0),
        ),
        pl.BlockSpec(
            (1, 1, hg, WBLK, d),
            lambda bi, gi, si, L: (layer, bi, gi, L[bi] // WBLK, 0),
        ),
    ]
    # Flattened operand order (incl. the scalar-prefetch lengths at 0):
    # 0=lengths 1=q 2=k 3=v 4=k_new 5=v_new 6=k_scale 7=v_scale.
    aliases = {2: 1, 3: 2}
    if quantized:
        out_shape += [
            jax.ShapeDtypeStruct(cache_ks.shape, cache_ks.dtype),
            jax.ShapeDtypeStruct(cache_vs.shape, cache_vs.dtype),
        ]
        out_specs += [
            pl.BlockSpec(
                (1, 1, 1, hg, 128),
                lambda bi, gi, si, L: (layer, bi, gi, 0, L[bi] // 128),
            ),
            pl.BlockSpec(
                (1, 1, 1, hg, 128),
                lambda bi, gi, si, L: (layer, bi, gi, 0, L[bi] // 128),
            ),
        ]
        aliases.update({6: 3, 7: 4})

    sblk_sc = sblk if quantized else 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ng, ns),
        in_specs=[
            pl.BlockSpec(
                (1, 1, hg * rep, d), lambda bi, gi, si, L: (bi, gi, 0, 0)
            ),
            pl.BlockSpec((1, 1, hg, sblk, d), kv_idx),
            pl.BlockSpec((1, 1, hg, sblk, d), kv_idx),
            pl.BlockSpec(
                (1, 1, 1, hg, d), lambda bi, gi, si, L: (bi, gi, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, 1, hg, d), lambda bi, gi, si, L: (bi, gi, 0, 0, 0)
            ),
            pl.BlockSpec((1, 1, 1, hg, sblk_sc), sc_idx),
            pl.BlockSpec((1, 1, 1, hg, sblk_sc), sc_idx),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((hg * rep, 128), jnp.float32),  # running max
            pltpu.VMEM((hg * rep, 128), jnp.float32),  # running denominator
            pltpu.VMEM((hg * rep, d), jnp.float32),  # running numerator
        ],
    )
    kernel = functools.partial(
        _kernel,
        sblk=sblk,
        rep=rep,
        hg=hg,
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
