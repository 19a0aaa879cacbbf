"""Flash-decode attention Pallas TPU kernel with per-row lengths and fused
INT8-KV dequantization.

Replaces the XLA decode-attention path (``ops/attention.py`` — which
materializes (B, Hq, T, S) fp32 score tensors) for the T==1 decode hot loop,
covering the reference's ``mx.fast.scaled_dot_product_attention`` decode use
(reference: /root/reference/mlx_parallm/models/llama.py:139; SURVEY §2.6).

Design (one program per (batch row, KV block), online softmax):

  * grid ``(B, S/SBLK)`` with the KV-position axis innermost; running
    (m, l, acc) live in VMEM scratch across a row's KV blocks — no (T, S)
    materialization, no HBM round trip for scores.
  * ``lengths`` ride scalar prefetch: the K/V BlockSpec index maps clamp
    blocks past a row's valid length back to block 0, so the pipeline skips
    their DMAs entirely — per-row HBM traffic is proportional to that row's
    live context, not the padded slab.
  * GQA: query heads are laid out kv-head-major ``(B, Hkv*rep, D)``; each
    kv head's K/V block is dotted against its ``rep`` query rows (static
    unrolled loop, MXU dots with fp32 accumulation).
  * INT8 KV (north star "INT8-quantized KV cache", VERDICT round 1 #6):
    int8 K/V blocks are cast to bf16 in VMEM and the per-(position, head)
    scales are folded into the score rows / probability rows — the slab is
    read at 1 byte/element and NEVER dequantized to a bf16 slab in HBM
    (replacing ``QuantizedKVCache.layer_view``'s full-slab dequant).
  * Optional logit softcap (gemma2) and sliding window supported in-kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Conservative VMEM budget for the double-buffered K/V blocks (the scratch,
# q and out blocks are small): stay well under the 16 MiB scoped limit.
_KV_VMEM_BUDGET = 8 * 2**20


def _choose_sblk(s: int, hkv: int, d: int, kv_bytes: int) -> int:
    for sblk in (1024, 512, 256, 128):
        if s % sblk != 0:
            continue
        if 2 * 2 * sblk * hkv * d * kv_bytes <= _KV_VMEM_BUDGET:
            return sblk
    return 0


def _kernel(
    len_ref,
    q_ref,
    k_ref,
    v_ref,
    ks_ref,
    vs_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    rep: int,
    hkv: int,
    sblk: int,
    quantized: bool,
    softcap: Optional[float],
    window: Optional[int],
):
    b = pl.program_id(0)
    si = pl.program_id(1)
    ns = pl.num_programs(1)

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_pos = len_ref[b]  # query attends kv slots s <= q_pos
    valid_n = q_pos + 1
    base = si * sblk

    run = base < valid_n
    if window is not None:
        run = jnp.logical_and(run, base + sblk > q_pos - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0]  # (Hq, D) bf16, pre-scaled
        k = k_ref[0]  # (SBLK, Hkv, D)
        v = v_ref[0]
        rows = []
        for h in range(hkv):
            q_h = q[h * rep : (h + 1) * rep, :]  # (rep, D)
            k_h = k[:, h, :]  # (SBLK, D)
            if quantized:
                k_h = k_h.astype(jnp.bfloat16)
            s_h = jax.lax.dot_general(
                q_h,
                k_h,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rep, SBLK)
            if quantized:
                s_h = s_h * ks_ref[0][h : h + 1, :].astype(jnp.float32)
            rows.append(s_h)
        scores = jnp.concatenate(rows, axis=0)  # (Hq, SBLK) fp32
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap

        kv_pos = base + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1
        )
        valid = kv_pos <= q_pos
        if window is not None:
            valid = jnp.logical_and(valid, kv_pos > q_pos - window)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[...]  # (Hq, 128), all lanes equal
        m_cur = jnp.max(scores, axis=1, keepdims=True)  # (Hq, 1)
        m_new = jnp.maximum(m_prev, m_cur)  # (Hq, 128)
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])  # (Hq, 1)
        p = jnp.exp(scores - m_new[:, :1])  # (Hq, SBLK)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_new

        outs = []
        for h in range(hkv):
            p_h = p[h * rep : (h + 1) * rep, :]  # (rep, SBLK)
            if quantized:
                p_h = p_h * vs_ref[0][h : h + 1, :].astype(jnp.float32)
            v_h = v[:, h, :]
            if quantized:
                v_h = v_h.astype(jnp.bfloat16)
            outs.append(
                jax.lax.dot_general(
                    p_h.astype(v_h.dtype),
                    v_h,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (rep, D)
        pv = jnp.concatenate(outs, axis=0)  # (Hq, D)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(si == ns - 1)
    def _final():
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-20)
        ).astype(o_ref.dtype)


def supported(q, k, lengths) -> bool:
    """Shape gate for the decode kernel: T==1 query, lane-aligned head dim,
    KV window divisible by a feasible block size."""
    if q.ndim != 4 or q.shape[1] != 1:
        return False
    b, _, hq, d = q.shape
    _, s, hkv, dk = k.shape
    if d != dk or d % 128 != 0 or hq % hkv != 0:
        return False
    kv_bytes = 1 if k.dtype == jnp.int8 else 2
    return _choose_sblk(s, hkv, d, kv_bytes) > 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "logit_softcap", "sliding_window", "interpret"),
)
def flash_decode(
    q,
    k,
    v,
    lengths,
    *,
    scale: float,
    k_scale=None,
    v_scale=None,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
):
    """Single-token batched decode attention over a KV slab.

    q: (B, 1, Hq, D); k/v: (B, S, Hkv, D) bf16 — or int8 with
    k_scale/v_scale (B, S, Hkv); lengths: (B,) int32 where row b's query
    sits at absolute position lengths[b] (attends kv slots <= lengths[b]).
    Returns (B, 1, Hq, D) in q.dtype.
    """
    b, t, hq, d = q.shape
    _, s, hkv, _ = k.shape
    assert t == 1 and hq % hkv == 0
    rep = hq // hkv
    quantized = k_scale is not None
    kv_bytes = 1 if quantized else 2
    sblk = _choose_sblk(s, hkv, d, kv_bytes)
    assert sblk > 0, (s, hkv, d)
    ns = s // sblk

    q2 = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    q2 = q2.reshape(b, hq, d)  # kv-head-major rows: h*rep + r

    if quantized:
        ks_t = k_scale.transpose(0, 2, 1)  # (B, Hkv, S)
        vs_t = v_scale.transpose(0, 2, 1)
    else:
        # Placeholder operands keep one kernel signature; blocks are tiny
        # and their loads are dead-code under `quantized=False`.
        ks_t = jnp.zeros((b, hkv, 128), dtype=jnp.bfloat16)
        vs_t = ks_t
    s_sc = ks_t.shape[2]
    sblk_sc = sblk if quantized else 128

    def kv_idx(bi, si, len_ref):
        # Skip (re-map to block 0, whose DMA the pipeline elides) every
        # block fully past this row's valid length.
        live = si * sblk < len_ref[bi] + 1
        return (bi, jnp.where(live, si, 0), 0, 0)

    if quantized:

        def sc_idx(bi, si, len_ref):
            live = si * sblk < len_ref[bi] + 1
            return (bi, 0, jnp.where(live, si, 0))

    else:

        def sc_idx(bi, si, len_ref):
            return (bi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda bi, si, len_ref: (bi, 0, 0)),
            pl.BlockSpec((1, sblk, hkv, d), kv_idx),
            pl.BlockSpec((1, sblk, hkv, d), kv_idx),
            pl.BlockSpec((1, hkv, sblk_sc), sc_idx),
            pl.BlockSpec((1, hkv, sblk_sc), sc_idx),
        ],
        out_specs=pl.BlockSpec(
            (1, hq, d), lambda bi, si, len_ref: (bi, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((hq, 128), jnp.float32),  # running max (broadcast)
            pltpu.VMEM((hq, 128), jnp.float32),  # running denom
            pltpu.VMEM((hq, d), jnp.float32),  # running numerator
        ],
    )
    kernel = functools.partial(
        _kernel,
        rep=rep,
        hkv=hkv,
        sblk=sblk,
        quantized=quantized,
        softcap=logit_softcap,
        window=sliding_window,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * d * s,
            bytes_accessed=2 * b * s * hkv * d * kv_bytes + b * hq * d * 4,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q2, k, v, ks_t, vs_t)
    return out.reshape(b, 1, hq, d).astype(q.dtype)
