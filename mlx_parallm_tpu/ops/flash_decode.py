"""Flash-decode attention Pallas TPU kernel with per-row lengths and fused
INT8-KV dequantization.

Replaces the XLA decode-attention path (``ops/attention.py`` — which
materializes (B, Hq, T, S) fp32 score tensors) for the T==1 decode hot loop,
covering the reference's ``mx.fast.scaled_dot_product_attention`` decode use
(reference: /root/reference/mlx_parallm/models/llama.py:139; SURVEY §2.6).

Design (one program per (row, kv-head, KV block), online softmax):

  * KV slab layout is (B, H_kv, S, D) — each (SBLK, D) K/V block is ONE
    fully contiguous HBM region, and the whole block feeds a single MXU dot
    against that head's ``rep`` query rows. Grid ``(B, Hkv, S/SBLK)`` with
    the KV-position axis innermost; running (m, l, acc) live in VMEM
    scratch across a row's KV blocks — no (T, S) materialization.
  * ``lengths`` ride scalar prefetch: the K/V BlockSpec index maps clamp
    blocks past a row's valid length back to block 0, so the pipeline skips
    their DMAs entirely — per-row HBM traffic is proportional to that row's
    live context, not the padded slab.
  * INT8 KV (north star "INT8-quantized KV cache"): int8 K/V blocks are
    cast to bf16 in VMEM and the per-(head, position) scales are folded
    into the score / probability rows — the slab is read at 1 byte/element
    and NEVER dequantized to a bf16 slab in HBM (replacing
    ``QuantizedKVCache.layer_view``'s full-slab dequant).
  * Optional logit softcap (gemma2) and sliding window supported in-kernel;
    window blocks below the attention span are DMA-skipped too.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Budget for the double-buffered K/V blocks (q/out/scratch are small);
# stays well under the 16 MiB scoped limit.
_KV_VMEM_BUDGET = 8 * 2**20


def _choose_sblk(s: int, d: int, kv_bytes: int, hg: int = 1) -> int:
    for sblk in (4096, 2048, 1024, 512, 256, 128):
        if s % sblk != 0:
            continue
        if 2 * 2 * hg * sblk * d * kv_bytes <= _KV_VMEM_BUDGET:
            return sblk
    return 0


def choose_hg_sblk(hkv: int, s: int, d: int, kv_bytes: int):
    """Joint (hg, sblk) rule shared by flash_decode and flash_append:
    maximize KV heads per grid step FIRST (fewer grid steps — the per-step
    fixed cost dominates at large batch), then cap the S block at 512 so
    per-row dead-block DMA elision keeps working at long contexts (an
    uncapped block spans the whole slab and silently reads every row's
    full capacity)."""
    hg = hkv
    while hkv % hg != 0:
        hg -= 1
    sblk = _choose_sblk(s, d, kv_bytes, hg)
    while sblk == 0 and hg > 1:
        hg = max(1, hg // 2)
        while hkv % hg != 0:
            hg -= 1
        sblk = _choose_sblk(s, d, kv_bytes, hg)
    if sblk > 512 and s % 512 == 0:
        sblk = 512
    return hg, sblk


def _kernel(
    len_ref,
    q_ref,
    k_ref,
    v_ref,
    ks_ref,
    vs_ref,
    o_ref,
    *out_and_scratch,
    sblk: int,
    rep: int,
    hg: int,
    quantized: bool,
    softcap: Optional[float],
    window: Optional[int],
    compute_dtype=jnp.bfloat16,
):
    m_ref, l_ref, acc_ref = out_and_scratch
    b = pl.program_id(0)
    si = pl.program_id(2)
    ns = pl.num_programs(2)

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_pos = len_ref[b]
    q_hi = q_pos + 1  # attend kv slots < q_hi
    base = si * sblk
    run = base < q_hi
    if window is not None:
        run = jnp.logical_and(run, base + sblk > q_pos - window)

    @pl.when(run)
    def _compute():
        # ONE batched dot over the head-group dim instead of hg tiny
        # (rep, SBLK) dots + concatenates (see flash_append: the per-call
        # fixed cost of small MXU ops dominated at large batch).
        d = q_ref.shape[-1]
        q3 = q_ref[0, 0].astype(compute_dtype).reshape(hg, rep, d)
        k3 = k_ref[0, 0].astype(compute_dtype)  # (hg, SBLK, D)
        scores3 = jax.lax.dot_general(
            q3,
            k3,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (hg, rep, SBLK)
        if quantized:
            scores3 = scores3 * ks_ref[0, 0][:, None, :].astype(jnp.float32)
        scores = scores3.reshape(hg * rep, scores3.shape[-1])
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap

        kv_pos = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = kv_pos < q_hi
        if window is not None:
            valid = jnp.logical_and(valid, kv_pos > q_pos - window)
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[...]  # (HG*rep, 128), all lanes equal
        m_cur = jnp.max(scores, axis=1, keepdims=True)  # (HG*rep, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_new[:, :1])  # (HG*rep, 1)
        p = jnp.exp(scores - m_new[:, :1])  # (HG*rep, SBLK)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_new

        p3 = p.reshape(hg, rep, p.shape[-1])
        if quantized:
            p3 = p3 * vs_ref[0, 0][:, None, :].astype(jnp.float32)
        v3 = v_ref[0, 0].astype(compute_dtype)  # (hg, SBLK, D)
        pv = jax.lax.dot_general(
            p3.astype(v3.dtype),
            v3,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hg * rep, d)
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(si == ns - 1)
    def _final():
        o_ref[0, 0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-20)
        ).astype(o_ref.dtype)


def supported(q, k, lengths) -> bool:
    """Shape gate: T==1 query, lane-aligned head dim, KV window divisible by
    a feasible block size. k is the slab-layout (B, Hkv, S, D) cache view."""
    if q.ndim != 4 or q.shape[1] != 1 or k.ndim != 4:
        return False
    b, _, hq, d = q.shape
    _, hkv, s, dk = k.shape
    if d != dk or d % 128 != 0 or hq % hkv != 0:
        return False
    kv_bytes = 1 if k.dtype == jnp.int8 else 2
    # hg=1 is the fallback grouping the wrapper can always reach.
    return _choose_sblk(s, d, kv_bytes, 1) > 0


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
    """Single-token batched decode attention over a slab-layout KV cache.

    q: (B, 1, Hq, D); k/v: (B, Hkv, S, D) bf16 — or int8 with
    k_scale/v_scale (B, Hkv, S); lengths: (B,) int32 where row b's query
    sits at absolute position lengths[b] (attends kv slots <= lengths[b]).
    Returns (B, 1, Hq, D) in q.dtype.
    """
    b, t, hq, d = q.shape
    _, hkv, s, _ = k.shape
    assert t == 1 and hq % hkv == 0
    rep = hq // hkv
    quantized = k_scale is not None
    kv_bytes = 1 if quantized else 2
    hg, sblk = choose_hg_sblk(hkv, s, d, kv_bytes)
    assert sblk > 0, (s, d)
    ns = s // sblk
    ng = hkv // hg  # head groups

    q2 = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    q2 = q2.reshape(b, ng, hg * rep, d)  # row within group: h_local*rep + r

    k = k.reshape(b, ng, hg, s, d)
    v = v.reshape(b, ng, hg, s, d)
    if quantized:
        k_scale = k_scale.reshape(b, ng, hg, s)
        v_scale = v_scale.reshape(b, ng, hg, s)
    else:
        # Placeholder operands keep one kernel signature; their blocks are
        # tiny and the loads are dead code under `quantized=False`.
        k_scale = jnp.zeros((b, ng, hg, 128), dtype=jnp.bfloat16)
        v_scale = k_scale
    sblk_sc = sblk if quantized else 128

    def live_fn(bi, si, len_ref):
        live = si * sblk < len_ref[bi] + 1
        if sliding_window is not None:
            live = jnp.logical_and(
                live, (si + 1) * sblk > len_ref[bi] - sliding_window
            )
        return live

    def kv_idx(bi, gi, si, len_ref):
        # Clamp blocks fully outside [q_pos - window, q_pos] back to the
        # previous live block: the pipeline elides the repeated DMA, so
        # per-row traffic tracks that row's live context.
        return (bi, gi, 0, jnp.where(live_fn(bi, si, len_ref), si, 0), 0)

    if quantized:

        def sc_idx(bi, gi, si, len_ref):
            return (bi, gi, 0, jnp.where(live_fn(bi, si, len_ref), si, 0))

    else:

        def sc_idx(bi, gi, si, len_ref):
            return (bi, gi, 0, 0)

    out_shape = jax.ShapeDtypeStruct((b, ng, hg * rep, d), q.dtype)
    out_specs = pl.BlockSpec(
        (1, 1, hg * rep, d), lambda bi, gi, si, L: (bi, gi, 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ng, ns),
        in_specs=[
            pl.BlockSpec(
                (1, 1, hg * rep, d), lambda bi, gi, si, L: (bi, gi, 0, 0)
            ),
            pl.BlockSpec((1, 1, hg, sblk, d), kv_idx),
            pl.BlockSpec((1, 1, hg, sblk, d), kv_idx),
            pl.BlockSpec((1, 1, hg, sblk_sc), sc_idx),
            pl.BlockSpec((1, 1, hg, sblk_sc), sc_idx),
        ],
        out_specs=out_specs,
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
        out_shape=out_shape,
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * d * s,
            bytes_accessed=2 * b * s * hkv * d * kv_bytes + b * hq * d * 4,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q2, k, v, k_scale, v_scale)
    return res.reshape(b, 1, hq, d).astype(q.dtype)
