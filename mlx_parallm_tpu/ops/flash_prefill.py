"""Blocked (flash) prefill attention over the KV slab with per-row offsets.

Replaces the XLA ``sdpa_slab`` einsum path for T>1 chunks, which
materializes O(B·Hq·T·S) fp32 score tensors in HBM (at a 512-token chunk
over a 2.5k-slab that is ~1.3 GB per layer); here scores live in VMEM one
(T-block, S-block) tile at a time with an online softmax, the same design
as the decode kernels (reference bar: ``mx.fast.scaled_dot_product_attention``
covers prefill too — /root/reference/mlx_parallm/models/llama.py:139).

Grid is (B, H_kv, T-blocks, S-blocks), S innermost. Queries arrive
pre-grouped per kv-head as (B, Hkv, T*rep, D) so each grid step's Q block
is one contiguous (TBLK*rep, D) matrix feeding a single MXU dot against
the head's (SBLK, D) K block. Causality is enforced at block granularity
by DMA-clamping S blocks beyond ``offsets[b] + t_max(block)`` (per-row
traffic tracks the live context) and at element granularity by an iota
mask. INT8 KV folds the per-(head, position) scales into the score /
probability rows in VMEM — the slab is never dequantized to HBM."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_VMEM_BUDGET = 8 * 2**20
TBLK = 64  # queries per T block (rows per block = TBLK * rep)


def _choose_sblk(s: int, d: int, kv_bytes: int) -> int:
    for sblk in (1024, 512, 256, 128):
        if s % sblk != 0:
            continue
        if 2 * 2 * sblk * d * kv_bytes <= _VMEM_BUDGET:
            return sblk
    return 0


def supported(q, k, lengths) -> bool:
    """q: (B, T, Hq, D) with T > 1; k: slab view (B, Hkv, S, D)."""
    if q.ndim != 4 or q.shape[1] < 2 or k.ndim != 4:
        return False
    b, t, hq, d = q.shape
    _, hkv, s, dk = k.shape
    if d != dk or d % 128 != 0 or hq % hkv != 0:
        return False
    if t % TBLK != 0 or s % 128 != 0:
        return False
    kv_bytes = 1 if k.dtype == jnp.int8 else 2
    return _choose_sblk(s, d, kv_bytes) > 0


def _kernel(
    off_ref,
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
    sblk: int,
    tblk: int,
    rep: int,
    quantized: bool,
    softcap: Optional[float],
    window: Optional[int],
    compute_dtype=jnp.bfloat16,
):
    b = pl.program_id(0)
    ti = pl.program_id(2)
    si = pl.program_id(3)
    ns = pl.num_programs(3)
    rows = tblk * rep
    off = off_ref[b]

    @pl.when(si == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = si * sblk
    q_hi = off + (ti + 1) * tblk  # strict upper bound on valid kv slots
    run = base < q_hi
    if window is not None:
        run = jnp.logical_and(run, base + sblk > off + ti * tblk - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(compute_dtype)  # (rows, D), pre-scaled
        k = k_ref[0, 0].astype(compute_dtype)  # (SBLK, D)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, SBLK)
        if quantized:
            scores = scores * ks_ref[0, 0].astype(jnp.float32)  # (1, SBLK)
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap

        kv_pos = base + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 1
        )
        t_of_row = ti * tblk + (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) // rep
        )
        q_pos = off + t_of_row
        valid = kv_pos <= q_pos
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

        if quantized:
            p = p * vs_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(compute_dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(si == ns - 1)
    def _final():
        # Fully-masked rows (queries past a row's live span in chunked
        # prefill) have l == 0; emit zeros for them.
        o_ref[0, 0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-20)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "logit_softcap", "sliding_window", "interpret"),
)
def flash_prefill(
    q,
    k,
    v,
    offsets,
    *,
    scale: float,
    k_scale=None,
    v_scale=None,
    logit_softcap: Optional[float] = None,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
):
    """Causal prefill attention: q (B, T, Hq, D) over slab k/v
    (B, Hkv, S, D) (int8 with k_scale/v_scale (B, Hkv, S)); query token i
    of row b sits at absolute position offsets[b] + i and attends kv slots
    <= that. Returns (B, T, Hq, D) in q.dtype."""
    b, t, hq, d = q.shape
    _, hkv, s, _ = k.shape
    assert hq % hkv == 0
    rep = hq // hkv
    quantized = k_scale is not None
    kv_bytes = 1 if quantized else 2
    sblk = _choose_sblk(s, d, kv_bytes)
    assert sblk > 0 and t % TBLK == 0, (s, t, d)
    ns = s // sblk
    nt = t // TBLK
    rows = TBLK * rep

    q2 = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    # (B, T, Hq, D) -> (B, Hkv, T*rep, D): row t*rep + r of head h is
    # query token t's r-th head within kv group h.
    q2 = q2.reshape(b, t, hkv, rep, d).transpose(0, 2, 1, 3, 4)
    q2 = q2.reshape(b, hkv, t * rep, d)

    if quantized:
        # (B, Hkv, 1, S): the singleton axis makes the scale block's last
        # two dims (1, SBLK) span/tile the array dims legally (a (1, sblk)
        # block over (B, Hkv, S) would put a size-1 block on the Hkv dim).
        k_scale = k_scale.reshape(b, hkv, 1, s)
        v_scale = v_scale.reshape(b, hkv, 1, s)
    else:
        k_scale = jnp.zeros((b, hkv, 1, 128), dtype=jnp.bfloat16)
        v_scale = k_scale
    sblk_sc = sblk if quantized else 128

    def live_fn(bi, ti, si, off_ref):
        live = si * sblk < off_ref[bi] + (ti + 1) * TBLK
        if sliding_window is not None:
            live = jnp.logical_and(
                live,
                (si + 1) * sblk > off_ref[bi] + ti * TBLK - sliding_window,
            )
        return live

    def kv_idx(bi, hi, ti, si, off_ref):
        return (bi, hi, jnp.where(live_fn(bi, ti, si, off_ref), si, 0), 0)

    if quantized:

        def sc_idx(bi, hi, ti, si, off_ref):
            return (
                bi, hi, 0, jnp.where(live_fn(bi, ti, si, off_ref), si, 0)
            )

    else:

        def sc_idx(bi, hi, ti, si, off_ref):
            return (bi, hi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv, nt, ns),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows, d), lambda bi, hi, ti, si, O: (bi, hi, ti, 0)
            ),
            pl.BlockSpec((1, 1, sblk, d), kv_idx),
            pl.BlockSpec((1, 1, sblk, d), kv_idx),
            pl.BlockSpec((1, 1, 1, sblk_sc), sc_idx),
            pl.BlockSpec((1, 1, 1, sblk_sc), sc_idx),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows, d), lambda bi, hi, ti, si, O: (bi, hi, ti, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel,
        sblk=sblk,
        tblk=TBLK,
        rep=rep,
        quantized=quantized,
        softcap=logit_softcap,
        window=sliding_window,
        # CPU interpret mode (tests) lacks bf16 dot support.
        compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
    )
    res = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hkv, t * rep, d), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * d * s,
            bytes_accessed=2 * b * hkv * s * d * kv_bytes * nt
            + 2 * b * hq * t * d * 2,
            transcendentals=b * hq * t * s,
        ),
        interpret=interpret,
    )(offsets.astype(jnp.int32), q2, k, v, k_scale, v_scale)
    out = res.reshape(b, hkv, t, rep, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, t, hq, d).astype(q.dtype)
