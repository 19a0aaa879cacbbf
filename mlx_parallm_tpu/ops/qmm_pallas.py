"""Fused dequant + matmul Pallas TPU kernel for group-wise INT4/INT8 weights.

The speed-of-light decode path (SURVEY §7.4 item 1): weights stream from HBM
at packed width (0.5 byte/weight for INT4), are dequantized in VMEM, and feed
the MXU — replacing MLX's fused ``QuantizedLinear`` matmul
(reference: /root/reference/mlx_parallm/utils.py:686-690).

Weights are pre-shuffled ONCE at load into the kernel layout
(``ops.quant.kernel_pack``): a transposed ``(Kw, N)`` uint32 tensor where

  * bit-plane ``j`` (``(W >> bits*j) & mask``) is already the natural
    ``(K-slice, N)`` matmul operand — no in-kernel transpose;
  * word-row ``i`` belongs to quant group ``i mod G``, so the scale map is a
    Mosaic-native tile repeat along sublanes.

Per output tile: y = sum_j xp_j @ (plane_j * s_map) + x_group_sums @ biases_t
with bf16 MXU dots and fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_TILE = 16  # bf16 sublane minimum; decode batches are padded up to this
N_TILE = 256


def supported(x, packed_kernel, scales, group_size, bits) -> bool:
    """Shape/alignment gate. ``packed_kernel`` is the (Kw, N) kernel layout."""
    if packed_kernel is None or bits not in (4, 8):
        return False
    per_word = 32 // bits
    if group_size % per_word != 0:
        return False
    kw, n = packed_kernel.shape
    k = kw * per_word
    if x.shape[-1] != k:
        return False
    if n % N_TILE != 0 or kw % 8 != 0 or k % group_size != 0:
        return False
    if kw * 4 * N_TILE > 8 * 1024 * 1024:  # VMEM budget per tile
        return False
    return True


def _kernel(xp_ref, xg_ref, w_ref, s_ref, b_ref, out_ref, *, planes, bits, reps):
    """One (M_TILE, N_TILE) output tile; full K in VMEM.

    xp: (planes, M, Kw) plane-permuted activations (kernel layout)
    xg: (M, G) per-group activation sums
    w:  (Kw, N_TILE) packed uint32 (kernel layout)
    s, b: (G, N_TILE) transposed scales / biases
    """
    mask = jnp.uint32((1 << bits) - 1)
    w = w_ref[:]
    # s_map[q*G + r, n] = scales_t[r, n] — tile repeat along sublanes.
    s_map = pltpu.repeat(s_ref[:].astype(jnp.float32), reps, axis=0)  # (Kw, N)

    acc = jnp.zeros((xp_ref.shape[1], w.shape[1]), jnp.float32)
    for j in range(planes):
        # Mosaic has no uint32->float cast; hop through int32 (values are
        # 0..2^bits-1, exact).
        plane = ((w >> jnp.uint32(bits * j)) & mask).astype(jnp.int32)
        deq = (plane.astype(jnp.float32) * s_map).astype(jnp.bfloat16)
        acc += jnp.dot(xp_ref[j], deq, preferred_element_type=jnp.float32)
    acc += jnp.dot(xg_ref[:], b_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("group_size", "bits"))
def qmm_pallas(x, packed_kernel, scales, biases, *, group_size, bits):
    """y = x @ dequant(W)^T.

    x: (..., K); packed_kernel: (Kw, N) uint32 in KERNEL layout
    (quant.kernel_pack); scales/biases: (N, G) (transposed internally).
    """
    *lead, k = x.shape
    kw, n = packed_kernel.shape
    per_word = 32 // bits
    g = k // group_size
    qq = group_size // per_word  # words per group (per plane)

    xf = x.reshape(-1, k).astype(jnp.bfloat16)
    m = xf.shape[0]
    m_pad = max(M_TILE, ((m + M_TILE - 1) // M_TILE) * M_TILE)
    if m_pad != m:
        xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))

    # Plane permutation to kernel layout:
    # xp[j, b, q*G + r] = x[b, r*gs + q*P + j].
    xp = (
        xf.reshape(m_pad, g, qq, per_word)  # [b, r, q, j]
        .transpose(3, 0, 2, 1)  # [j, b, q, r]
        .reshape(per_word, m_pad, kw)
    )
    xg = jnp.sum(
        xf.reshape(m_pad, g, group_size).astype(jnp.float32), axis=-1
    ).astype(jnp.bfloat16)

    scales_t = scales.T.astype(jnp.bfloat16)  # (G, N)
    biases_t = biases.T.astype(jnp.bfloat16)

    grid = (m_pad // M_TILE, n // N_TILE)
    out = pl.pallas_call(
        functools.partial(_kernel, planes=per_word, bits=bits, reps=qq),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (per_word, M_TILE, kw),
                lambda i, j: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (M_TILE, g), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (kw, N_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (g, N_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (g, N_TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (M_TILE, N_TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=n * kw * 4 + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0,
        ),
    )(xp, xg, packed_kernel, scales_t, biases_t)

    return out[:m].reshape(*lead, n).astype(x.dtype)
