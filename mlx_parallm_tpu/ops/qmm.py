"""Quantized matmul: y = x @ dequant(W)^T for group-wise affine INT4/INT8 weights.

This is the TPU-native replacement for the reference's reliance on MLX
``QuantizedLinear`` / ``mx.gather_qmm`` (reference:
/root/reference/mlx_parallm/models/switch_layers.py:58-67,
/root/reference/mlx_parallm/utils.py:686-690). Three implementations:

  * ``dequant``  — dequantize-to-float then matmul. Reference-quality; used in
    tests and as the universal fallback.
  * ``grouped``  — per-group factored einsum over unpacked int8 values:
    ``y[b,n] = sum_g scales[n,g] * (x_g . q_g) + sum_g biases[n,g] * sum(x_g)``.
    Avoids materializing the full dequantized weight matrix in HBM; XLA keeps
    the (B, G, N) intermediate small for decode-sized B.
  * ``pallas``   — fused in-VMEM dequant + MXU matmul on packed uint32 weights
    (see ``ops/qmm_pallas.py``); the speed-of-light decode path on TPU.

Dispatch is automatic: Pallas on TPU when shapes are tile-aligned, else grouped
when an int8 mirror is present, else dequant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quant


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def qmm_dequant(x, packed, scales, biases, *, group_size, bits):
    w = quant.dequantize(packed, scales, biases, group_size, bits, dtype=x.dtype)
    return x @ w.T


def qmm_grouped(x, q_int8, scales, biases, *, group_size, bits):
    """Grouped factored quantized matmul over an unpacked int8 weight mirror.

    ``x``: (..., K) float; ``q_int8``: (N, K) int8 values in [0, 2**bits);
    ``scales``/``biases``: (N, G) with G = K // group_size.
    """
    *lead, k = x.shape
    n, k2 = q_int8.shape
    assert k == k2, (x.shape, q_int8.shape)
    g = k // group_size
    xf = x.reshape(-1, g, group_size)
    qg = q_int8.reshape(n, g, group_size).astype(x.dtype)
    # (B, G, group) x (N, G, group) -> (G, B, N), batched over G.
    t = jax.lax.dot_general(
        xf.transpose(1, 0, 2),
        qg.transpose(1, 0, 2),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    sc = scales.astype(jnp.float32)
    y = jnp.einsum("gbn,ng->bn", t, sc)
    xsum = jnp.sum(xf, axis=-1, dtype=jnp.float32)  # (B, G)
    y = y + xsum @ biases.astype(jnp.float32).T
    return y.reshape(*lead, n).astype(x.dtype)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _qmm_pallas_ad(meta, x, q_kernel, scales_t, biases_t, scales, biases):
    """Fused Pallas quantized matmul with a custom VJP.

    Forward is the Pallas kernel verbatim; backward reconstructs the
    dequantized weight (``quant.dequant_from_kernel``) and returns
    ``dx = dy @ W`` — the only cotangent that exists (weights are frozen
    integer storage; LoRA deltas differentiate through their own ops)."""
    from . import qmm_pallas

    group_size, bits = meta
    return qmm_pallas.qmm_pallas(
        x, q_kernel, scales, biases, group_size=group_size, bits=bits,
        scales_t=scales_t, biases_t=biases_t,
    )


def _qmm_pallas_ad_fwd(meta, x, q_kernel, scales_t, biases_t, scales, biases):
    y = _qmm_pallas_ad(meta, x, q_kernel, scales_t, biases_t, scales, biases)
    return y, (q_kernel, scales_t, biases_t, scales, biases)


def _qmm_pallas_ad_bwd(meta, res, dy):
    """dx = dy @ W, dequantizing ONE (NT, K) weight tile per scan step.

    A monolithic ``dequant_from_kernel`` materializes an s32 (N, K) plane
    array — 224 MB for a 14336x4096 linear — and a 32-layer training
    backward keeps several alive at once (measured OOM in the round-5
    RL co-residency bench). Scanning over the kernel's N-tiles bounds the
    dequant temps to one tile (~16 MB) regardless of depth."""
    import numpy as np

    group_size, bits = meta
    q_kernel, scales_t, biases_t, scales, biases = res
    t_tiles, kw, nt = q_kernel.shape
    per_word = 32 // bits
    k = kw * per_word
    g = k // group_size
    lead = dy.shape[:-1]
    n_pad = dy.shape[-1]
    assert n_pad == t_tiles * nt, (dy.shape, q_kernel.shape)
    dy2 = dy.reshape(-1, n_pad)
    m = dy2.shape[0]
    # (T, NT, M) / (T, NT, G): per-tile cotangent columns and quant params.
    dy3 = dy2.T.reshape(t_tiles, nt, m)
    sc3 = scales_t.T.reshape(t_tiles, nt, g)
    bi3 = biases_t.T.reshape(t_tiles, nt, g)
    inv = jnp.asarray(
        np.argsort(
            np.asarray(
                quant.kernel_layout_indices(k, group_size, bits)
            ).reshape(-1)
        )
    )

    def body(acc, inp):
        wtile, s, bcol, dyt = inp
        vals = quant.unpack(wtile.T, bits, dtype=jnp.uint32)  # (NT, K)
        if bits == 8:
            vals = jax.lax.bitcast_convert_type(
                vals.astype(jnp.uint8), jnp.int8
            ).astype(jnp.int32)
        else:
            vals = vals.astype(jnp.int32)
        q = vals[:, inv]  # original element order
        w = (
            q.reshape(nt, g, group_size).astype(jnp.float32)
            * s.astype(jnp.float32)[..., None]
            + bcol.astype(jnp.float32)[..., None]
        ).reshape(nt, k)
        # (M, NT) @ (NT, K) accumulated in f32.
        acc = acc + jax.lax.dot_general(
            dyt, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc0 = jnp.zeros((m, k), dtype=jnp.float32)
    dx2, _ = jax.lax.scan(body, acc0, (q_kernel, sc3, bi3, dy3))
    dx = dx2.astype(dy.dtype).reshape(*lead, k)
    return (
        dx,
        np.zeros(q_kernel.shape, jax.dtypes.float0),
        jnp.zeros_like(scales_t),
        jnp.zeros_like(biases_t),
        jnp.zeros_like(scales),
        jnp.zeros_like(biases),
    )


_qmm_pallas_ad.defvjp(_qmm_pallas_ad_fwd, _qmm_pallas_ad_bwd)


def qmm(
    x,
    packed,
    scales,
    biases,
    *,
    group_size: int = quant.DEFAULT_GROUP_SIZE,
    bits: int = quant.DEFAULT_BITS,
    q_int8=None,
    q_kernel=None,
    q_scales_t=None,
    q_biases_t=None,
    impl: str = "auto",
):
    """Quantized linear: ``x @ dequant(W)^T``.

    ``packed`` is the MLX uint32-packed weight ``(N, K*bits//32)``;
    ``q_kernel`` is the optional TILED (T, Kw, NT) fused-kernel layout
    (quant.tile_kernel(quant.kernel_pack(...))) enabling the Pallas path on
    TPU; ``q_scales_t``/``q_biases_t`` the optional pre-transposed (G, N)
    scale/bias mirrors (quant.kernel_scale_mirrors) keeping the relayout
    off the hot path; ``q_int8`` is an optional unpacked int8 mirror
    ``(N, K)`` enabling the grouped path.
    """
    if impl == "auto":
        if _on_tpu() and q_kernel is not None:
            from . import qmm_pallas

            if qmm_pallas.supported(x, q_kernel, scales, group_size, bits):
                impl = "pallas"
            elif q_int8 is not None:
                impl = "grouped"
            else:
                impl = "dequant"
        elif q_int8 is not None:
            impl = "grouped"
        elif (
            packed is None
            and q_kernel is not None
            and q_scales_t is not None
        ):
            # Kernel-layout-only tree (no MLX packed mirror) off-TPU:
            # reconstruct the weight from the tiled layout.
            impl = "dequant_kernel"
        else:
            impl = "dequant"

    if impl == "dequant_kernel":
        w = quant.dequant_from_kernel(
            q_kernel, q_scales_t, q_biases_t,
            group_size=group_size, bits=bits, dtype=x.dtype,
        )
        return x @ w.T

    if impl == "pallas":
        if q_scales_t is not None and q_biases_t is not None:
            # Differentiable wrapper: the Pallas kernel has no AD rule, so
            # training programs (GRPO grads flow through every linear's
            # INPUT) would crash on the TPU hot path. The custom VJP keeps
            # the fused kernel forward and computes dx = dy @ W through a
            # one-shot dequant reconstruction (backward-only cost).
            return _qmm_pallas_ad(
                (group_size, bits), x, q_kernel, q_scales_t, q_biases_t,
                scales, biases,
            )
        from . import qmm_pallas

        return qmm_pallas.qmm_pallas(
            x, q_kernel, scales, biases, group_size=group_size, bits=bits,
            scales_t=q_scales_t, biases_t=q_biases_t,
        )
    if impl == "grouped":
        if q_int8 is None:
            q_int8 = quant.unpack(packed, bits)
        return qmm_grouped(
            x, q_int8, scales, biases, group_size=group_size, bits=bits
        )
    if impl == "dequant":
        return qmm_dequant(
            x, packed, scales, biases, group_size=group_size, bits=bits
        )
    raise ValueError(f"unknown qmm impl: {impl}")
