"""Group-wise affine weight-only quantization (INT4 / INT8).

Storage layout is wire-compatible with MLX's ``mx.quantize`` so that checkpoints
converted by the reference stack round-trip into this framework
(reference: /root/reference/mlx_parallm/models/switch_layers.py:20-28,
/root/reference/mlx_parallm/utils.py:686-690,904):

  * ``weight``  : ``uint32`` of shape ``(out, in * bits // 32)``. Each uint32 packs
    ``32 // bits`` consecutive input-dim elements, first element in the least
    significant bits.
  * ``scales``  : ``(out, in // group_size)`` float.
  * ``biases``  : ``(out, in // group_size)`` float.
  * dequant     : ``w = q * scale + bias`` with ``q`` in ``[0, 2**bits - 1]``.

On TPU, packed ``uint32`` weights are consumed directly by the fused Pallas
dequant-matmul kernel (see ``ops/qmm.py``); an unpacked ``int8`` mirror can be
materialised at load time for the XLA grouped-einsum path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_GROUP_SIZE = 64
DEFAULT_BITS = 4


def _check(group_size: int, bits: int, in_features: int) -> None:
    if bits not in (2, 4, 8):
        raise ValueError(f"bits must be one of 2/4/8, got {bits}")
    if in_features % group_size != 0:
        raise ValueError(
            f"in_features ({in_features}) must be divisible by group_size ({group_size})"
        )
    if group_size % (32 // bits) != 0:
        raise ValueError(f"group_size {group_size} incompatible with bits {bits}")


def quantize(
    w: jax.Array, group_size: int = DEFAULT_GROUP_SIZE, bits: int = DEFAULT_BITS
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize a float matrix ``(..., K)`` group-wise along the last axis.

    Returns ``(packed_uint32, scales, biases)`` in the MLX-compatible layout.
    """
    *lead, k = w.shape
    _check(group_size, bits, k)
    n_groups = k // group_size
    levels = (1 << bits) - 1

    wg = w.reshape(*lead, n_groups, group_size).astype(jnp.float32)
    w_min = jnp.min(wg, axis=-1)
    w_max = jnp.max(wg, axis=-1)
    scale = (w_max - w_min) / levels
    # Guard degenerate all-equal groups.
    scale = jnp.where(scale <= 1e-10, jnp.ones_like(scale), scale)
    bias = w_min

    q = jnp.clip(
        jnp.round((wg - bias[..., None]) / scale[..., None]), 0, levels
    ).astype(jnp.uint32)

    packed = pack(q.reshape(*lead, k), bits)
    return packed, scale.astype(w.dtype), bias.astype(w.dtype)


def pack(q: jax.Array, bits: int) -> jax.Array:
    """Pack integer values in ``[0, 2**bits)`` of shape ``(..., K)`` into uint32.

    Element ``i`` of each 32//bits-sized chunk occupies bits ``[i*bits, (i+1)*bits)``
    (little-endian within the word), matching MLX.
    """
    per_word = 32 // bits
    *lead, k = q.shape
    assert k % per_word == 0
    q = q.astype(jnp.uint32).reshape(*lead, k // per_word, per_word)
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits).astype(jnp.uint32)
    return jnp.bitwise_or.reduce(q << shifts, axis=-1)


def unpack(packed: jax.Array, bits: int, dtype=jnp.uint8) -> jax.Array:
    """Unpack uint32-packed weights back to integer values ``(..., K)``."""
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits).astype(jnp.uint32)
    vals = (packed[..., None] >> shifts) & mask
    *lead, words, _ = vals.shape
    return vals.reshape(*lead, words * per_word).astype(dtype)


def dequantize(
    packed: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    group_size: int = DEFAULT_GROUP_SIZE,
    bits: int = DEFAULT_BITS,
    dtype=jnp.float32,
) -> jax.Array:
    """Dequantize packed weights back to ``(..., K)`` floats."""
    q = unpack(packed, bits, dtype=jnp.int32).astype(dtype)
    *lead, k = q.shape
    n_groups = k // group_size
    qg = q.reshape(*lead, n_groups, group_size)
    w = qg * scales[..., None].astype(dtype) + biases[..., None].astype(dtype)
    return w.reshape(*lead, k)


@functools.partial(jax.jit, static_argnames=("group_size", "bits"))
def quantize_jit(w, group_size=DEFAULT_GROUP_SIZE, bits=DEFAULT_BITS):
    return quantize(w, group_size, bits)


def kernel_layout_indices(k: int, group_size: int, bits: int):
    """Element-index map for the fused-kernel byte-plane layout.

    The Pallas kernel unpacks a ``(Kw, N)`` uint32 tile with lane-wise mask +
    ``pltpu.bitcast(..., int8)``, which yields byte-plane arrays whose row
    ``t = 4*i + b`` holds byte ``b`` of word-row ``i``. We choose the packing
    so that the element at plane-row ``t`` (and nibble parity ``p`` for INT4)
    belongs to quant group ``t mod G`` — making the per-row scale map a
    Mosaic-native tile repeat (``pltpu.repeat(scales_t, rows//G, axis=0)``).

    Returns an int array ``elem[kw, 32//bits]``: original input-dim element
    index for (word-row, intra-word slot).
    """
    import numpy as np

    per_word = 32 // bits
    kw = k // per_word
    g = k // group_size
    elem = np.empty((kw, per_word), dtype=np.int64)
    for i in range(kw):
        for j in range(per_word):
            if bits == 4:
                b, p = j // 2, j % 2  # byte, nibble parity
                t = 4 * i + b  # row in the (K/2)-row plane array
                q_idx, r = divmod(t, g)
                elem[i, j] = r * group_size + 2 * q_idx + p
            else:  # bits == 8
                t = 4 * i + j
                q_idx, r = divmod(t, g)
                elem[i, j] = r * group_size + q_idx
    return elem


def kernel_pack(
    packed_mlx: jax.Array, group_size: int, bits: int
) -> jax.Array:
    """Re-pack MLX-layout packed weights into the fused-kernel layout:
    a TRANSPOSED ``(Kw, N)`` uint32 tensor whose byte/nibble planes come out
    of a single lane-wise ``bitcast`` as MXU-ready ``(K-slice, N)`` int8
    operands with tile-repeatable group scale maps (see
    ``kernel_layout_indices``; activation permutation in qmm_pallas).

    For INT8, stored bytes are biased by -128 (two's complement) so the int8
    reinterpretation is exact; the matching ``+128*scale`` correction folds
    into the affine bias term (applied in qmm_pallas).
    """
    per_word = 32 // bits
    q = unpack(packed_mlx, bits, dtype=jnp.uint32)  # (N, K) original order
    n, k = q.shape
    kw = k // per_word
    elem = jnp.asarray(kernel_layout_indices(k, group_size, bits))
    q_kernel = q[:, elem.reshape(-1)].reshape(n, kw, per_word)
    if bits == 8:
        q_kernel = (q_kernel - 128) & 0xFF
    # (N, Kw, P) -> (Kw, N, P) -> pack intra-word slots.
    q_kernel = q_kernel.transpose(1, 0, 2)
    return pack(q_kernel, bits).reshape(kw, n)  # (Kw, N) uint32


# N-tile candidates for the tiled kernel layout. Bigger tiles mean longer
# contiguous DMA bursts (one (Kw, NT) block is a single sequential HBM
# read); measured on v5e: tiled layouts stream ~25% faster than the
# strided 2D layout, and NT=1024 edges out 2048 (~3% at decode m=16 —
# smaller double-buffered blocks overlap better). 256 is the kernel's
# lane-width floor.
_N_TILE_CANDIDATES = (1024, 2048, 512, 256)


def choose_n_tile(
    k: int, n: int, bits: int, n_shards: int = 1, group_size: int = 64
):
    """Largest N-tile that (a) divides ``n`` with a tile count divisible by
    ``n_shards`` (so TP sharding along the tile axis stays even) and (b)
    passes the SAME feasibility gate the kernel applies at dispatch
    (``qmm_pallas._kw_tile``). Using the kernel's own model here means a
    chosen layout is never rejected later by ``qmm_pallas.supported`` (which
    would silently demote the layer to the unpacked-int8 fallback). Returns
    None when no candidate fits."""
    from . import qmm_pallas

    kw = k * bits // 32
    if k % group_size != 0 or kw % 8 != 0:
        return None
    g = k // group_size
    rows = k // 2 if bits == 4 else k
    if rows % g != 0:
        return None
    best_fallback = None
    for nt in _N_TILE_CANDIDATES:
        if n % nt != 0 or (n // nt) % n_shards != 0:
            continue
        kt = qmm_pallas._kw_tile(kw, g, qmm_pallas.M_TILE, nt, bits)
        if kt <= 0:
            continue
        if kt == kw:
            # Whole-K blocks: no K-split output revisits. Measured on
            # K=14336 at decode m=16: 693 GB/s (nt=512, whole-K) vs
            # 214-524 GB/s (nt=1024, two K steps) — whole-K beats a
            # wider tile decisively.
            return nt
        if best_fallback is None:
            best_fallback = nt
    return best_fallback


def choose_n_tile_expert(
    k: int, n: int, bits: int, n_shards: int = 1, group_size: int = 64
):
    """N-tile for STACKED MoE expert weights: prefer a tile whose whole-K
    block fits VMEM (the ragged grouped kernel needs single-block K —
    e.g. K=14336 experts must drop to nt=512), falling back to the plain
    per-expert kernel's choice."""
    from . import qmm_ragged

    kw = k * bits // 32
    if k % group_size != 0 or kw % 8 != 0:
        return None
    g = k // group_size
    rows = k // 2 if bits == 4 else k
    if rows % g != 0:
        return None
    from . import qmm_pallas

    for nt in _N_TILE_CANDIDATES:
        if n % nt != 0 or (n // nt) % n_shards != 0:
            continue
        if qmm_pallas._kw_tile(kw, g, qmm_pallas.M_TILE, nt, bits) <= 0:
            continue
        if qmm_ragged.choose_tm(16, kw, nt, g, bits) > 0:
            return nt
    return choose_n_tile(k, n, bits, n_shards=n_shards, group_size=group_size)


def plan_n_tile(
    k: int, n: int, bits: int, n_shards: int = 1, group_size: int = 64,
    max_pad_frac: float = 0.125,
):
    """(n_tile, n_pad): like ``choose_n_tile`` but allowed to PAD the output
    dimension up to a multiple of a large tile. Vocab-sized heads (e.g.
    N=32000) otherwise fall to 256-wide tiles whose small blocks stream at
    a fraction of peak (measured 169 vs ~700 GB/s for the 7B lm_head);
    padding to 32768 costs 2.4% extra weight traffic and wins it back
    four-fold. Padded rows carry zero scales/biases (zero logits, sliced
    off by ``params.linear``). Returns (None, n) when nothing feasible."""
    from . import qmm_pallas

    kw = k * bits // 32
    if k % group_size != 0 or kw % 8 != 0:
        return None, n
    g = k // group_size
    rows = k // 2 if bits == 4 else k
    if rows % g != 0:
        return None, n
    fallback = (None, n)
    for nt in _N_TILE_CANDIDATES:
        step = nt * n_shards
        n_pad = ((n + step - 1) // step) * step
        if (n_pad - n) / n > max_pad_frac:
            continue
        kt = qmm_pallas._kw_tile(kw, g, qmm_pallas.M_TILE, nt, bits)
        if kt <= 0:
            continue
        if kt == kw:  # whole-K first (see choose_n_tile)
            return nt, n_pad
        if fallback[0] is None:
            fallback = (nt, n_pad)
    return fallback


def pad_quantized_rows(packed, scales, biases, n_pad: int):
    """Zero-pad a quantized linear's output rows to ``n_pad`` (zero scales
    and biases make the padded logits exactly zero)."""
    import jax.numpy as jnp

    n = packed.shape[0]
    if n_pad == n:
        return packed, scales, biases
    extra = n_pad - n
    packed = jnp.concatenate(
        [packed, jnp.zeros((extra, packed.shape[1]), packed.dtype)], axis=0
    )
    scales = jnp.concatenate(
        [scales, jnp.zeros((extra, scales.shape[1]), scales.dtype)], axis=0
    )
    biases = jnp.concatenate(
        [biases, jnp.zeros((extra, biases.shape[1]), biases.dtype)], axis=0
    )
    return packed, scales, biases


def kernel_scale_mirrors(scales: jax.Array, biases: jax.Array, bits: int):
    """Pre-transposed (G, N) scale/bias operands for the fused kernel.

    Built once at load time: computing ``scales.T`` per call puts a
    (N, G) -> (G, N) relayout of every scale plane on the decode hot path
    (measured ~15% of the qmm wrapper's time at decode shapes). For INT8
    the bias mirror carries the ``+128*scale`` storage-offset correction
    (see ``kernel_pack``)."""
    import jax.numpy as jnp

    sk = scales.T.astype(jnp.bfloat16)
    if bits == 8:
        eff = biases.astype(jnp.float32) + 128.0 * scales.astype(jnp.float32)
        bk = eff.T.astype(jnp.bfloat16)
    else:
        bk = biases.T.astype(jnp.bfloat16)
    return sk, bk


def tile_kernel(wk: jax.Array, n_tile: int) -> jax.Array:
    """(Kw, N) kernel layout -> tiled (N // n_tile, Kw, n_tile).

    Tile t holds columns ``[t*n_tile, (t+1)*n_tile)`` so each Pallas weight
    block is one fully contiguous HBM region."""
    kw, n = wk.shape
    assert n % n_tile == 0, (wk.shape, n_tile)
    return wk.reshape(kw, n // n_tile, n_tile).transpose(1, 0, 2)


def untile_kernel(wk3: jax.Array) -> jax.Array:
    """Inverse of ``tile_kernel``: (T, Kw, NT) -> (Kw, T*NT)."""
    t, kw, nt = wk3.shape
    return wk3.transpose(1, 0, 2).reshape(kw, t * nt)


def dequant_from_kernel(
    q_kernel: jax.Array,
    scales_t: jax.Array,
    biases_t: jax.Array,
    *,
    group_size: int,
    bits: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Reconstruct the dequantized ``(N, K)`` weight from the TILED kernel
    layout (inverse of ``tile_kernel(kernel_pack(...))``).

    Training-path helper: the fused Pallas matmul has no autodiff rule, so
    its custom VJP (``ops.qmm``) computes ``dx = dy @ W`` through this
    reconstruction. ``scales_t``/``biases_t`` are the (G, N) kernel
    mirrors — for INT8 the stored values are already -128-biased and the
    bias mirror carries the matching correction, so ``W = s*v + b`` holds
    for the SIGNED reinterpretation directly."""
    import numpy as np

    wk = untile_kernel(q_kernel)  # (Kw, N) uint32
    per_word = 32 // bits
    kw, n = wk.shape
    k = kw * per_word
    # (N, Kw*per_word) in (word-row, slot) order = kernel plane order.
    vals = unpack(wk.T, bits, dtype=jnp.uint32)
    if bits == 8:
        vals = jax.lax.bitcast_convert_type(
            vals.astype(jnp.uint8), jnp.int8
        ).astype(jnp.int32)
    else:
        vals = vals.astype(jnp.int32)
    # Invert the kernel element permutation: slot m holds original input
    # element perm[m].
    perm = kernel_layout_indices(k, group_size, bits).reshape(-1)
    inv = np.argsort(perm)
    q = vals[:, jnp.asarray(inv)]  # (N, K) original element order
    g = k // group_size
    qg = q.reshape(n, g, group_size).astype(jnp.float32)
    s = scales_t.T.astype(jnp.float32)[..., None]  # (N, G, 1)
    b = biases_t.T.astype(jnp.float32)[..., None]
    return (qg * s + b).reshape(n, k).astype(dtype)
