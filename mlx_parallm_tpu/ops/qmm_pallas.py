"""Fused dequant + matmul Pallas TPU kernel for group-wise INT4/INT8 weights.

The speed-of-light decode path (SURVEY §7.4 item 1): weights stream from HBM
at packed width (0.5 byte/weight for INT4), are expanded to int8 operands with
ONE lane-wise mask + ``bitcast`` (no per-element shifts), dequantized with a
tile-repeat scale map, and fed to the MXU — replacing MLX's fused
``QuantizedLinear`` matmul (reference: /root/reference/mlx_parallm/utils.py:686-690).

Layout contract (see ``ops.quant.kernel_pack`` / ``kernel_layout_indices`` /
``tile_kernel``): the packed kernel is a TILED ``(T, Kw, NT)`` uint32 tensor
(tile t = output columns [t*NT, (t+1)*NT)), so each weight block the grid
touches is one fully contiguous HBM region — measured ~25% faster on v5e than
blocked reads out of a row-major (Kw, N) matrix. Within a tile, byte-planes
after ``pltpu.bitcast(w & 0x0F0F0F0F, int8)`` (and the ``>> 4`` variant for
odd nibbles) form ``(K/2, NT)`` int8 matrices where plane-row ``t`` belongs
to quant group ``t mod G``. The matching activation permutation is a pure
reshape/transpose of the (small) ``x`` done in XLA:

    INT4:  y = x_even @ (i8_even * s_map) + x_odd @ (i8_odd * s_map)
             + x_group_sums @ biases_t
    INT8:  y = x_perm @ (i8 * s_map) + x_group_sums @ biases_eff
           (bytes stored -128-biased; correction folded into biases_eff)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_TILE = 16  # bf16 sublane minimum; decode batches are padded up to this
_NIBBLE_MASK = 0x0F0F0F0F


def _m_tile(m_pad: int) -> int:
    """Decode batches use the minimum sublane tile; prefill / large batches
    use a full MXU-height tile. (mt=32 at m=64 looked faster in the
    isolated probe_qmm_m64 but lost 5.5 ms/step e2e at b64 — the doubled
    weight re-stream dominates in-program; mt == m_pad stands.)"""
    for cand in (256, 128, 64, 32):
        if m_pad % cand == 0:
            return cand
    return M_TILE


# Conservative headroom under the 16 MiB scoped limit: the model below does
# not count the materialized scale map / compiler copies, and embedding the
# kernel in a larger XLA program adds operand copies (observed: a shape whose
# standalone compile fit OOM'd inside the full prefill program).
_VMEM_BUDGET = 11 * 2**20


def _scoped_vmem(mt: int, kwt: int, nt: int, g: int, bits: int) -> int:
    """Estimate of the kernel's scoped VMEM footprint (calibrated against
    Mosaic's reported allocations: weight blocks double-buffered, x/out
    blocks double-buffered, the dequant expansion fused into the dot)."""
    nplanes = 2 if bits == 4 else 1
    w = 2 * kwt * nt * 4
    x = 2 * nplanes * mt * (4 * kwt) * 2
    out = 2 * mt * nt * 4
    sb = 2 * g * nt * 2  # scales block, double-buffered (bias applied by XLA)
    return w + x + out + sb


def _kw_tile(kw: int, g: int, mt: int = M_TILE, nt: int = 256, bits: int = 4) -> int:
    """Largest divisor of Kw that keeps per-tile plane rows a multiple of G
    (valid tile-repeat scale map) and fits the VMEM budget at this (mt, nt).

    The search must reach past 512: shapes whose group count has odd
    factors need larger tiles (e.g. K=13824, G=216 admits only multiples
    of 864) — the VMEM budget is the real bound."""
    for d in range(min(kw, 2048), 0, -1):
        if kw % d != 0 or (4 * d) % g != 0:
            continue
        # x blocks are (mt, 4*d): Pallas requires the last block dim be a
        # multiple of 128 unless it spans the full array dimension.
        if d != kw and (4 * d) % 128 != 0:
            continue
        if _scoped_vmem(mt, d, nt, g, bits) <= _VMEM_BUDGET:
            return d
    return 0


def supported(x, packed_kernel, scales, group_size, bits) -> bool:
    """Shape/alignment gate. ``packed_kernel`` is the tiled (T, Kw, NT)
    kernel layout (quant.tile_kernel of quant.kernel_pack)."""
    if packed_kernel is None or bits not in (4, 8):
        return False
    if packed_kernel.ndim != 3:
        return False
    t, kw, nt = packed_kernel.shape
    per_word = 32 // bits
    k = kw * per_word
    if x.shape[-1] != k:
        return False
    g = k // group_size if k % group_size == 0 else 0
    if g == 0:
        return False
    rows = k // 2 if bits == 4 else k
    if rows % g != 0:
        return False
    if nt % 256 != 0 or kw % 8 != 0:
        return False
    # Feasibility at the decode m-tile; qmm_pallas() itself re-budgets for
    # the actual batch (shrinking mt if needed).
    return _kw_tile(kw, g, M_TILE, nt, bits) > 0


def _kernel4(xe_ref, xo_ref, w_ref, s_ref, out_ref, *, reps, column):
    """INT4 tile: two bitcast nibble-plane matmuls.

    Grid is (M, N-tiles, K) with K innermost; the output block is revisited
    across K steps and accumulated in place. The affine bias term
    (x_group_sums @ biases_t) is a tiny rank-G matmul applied by XLA
    OUTSIDE the kernel — a third in-kernel dot per block costs a full MXU
    pipeline slot (measured: removing it is worth ~5% at decode shapes).

    ``column=True`` (per-column-scale layout, G == 1): the per-value scale
    multiply — the kernel's measured VPU bottleneck, ~1.5 ops/value of a
    ~2.9-op body (probe_qmm_decompose: prod 486-515 GB/s vs noscale
    627-709) — is SKIPPED entirely; the single per-column scale folds into
    the XLA epilogue on the f32 accumulator."""
    kt = pl.program_id(2)
    w = w_ref[0]
    even = pltpu.bitcast(w & jnp.uint32(_NIBBLE_MASK), jnp.int8)
    odd = pltpu.bitcast(
        (w >> jnp.uint32(4)) & jnp.uint32(_NIBBLE_MASK), jnp.int8
    )
    if column:
        we = even.astype(jnp.bfloat16)
        wo = odd.astype(jnp.bfloat16)
    else:
        s_map = pltpu.repeat(s_ref[:], reps, axis=0)  # (rows_t, NT) bf16
        we = even.astype(jnp.bfloat16) * s_map
        wo = odd.astype(jnp.bfloat16) * s_map
    acc = jnp.dot(xe_ref[:], we, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], wo, preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        out_ref[:] = acc

    @pl.when(kt != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


def _kernel8(xp_ref, w_ref, s_ref, out_ref, *, reps, column):
    """INT8 tile: one bitcast byte-plane matmul (bias term applied by XLA
    outside, as in _kernel4; ``column`` as in _kernel4)."""
    kt = pl.program_id(2)
    w = w_ref[0]
    vals = pltpu.bitcast(w, jnp.int8)  # (rows_t, NT), stored -128-biased
    if column:
        wv = vals.astype(jnp.bfloat16)
    else:
        s_map = pltpu.repeat(s_ref[:], reps, axis=0)
        wv = vals.astype(jnp.bfloat16) * s_map
    acc = jnp.dot(xp_ref[:], wv, preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        out_ref[:] = acc

    @pl.when(kt != 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("group_size", "bits"))
def qmm_pallas(
    x, packed_kernel, scales, biases, *, group_size, bits,
    scales_t=None, biases_t=None,
):
    """y = x @ dequant(W)^T.

    x: (..., K); packed_kernel: (T, Kw, NT) uint32 in TILED KERNEL layout
    (quant.tile_kernel(quant.kernel_pack(...))); scales/biases: (N, G) MLX
    layout. ``scales_t``/``biases_t`` are OPTIONAL pre-transposed (G, N)
    operands (``quant.kernel_scale_mirrors``): computing them per call puts
    a (N, G) -> (G, N) relayout of every scale plane on the decode hot path
    (for INT8 ``biases_t`` must be the -128-offset-corrected effective
    bias, transposed).
    """
    *lead, k = x.shape
    n_t, kw, nt = packed_kernel.shape
    n = n_t * nt
    g = k // group_size

    xf = x.reshape(-1, k).astype(jnp.bfloat16)
    m = xf.shape[0]
    m_pad = max(M_TILE, ((m + M_TILE - 1) // M_TILE) * M_TILE)
    if m_pad != m:
        xf = jnp.pad(xf, ((0, m_pad - m), (0, 0)))
    mt = _m_tile(m_pad)

    xg = jnp.sum(
        xf.reshape(m_pad, g, group_size).astype(jnp.float32), axis=-1
    ).astype(jnp.bfloat16)

    # Joint (mt, kw_tile) choice under the VMEM budget: prefer the large
    # prefill m-tile, shrink it before giving up on a valid K tiling.
    kw_tile = _kw_tile(kw, g, mt, nt, bits)
    while kw_tile == 0 and mt > M_TILE:
        mt //= 2
        kw_tile = _kw_tile(kw, g, mt, nt, bits)
    assert kw_tile > 0, (kw, g, mt, nt, bits)
    n_kt = kw // kw_tile
    rows_t = 4 * kw_tile  # plane rows per K tile (both bit widths)

    # Per-column-scale layout (G == 1): the kernel runs scale-free at its
    # no-scale ceiling and the one scale per output column is applied to
    # the f32 accumulator below (fuses with the bias epilogue).
    column = g == 1

    if scales_t is None:
        scales_t = scales.T.astype(jnp.bfloat16)  # (G, N)
    if bits == 8:
        if biases_t is None:
            biases_eff = (
                biases.astype(jnp.float32)
                + 128.0 * scales.astype(jnp.float32)
            )
            biases_t = biases_eff.T.astype(jnp.bfloat16)
        # x1[b, q*G + r] = x[b, r*gs + q]
        xp = (
            xf.reshape(m_pad, g, group_size).transpose(0, 2, 1).reshape(m_pad, k)
        )
        kernel = functools.partial(_kernel8, reps=rows_t // g, column=column)
        x_inputs = [xp]
        x_specs = [
            pl.BlockSpec(
                (mt, rows_t), lambda i, j, kt: (i, kt), memory_space=pltpu.VMEM
            )
        ]
    else:
        if biases_t is None:
            biases_t = biases.T.astype(jnp.bfloat16)
        # x_{even,odd}[b, q*G + r] = x[b, r*gs + 2q + p]
        x4 = xf.reshape(m_pad, g, group_size // 2, 2)  # [b, r, q, p]
        xp = x4.transpose(3, 0, 2, 1).reshape(2, m_pad, k // 2)
        kernel = functools.partial(_kernel4, reps=rows_t // g, column=column)
        x_inputs = [xp[0], xp[1]]
        x_specs = [
            pl.BlockSpec(
                (mt, rows_t), lambda i, j, kt: (i, kt), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (mt, rows_t), lambda i, j, kt: (i, kt), memory_space=pltpu.VMEM
            ),
        ]

    grid = (m_pad // mt, n_t, n_kt)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        grid=grid,
        in_specs=x_specs
        + [
            pl.BlockSpec(
                (1, kw_tile, nt),
                lambda i, j, kt: (j, kt, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g, nt), lambda i, j, kt: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (mt, nt), lambda i, j, kt: (i, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            # M/N are genuinely parallel; K must STAY 'arbitrary': the
            # output block is revisited and accumulated in place across K
            # steps, which 'parallel' would miscompile. (All-'arbitrary'
            # measured ~8% over no hints in r3; parallel M/N is A/B'd by
            # MLX_PARALLM_QMM_ARB=1.)
            dimension_semantics=(
                ("arbitrary", "arbitrary", "arbitrary")
                if __import__("os").environ.get("MLX_PARALLM_QMM_ARB") == "1"
                else ("parallel", "parallel", "arbitrary")
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=n * kw * 4 + m_pad * k * 2 + m_pad * n * 4,
            transcendentals=0,
        ),
    )(*x_inputs, packed_kernel, scales_t)

    # Affine epilogue (rank-G): XLA fuses this tiny matmul-add; doing it
    # in-kernel cost an MXU pipeline slot per (mt, nt) block. In column
    # mode the deferred per-column scale joins it.
    if column:
        out = out * scales_t.astype(jnp.float32)
    out = out + xg @ biases_t.astype(jnp.float32)
    return out[:m].reshape(*lead, n).astype(x.dtype)
