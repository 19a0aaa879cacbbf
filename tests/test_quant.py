"""Quantization round-trip + quantized matmul parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_parallm_tpu.ops import qmm, quant


@pytest.mark.parametrize("bits", [4, 8])
def test_quantize_roundtrip(bits):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    packed, scales, biases = quant.quantize(w, group_size=64, bits=bits)
    assert packed.dtype == jnp.uint32
    assert packed.shape == (32, 128 * bits // 32)
    assert scales.shape == (32, 2)
    deq = quant.dequantize(packed, scales, biases, 64, bits)
    err = jnp.max(jnp.abs(deq - w))
    # Max quantization error is half a quantization step.
    max_step = jnp.max(scales)
    assert err <= max_step * 0.51 + 1e-6


@pytest.mark.parametrize("bits", [4, 8])
def test_pack_unpack_identity(bits):
    rng = np.random.default_rng(1)
    vals = jnp.asarray(
        rng.integers(0, 2**bits, size=(8, 64), dtype=np.uint32)
    )
    packed = quant.pack(vals, bits)
    unpacked = quant.unpack(packed, bits, dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(vals))


def test_numpy_jax_pack_agree():
    """The tiny-model factory's host-side quantizer must produce the exact
    same packed layout as ops.quant."""
    from mlx_parallm_tpu.tools.tiny_model import _np_quantize

    rng = np.random.default_rng(2)
    w = rng.standard_normal((16, 128)).astype(np.float32)
    packed_np, scales_np, biases_np = _np_quantize(w, 64, 4)
    packed_j, scales_j, biases_j = quant.quantize(jnp.asarray(w), 64, 4)
    np.testing.assert_array_equal(packed_np, np.asarray(packed_j))
    np.testing.assert_allclose(scales_np, np.asarray(scales_j), rtol=1e-5)
    np.testing.assert_allclose(biases_np, np.asarray(biases_j), rtol=1e-5)


@pytest.mark.parametrize("bits", [4, 8])
def test_qmm_grouped_matches_dequant(bits):
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((48, 192)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((5, 192)).astype(np.float32))
    packed, scales, biases = quant.quantize(w, group_size=64, bits=bits)
    y_ref = qmm.qmm_dequant(x, packed, scales, biases, group_size=64, bits=bits)
    q8 = quant.unpack(packed, bits)
    y_grouped = qmm.qmm_grouped(x, q8, scales, biases, group_size=64, bits=bits)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_grouped), rtol=1e-4, atol=1e-4
    )


def test_qmm_auto_jit():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    packed, scales, biases = quant.quantize(w, 64, 4)

    @jax.jit
    def f(x, packed, scales, biases):
        return qmm.qmm(x, packed, scales, biases, group_size=64, bits=4)

    y = f(x, packed, scales, biases)
    y_ref = x @ quant.dequantize(packed, scales, biases, 64, 4).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_tile_untile_roundtrip():
    import jax
    import jax.numpy as jnp

    from mlx_parallm_tpu.ops import quant

    wk = jax.random.bits(jax.random.PRNGKey(0), (64, 2048), jnp.uint32)
    for nt in (256, 512, 1024, 2048):
        wk3 = quant.tile_kernel(wk, nt)
        assert wk3.shape == (2048 // nt, 64, nt)
        assert (quant.untile_kernel(wk3) == wk).all()
        # Tile t must hold columns [t*nt, (t+1)*nt) in order.
        if wk3.shape[0] > 1:
            assert (wk3[1] == wk[:, nt : 2 * nt]).all()


def test_choose_n_tile_properties():
    from mlx_parallm_tpu.ops import quant

    # Picks the preferred candidate dividing N (1024 measured fastest).
    assert quant.choose_n_tile(4096, 28672, 4) == 1024
    assert quant.choose_n_tile(4096, 32000, 4) == 256  # 32000 % 512 != 0
    assert quant.choose_n_tile(4096, 100, 4) is None  # below lane floor
    # Shard-aware: N/nt must stay divisible by n_shards.
    assert quant.choose_n_tile(4096, 28672, 4, n_shards=8) == 512  # 28672/512=56
    # tp=4 also divides the NT=1024 tile count evenly.
    assert quant.choose_n_tile(4096, 28672, 4, n_shards=4) == 1024  # T=28
    # Any chosen tile must pass the kernel's own feasibility gate (the chooser
    # uses qmm_pallas._kw_tile, so chosen layouts are never rejected later).
    from mlx_parallm_tpu.ops import qmm_pallas

    for k, n, bits, gs in [(4096, 28672, 4, 64), (2048, 8192, 8, 32),
                           (4096, 32000, 4, 64), (11008, 4096, 4, 64)]:
        nt = quant.choose_n_tile(k, n, bits, group_size=gs)
        if nt is not None:
            kw = k * bits // 32
            assert qmm_pallas._kw_tile(
                kw, k // gs, qmm_pallas.M_TILE, nt, bits
            ) > 0


def test_dequant_from_kernel_roundtrip():
    """dequant_from_kernel inverts tile_kernel(kernel_pack(...)) — the
    training path's backward-weight reconstruction must agree with the
    plain MLX-layout dequantization bit-for-bit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlx_parallm_tpu.ops import quant

    rng = np.random.default_rng(0)
    for bits, gs, k, n in [(4, 64, 512, 512), (8, 32, 256, 512)]:
        w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
        packed, scales, biases = quant.quantize(w, gs, bits)
        ref = np.asarray(
            quant.dequantize(packed, scales, biases, gs, bits), np.float32
        )
        wk = quant.tile_kernel(quant.kernel_pack(packed, gs, bits), 256)
        sk, bk = quant.kernel_scale_mirrors(scales, biases, bits)
        got = np.asarray(
            quant.dequant_from_kernel(
                wk, sk, bk, group_size=gs, bits=bits, dtype=jnp.float32
            ),
            np.float32,
        )
        # bf16 mirrors round the scales/biases (the fp32 reference does
        # not); worst case is ~q_max * eps_bf16 * |scale-magnitude| —
        # compare at bf16 resolution, not exactly.
        np.testing.assert_allclose(got, ref, rtol=1.3e-2, atol=5e-2)
        # The element PERMUTATION must be exact: reconstruct with fp32
        # mirrors and require bitwise agreement.
        sk32 = scales.astype(jnp.float32).T
        bk32 = biases.astype(jnp.float32).T
        if bits == 8:
            bk32 = bk32 + 128.0 * sk32
        exact = np.asarray(
            quant.dequant_from_kernel(
                wk, sk32, bk32, group_size=gs, bits=bits, dtype=jnp.float32
            ),
            np.float32,
        )
        # fp32-noise-only agreement (the int8 +128*s bias fold reorders
        # the arithmetic): any permutation error would be O(scale), not
        # O(1e-6).
        np.testing.assert_allclose(exact, ref, atol=1e-5)


def test_qmm_grad_through_kernel_layout():
    """Gradients flow through qmm's kernel-layout path (the GRPO training
    program differentiates every linear's input)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mlx_parallm_tpu.ops import qmm, quant

    rng = np.random.default_rng(1)
    k, n, gs, bits = 256, 512, 64, 4
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    packed, scales, biases = quant.quantize(w, gs, bits)
    wk = quant.tile_kernel(quant.kernel_pack(packed, gs, bits), 256)
    sk, bk = quant.kernel_scale_mirrors(scales, biases, bits)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)

    def loss(x):
        y = qmm.qmm(
            x, None, scales, biases, group_size=gs, bits=bits,
            q_kernel=wk, q_scales_t=sk, q_biases_t=bk,
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    w_deq = quant.dequant_from_kernel(
        wk, sk, bk, group_size=gs, bits=bits, dtype=jnp.float32
    )
    y = x.astype(jnp.float32) @ w_deq.T
    g_ref = 2.0 * y @ w_deq
    # bf16 activations/cotangents round at ~1% relative; a permutation or
    # scale bug would be O(|g|)-wrong everywhere, not sub-percent.
    g = np.asarray(g, np.float32)
    g_ref = np.asarray(g_ref, np.float32)
    denom = max(1.0, float(np.abs(g_ref).max()))
    assert np.abs(g - g_ref).max() / denom < 0.02
