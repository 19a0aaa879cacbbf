"""Ragged (expert-grouped) qmm kernel vs per-row dequant reference
(Pallas interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mlx_parallm_tpu.ops import qmm_ragged, quant


def _build_stack(e, n, k, gs, bits, seed=0):
    rng = np.random.default_rng(seed)
    packed, scales, biases, wk3 = [], [], [], []
    dense = []
    for i in range(e):
        w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32) * 0.05)
        p, s, b = quant.quantize(w, gs, bits)
        packed.append(p)
        scales.append(s)
        biases.append(b)
        dense.append(quant.dequantize(p, s, b, gs, bits, dtype=jnp.float32))
        nt = 256
        wk3.append(quant.tile_kernel(quant.kernel_pack(p, gs, bits), nt))
    scales = jnp.stack(scales)
    biases = jnp.stack(biases)
    sk3 = jnp.stack(
        [
            quant.kernel_scale_mirrors(scales[i], biases[i], bits)[0]
            for i in range(e)
        ]
    )
    bk3 = jnp.stack(
        [
            quant.kernel_scale_mirrors(scales[i], biases[i], bits)[1]
            for i in range(e)
        ]
    )
    return jnp.stack(wk3), sk3, bk3, jnp.stack(dense)


@pytest.mark.parametrize("bits", [4, 8])
def test_ragged_matches_dense(bits):
    e, n, k, gs = 4, 512, 256, 64
    rng = np.random.default_rng(1)
    wk3, sk3, bk3, dense = _build_stack(e, n, k, gs, bits)

    r = 40  # ragged row count; expert 2 left empty
    ids = jnp.asarray(
        rng.choice([0, 1, 3], size=(r,)).astype(np.int32)
    )
    x = jnp.asarray(rng.normal(size=(r, k)).astype(np.float32))

    y = qmm_ragged.ragged_qmm(
        x, ids, wk3, sk3, bk3,
        group_size=gs, bits=bits, num_experts=e, interpret=True,
    )
    ref = jnp.einsum("rk,rnk->rn", x, dense[ids])
    # Tolerance covers bf16 scale-map rounding inside the kernel.
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), rtol=6e-2, atol=6e-2
    )


def _param_dict(e, n, k, gs, bits, seed):
    wk3, sk3, bk3, dense = _build_stack(e, n, k, gs, bits, seed=seed)
    return {"wk3": wk3, "sk3": sk3, "bk3": bk3}, dense


def test_switch_glu_ragged_matches_reference():
    """The shared-layout ragged SwitchGLU must match the per-pair dense
    composition (gate/up/down all routed per (token, slot))."""
    import jax

    from mlx_parallm_tpu.models import switch_layers as SL

    e, k, f, gs, bits = 4, 256, 512, 64, 4
    p_gate, d_gate = _param_dict(e, f, k, gs, bits, seed=5)
    p_up, d_up = _param_dict(e, f, k, gs, bits, seed=6)
    p_down, d_down = _param_dict(e, k, f, gs, bits, seed=7)
    p = {"gate_proj": p_gate, "up_proj": p_up, "down_proj": p_down}

    rng = np.random.default_rng(2)
    t, top_k = 20, 2
    x = jnp.asarray(rng.normal(size=(t, k)).astype(np.float32) * 0.3)
    idx = jnp.asarray(rng.integers(0, e, (t, top_k)).astype(np.int32))

    out = SL.switch_glu_ragged(p, x, idx, (gs, bits), interpret=True)
    assert out.shape == (t, top_k, k)

    gate = jnp.einsum("tk,tjnk->tjn", x, d_gate[idx])
    up = jnp.einsum("tk,tjnk->tjn", x, d_up[idx])
    h = jax.nn.silu(gate) * up
    ref = jnp.einsum("tjf,tjnf->tjn", h, d_down[idx])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=8e-2, atol=8e-2
    )


def test_layout_covers_all_rows():
    ids = jnp.asarray(np.array([3, 0, 0, 2, 3, 3, 0], dtype=np.int32))
    lay = qmm_ragged.make_layout(ids, 4, 16)
    pos = np.asarray(lay.pos)
    assert len(set(pos.tolist())) == len(pos)  # distinct padded positions
    # Every row's padded position lands in a tile owned by its expert.
    e_of_tile = np.asarray(lay.e_of_tile)
    order = np.asarray(lay.order)
    ids_np = np.asarray(ids)
    for r_sorted, p in enumerate(pos):
        assert e_of_tile[p // lay.tm] == ids_np[order[r_sorted]]
