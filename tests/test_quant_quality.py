"""Quantization quality: INT4/INT8 perplexity delta vs the FP base model
(north-star requirement: match FP16-reference perplexity within the INT4
delta at the same bit width)."""

import numpy as np
import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine
from mlx_parallm_tpu.tools import convert as C

TEXT = (
    "The quick brown fox jumps over the lazy dog. "
    "TPU pods run JAX programs compiled by XLA across many chips. "
    "You are a helpful assistant. Answer concisely and correctly."
)


def _ppl(model_dir):
    model, tok = loader.load(model_dir)
    engine = DecodeEngine(model, tok)
    ids = tok.encode(TEXT)
    lp, mask = engine.score_tokens([ids])
    return float(np.exp(-lp[0][mask[0]].mean()))


def test_int4_int8_perplexity_delta(tiny_fp_model_dir, tmp_path):
    ppl_fp = _ppl(tiny_fp_model_dir)
    q4 = C.convert(tiny_fp_model_dir, str(tmp_path / "q4"), quantize=True, q_bits=4)
    q8 = C.convert(tiny_fp_model_dir, str(tmp_path / "q8"), quantize=True, q_bits=8)
    ppl_q4 = _ppl(q4)
    ppl_q8 = _ppl(q8)

    assert np.isfinite(ppl_fp) and np.isfinite(ppl_q4) and np.isfinite(ppl_q8)
    # INT8 must be closer to FP than INT4; both within sane deltas.
    d4 = abs(ppl_q4 - ppl_fp) / ppl_fp
    d8 = abs(ppl_q8 - ppl_fp) / ppl_fp
    assert d8 <= d4 + 0.02, (ppl_fp, ppl_q8, ppl_q4)
    assert d8 < 0.05, f"INT8 ppl delta too large: fp={ppl_fp} q8={ppl_q8}"
    assert d4 < 0.30, f"INT4 ppl delta too large: fp={ppl_fp} q4={ppl_q4}"


def _ppl_layout(model_dir, quant_layout):
    model, tok = loader.load(model_dir, quant_layout=quant_layout)
    engine = DecodeEngine(model, tok)
    ids = tok.encode(TEXT)
    lp, mask = engine.score_tokens([ids])
    return float(np.exp(-lp[0][mask[0]].mean()))


def test_column_layout_quality_and_numerics(tiny_fp_model_dir, tmp_path):
    """The opt-in per-column-scale repack (loader quant_layout="column")
    must produce a working model whose perplexity delta vs the group-wise
    wire format is bounded — it trades accuracy for kernel rate (the
    scale-free kernel body), and the trade must be measurable, not
    catastrophic."""
    q4 = C.convert(
        tiny_fp_model_dir, str(tmp_path / "q4c"), quantize=True, q_bits=4
    )
    ppl_group = _ppl_layout(q4, None)
    ppl_col = _ppl_layout(q4, "column")
    assert np.isfinite(ppl_col), ppl_col
    # Per-column INT4 is strictly coarser than group-64; it may not
    # IMPROVE on the group layout, and the degradation must stay within
    # an order of magnitude of usable (recorded, not hidden).
    assert ppl_col < ppl_group * 10, (ppl_group, ppl_col)


def test_column_layout_matmul_matches_dequant():
    """linear() on a G==1 (per-column) quantized dict must equal the
    explicit dequantized matmul (the epilogue-scale path)."""
    import jax.numpy as jnp

    from mlx_parallm_tpu.core import params as P
    from mlx_parallm_tpu.ops import quant

    rng = np.random.default_rng(0)
    k, n = 256, 512
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    packed, scales, biases = quant.quantize(w, k, 4)  # per-column
    assert scales.shape == (n, 1)
    p = {"weight": packed, "scales": scales, "biases": biases}
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.bfloat16)
    y = P.linear(p, x, (64, 4))  # model qcfg says 64; layer derives K
    w_deq = quant.dequantize(packed, scales, biases, k, 4, dtype=jnp.float32)
    ref = np.asarray(x, np.float32) @ np.asarray(w_deq, np.float32).T
    np.testing.assert_allclose(
        np.asarray(y, np.float32), ref, rtol=0.05, atol=0.5
    )
