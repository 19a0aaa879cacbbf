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
