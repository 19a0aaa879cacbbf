"""Decode-engine and generation-API tests on the tiny quantized model."""

import numpy as np
import pytest

from mlx_parallm_tpu.core import generate as G
from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams


@pytest.fixture(scope="module")
def loaded(tiny_model_dir):
    return loader.load(tiny_model_dir)


def test_greedy_deterministic(loaded):
    model, tok = loaded
    engine = DecodeEngine(model, tok)
    prompt = tok.encode("The quick brown fox")
    sp = [SamplingParams(temperature=0.0, max_tokens=8)]

    def run():
        toks = []
        for step in engine.decode_batch([prompt], sp):
            if step.tokens[0] is not None:
                toks.append(step.tokens[0])
        return toks

    a, b = run(), run()
    assert a == b
    assert 1 <= len(a) <= 8


def test_batch_matches_single(loaded):
    """Greedy decode of a prompt must be identical whether it runs alone or
    inside a ragged batch (per-row offset correctness end-to-end)."""
    model, tok = loaded
    engine = DecodeEngine(model, tok)
    p1 = tok.encode("The quick brown fox jumps")
    p2 = tok.encode("Hello")
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    def collect(prompts, n):
        rows = [[] for _ in range(n)]
        for step in engine.decode_batch(prompts, [sp] * n):
            for i, t in enumerate(step.tokens):
                if t is not None:
                    rows[i].append(t)
        return rows

    solo = collect([p1], 1)[0]
    batched = collect([p1, p2], 2)[0]
    assert solo == batched


def test_max_tokens_and_finish_reason(loaded):
    model, tok = loaded
    engine = DecodeEngine(model, tok)
    sp = [SamplingParams(temperature=0.0, max_tokens=3)]
    fins = []
    n = 0
    for step in engine.decode_batch([tok.encode("abc")], sp):
        if step.tokens[0] is not None:
            n += 1
        fins.append(step.finished[0])
    assert n <= 3
    assert fins[-1] in ("length", "stop")


def test_logit_bias_forces_token(loaded):
    model, tok = loaded
    engine = DecodeEngine(model, tok)
    forced = 7
    sp = [
        SamplingParams(
            temperature=0.0, max_tokens=4, logit_bias={forced: 1000.0}
        )
    ]
    toks = []
    for step in engine.decode_batch([tok.encode("xyz")], sp):
        if step.tokens[0] is not None:
            toks.append(step.tokens[0])
    assert all(t == forced for t in toks)


def test_sampling_with_temperature_runs(loaded):
    model, tok = loaded
    engine = DecodeEngine(model, tok)
    sp = [SamplingParams(temperature=0.8, top_p=0.9, max_tokens=5, seed=42)]
    toks = [
        s.tokens[0]
        for s in engine.decode_batch([tok.encode("hello")], sp)
        if s.tokens[0] is not None
    ]
    assert len(toks) >= 1
    assert all(0 <= t < model.args.vocab_size for t in toks)


def test_score_tokens_perplexity(loaded):
    model, tok = loaded
    engine = DecodeEngine(model, tok)
    ids = tok.encode("The quick brown fox jumps over the lazy dog.")
    lp, mask = engine.score_tokens([ids])
    assert lp.shape[1] == len(ids) - 1
    avg_nll = -lp[0][mask[0]].mean()
    assert np.isfinite(avg_nll) and avg_nll > 0


def test_score_tokens_chunked_matches_monolithic(loaded, monkeypatch):
    """Chunked teacher-forced scoring (VERDICT r2 #5) must be numerically
    identical to a single-pass forward, for logprobs AND top-k."""
    model, tok = loaded
    engine = DecodeEngine(model, tok, max_context_length=2048)
    base = tok.encode("The quick brown fox jumps over the lazy dog. ")
    ids = (base * 30)[:300]

    monkeypatch.setenv("MLX_PARALLM_SCORE_CHUNK", "4096")  # one chunk
    lp_mono, mask_mono = engine.score_tokens([ids])
    v_mono, i_mono = engine.score_topk([ids], 3)
    e_mono = engine.embed([ids])

    monkeypatch.setenv("MLX_PARALLM_SCORE_CHUNK", "128")  # forced chunking
    lp_chn, mask_chn = engine.score_tokens([ids])
    v_chn, i_chn = engine.score_topk([ids], 3)
    e_chn = engine.embed([ids])

    assert (mask_mono == mask_chn).all()
    np.testing.assert_allclose(lp_mono, lp_chn, rtol=2e-4, atol=2e-4)
    assert (i_mono == i_chn).mean() > 0.99  # ties may reorder
    np.testing.assert_allclose(v_mono, v_chn, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(e_mono, e_chn, rtol=2e-4, atol=2e-4)


def test_score_tokens_long_input_8k(loaded, monkeypatch):
    """An 8k-token perplexity request must run (chunked) without a
    monolithic full-length forward — reference chunks echo forwards above
    1024 tokens (server/main.py:481-527)."""
    model, tok = loaded
    engine = DecodeEngine(model, tok, max_context_length=8192)
    base = tok.encode("The quick brown fox jumps over the lazy dog. ")
    ids = (base * 800)[:8192]
    monkeypatch.setenv("MLX_PARALLM_SCORE_CHUNK", "1024")
    lp, mask = engine.score_tokens([ids])
    assert lp.shape[1] == len(ids) - 1
    avg_nll = -lp[0][mask[0]].mean()
    assert np.isfinite(avg_nll) and avg_nll > 0


def test_score_tokens_context_guard(loaded):
    """Over-length scoring inputs raise (mapped to HTTP 400) instead of
    allocating an unbounded cache."""
    model, tok = loaded
    engine = DecodeEngine(model, tok, max_context_length=256)
    with pytest.raises(ValueError, match="max context"):
        engine.score_tokens([[5] * 300])
    with pytest.raises(ValueError, match="max context"):
        engine.score_topk([[5] * 300], 2)
    with pytest.raises(ValueError, match="max context"):
        engine.embed([[5] * 300])


def test_generate_api(loaded):
    model, tok = loaded
    text = G.generate(model, tok, "Hello", max_tokens=8)
    assert isinstance(text, str)


def test_batch_generate_api(loaded):
    model, tok = loaded
    outs = G.batch_generate(
        model, tok, ["Hello", "The quick"], max_tokens=6, format_prompts_flag=False
    )
    assert len(outs) == 2
    assert all(isinstance(o, str) for o in outs)


def test_batch_stream_generate(loaded):
    model, tok = loaded
    rows = [tok.encode("Hello world"), tok.encode("abc")]
    stream = G.batch_stream_generate_text(model, tok, rows, 5)
    collected = ["", ""]
    finishes = [None, None]
    for step in stream:
        for i, (delta, fin) in enumerate(step):
            collected[i] += delta
            if fin and fin != "done":
                finishes[i] = fin
    assert all(f in ("stop", "length") for f in finishes)


def test_detokenizer_utf8_safety(loaded):
    _, tok = loaded
    detok = tok.make_detokenizer()
    text = "héllo 漢字 🙂 done"
    ids = tok.encode(text)
    out = ""
    for t in ids:
        detok.add_token(t)
        out += detok.last_segment
    detok.finalize()
    out += detok.last_segment
    assert "�" not in out
    assert out == tok.decode(ids, skip_special_tokens=True)


def test_decode_across_hot_window_bucket(tiny_model_dir):
    """Cross-bucket equivalence for DecodeEngine (the slot engine carried a
    bucket-boundary KV bug in round 1; this pins the sibling logic): a
    generation crossing the first 256-position hot bucket must be
    chunk-size-invariant and keep writing real KV past the boundary."""
    import jax
    import numpy as np

    model, tok = loader.load(tiny_model_dir)

    class _NoEos:
        def __init__(self, inner):
            self._inner = inner
            self.eos_token_ids = set()

        def __getattr__(self, name):
            return getattr(self._inner, name)

    no_eos = _NoEos(tok)
    base = tok.encode("The quick brown fox jumps over the lazy dog. ")
    ids = (base * 20)[:200]
    sp = [SamplingParams(temperature=0.0, max_tokens=150)]  # final len 350

    def run(chunk):
        eng = DecodeEngine(
            model, no_eos, disable_prefix_cache=True,
            max_context_length=1024, decode_steps_per_call=chunk,
        )
        toks = []
        for step in eng.decode_batch([ids], sp):
            if step.tokens[0] is not None:
                toks.append(step.tokens[0])
        return toks

    t4 = run(4)
    t16 = run(16)
    assert len(t4) == 150
    assert t4 == t16


def test_chunked_prefill_matches_monolithic(tiny_model_dir, monkeypatch):
    """Long prompts prefill in fixed chunks (bounding O(T^2) attention
    memory); tokens must match the one-shot prefill exactly, including
    ragged rows that end inside different chunks (and one shorter than the
    first chunk)."""
    model, tok = loader.load(tiny_model_dir)
    base = tok.encode("The quick brown fox jumps over the lazy dog. ")
    prompts = [
        (base * 60)[:530],  # ends in chunk 3
        (base * 60)[:100],  # ends in chunk 1
        (base * 60)[:256],  # ends exactly at a chunk boundary
        (base * 60)[:300],  # ends in chunk 2
    ]
    sp = [SamplingParams(temperature=0.0, max_tokens=6) for _ in prompts]

    def run():
        eng = DecodeEngine(
            model, tok, max_batch_size=4, max_context_length=1024,
            disable_prefix_cache=True,
        )
        out = [[] for _ in prompts]
        for step in eng.decode_batch(prompts, sp):
            for i, t in enumerate(step.tokens):
                if t is not None:
                    out[i].append(t)
        return out

    monkeypatch.setenv("MLX_PARALLM_PREFILL_CHUNK", "100000")  # monolithic
    mono = run()
    monkeypatch.setenv("MLX_PARALLM_PREFILL_CHUNK", "256")  # chunked
    chunked = run()
    assert chunked == mono
