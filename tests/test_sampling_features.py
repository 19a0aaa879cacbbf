"""Stop sequences + repetition/presence/frequency penalty tests."""

import numpy as np
import pytest

from mlx_parallm_tpu.core import generate as G
from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams


@pytest.fixture(scope="module")
def loaded(tiny_model_dir):
    return loader.load(tiny_model_dir)


def test_penalties_change_sampling(loaded):
    """A strong repetition penalty must change greedy output when the
    unpenalized output repeats tokens."""
    model, tok = loaded
    engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    prompt = tok.encode("a a a a a a")

    def run(**kw):
        sp = [SamplingParams(temperature=0.0, max_tokens=10, **kw)]
        return [
            s.tokens[0]
            for s in engine.decode_batch([prompt], sp)
            if s.tokens[0] is not None
        ]

    base = run()
    if len(set(base)) < len(base):  # has repeats -> penalty must differ
        pen = run(frequency_penalty=5.0)
        assert pen != base
    # presence/frequency penalties always produce valid tokens
    pen2 = run(presence_penalty=1.5, frequency_penalty=0.5)
    assert all(0 <= t < model.args.vocab_size for t in pen2)


def test_penalty_reduces_repetition(loaded):
    model, tok = loaded
    engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    prompt = tok.encode("the the the")
    sp = [
        SamplingParams(
            temperature=0.0, max_tokens=12, frequency_penalty=10.0
        )
    ]
    toks = [
        s.tokens[0]
        for s in engine.decode_batch([prompt], sp)
        if s.tokens[0] is not None
    ]
    # With a huge frequency penalty, no token can appear 3+ times.
    from collections import Counter

    assert max(Counter(toks).values()) <= 2


def test_stop_sequence_nonstreaming(loaded):
    model, tok = loaded
    # Find what the model would greedily produce, then use a piece of it as
    # a stop string.
    engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    base_sp = [SamplingParams(temperature=0.0, max_tokens=10)]
    prompt_ids = tok.encode("The quick brown")
    ids = [
        s.tokens[0]
        for s in engine.decode_batch([prompt_ids], base_sp)
        if s.tokens[0] is not None
    ]
    full_text = tok.decode(
        [t for t in ids if t not in tok.eos_token_ids], skip_special_tokens=True
    )
    if len(full_text) < 3:
        pytest.skip("tiny model generated too little text")
    stop = full_text[1:3]

    results = G._sync_batch_generate_text(
        model,
        tok,
        ["The quick brown"],
        10,
        sampling_params=[
            SamplingParams(temperature=0.0, max_tokens=10, stop=[stop])
        ],
    )
    text = results[0][0]
    assert stop not in text
    assert text == full_text[: full_text.find(stop)]


def test_stop_sequence_streaming(loaded):
    model, tok = loaded
    engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    base_sp = [SamplingParams(temperature=0.0, max_tokens=10)]
    prompt_ids = tok.encode("Hello world and")
    ids = [
        s.tokens[0]
        for s in engine.decode_batch([prompt_ids], base_sp)
        if s.tokens[0] is not None
    ]
    full_text = tok.decode(
        [t for t in ids if t not in tok.eos_token_ids], skip_special_tokens=True
    )
    if len(full_text) < 3:
        pytest.skip("tiny model generated too little text")
    stop = full_text[1:3]

    acc = ""
    finish = None
    for step in G.batch_stream_generate_text(
        model,
        tok,
        [prompt_ids],
        10,
        sampling_params=[
            SamplingParams(temperature=0.0, max_tokens=10, stop=[stop])
        ],
    ):
        delta, fin = step[0]
        acc += delta
        if fin and fin != "done":
            finish = fin
            break
    assert finish == "stop"
    assert stop not in acc
