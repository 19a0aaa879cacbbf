"""Mock rollout provider unit tests, incl. the tokenize-boundary assumption
(reference strategy: /root/reference/test_mock_quick.py:24-38 — prompt tokens
must be a strict prefix of prompt+response tokens or masks misalign)."""

import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.rl_training.atropos_client import (
    GSM8K_SYSTEM_PROMPT,
    MOCK_QUESTION,
    MockAtroposClient,
    _BOXED_RE,
)


@pytest.fixture(scope="module")
def tok(tiny_model_dir):
    _, tokenizer = loader.load(tiny_model_dir)
    return tokenizer


def test_tokenize_boundary_assumption(tok):
    """Prompt tokens should be a strict prefix of tokenize(prompt+response)."""
    messages = [
        {"role": "system", "content": GSM8K_SYSTEM_PROMPT},
        {"role": "user", "content": MOCK_QUESTION},
    ]
    prompt_text = tok.apply_chat_template(
        messages, tokenize=False, add_generation_prompt=True
    )
    prompt_ids = tok.encode(prompt_text)
    response = "The answer is \\boxed{3}."
    full_ids = tok.encode(prompt_text + response)
    assert full_ids[: len(prompt_ids)] == prompt_ids, (
        "mask alignment assumption violated for this tokenizer"
    )


def test_boxed_scoring_regex():
    assert _BOXED_RE.search("so \\boxed{3} done").group(1) == "3"
    assert _BOXED_RE.search("\\boxed{42}").group(1) == "42"
    assert _BOXED_RE.search("no box here") is None


def test_mock_client_mask_construction(tok):
    client = MockAtroposClient("http://unused", "model", tok)
    # Build masks the way fetch_batch does, without HTTP.
    messages = [
        {"role": "system", "content": GSM8K_SYSTEM_PROMPT},
        {"role": "user", "content": MOCK_QUESTION},
    ]
    prompt_text = tok.apply_chat_template(
        messages, tokenize=False, add_generation_prompt=True
    )
    prompt_ids = tok.encode(prompt_text)
    response = "I think \\boxed{3}"
    full_ids = tok.encode(prompt_text + response)
    mask = [0] * len(prompt_ids) + [1] * (len(full_ids) - len(prompt_ids))
    assert len(mask) == len(full_ids)
    assert sum(mask) > 0
