"""Black-box HTTP tests against a spawned server (reference test strategy:
tests/test_server_basic.py in /root/reference)."""

import json

import pytest
import requests

from .helpers import launch_server


@pytest.fixture(scope="module")
def server(tiny_model_dir, tmp_path_factory):
    handle = launch_server(
        tiny_model_dir, tmpdir=str(tmp_path_factory.mktemp("srv"))
    )
    yield handle
    handle.stop()


def test_health(server):
    r = requests.get(f"{server.base}/health", timeout=10)
    assert r.status_code == 200
    assert r.json()["status"] == "ok"


def test_models_listing(server):
    r = requests.get(f"{server.base}/v1/models", timeout=10)
    assert r.status_code == 200
    data = r.json()
    assert data["object"] == "list"
    assert len(data["data"]) == 1
    assert data["data"][0]["status"] == "loaded"
    assert data["data"][0]["id"] == server.model_id


def test_single_completion(server):
    r = requests.post(
        f"{server.base}/v1/completions",
        json={
            "model": server.model_id,
            "prompt": "Hello world",
            "max_tokens": 8,
            "temperature": 0.0,
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    data = r.json()
    assert data["object"] == "text_completion"
    assert len(data["choices"]) == 1
    assert isinstance(data["choices"][0]["text"], str)
    assert data["choices"][0]["finish_reason"] in ("stop", "length")
    assert data["usage"]["prompt_tokens"] > 0
    assert data["usage"]["total_tokens"] == (
        data["usage"]["prompt_tokens"] + data["usage"]["completion_tokens"]
    )


def test_n_choices_completion(server):
    r = requests.post(
        f"{server.base}/v1/completions",
        json={
            "model": server.model_id,
            "prompt": "Count to three:",
            "max_tokens": 6,
            "n": 2,
            "temperature": 0.7,
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    choices = r.json()["choices"]
    assert len(choices) == 2
    assert [c["index"] for c in choices] == [0, 1]


def test_chat_completion(server):
    r = requests.post(
        f"{server.base}/v1/chat/completions",
        json={
            "model": server.model_id,
            "messages": [{"role": "user", "content": "Say hi"}],
            "max_tokens": 8,
            "temperature": 0.0,
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    data = r.json()
    assert data["object"] == "chat.completion"
    msg = data["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)


def test_n_choices_chat(server):
    r = requests.post(
        f"{server.base}/v1/chat/completions",
        json={
            "model": server.model_id,
            "messages": [{"role": "user", "content": "Pick a number"}],
            "max_tokens": 6,
            "n": 2,
            "temperature": 0.9,
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    assert len(r.json()["choices"]) == 2


def test_logprobs_echo_max_tokens_zero(server):
    r = requests.post(
        f"{server.base}/v1/completions",
        json={
            "model": server.model_id,
            "prompt": "The quick brown fox",
            "max_tokens": 0,
            "echo": True,
            "logprobs": 1,
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    ch = r.json()["choices"][0]
    lp = ch["logprobs"]
    assert lp is not None
    assert len(lp["tokens"]) > 0
    assert lp["token_logprobs"][0] is None  # first prompt token has no lp
    assert all(v is None or v <= 0 for v in lp["token_logprobs"])
    assert ch["text"]  # echo returns the prompt text


def test_logprobs_generation(server):
    r = requests.post(
        f"{server.base}/v1/completions",
        json={
            "model": server.model_id,
            "prompt": "Hello",
            "max_tokens": 4,
            "logprobs": 2,
            "temperature": 0.0,
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    lp = r.json()["choices"][0]["logprobs"]
    assert lp is not None
    assert len(lp["tokens"]) >= 1
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) == len(lp["text_offset"])
    # Real top-k alternatives (reference server/main.py:521-527): each
    # generated position carries >= k entries including the sampled token,
    # and greedy sampling means the sampled token is the argmax entry.
    for i, entry in enumerate(lp["top_logprobs"]):
        assert entry is not None and len(entry) >= 2, (i, entry)
        sampled = lp["tokens"][i]
        assert sampled in entry
        assert abs(entry[sampled] - lp["token_logprobs"][i]) < 0.05
        assert entry[sampled] == max(entry.values())  # greedy argmax


def test_perplexity(server):
    r = requests.post(
        f"{server.base}/v1/perplexity",
        json={
            "model": server.model_id,
            "text": "The quick brown fox jumps over the lazy dog.",
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    data = r.json()
    assert data["perplexity"] > 0
    assert data["num_tokens"] > 0


def test_streaming_chat(server):
    r = requests.post(
        f"{server.base}/v1/chat/completions",
        json={
            "model": server.model_id,
            "messages": [{"role": "user", "content": "Stream please"}],
            "max_tokens": 6,
            "stream": True,
            "temperature": 0.0,
        },
        stream=True,
        timeout=180,
    )
    assert r.status_code == 200
    lines = [ln for ln in r.iter_lines() if ln]
    assert lines[-1] == b"data: [DONE]"
    saw_role = False
    for ln in lines[:-1]:
        assert ln.startswith(b"data: ")
        chunk = json.loads(ln[len(b"data: ") :])
        assert chunk["object"] == "chat.completion.chunk"
        if chunk["choices"][0]["delta"].get("role") == "assistant":
            saw_role = True
    assert saw_role


def test_streaming_completion(server):
    r = requests.post(
        f"{server.base}/v1/completions",
        json={
            "model": server.model_id,
            "prompt": "Stream this",
            "max_tokens": 5,
            "stream": True,
            "temperature": 0.0,
        },
        stream=True,
        timeout=180,
    )
    assert r.status_code == 200
    lines = [ln for ln in r.iter_lines() if ln]
    assert lines[-1] == b"data: [DONE]"
    for ln in lines[:-1]:
        chunk = json.loads(ln[len(b"data: ") :])
        assert chunk["object"] == "text_completion"


def test_unknown_model_404(server):
    r = requests.post(
        f"{server.base}/v1/completions",
        json={"model": "nope", "prompt": "x", "max_tokens": 1},
        timeout=30,
    )
    assert r.status_code == 404


def test_prompt_too_long_rejected(server):
    r = requests.post(
        f"{server.base}/v1/completions",
        json={
            "model": server.model_id,
            "prompt": "word " * 40000,
            "max_tokens": 10,
        },
        timeout=60,
    )
    assert r.status_code == 400


def test_debug_metrics(server):
    r = requests.get(f"{server.base}/debug/metrics", timeout=10)
    assert r.status_code == 200
    m = r.json()
    for key in (
        "batches_processed",
        "avg_batch_fill",
        "queue_depth",
        "decode_tokens_total",
        "last_decode_tps",
    ):
        assert key in m


def test_embeddings(server):
    r = requests.post(
        f"{server.base}/v1/embeddings",
        json={
            "model": server.model_id,
            "input": ["Hello world", "Another sentence"],
        },
        timeout=180,
    )
    assert r.status_code == 200, r.text
    data = r.json()
    assert data["object"] == "list"
    assert len(data["data"]) == 2
    emb0 = data["data"][0]["embedding"]
    emb1 = data["data"][1]["embedding"]
    assert len(emb0) == len(emb1) > 0
    assert emb0 != emb1
    assert data["usage"]["prompt_tokens"] > 0


def test_embeddings_single_string(server):
    r = requests.post(
        f"{server.base}/v1/embeddings",
        json={"model": server.model_id, "input": "single"},
        timeout=180,
    )
    assert r.status_code == 200, r.text
    assert len(r.json()["data"]) == 1
