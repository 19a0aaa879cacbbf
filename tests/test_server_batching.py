"""Scheduler behavior tests: batching observability via /debug/metrics
(reference strategy: tests/test_server_batching.py:27-54) and the continuous
admit-on-step scheduler."""

from concurrent.futures import ThreadPoolExecutor

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


@pytest.fixture(scope="module")
def cont_server(tiny_model_dir, tmp_path_factory):
    handle = launch_server(
        tiny_model_dir,
        extra_args=["--scheduler", "continuous"],
        tmpdir=str(tmp_path_factory.mktemp("srv_cont")),
    )
    yield handle
    handle.stop()


def _completion(base, model_id, prompt, **kw):
    payload = {
        "model": model_id,
        "prompt": prompt,
        "max_tokens": kw.pop("max_tokens", 6),
        "temperature": kw.pop("temperature", 0.0),
    }
    payload.update(kw)
    r = requests.post(f"{base}/v1/completions", json=payload, timeout=300)
    assert r.status_code == 200, r.text
    return r.json()


def test_concurrent_requests_batch(server):
    before = requests.get(f"{server.base}/debug/metrics", timeout=10).json()
    prompts = [f"Request number {i} says" for i in range(8)]
    with ThreadPoolExecutor(max_workers=8) as ex:
        futs = [
            ex.submit(_completion, server.base, server.model_id, p)
            for p in prompts
        ]
        results = [f.result() for f in futs]
    assert all(len(r["choices"]) == 1 for r in results)
    after = requests.get(f"{server.base}/debug/metrics", timeout=10).json()
    assert after["batches_processed"] > before["batches_processed"]
    # 8 concurrent requests should need far fewer than 8 batches.
    assert (
        after["batches_processed"] - before["batches_processed"] < 8
    ), "concurrent requests were not co-batched"


def test_per_request_sampling_params(server):
    """Two requests with different temperatures in one batch must both be
    honored (the reference consolidated params from the first request)."""
    with ThreadPoolExecutor(max_workers=2) as ex:
        f_greedy = ex.submit(
            _completion,
            server.base,
            server.model_id,
            "The quick brown fox",
            temperature=0.0,
            max_tokens=8,
        )
        f_hot = ex.submit(
            _completion,
            server.base,
            server.model_id,
            "The quick brown fox",
            temperature=1.5,
            max_tokens=8,
            seed=123,
        )
        greedy, hot = f_greedy.result(), f_hot.result()
    # The greedy result must equal a solo greedy run.
    solo = _completion(
        server.base, server.model_id, "The quick brown fox", temperature=0.0,
        max_tokens=8,
    )
    assert greedy["choices"][0]["text"] == solo["choices"][0]["text"]


def test_continuous_scheduler_completion(cont_server):
    data = _completion(
        cont_server.base, cont_server.model_id, "Hello continuous", max_tokens=6
    )
    assert data["choices"][0]["finish_reason"] in ("stop", "length")


def test_continuous_scheduler_stream(cont_server):
    r = requests.post(
        f"{cont_server.base}/v1/chat/completions",
        json={
            "model": cont_server.model_id,
            "messages": [{"role": "user", "content": "Stream me"}],
            "max_tokens": 5,
            "stream": True,
        },
        stream=True,
        timeout=300,
    )
    assert r.status_code == 200
    lines = [ln for ln in r.iter_lines() if ln]
    assert lines[-1] == b"data: [DONE]"


def test_continuous_scheduler_concurrent_mixed(cont_server):
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [
            ex.submit(
                _completion,
                cont_server.base,
                cont_server.model_id,
                f"mixed load {i}",
                max_tokens=5,
            )
            for i in range(4)
        ]
        results = [f.result() for f in futs]
    assert len(results) == 4
