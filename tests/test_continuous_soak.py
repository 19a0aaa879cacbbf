"""Continuous-scheduler behavior tests (VERDICT r1 #8 'done' criteria):
metrics reflect decode work even with no follow-up admissions, and a mixed
stream/non-stream soak loses zero requests."""

import concurrent.futures as cf
import json

import pytest
import requests

from .helpers import launch_server


@pytest.fixture(scope="module")
def cont_server(tiny_model_dir, tmp_path_factory):
    handle = launch_server(
        tiny_model_dir,
        extra_args=[
            "--scheduler", "continuous",
            "--max-batch-size", "4",
            "--max-context-length", "512",
        ],
        tmpdir=str(tmp_path_factory.mktemp("cont_server")),
    )
    yield handle
    handle.stop()


def test_metrics_update_without_followup_traffic(cont_server, tiny_model_dir):
    """Tokens decoded after the LAST admission must show up in
    /debug/metrics (round 1 only refreshed metrics inside the admission
    loop, hiding the idle tail)."""
    r = requests.post(
        f"{cont_server.base}/v1/completions",
        json={
            "model": tiny_model_dir,
            "prompt": "Count to ten:",
            "max_tokens": 24,
            "temperature": 0.0,
        },
        timeout=300,
    )
    assert r.status_code == 200, r.text
    done_tokens = r.json()["usage"]["completion_tokens"]
    assert done_tokens >= 1

    m = requests.get(f"{cont_server.base}/debug/metrics", timeout=30).json()
    # The first token is sampled at admission (prefill), not by the decode
    # loop, so the decode counter trails usage by exactly one.
    assert m["decode_tokens_total"] >= done_tokens - 1
    assert m["decode_time_total"] > 0
    assert m["last_decode_tps"] > 0


def test_mixed_soak_loses_nothing(cont_server, tiny_model_dir):
    """20 concurrent mixed requests (stream + non-stream, varied params)
    through 4 slots: every one must complete (the old asyncio.wait+cancel
    pattern could drop a dequeued request on the floor)."""

    def non_stream(i):
        r = requests.post(
            f"{cont_server.base}/v1/completions",
            json={
                "model": tiny_model_dir,
                "prompt": f"request {i} says",
                "max_tokens": 4 + (i % 5),
                "temperature": 0.0 if i % 3 == 0 else 0.8,
                "seed": i,
                "n": 2 if i % 4 == 0 else 1,
            },
            timeout=600,
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert all(
            c["finish_reason"] in ("stop", "length") for c in body["choices"]
        )
        return "ns"

    def stream(i):
        r = requests.post(
            f"{cont_server.base}/v1/chat/completions",
            json={
                "model": tiny_model_dir,
                "messages": [{"role": "user", "content": f"hello {i}"}],
                "max_tokens": 5,
                "stream": True,
            },
            timeout=600,
            stream=True,
        )
        assert r.status_code == 200
        lines = [ln for ln in r.iter_lines(decode_unicode=True) if ln]
        assert lines[-1] == "data: [DONE]", lines[-3:]
        for ln in lines[:-1]:
            json.loads(ln[len("data: "):])  # every chunk is valid JSON
        return "st"

    jobs = []
    with cf.ThreadPoolExecutor(max_workers=10) as ex:
        for i in range(20):
            jobs.append(ex.submit(stream if i % 2 else non_stream, i))
        results = [j.result(timeout=600) for j in jobs]
    assert len(results) == 20
