"""Multi-process ("multi-host") SERVING test: 2 JAX processes x 4 virtual
CPU devices form one 8-device runtime. Process 0 runs the real HTTP server
(continuous scheduler) over the global tp=8 mesh; process 1 runs the
follower loop replaying the broadcast slot-engine commands. Requests are
served end-to-end over HTTP with weights + KV sharded across both
processes — the cross-host continuous-batching contract (SURVEY §5,
§7.4.4) the reference lacks entirely."""

import json
import os
import socket
import subprocess
import sys
import time

import pytest
import requests

from mlx_parallm_tpu.tools.tiny_model import build_tiny_model

from .helpers import REPO_ROOT


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(pid, *, coord_port, http_port, model_dir, log_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["MLX_PARALLM_FORCE_CPU"] = "1"
    # Fresh runtime per process; don't inherit the axon sitecustomize's
    # TPU registration.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = [
        sys.executable,
        "-m",
        "mlx_parallm_tpu.cli",
        "--model-path",
        model_dir,
        "--port",
        str(http_port),
        "--scheduler",
        "continuous",
        "--tp",
        "8",
        "--coordinator",
        f"127.0.0.1:{coord_port}",
        "--num-processes",
        "2",
        "--process-id",
        str(pid),
        "--max-batch-size",
        "4",
        "--max-context-length",
        "256",
    ]
    logf = open(log_path, "w")
    return subprocess.Popen(
        cmd, cwd=REPO_ROOT, env=env, stdout=logf, stderr=subprocess.STDOUT
    )


@pytest.mark.slow
def test_two_process_http_serving(tmp_path):
    model_dir = build_tiny_model(
        str(tmp_path / "model"),
        hidden_size=128,
        num_layers=2,
        num_heads=8,
        num_kv_heads=8,
        intermediate_size=256,
        vocab_size=512,
        group_size=16,
        bits=4,
    )
    coord_port = _free_port()
    http_port = _free_port()
    logs = [str(tmp_path / f"host{i}.log") for i in range(2)]
    procs = [
        _spawn(
            i,
            coord_port=coord_port,
            http_port=http_port,
            model_dir=model_dir,
            log_path=logs[i],
        )
        for i in range(2)
    ]

    def dump(i):
        with open(logs[i]) as f:
            return f.read()[-4000:]

    try:
        base = f"http://127.0.0.1:{http_port}"
        deadline = time.time() + 420
        up = False
        while time.time() < deadline:
            for i, p in enumerate(procs):
                assert p.poll() is None, f"process {i} died:\n{dump(i)}"
            try:
                r = requests.get(f"{base}/v1/models", timeout=2)
                if "loaded" in r.text:
                    up = True
                    break
            except requests.RequestException:
                pass
            time.sleep(2)
        assert up, f"server never came up\nhost0:\n{dump(0)}\nhost1:\n{dump(1)}"

        # Greedy completion served across both processes.
        r = requests.post(
            f"{base}/v1/completions",
            json={
                "model": model_dir,
                "prompt": "The quick brown fox",
                "max_tokens": 8,
                "temperature": 0.0,
            },
            timeout=300,
        )
        assert r.status_code == 200, r.text
        body = r.json()
        text_multi = body["choices"][0]["text"]
        assert body["usage"]["completion_tokens"] >= 1

        # Concurrent mixed traffic: a second round admitted while slots may
        # still be draining, plus n=2 RNG-stream choices.
        import concurrent.futures as cf

        def one(prompt, n=1, temp=0.0):
            rr = requests.post(
                f"{base}/v1/completions",
                json={
                    "model": model_dir,
                    "prompt": prompt,
                    "max_tokens": 6,
                    "temperature": temp,
                    "n": n,
                    "seed": 7,
                },
                timeout=300,
            )
            assert rr.status_code == 200, rr.text
            return rr.json()

        with cf.ThreadPoolExecutor(max_workers=3) as ex:
            futs = [
                ex.submit(one, "Hello world"),
                ex.submit(one, "Counting sheep", 2, 0.8),
                ex.submit(one, "The quick brown fox"),
            ]
            outs = [f.result() for f in futs]
        assert len(outs[1]["choices"]) == 2
        # Same prompt, greedy (max_tokens 6 vs 8) => a prefix of the first
        # round's text (KV consistent across admissions on the sharded slab).
        assert text_multi.startswith(outs[2]["choices"][0]["text"])

        # The follower stayed alive and replayed the schedule.
        assert procs[1].poll() is None, dump(1)
        assert "Follower process ready" in dump(1)

        # Graceful shutdown: SIGTERM to host 0 broadcasts OP_STOP; the
        # follower must exit cleanly by itself.
        procs[0].terminate()
        procs[0].wait(timeout=60)
        try:
            rc1 = procs[1].wait(timeout=120)
        except subprocess.TimeoutExpired:
            pytest.fail(f"follower did not exit after host-0 stop:\n{dump(1)}")
        assert rc1 == 0, f"follower exited rc={rc1}:\n{dump(1)}"
        assert "OP_STOP received" in dump(1)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                p.kill()
