"""Subprocess server smoke test: boots the serve CLI against a model dir and
exercises health/models/completion/chat/stream/metrics.

Parity: reference /root/reference/scripts/smoke_test_server.py:57-266.

Usage: python scripts/smoke_test_server.py --model-path <dir> [--port 0]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

import requests

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=300)
    ap.add_argument("--scheduler", default="default")
    ns = ap.parse_args()

    port = ns.port or free_port()
    cmd = [
        sys.executable, "-m", "mlx_parallm_tpu.cli",
        "--model-path", ns.model_path, "--port", str(port),
        "--scheduler", ns.scheduler,
    ]
    proc = subprocess.Popen(cmd, cwd=REPO_ROOT)
    base = f"http://127.0.0.1:{port}"
    ok = True
    try:
        deadline = time.time() + ns.timeout
        while time.time() < deadline:
            try:
                if requests.get(f"{base}/health", timeout=2).status_code == 200:
                    models = requests.get(f"{base}/v1/models", timeout=5).json()
                    if any(m.get("status") == "loaded" for m in models["data"]):
                        break
            except requests.RequestException:
                pass
            time.sleep(0.5)
        else:
            print("FAIL: server never became healthy")
            return 1
        print("PASS: health + model loaded")

        r = requests.post(
            f"{base}/v1/completions",
            json={"model": ns.model_path, "prompt": "Hello", "max_tokens": 8},
            timeout=180,
        )
        assert r.status_code == 200, r.text
        print(f"PASS: completion -> {r.json()['choices'][0]['text']!r}")

        r = requests.post(
            f"{base}/v1/chat/completions",
            json={
                "model": ns.model_path,
                "messages": [{"role": "user", "content": "Say hi"}],
                "max_tokens": 8,
            },
            timeout=180,
        )
        assert r.status_code == 200, r.text
        print(f"PASS: chat -> {r.json()['choices'][0]['message']['content']!r}")

        r = requests.post(
            f"{base}/v1/chat/completions",
            json={
                "model": ns.model_path,
                "messages": [{"role": "user", "content": "Stream"}],
                "max_tokens": 5,
                "stream": True,
            },
            stream=True,
            timeout=180,
        )
        lines = [ln for ln in r.iter_lines() if ln]
        assert lines[-1] == b"data: [DONE]", lines[-1]
        print(f"PASS: streaming ({len(lines)} SSE lines, [DONE] terminated)")

        m = requests.get(f"{base}/debug/metrics", timeout=10).json()
        print(f"PASS: metrics -> {json.dumps({k: m[k] for k in ('batches_processed', 'decode_tokens_total')})}")
    except AssertionError as e:
        print(f"FAIL: {e}")
        ok = False
    finally:
        proc.terminate()
        proc.wait(timeout=20)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
