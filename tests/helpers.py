"""Server test harness: spawn the serve CLI as a subprocess, poll health,
capture logs (parity with the reference's tests/helpers.py:86-151)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from typing import List, Optional

import requests

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class ServerHandle:
    def __init__(self, proc: subprocess.Popen, port: int, model_id: str, log_path: str):
        self.proc = proc
        self.port = port
        self.model_id = model_id
        self.log_path = log_path

    @property
    def base(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def logs(self) -> str:
        try:
            with open(self.log_path) as f:
                return f.read()
        except OSError:
            return ""

    def stop(self) -> None:
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait(timeout=15)


def launch_server(
    model_path: str,
    *,
    extra_args: Optional[List[str]] = None,
    timeout: float = 240.0,
    log_name: str = "server.log",
    tmpdir: str = "/tmp",
) -> ServerHandle:
    port = free_port()
    log_path = os.path.join(tmpdir, f"{port}_{log_name}")
    env = dict(os.environ)
    env["MLX_PARALLM_FORCE_CPU"] = "1"
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(tmpdir, "jax_cache")
    )
    cmd = [
        sys.executable,
        "-m",
        "mlx_parallm_tpu.cli",
        "--model-path",
        model_path,
        "--port",
        str(port),
    ] + (extra_args or [])
    logf = open(log_path, "w")
    proc = subprocess.Popen(
        cmd, cwd=REPO_ROOT, env=env, stdout=logf, stderr=subprocess.STDOUT
    )
    handle = ServerHandle(proc, port, model_path, log_path)

    deadline = time.time() + timeout
    last_err = None
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(
                f"Server exited early (rc={proc.returncode}):\n{handle.logs()[-4000:]}"
            )
        try:
            r = requests.get(f"{handle.base}/health", timeout=2)
            if r.status_code == 200:
                # Wait until the model finishes loading.
                m = requests.get(f"{handle.base}/v1/models", timeout=5).json()
                if any(
                    c.get("status") == "loaded" for c in m.get("data", [])
                ):
                    return handle
        except requests.RequestException as e:
            last_err = e
        time.sleep(0.5)
    handle.stop()
    raise TimeoutError(
        f"Server not healthy after {timeout}s ({last_err}):\n{handle.logs()[-4000:]}"
    )
