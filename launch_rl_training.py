"""RL training orchestrator: launches the Atropos API server, environment
server, and trainer as subprocesses with colored log multiplexing, port
waits, and cleanup.

Parity: reference /root/reference/launch_rl_training.py:37-354. When no
Atropos installation is available the trainer runs with the built-in mock
rollout provider (HTTP loopback through its own serving stack).

Usage: python launch_rl_training.py --model-path <dir> [--atropos-cmd ...]
       [--env-cmd ...] [--total-steps N]
"""

from __future__ import annotations

import argparse
import os
import shlex
import signal
import socket
import subprocess
import sys
import threading
import time

COLORS = {
    "trainer": "\033[36m",
    "atropos": "\033[33m",
    "env": "\033[35m",
}
RESET = "\033[0m"

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def wait_for_port(host: str, port: int, timeout: float = 60.0) -> bool:
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with socket.create_connection((host, port), timeout=1):
                return True
        except OSError:
            time.sleep(0.5)
    return False


def pump_logs(name: str, proc: subprocess.Popen) -> threading.Thread:
    color = COLORS.get(name, "")

    def run():
        for line in iter(proc.stdout.readline, b""):
            sys.stdout.write(f"{color}[{name}]{RESET} {line.decode(errors='replace')}")
            sys.stdout.flush()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return th


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--total-steps", type=int, default=10)
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument(
        "--atropos-cmd",
        default=None,
        help="command to launch an Atropos rollout API (optional)",
    )
    ap.add_argument("--atropos-port", type=int, default=8001)
    ap.add_argument(
        "--env-cmd", default=None, help="command to launch an environment server"
    )
    ns = ap.parse_args()

    procs: list[tuple[str, subprocess.Popen]] = []

    def cleanup(*_):
        for name, proc in reversed(procs):
            if proc.poll() is None:
                print(f"terminating {name} (pid {proc.pid})")
                proc.terminate()
        for _, proc in procs:
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()

    signal.signal(signal.SIGINT, lambda *a: (cleanup(), sys.exit(130)))
    signal.signal(signal.SIGTERM, lambda *a: (cleanup(), sys.exit(143)))

    atropos_url = None
    try:
        if ns.atropos_cmd:
            proc = subprocess.Popen(
                shlex.split(ns.atropos_cmd),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            procs.append(("atropos", proc))
            pump_logs("atropos", proc)
            if not wait_for_port("127.0.0.1", ns.atropos_port, 120):
                print("Atropos API never came up")
                cleanup()
                return 1
            atropos_url = f"http://127.0.0.1:{ns.atropos_port}"

        if ns.env_cmd:
            proc = subprocess.Popen(
                shlex.split(ns.env_cmd),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            procs.append(("env", proc))
            pump_logs("env", proc)

        port = ns.port or free_port()
        cmd = [
            sys.executable,
            "-m",
            "mlx_parallm_tpu.rl_training.train",
            "--model-path",
            ns.model_path,
            "--port",
            str(port),
            "--total-steps",
            str(ns.total_steps),
            "--checkpoint-dir",
            ns.checkpoint_dir,
        ]
        if atropos_url:
            cmd += ["--atropos-url", atropos_url]
        proc = subprocess.Popen(
            cmd, cwd=REPO_ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT
        )
        procs.append(("trainer", proc))
        pump_logs("trainer", proc)
        rc = proc.wait()
        return rc
    finally:
        cleanup()


if __name__ == "__main__":
    sys.exit(main())
