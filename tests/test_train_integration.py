"""End-to-end RL training integration: the unified train CLI co-hosts the
server, generates rollouts through its own HTTP API (mock Atropos), runs GRPO
steps, and writes adapter checkpoints. Also covers booting the server with
--lora-path (reference strategy: tests/test_adapter_loading.py)."""

import json
import os
import subprocess
import sys

import pytest
import requests

from .helpers import REPO_ROOT, free_port, launch_server


@pytest.mark.slow
def test_train_cli_end_to_end(tiny_model_dir, tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    port = free_port()
    env = dict(os.environ)
    env["MLX_PARALLM_FORCE_CPU"] = "1"
    env["MOCK_N"] = "2"
    env["MOCK_MAX_TOKENS"] = "8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jax_cache"))
    cmd = [
        sys.executable,
        "-m",
        "mlx_parallm_tpu.rl_training.train",
        "--model-path",
        tiny_model_dir,
        "--port",
        str(port),
        "--total-steps",
        "2",
        "--checkpoint-interval",
        "2",
        "--checkpoint-dir",
        ckpt_dir,
        "--learning-rate",
        "1e-3",
        "--lora-rank",
        "4",
        "--lora-layers",
        "2",
        "--max-tokens",
        "16",
    ]
    proc = subprocess.run(
        cmd, cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=540
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr

    # Artifacts: initial adapter + step checkpoint + metadata.
    assert os.path.exists(
        os.path.join(ckpt_dir, "initial_adapter", "adapters.safetensors")
    )
    step_dir = os.path.join(ckpt_dir, "step_2")
    assert os.path.exists(os.path.join(step_dir, "adapters.safetensors"))
    assert os.path.exists(os.path.join(step_dir, "adapter_config.json"))
    with open(os.path.join(ckpt_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["step"] == 2


@pytest.mark.slow
def test_train_kill_and_resume(tiny_model_dir, tmp_path):
    """Failure recovery (SURVEY §5): SIGKILL the trainer mid-run, restart
    with --resume, and training continues from the last checkpoint to
    completion."""
    import signal
    import time

    ckpt_dir = str(tmp_path / "ckpts")
    env = dict(os.environ)
    env["MLX_PARALLM_FORCE_CPU"] = "1"
    env["MOCK_N"] = "2"
    env["MOCK_MAX_TOKENS"] = "8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jax_cache"))

    def cmd(extra):
        return [
            sys.executable, "-m", "mlx_parallm_tpu.rl_training.train",
            "--model-path", tiny_model_dir,
            "--port", str(free_port()),
            "--total-steps", "3",
            "--checkpoint-interval", "1",
            "--checkpoint-dir", ckpt_dir,
            "--learning-rate", "1e-3",
            "--lora-rank", "4",
            "--lora-layers", "2",
            "--max-tokens", "16",
        ] + extra

    # Phase 1: run until the first step checkpoint lands, then SIGKILL.
    proc = subprocess.Popen(
        cmd([]), cwd=REPO_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.time() + 480
    step1 = os.path.join(ckpt_dir, "step_1", "adapters.safetensors")
    while time.time() < deadline and not os.path.exists(step1):
        assert proc.poll() is None, proc.stdout.read()[-3000:]
        time.sleep(2)
    assert os.path.exists(step1), "no checkpoint before deadline"
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=30)

    # Phase 2: restart with --resume; it must pick up the latest step_N
    # and finish the remaining steps.
    proc2 = subprocess.run(
        cmd(["--resume"]), cwd=REPO_ROOT, env=env,
        capture_output=True, text=True, timeout=540,
    )
    assert proc2.returncode == 0, proc2.stdout + "\n" + proc2.stderr
    assert "Resuming from" in proc2.stdout + proc2.stderr
    with open(os.path.join(ckpt_dir, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["step"] == 3
    assert os.path.exists(
        os.path.join(ckpt_dir, "step_3", "adapters.safetensors")
    )


@pytest.mark.slow
def test_server_boot_with_lora_path(tiny_model_dir, tmp_path):
    """Init a LoRA adapter offline, boot the server with --lora-path, serve."""
    os.environ["MLX_PARALLM_FORCE_CPU"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mlx_parallm_tpu.core import loader
    from mlx_parallm_tpu.rl_training.lora_init import init_lora_if_needed

    model, _ = loader.load(tiny_model_dir)
    adapter_dir = init_lora_if_needed(model, str(tmp_path), rank=4, num_layers=2)

    handle = launch_server(
        tiny_model_dir,
        extra_args=["--lora-path", adapter_dir],
        tmpdir=str(tmp_path),
    )
    try:
        r = requests.post(
            f"{handle.base}/v1/completions",
            json={
                "model": handle.model_id,
                "prompt": "Hello adapter",
                "max_tokens": 4,
            },
            timeout=180,
        )
        assert r.status_code == 200, r.text
        assert r.json()["choices"][0]["text"] is not None
    finally:
        handle.stop()
