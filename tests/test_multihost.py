"""True multi-process (multi-'host') coordination test: 2 JAX processes x 4
virtual CPU devices form one 8-device runtime; host 0 broadcasts the
admission schedule; both run the same sharded decode program. Identical
checksums on both hosts prove SPMD consistency."""

import os
import re
import socket
import subprocess
import sys

import pytest

from mlx_parallm_tpu.tools.tiny_model import build_tiny_model

from .helpers import REPO_ROOT


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_spmd_decode(tmp_path):
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
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        # Fresh runtime per process; don't inherit the axon sitecustomize's
        # TPU registration.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        cmd = [
            sys.executable,
            "-m",
            "mlx_parallm_tpu.parallel.multihost_demo",
            "--coordinator",
            f"127.0.0.1:{port}",
            "--num-processes",
            "2",
            "--process-id",
            str(pid),
            "--model-path",
            model_dir,
        ]
        procs.append(
            subprocess.Popen(
                cmd,
                cwd=REPO_ROOT,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]

    sums = [
        re.search(r"MULTIHOST_OK checksum=([\d.]+)", out).group(1)
        for out in outs
    ]
    assert sums[0] == sums[1], f"hosts disagree: {sums}"
    assert "8 global devices" in outs[0]
