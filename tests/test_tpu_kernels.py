"""Real-TPU kernel equivalence gate (VERDICT r3 #6).

The regular suite pins JAX to a virtual CPU mesh (conftest), so the bf16
MXU paths of the Pallas kernels can't run here directly. This test shells
out to ``scripts/tpu_equiv_check.py`` in a clean environment on the live
chip. Opt-in via MLX_PARALLM_TPU_TESTS=1 (the TPU tunnel compiles take
minutes and two TPU processes must never overlap, so CI on the CPU mesh
skips it; run it standalone before recording bench numbers):

    MLX_PARALLM_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v
"""

import os
import subprocess
import sys

import pytest

from .helpers import REPO_ROOT


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("MLX_PARALLM_TPU_TESTS") != "1",
    reason="TPU kernel equivalence runs opt-in (MLX_PARALLM_TPU_TESTS=1)",
)
def test_tpu_kernel_equivalence():
    env = dict(os.environ)
    # Undo the conftest's CPU pin for the child process.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO_ROOT, ".jax_cache")
    )
    proc = subprocess.run(
        [sys.executable, "scripts/tpu_equiv_check.py"],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, proc.stdout + proc.stderr
