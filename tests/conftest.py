"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a fake CPU mesh via ``--xla_force_host_platform_device_count``
(SURVEY §4: the harness the reference lacks)."""

import os

# The environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests must run on
# a virtual CPU mesh, so override BOTH the env var and the live config (the
# axon sitecustomize registers its backend at interpreter start).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    """Session-scoped int4-quantized tiny llama checkpoint + tokenizer."""
    from mlx_parallm_tpu.tools.tiny_model import build_tiny_model

    out = tmp_path_factory.mktemp("tiny_model")
    return build_tiny_model(str(out))


@pytest.fixture(scope="session")
def tiny_fp_model_dir(tmp_path_factory):
    """Unquantized variant for numerics comparisons."""
    from mlx_parallm_tpu.tools.tiny_model import build_tiny_model

    out = tmp_path_factory.mktemp("tiny_model_fp")
    return build_tiny_model(str(out), bits=None)
