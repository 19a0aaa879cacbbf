"""Multi-host SPMD serving-coordination demo/worker.

Run one process per "host"; together they form a single JAX multi-controller
runtime executing the SAME sharded decode program, with host 0 broadcasting
the per-step admission schedule (the serving pattern from
parallel/distributed.py / docs/ARCHITECTURE.md). Used by
tests/test_multihost.py with 2 CPU processes x 4 virtual devices to validate
cross-host coordination without a pod.

Usage (per process i of N):
  python -m mlx_parallm_tpu.parallel.multihost_demo \
      --coordinator 127.0.0.1:PORT --num-processes N --process-id i \
      --model-path <dir>
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--steps", type=int, default=4)
    ns = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=ns.coordinator,
        num_processes=ns.num_processes,
        process_id=ns.process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from ..core import loader
    from ..models.base import KVCache
    from ..parallel import distributed, mesh as M

    n_global = len(jax.devices())
    print(
        f"[host {jax.process_index()}] {jax.local_device_count()} local / "
        f"{n_global} global devices",
        flush=True,
    )

    model, tok = loader.load(ns.model_path)
    tp = 4 if n_global % 4 == 0 else n_global
    mesh = M.make_mesh(tp=tp, dp=n_global // tp)
    M.shard_model(model, mesh)

    b = 4
    cache = M.shard_cache(
        KVCache.init(model.num_layers, b, 64, model.n_kv_heads(), model.head_dim()),
        mesh,
    )
    apply_fn = model.apply_fn()
    step_fn = jax.jit(apply_fn, donate_argnums=(2,))

    # Host 0 decides the admission schedule each step; peers follow the
    # broadcast (SPMD: every host runs the identical program on the global
    # arrays).
    rng = np.random.default_rng(0)
    checksum = 0.0
    for step in range(ns.steps):
        if distributed.is_primary():
            schedule = rng.integers(1, 400, size=(b, 1)).astype(np.int32)
        else:
            schedule = np.zeros((b, 1), dtype=np.int32)
        schedule = distributed.broadcast_from_host0(schedule, mesh)
        logits, cache = step_fn(model.params, jnp.asarray(schedule), cache)
        # Fully-replicated reduction visible on every host.
        checksum += float(jnp.sum(jnp.abs(logits.astype(jnp.float32))))
    print(
        f"[host {jax.process_index()}] MULTIHOST_OK checksum={checksum:.4f}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
