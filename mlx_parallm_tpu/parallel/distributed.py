"""Multi-host runtime: initialization + cross-host serving coordination.

The distributed capability the reference explicitly lacks (SURVEY §2.7,
§5 "Distributed communication backend: absent"). Architecture (SURVEY §5
TPU-native equivalent):

  * every host calls :func:`initialize` at startup
    (``jax.distributed.initialize``), after which ``jax.devices()`` spans the
    full slice and one global Mesh covers ICI (intra-slice) + DCN
    (inter-slice) axes;
  * all hosts run the SAME jitted SPMD programs (prefill / decode_chunk /
    train step) over globally-sharded arrays — XLA emits the collectives
    (all-gather for column-parallel outputs, reduce-scatter/psum for
    row-parallel partial sums) and overlaps them with compute;
  * host 0 runs the HTTP front end and broadcasts per-step batch admission
    decisions (token ids, slot assignments) to peers through
    :func:`broadcast_from_host0` — a tiny replicated array transfer per step,
    hidden behind the decode chunk's device time;
  * peers run :func:`follower_loop`, executing identical admission +
    decode-chunk calls driven by the broadcast schedule.

Single-host slices need none of this — `initialize` is a no-op when no
coordinator address is configured.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host JAX runtime.

    Args resolve from the environment when not given
    (``MLX_PARALLM_COORDINATOR``, ``MLX_PARALLM_NUM_PROCESSES``,
    ``MLX_PARALLM_PROCESS_ID``; standard TPU pod metadata is used by JAX when
    all three are None). Returns True when running multi-process.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "MLX_PARALLM_COORDINATOR"
    )
    if num_processes is None and "MLX_PARALLM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MLX_PARALLM_NUM_PROCESSES"])
    if process_id is None and "MLX_PARALLM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MLX_PARALLM_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        logger.info("Single-process run; skipping jax.distributed.initialize")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "Distributed runtime up: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )
    return True


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def broadcast_from_host0(data: np.ndarray, mesh) -> np.ndarray:
    """Broadcast a small host-0 numpy array (e.g. the per-step admission
    schedule: token ids + slot indices) to all hosts.

    Implemented as a replicated global array formed from host-0's data via
    ``make_array_from_process_local_data`` + a psum-style identity under jit;
    for the sizes involved (a few KB per decode chunk) this rides DCN without
    stalling the decode loop.
    """
    import jax

    if jax.process_count() == 1:
        return data
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(data))
