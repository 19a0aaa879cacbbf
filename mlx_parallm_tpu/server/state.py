"""Shared server state: model registry + weight-update serialization.

Parity with /root/reference/mlx_parallm/server/state.py:7-15. The lock exists
for API compatibility with the trainer loop; on TPU adapter swaps are
functional tree replacements (see rl_training/weight_updater.py) so the lock
only guards the brief registry mutation, not whole forward passes.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

from .schemas import InternalModelRecord, ModelStatus

model_registry: Dict[str, InternalModelRecord] = {}

weight_update_lock = threading.RLock()


def get_active_record() -> Optional[InternalModelRecord]:
    for record in model_registry.values():
        if record.status == ModelStatus.LOADED:
            return record
    return None
