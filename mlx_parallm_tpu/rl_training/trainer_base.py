"""Abstract trainer + rollout-provider protocol
(parity: reference rl_training/trainer_base.py:7-23)."""

from __future__ import annotations

import abc
from typing import Any, Dict, List, Protocol

from .types import ScoredDataGroup


class RolloutProvider(Protocol):
    async def register(self, registration: Dict[str, Any]) -> str: ...

    async def fetch_batch(self) -> List[ScoredDataGroup]: ...


class RLTrainerBase(abc.ABC):
    @abc.abstractmethod
    def step(self, scored_batch: List[ScoredDataGroup]) -> Dict[str, float]:
        ...

    def run(self, provider: RolloutProvider, total_steps: int) -> None:
        import asyncio

        async def _loop():
            for _ in range(total_steps):
                batch = await provider.fetch_batch()
                self.step(batch)

        asyncio.run(_loop())
