"""FIFO rollout buffer (parity: reference rl_training/rollout_buffer.py:8-29)."""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Deque, List, Optional


@dataclasses.dataclass
class ScoredSample:
    tokens: List[int]
    mask: List[int]
    score: float
    advantages: Optional[List[float]] = None


class RolloutBuffer:
    def __init__(self, maxlen: int = 1024):
        self._buf: Deque[ScoredSample] = deque(maxlen=maxlen)

    def add(self, sample: ScoredSample) -> None:
        self._buf.append(sample)

    def drain(self, n: int) -> List[ScoredSample]:
        out = []
        while self._buf and len(out) < n:
            out.append(self._buf.popleft())
        return out

    def __len__(self) -> int:
        return len(self._buf)
