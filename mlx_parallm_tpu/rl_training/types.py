"""Rollout interchange types (parity: reference rl_training/types.py:12-27).

``ScoredDataGroup`` is the Atropos-compatible wire format; field names are
part of the external API surface and must not change.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, TypedDict


class ScoredDataGroup(TypedDict, total=False):
    tokens: List[List[int]]
    masks: List[List[int]]
    scores: List[float]
    advantages: Optional[List[List[float]]]
    ref_logprobs: Optional[List[List[float]]]
    messages: Optional[List[Any]]
    overrides: Optional[List[Dict[str, Any]]]
    group_overrides: Optional[Dict[str, Any]]
    images: Optional[Any]
    env_id: Optional[str]
