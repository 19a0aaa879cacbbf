"""Rollout providers: Atropos API client + HTTP-loopback mock.

Parity: reference rl_training/atropos_client.py. ``AtroposClient`` registers
with an Atropos rollout server and polls ``GET /batch`` (:17-100);
``MockAtroposClient`` closes the RL loop through the serving stack's own
``/v1/chat/completions`` endpoint, scoring GSM8K-style answers by regex
(:103-225) — which exercises the full serving path during training.
"""

from __future__ import annotations

import asyncio
import logging
import os
import re
from typing import Any, Dict, List, Optional

import aiohttp

from .types import ScoredDataGroup

logger = logging.getLogger(__name__)


class AtroposClient:
    """Client for an external Atropos rollout API
    (parity: reference atropos_client.py:17-100)."""

    def __init__(self, base_url: str, *, poll_interval: float = 1.0):
        self.base_url = base_url.rstrip("/")
        self.poll_interval = poll_interval
        self.uuid: Optional[str] = None

    async def register(self, registration: Dict[str, Any]) -> str:
        async with aiohttp.ClientSession() as session:
            async with session.post(
                f"{self.base_url}/register", json=registration
            ) as resp:
                resp.raise_for_status()
                data = await resp.json()
        self.uuid = data.get("uuid")
        logger.info("Registered with Atropos: %s", self.uuid)
        return self.uuid

    async def fetch_batch(self) -> List[ScoredDataGroup]:
        """Poll /batch until a non-null batch arrives."""
        async with aiohttp.ClientSession() as session:
            while True:
                async with session.get(f"{self.base_url}/batch") as resp:
                    resp.raise_for_status()
                    data = await resp.json()
                batch = data.get("batch")
                if batch:
                    return [self._parse_item(item) for item in batch]
                await asyncio.sleep(self.poll_interval)

    @staticmethod
    def _parse_item(item: Dict[str, Any]) -> ScoredDataGroup:
        group: ScoredDataGroup = {
            "tokens": item["tokens"],
            "masks": item["masks"],
            "scores": item["scores"],
        }
        for opt in (
            "advantages",
            "ref_logprobs",
            "messages",
            "overrides",
            "group_overrides",
            "images",
            "env_id",
        ):
            if item.get(opt) is not None:
                group[opt] = item[opt]
        return group


GSM8K_SYSTEM_PROMPT = (
    "You are a careful math tutor. Solve the problem step by step and give "
    "the final answer in \\boxed{}."
)
MOCK_QUESTION = "What is 1 + 2?"
MOCK_ANSWER = "3"
_BOXED_RE = re.compile(r"\\boxed\{([^}]*)\}")


class MockAtroposClient:
    """Generates rollouts by calling the co-hosted server's own chat endpoint
    and regex-scoring the answers (parity: reference atropos_client.py:103-225).

    Env knobs (parity): ``MOCK_N`` (choices per prompt, default 2),
    ``MOCK_PREFILL`` (assistant <think> prefill), ``MOCK_MAX_TOKENS``.
    """

    def __init__(self, server_url: str, model_id: str, tokenizer):
        self.server_url = server_url.rstrip("/")
        self.model_id = model_id
        self.tokenizer = tokenizer
        self.n = int(os.environ.get("MOCK_N", 2))
        self.prefill = os.environ.get("MOCK_PREFILL", "")
        self.max_tokens = int(os.environ.get("MOCK_MAX_TOKENS", 64))

    async def register(self, registration: Dict[str, Any]) -> str:
        return "mock"

    async def fetch_batch(self) -> List[ScoredDataGroup]:
        messages = [
            {"role": "system", "content": GSM8K_SYSTEM_PROMPT},
            {"role": "user", "content": MOCK_QUESTION},
        ]
        payload = {
            "model": self.model_id,
            "messages": messages,
            "n": self.n,
            "max_tokens": self.max_tokens,
            "temperature": 1.0,
            "top_p": 0.95,
        }
        async with aiohttp.ClientSession() as session:
            async with session.post(
                f"{self.server_url}/v1/chat/completions", json=payload
            ) as resp:
                resp.raise_for_status()
                data = await resp.json()

        prompt_text = self.tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        if self.prefill:
            prompt_text += self.prefill
        prompt_ids = self.tokenizer.encode(prompt_text)

        tokens: List[List[int]] = []
        masks: List[List[int]] = []
        scores: List[float] = []
        for choice in data["choices"]:
            response = choice["message"]["content"] or ""
            full_ids = self.tokenizer.encode(prompt_text + response)
            # Tokenize-boundary check (parity: reference test_mock_quick.py):
            # the prompt tokens should be a strict prefix of prompt+response.
            if full_ids[: len(prompt_ids)] != prompt_ids:
                logger.warning(
                    "Prompt tokens are not a strict prefix of prompt+response; "
                    "masks may be misaligned"
                )
            mask = [0] * len(prompt_ids) + [1] * (len(full_ids) - len(prompt_ids))
            m = _BOXED_RE.search(response)
            score = 1.0 if (m and m.group(1).strip() == MOCK_ANSWER) else 0.0
            tokens.append(full_ids)
            masks.append(mask)
            scores.append(score)

        return [
            ScoredDataGroup(tokens=tokens, masks=masks, scores=scores)
        ]
