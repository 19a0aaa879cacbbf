"""High-level generation API: the reference ``utils.py`` surface, TPU-native.

Implements the library-level entry points users of the reference rely on
(reference: /root/reference/mlx_parallm/utils.py — ``generate`` :546,
``stream_generate`` :429, ``batch_generate`` :473,
``batch_stream_generate_text`` :983, ``batch_generate_text`` :1087), backed by
``DecodeEngine``. Tokenization / chat-template LRU caches match the
reference's (:137-194).
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
from collections import OrderedDict
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

from .engine import DecodeEngine, SamplingParams
from .loader import Model
from .tokenizer_utils import TokenizerWrapper

logger = logging.getLogger(__name__)


class _LRUCache:
    def __init__(self, maxsize: int):
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()

    def get(self, key):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        return None

    def put(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)


_ENCODE_CACHE = _LRUCache(4096)
_TEMPLATE_CACHE = _LRUCache(2048)


def encode_cached(tokenizer, text: str) -> List[int]:
    key = (id(tokenizer), text)
    hit = _ENCODE_CACHE.get(key)
    if hit is not None:
        return list(hit)
    ids = tokenizer.encode(text)
    _ENCODE_CACHE.put(key, tuple(ids))
    return ids


def apply_chat_template_cached(tokenizer, messages, add_generation_prompt=True) -> str:
    key = (
        id(tokenizer),
        json.dumps(
            [
                {"role": m.get("role"), "content": m.get("content")}
                for m in messages
            ],
            sort_keys=True,
        ),
        add_generation_prompt,
    )
    hit = _TEMPLATE_CACHE.get(key)
    if hit is not None:
        return hit
    text = tokenizer.apply_chat_template(
        messages, tokenize=False, add_generation_prompt=add_generation_prompt
    )
    _TEMPLATE_CACHE.put(key, text)
    return text


_ENGINES: Dict[int, DecodeEngine] = {}


def get_engine(model: Model, tokenizer, **kw) -> DecodeEngine:
    eng = _ENGINES.get(id(model))
    if eng is None:
        eng = DecodeEngine(model, tokenizer, **kw)
        _ENGINES[id(model)] = eng
    return eng


# ------------------------------------------------------------------ library API


def generate_step(
    prompt_tokens: Sequence[int],
    model: Model,
    tokenizer,
    *,
    temp: float = 0.0,
    top_p: float = 1.0,
    max_tokens: int = 10**9,
    logit_bias: Optional[Dict[int, float]] = None,
) -> Iterator[Tuple[int, float]]:
    """Single-sequence token generator (parity: reference utils.py:315).
    Yields (token, logprob) pairs until EOS or max_tokens."""
    engine = get_engine(model, tokenizer)
    sp = SamplingParams(
        temperature=temp, top_p=top_p, max_tokens=max_tokens, logit_bias=logit_bias
    )
    for step in engine.decode_batch([list(prompt_tokens)], [sp]):
        if step.tokens[0] is not None:
            yield step.tokens[0], step.logprobs[0]


def stream_generate(
    model: Model, tokenizer, prompt: str, max_tokens: int = 100, **kw
) -> Iterator[str]:
    """Streaming text generator (parity: reference utils.py:429)."""
    tok = tokenizer
    detok = tok.make_detokenizer()
    prompt_tokens = encode_cached(tok, prompt)
    engine = get_engine(model, tok)
    sp = SamplingParams(
        temperature=kw.get("temp", 0.0),
        top_p=kw.get("top_p", 1.0),
        max_tokens=max_tokens,
    )
    for step in engine.decode_batch([prompt_tokens], [sp]):
        if step.tokens[0] is None:
            continue
        if step.finished[0] == "stop":
            break
        detok.add_token(step.tokens[0])
        if detok.last_segment:
            yield detok.last_segment
    detok.finalize()
    if detok.last_segment:
        yield detok.last_segment


def generate(
    model: Model,
    tokenizer,
    prompt: str,
    temp: float = 0.0,
    max_tokens: int = 100,
    verbose: bool = False,
    top_p: float = 1.0,
    **kw,
) -> str:
    """One-shot single-prompt generation (parity: reference utils.py:546)."""
    text = ""
    t0 = time.perf_counter()
    for chunk in stream_generate(
        model, tokenizer, prompt, max_tokens=max_tokens, temp=temp, top_p=top_p
    ):
        text += chunk
        if verbose:
            print(chunk, end="", flush=True)
    if verbose:
        dt = time.perf_counter() - t0
        print(f"\n[generation took {dt:.2f}s]")
    return text


def format_prompts(prompts: List[str], tokenizer) -> List[str]:
    """Chat-template formatting for batch_generate
    (parity: reference utils.py:473-490)."""
    if getattr(tokenizer, "has_chat_template", False):
        return [
            apply_chat_template_cached(
                tokenizer, [{"role": "user", "content": p}]
            )
            for p in prompts
        ]
    return prompts


def batch_generate(
    model: Model,
    tokenizer,
    prompts: List[str],
    max_tokens: int = 100,
    verbose: bool = False,
    format_prompts_flag: bool = True,
    temp: float = 0.0,
    top_p: float = 1.0,
    **kw,
) -> List[str]:
    """Batch one-shot generation (parity: reference utils.py:473)."""
    texts = format_prompts(prompts, tokenizer) if format_prompts_flag else prompts
    token_rows = [encode_cached(tokenizer, t) for t in texts]
    engine = get_engine(model, tokenizer)
    sp = [
        SamplingParams(temperature=temp, top_p=top_p, max_tokens=max_tokens)
        for _ in prompts
    ]
    rows: List[List[int]] = [[] for _ in prompts]
    t0 = time.perf_counter()
    for step in engine.decode_batch(token_rows, sp):
        for i, t in enumerate(step.tokens):
            if t is not None and step.finished[i] != "stop":
                rows[i].append(t)
    results = [
        tokenizer.decode(r, skip_special_tokens=True) for r in rows
    ]
    if verbose:
        n = sum(len(r) for r in rows)
        dt = time.perf_counter() - t0
        print(f"[batch_generate: {n} tokens in {dt:.2f}s = {n/dt:.1f} tok/s]")
    return results


def batch_stream_generate_text(
    model: Model,
    tokenizer,
    prompts_tokens: List[List[int]],
    max_tokens,
    *,
    temps: Optional[List[float]] = None,
    top_ps: Optional[List[float]] = None,
    logit_biases: Optional[List[Optional[dict]]] = None,
    sampling_params: Optional[List[SamplingParams]] = None,
) -> Iterator[List[Tuple[str, Optional[str]]]]:
    """Batched streaming: yields per-step ``[(text_delta, finish_reason)]``
    (parity: reference utils.py:983-1081). ``max_tokens`` may be an int or a
    per-sequence list. ``sampling_params`` overrides the per-field lists and
    additionally enables stop sequences + repetition penalties."""
    b = len(prompts_tokens)
    if isinstance(max_tokens, int):
        max_tokens = [max_tokens] * b
    if sampling_params is not None:
        sp = sampling_params
    else:
        sp = [
            SamplingParams(
                temperature=(temps[i] if temps else 0.0),
                top_p=(top_ps[i] if top_ps else 1.0),
                max_tokens=max_tokens[i],
                logit_bias=(logit_biases[i] if logit_biases else None),
            )
            for i in range(b)
        ]
    engine = get_engine(model, tokenizer)
    detoks = [tokenizer.make_detokenizer() for _ in range(b)]
    done = [False] * b
    # Stop-sequence state: accumulated text + emitted offset; withhold up to
    # max(stop-length)-1 chars so a stop split across deltas is caught.
    acc = [""] * b
    emitted = [0] * b
    holdback = [
        (max((len(s) for s in (sp[i].stop or [])), default=1) - 1) for i in range(b)
    ]

    def take_delta(i: int, new_text: str, finishing: Optional[str]):
        """Returns (delta, finish) honoring stop sequences."""
        acc[i] += new_text
        stops = sp[i].stop or []
        cut = -1
        for s in stops:
            if not s:
                continue
            idx = acc[i].find(s)
            if idx != -1:
                cut = idx if cut == -1 else min(cut, idx)
        if cut != -1:
            delta = acc[i][emitted[i] : cut]
            emitted[i] = cut
            return delta, "stop"
        if finishing:
            delta = acc[i][emitted[i] :]
            emitted[i] = len(acc[i])
            return delta, finishing
        safe = len(acc[i]) - holdback[i]
        if safe > emitted[i]:
            delta = acc[i][emitted[i] : safe]
            emitted[i] = safe
            return delta, None
        return "", None

    for step in engine.decode_batch(prompts_tokens, sp):
        out: List[Tuple[str, Optional[str]]] = []
        for i in range(b):
            if done[i] or step.tokens[i] is None:
                out.append(("", "done" if done[i] else None))
                continue
            raw = ""
            if step.finished[i] == "stop":
                detoks[i].finalize()
                raw = detoks[i].last_segment
            else:
                detoks[i].add_token(step.tokens[i])
                raw = detoks[i].last_segment
                if step.finished[i] == "length":
                    detoks[i].finalize()
                    raw += detoks[i].last_segment
            delta, fin = take_delta(i, raw, step.finished[i])
            if fin:
                done[i] = True
            out.append((delta, fin))
        yield out


def _sync_batch_generate_text(
    model: Model,
    tokenizer,
    prompts: List[str],
    max_tokens,
    temps: Optional[List[float]] = None,
    top_ps: Optional[List[float]] = None,
    logit_biases: Optional[List[Optional[dict]]] = None,
    max_context_length: Optional[int] = None,
    sampling_params: Optional[List[SamplingParams]] = None,
) -> List[Tuple[str, int, int]]:
    b = len(prompts)
    if isinstance(max_tokens, int):
        max_tokens = [max_tokens] * b
    limit = max_context_length or getattr(
        tokenizer, "model_max_length", 2048
    ) or 2048
    limit = min(int(limit), 65536)

    token_rows = []
    for p in prompts:
        ids = encode_cached(tokenizer, p)
        if len(ids) > limit:
            ids = ids[-limit:]
        token_rows.append(ids)

    if sampling_params is not None:
        sp = sampling_params
    else:
        sp = [
            SamplingParams(
                temperature=(temps[i] if temps else 0.0),
                top_p=(top_ps[i] if top_ps else 1.0),
                max_tokens=max_tokens[i],
                logit_bias=(logit_biases[i] if logit_biases else None),
            )
            for i in range(b)
        ]
    engine = get_engine(model, tokenizer)
    rows: List[List[int]] = [[] for _ in range(b)]
    for step in engine.decode_batch(token_rows, sp):
        for i, t in enumerate(step.tokens):
            if t is not None and step.finished[i] != "stop":
                rows[i].append(t)
    out = []
    for i in range(b):
        text = tokenizer.decode(rows[i], skip_special_tokens=True)
        # Stop-sequence truncation (host-side).
        for s in sp[i].stop or []:
            if s and s in text:
                text = text[: text.find(s)]
        out.append((text, len(token_rows[i]), len(rows[i])))
    return out


async def batch_generate_text(
    model: Model,
    tokenizer,
    prompts: List[str],
    max_tokens,
    temps=None,
    top_ps=None,
    logit_biases=None,
    max_context_length: Optional[int] = None,
    sampling_params: Optional[List[SamplingParams]] = None,
) -> List[Tuple[str, int, int]]:
    """Async batched generation for the server worker (parity: reference
    utils.py:1087-1346). Runs the synchronous decode in the default executor
    so the event loop stays live."""
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(
        None,
        lambda: _sync_batch_generate_text(
            model,
            tokenizer,
            prompts,
            max_tokens,
            temps,
            top_ps,
            logit_biases,
            max_context_length,
            sampling_params,
        ),
    )
