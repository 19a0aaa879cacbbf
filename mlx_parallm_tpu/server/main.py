"""OpenAI-compatible HTTP server over the batched TPU decode engine.

Functional parity with the reference's FastAPI app (reference:
/root/reference/mlx_parallm/server/main.py): endpoints ``/health``,
``/debug/metrics``, ``/v1/models``, ``/v1/completions`` (stream/non-stream,
``n``, logprobs, echo, logit_bias), ``/v1/chat/completions``
(stream/non-stream), ``/v1/perplexity``; dynamic batching worker + co-batched
streaming worker + continuous scheduler; metrics dict with the reference's
field names.

Built on aiohttp (FastAPI/uvicorn are not available in this environment);
the HTTP surface (paths, JSON shapes, SSE framing incl. the ``data: [DONE]``
terminator) is byte-compatible.

Improvements over the reference (SURVEY §7.5): per-request sampling params are
honored inside one batch (the reference consolidates from the first request,
server/main.py:933-951); ``n>1`` uses independent RNG rows instead of
zero-width-space prompt perturbation (reference :1001-1012).
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import logging
import os
import time
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from aiohttp import web

from ..core import generate as G
from ..core import loader
from ..core.engine import ContextLengthError, DecodeEngine, SamplingParams
from . import state
from .schemas import (
    ChatCompletionChoice,
    EmbeddingData,
    EmbeddingRequest,
    EmbeddingResponse,
    ChatCompletionChunk,
    ChatCompletionRequest,
    ChatCompletionResponse,
    ChatCompletionStreamChoice,
    ChatMessage,
    CompletionChoice,
    CompletionChunk,
    CompletionRequest,
    CompletionResponse,
    CompletionStreamChoice,
    DeltaMessage,
    InternalModelRecord,
    LogProbs,
    ModelList,
    ModelStatus,
    PerplexityRequest,
    PerplexityResponse,
    UsageInfo,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServerArgs:
    """Server configuration (parity: reference cli.py:15-32 flags + env
    fallbacks server/main.py:134-164)."""

    model_path: str = ""
    host: str = "127.0.0.1"
    port: int = 8000
    lora_path: Optional[str] = None
    max_batch_size: int = 8
    batch_timeout: float = 0.1
    request_timeout_seconds: float = 86400.0
    max_concurrent_streams: int = 4
    scheduler: str = "default"  # "default" | "continuous"
    diverse_mode: bool = False
    max_context_length: int = 32768
    # None = per-scheduler default: 16 for the continuous slot scheduler
    # (INT8 KV — the bench's best throughput configuration, halves slab
    # memory so the slot pool can oversubscribe), 16-bit for the default
    # scheduler. Set explicitly to override.
    kv_bits: Optional[int] = None
    # Continuous-scheduler slot count. None = 2 * max_batch_size: the
    # oversubscribed pool admits arrival bursts immediately instead of
    # queueing them behind running generations (TTFT tail), at the slab
    # cost INT8 KV just paid for.
    num_slots: Optional[int] = None
    # Continuous-scheduler KV slab capacity per slot (slab memory =
    # num_slots * this; bounded separately from the request-validation
    # max_context_length). Must match across hosts in a multi-host run.
    slot_context_length: int = 4096
    # --- distributed serving (north star; absent from the reference) ---
    # tp/dp: tensor-/data-parallel mesh axes over the local (or global,
    # when multi-process) devices. None/1 = single-chip.
    tp: Optional[int] = None
    dp: Optional[int] = None
    # Multi-host runtime: host 0 serves HTTP + drives admissions; other
    # processes replay the broadcast slot schedule (continuous scheduler).
    coordinator: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    # Continuous scheduler: pre-compile admission/decode buckets at
    # startup (SlotEngine.warmup) before taking traffic.
    warmup: bool = False
    warmup_prompt_lens: tuple = (128,)

    @property
    def resolved_kv_bits(self) -> int:
        if self.kv_bits is not None:
            return self.kv_bits
        return 8 if self.scheduler == "continuous" else 16

    @property
    def resolved_num_slots(self) -> int:
        if self.num_slots is not None:
            return self.num_slots
        return 2 * self.max_batch_size

    @property
    def wants_mesh(self) -> bool:
        return (
            (self.tp or 0) > 1
            or (self.dp or 0) > 1
            or (self.num_processes or 0) > 1
            or self.coordinator is not None
        )

    @classmethod
    def from_env(cls) -> "ServerArgs":
        model = (
            os.environ.get("MLX_PARALLM_MODEL")
            or os.environ.get("MODEL_PATH")
            or os.environ.get("MODEL")
            or ""
        )
        return cls(
            model_path=model,
            max_batch_size=int(os.environ.get("MAX_BATCH_SIZE", 8)),
            batch_timeout=float(os.environ.get("BATCH_TIMEOUT", 0.1)),
            request_timeout_seconds=float(
                os.environ.get("REQUEST_TIMEOUT_SECONDS", 86400)
            ),
            max_concurrent_streams=int(
                os.environ.get("MAX_CONCURRENT_STREAMS", 4)
            ),
            scheduler=os.environ.get("SCHEDULER", "default"),
            diverse_mode=os.environ.get("DIVERSE_MODE", "") in ("1", "true"),
            max_context_length=int(
                os.environ.get("MAX_CONTEXT_LENGTH", 32768)
            ),
            kv_bits=(
                int(os.environ["KV_BITS"])
                if "KV_BITS" in os.environ
                else None
            ),
            num_slots=(
                int(os.environ["MLX_PARALLM_NUM_SLOTS"])
                if "MLX_PARALLM_NUM_SLOTS" in os.environ
                else None
            ),
            slot_context_length=int(
                os.environ.get("MLX_PARALLM_SLOT_CONTEXT", 4096)
            ),
            tp=(
                int(os.environ["MLX_PARALLM_TP"])
                if "MLX_PARALLM_TP" in os.environ
                else None
            ),
            dp=(
                int(os.environ["MLX_PARALLM_DP"])
                if "MLX_PARALLM_DP" in os.environ
                else None
            ),
            coordinator=os.environ.get("MLX_PARALLM_COORDINATOR"),
            num_processes=(
                int(os.environ["MLX_PARALLM_NUM_PROCESSES"])
                if "MLX_PARALLM_NUM_PROCESSES" in os.environ
                else None
            ),
            process_id=(
                int(os.environ["MLX_PARALLM_PROCESS_ID"])
                if "MLX_PARALLM_PROCESS_ID" in os.environ
                else None
            ),
            warmup=os.environ.get("MLX_PARALLM_WARMUP", "") in ("1", "true"),
        )


# Module-global CLI hand-off (parity: reference cli.py:13).
current_server_args: Optional[ServerArgs] = None


METRICS: Dict[str, Any] = {
    "batches_processed": 0,
    "batch_fill_total": 0.0,
    "batch_fill_histogram": [0] * 10,
    "queue_depth": 0,
    "stream_batches": 0,
    "prompt_tokens_total": 0,
    "prompt_time_total": 0.0,
    "decode_tokens_total": 0,
    "decode_time_total": 0.0,
    "last_prompt_tps": 0.0,
    "last_decode_tps": 0.0,
    "requests_total": 0,
}


def _record_batch_fill(n: int, cap: int) -> None:
    METRICS["batches_processed"] += 1
    fill = n / max(cap, 1)
    METRICS["batch_fill_total"] += fill
    bucket = min(int(fill * 10), 9)
    METRICS["batch_fill_histogram"][bucket] += 1


def _sync_engine_metrics(engine: DecodeEngine) -> None:
    m = engine.metrics
    METRICS["prompt_tokens_total"] = m["prompt_tokens_total"]
    METRICS["prompt_time_total"] = m["prompt_time_total"]
    METRICS["decode_tokens_total"] = m["completion_tokens_total"]
    METRICS["decode_time_total"] = m["decode_time_total"]
    METRICS["last_prompt_tps"] = m["last_prompt_tps"]
    METRICS["last_decode_tps"] = m["last_decode_tps"]


# ------------------------------------------------------------- queue items


@dataclasses.dataclass
class QueuedRequest:
    """Non-streaming request waiting for the batch worker
    (parity: reference server/main.py:92-99)."""

    request: Any  # CompletionRequest | ChatCompletionRequest
    prompt: str
    future: asyncio.Future
    n: int
    max_tokens: int
    is_chat: bool
    created: float = dataclasses.field(default_factory=time.time)


@dataclasses.dataclass
class StreamQueuedChat:
    """Streaming chat request with a per-client delta queue
    (parity: reference server/main.py:86-90)."""

    request: ChatCompletionRequest
    prompt: str
    queue: asyncio.Queue
    created: float = dataclasses.field(default_factory=time.time)


@dataclasses.dataclass
class StreamQueuedCompletion:
    """Streaming completion routed through the continuous slot engine:
    unlike the co-batched fallback (one private decode per stream), the
    request shares the persistent slot pool with all other traffic."""

    request: CompletionRequest
    prompt: str
    queue: asyncio.Queue
    created: float = dataclasses.field(default_factory=time.time)


DONE_SENTINEL = "__DONE__"


# ----------------------------------------------------------------- helpers


def _sp_from_request(req, max_tokens: int, seed_offset: int = 0) -> SamplingParams:
    logit_bias = None
    if getattr(req, "logit_bias", None):
        logit_bias = {int(k): float(v) for k, v in req.logit_bias.items()}
    seed = getattr(req, "seed", None)
    if seed is not None:
        seed = seed + seed_offset
    stop = getattr(req, "stop", None)
    if isinstance(stop, str):
        stop = [stop]
    return SamplingParams(
        temperature=req.temperature or 0.0,
        top_p=req.top_p if req.top_p is not None else 1.0,
        max_tokens=max_tokens,
        logit_bias=logit_bias,
        seed=seed,
        stop=stop,
        presence_penalty=getattr(req, "presence_penalty", 0.0) or 0.0,
        frequency_penalty=getattr(req, "frequency_penalty", 0.0) or 0.0,
    )


def _validate_prompt_len(
    record: InternalModelRecord, prompt: str, max_tokens: int, args: ServerArgs
) -> Optional[str]:
    """Reject prompts that cannot fit (parity: reference
    server/main.py:374-401). Returns an error message or None."""
    tok = record.tokenizer_instance
    n_tokens = len(G.encode_cached(tok, prompt))
    limit = args.max_context_length - max_tokens
    if n_tokens > limit:
        return (
            f"Prompt has {n_tokens} tokens which exceeds the limit of "
            f"{limit} (max_context_length {args.max_context_length} - "
            f"max_tokens {max_tokens})"
        )
    if n_tokens > 0.9 * limit:
        logger.warning(
            "Prompt length %d is above 90%% of the limit %d", n_tokens, limit
        )
    return None


def _json_error(status: int, message: str) -> web.Response:
    return web.json_response(
        {"error": {"message": message, "type": "invalid_request_error"}},
        status=status,
    )


# ------------------------------------------------------------ app factory


def create_app(args: Optional[ServerArgs] = None) -> web.Application:
    app = web.Application(client_max_size=64 * 1024 * 1024)
    app["args"] = args
    app["request_queue"] = asyncio.Queue()
    app["stream_chat_queue"] = asyncio.Queue()
    app["workers"] = []

    app.router.add_get("/health", health_check)
    app.router.add_get("/debug/metrics", debug_metrics)
    app.router.add_post("/debug/profile/start", profile_start)
    app.router.add_post("/debug/profile/stop", profile_stop)
    app.router.add_get("/v1/models", list_models_endpoint)
    app.router.add_post("/v1/completions", create_completion)
    app.router.add_post("/v1/chat/completions", create_chat_completion)
    app.router.add_post("/v1/perplexity", compute_perplexity)
    app.router.add_post("/v1/embeddings", create_embeddings)

    app.on_startup.append(startup_event)
    app.on_cleanup.append(cleanup_event)
    return app


async def startup_event(app: web.Application) -> None:
    """Load + register the model, then spawn scheduler workers
    (parity: reference server/main.py:102-216)."""
    args: Optional[ServerArgs] = app["args"] or current_server_args
    if args is None:
        args = ServerArgs.from_env()
    if not args.model_path:
        env_args = ServerArgs.from_env()
        if env_args.model_path:
            args = env_args
    app["args"] = args
    if not args.model_path:
        logger.error("No model path configured; server will have no models")
        return

    model_id = args.model_path
    record = InternalModelRecord(
        model_id=model_id, model_path=args.model_path, status=ModelStatus.LOADING
    )
    state.model_registry[model_id] = record

    loop = asyncio.get_running_loop()
    app["streaming_semaphore"] = asyncio.Semaphore(args.max_concurrent_streams)

    def _load():
        mesh = None
        tp = 1
        if args.wants_mesh:
            from ..parallel import mesh as M

            mesh = M.make_mesh(tp=args.tp, dp=args.dp)
            tp = mesh.shape["tp"]
            logger.info("Serving over mesh %s", dict(mesh.shape))
        model, tokenizer = loader.load(
            args.model_path, adapter_path=args.lora_path, n_shards=tp
        )
        if mesh is not None:
            from ..parallel.mesh import shard_model

            shard_model(model, mesh)
        return model, tokenizer

    try:
        model, tokenizer = await loop.run_in_executor(None, _load)
        record.model_instance = model
        record.tokenizer_instance = tokenizer
        record.engine_instance = DecodeEngine(
            model,
            tokenizer,
            max_batch_size=args.max_batch_size,
            max_context_length=args.max_context_length,
            kv_bits=args.resolved_kv_bits,
        )
        record.adapter_path = args.lora_path
        record.status = ModelStatus.LOADED
        logger.info("Model %s loaded", model_id)
    except Exception as e:  # pragma: no cover
        record.status = ModelStatus.ERROR_LOADING
        record.error_message = str(e)
        logger.exception("Failed to load model %s", model_id)
        return

    if args.scheduler == "continuous":
        app["workers"].append(
            asyncio.create_task(continuous_scheduler_worker(app))
        )
    else:
        app["workers"].append(asyncio.create_task(batch_processing_worker(app)))
        app["workers"].append(asyncio.create_task(streaming_batch_worker(app)))


async def cleanup_event(app: web.Application) -> None:
    for task in app["workers"]:
        task.cancel()
    for task in app["workers"]:
        try:
            await task
        except (asyncio.CancelledError, Exception):
            pass


# ------------------------------------------------------------- endpoints


async def health_check(request: web.Request) -> web.Response:
    return web.json_response({"status": "ok"})


async def debug_metrics(request: web.Request) -> web.Response:
    rec = state.get_active_record()
    if rec and rec.engine_instance:
        _sync_engine_metrics(rec.engine_instance)
    slot_engine = request.app.get("slot_engine")
    if slot_engine is not None:
        # Live pull from the slot engine (not only on admission — the
        # reference updates per step, server/main.py:1603-1634; an idle
        # tail after the last admission must still be reflected).
        sm = slot_engine.metrics
        METRICS["decode_tokens_total"] = sm["decode_tokens_total"]
        METRICS["decode_time_total"] = sm["decode_time_total"]
        METRICS["active_slots"] = sm["active_slots"]
        METRICS["admitted_total"] = sm["admitted_total"]
        METRICS["admission_prefills_total"] = sm["admission_prefills_total"]
        METRICS["admit_queue_wait_total"] = sm["admit_queue_wait_total"]
        METRICS["admit_prefill_wall_total"] = sm["admit_prefill_wall_total"]
        if sm["decode_time_total"] > 0:
            METRICS["last_decode_tps"] = (
                sm["decode_tokens_total"] / sm["decode_time_total"]
            )
    m = dict(METRICS)
    n = max(m["batches_processed"], 1)
    m["avg_batch_fill"] = m["batch_fill_total"] / n
    m["queue_depth"] = request.app["request_queue"].qsize()
    avg_prompt = m["prompt_tokens_total"] / max(m["prompt_time_total"], 1e-9)
    avg_decode = m["decode_tokens_total"] / max(m["decode_time_total"], 1e-9)
    m["avg_prompt_tps"] = avg_prompt
    m["avg_decode_tps"] = avg_decode
    return web.json_response(m)


async def profile_start(request: web.Request) -> web.Response:
    """Start a jax.profiler trace (SURVEY §5: the reference has no tracing;
    here device profiling is built into the server). Body: {"dir": path}."""
    import jax

    try:
        body = await request.json()
    except Exception:
        body = {}
    trace_dir = body.get("dir", "/tmp/mlx_parallm_tpu_trace")
    try:
        jax.profiler.start_trace(trace_dir)
    except Exception as e:
        return _json_error(400, f"profiler start failed: {e}")
    request.app["profile_dir"] = trace_dir
    return web.json_response({"status": "profiling", "dir": trace_dir})


async def profile_stop(request: web.Request) -> web.Response:
    import jax

    try:
        jax.profiler.stop_trace()
    except Exception as e:
        return _json_error(400, f"profiler stop failed: {e}")
    return web.json_response(
        {"status": "stopped", "dir": request.app.get("profile_dir")}
    )


async def list_models_endpoint(request: web.Request) -> web.Response:
    cards = [rec.to_card().model_dump() for rec in state.model_registry.values()]
    return web.json_response(ModelList(data=cards).model_dump())


async def compute_perplexity(request: web.Request) -> web.Response:
    try:
        body = PerplexityRequest(**(await request.json()))
    except Exception as e:
        return _json_error(400, f"Invalid request: {e}")
    rec = state.model_registry.get(body.model)
    if rec is None or rec.status != ModelStatus.LOADED:
        return _json_error(404, f"Model {body.model} not found")
    tok = rec.tokenizer_instance
    ids = G.encode_cached(tok, body.text)
    if len(ids) < 2:
        return _json_error(400, "Text too short to compute perplexity")
    engine: DecodeEngine = rec.engine_instance
    loop = asyncio.get_running_loop()
    try:
        lp, mask = await loop.run_in_executor(
            None, engine.score_tokens, [ids]
        )
    except ContextLengthError as e:
        # Context-length guard on the (chunked) scoring path; any other
        # error is a server bug and propagates to a 500.
        return _json_error(400, str(e))
    vals = lp[0][mask[0]]
    avg_nll = float(-vals.mean())
    return web.json_response(
        PerplexityResponse(
            model=body.model,
            perplexity=float(np.exp(avg_nll)),
            avg_nll=avg_nll,
            num_tokens=int(mask[0].sum()),
        ).model_dump()
    )


async def create_embeddings(request: web.Request) -> web.Response:
    """OpenAI-compatible /v1/embeddings: mean-pooled final hidden states."""
    try:
        body = EmbeddingRequest(**(await request.json()))
    except Exception as e:
        return _json_error(400, f"Invalid request: {e}")
    rec = state.model_registry.get(body.model)
    if rec is None or rec.status != ModelStatus.LOADED:
        return _json_error(404, f"Model {body.model} not found")
    tok = rec.tokenizer_instance
    engine: DecodeEngine = rec.engine_instance
    texts = body.input if isinstance(body.input, list) else [body.input]
    if not texts:
        return _json_error(400, "input must be non-empty")
    rows = [G.encode_cached(tok, t) or [tok.pad_token_id] for t in texts]
    loop = asyncio.get_running_loop()
    try:
        vecs = await loop.run_in_executor(None, engine.embed, rows)
    except ContextLengthError as e:
        return _json_error(400, str(e))
    n_tokens = sum(len(r) for r in rows)
    resp = EmbeddingResponse(
        model=body.model,
        data=[
            EmbeddingData(index=i, embedding=[float(x) for x in vecs[i]])
            for i in range(len(texts))
        ],
        usage=UsageInfo(prompt_tokens=n_tokens, total_tokens=n_tokens),
    )
    return web.json_response(resp.model_dump())


# ------------------------------------------------------------- completions


async def create_completion(request: web.Request) -> web.Response:
    METRICS["requests_total"] += 1
    try:
        body = CompletionRequest(**(await request.json()))
    except Exception as e:
        return _json_error(400, f"Invalid request: {e}")
    rec = state.model_registry.get(body.model)
    if rec is None or rec.status != ModelStatus.LOADED:
        return _json_error(404, f"Model {body.model} not found")
    args: ServerArgs = request.app["args"]

    prompts = body.prompt if isinstance(body.prompt, list) else [body.prompt]
    if len(prompts) != 1:
        return _json_error(400, "Only a single prompt is supported per request")
    prompt = prompts[0]
    max_tokens = body.max_tokens if body.max_tokens is not None else 16

    err = _validate_prompt_len(rec, prompt, max_tokens, args)
    if err:
        return _json_error(400, err)

    # Logprobs / echo bypass the batch queue (parity: reference :414-421).
    if (body.logprobs is not None and body.logprobs > 0) or body.echo:
        return await _completion_with_logprobs(request.app, rec, body, prompt)

    if body.stream:
        if (body.n or 1) > 1:
            # Same contract as the chat route: a stream carries ONE choice
            # (the co-batched worker would otherwise silently drop n).
            return _json_error(400, "Streaming with n>1 is not supported")
        if args.scheduler == "continuous":
            item = StreamQueuedCompletion(
                request=body, prompt=prompt, queue=asyncio.Queue()
            )
            await request.app["stream_chat_queue"].put(item)
            return await _relay_chat_stream(request, item)
        return await _stream_completion(request, rec, body, prompt)

    fut: asyncio.Future = asyncio.get_running_loop().create_future()
    qr = QueuedRequest(
        request=body,
        prompt=prompt,
        future=fut,
        n=body.n or 1,
        max_tokens=max_tokens,
        is_chat=False,
    )
    await request.app["request_queue"].put(qr)
    try:
        result = await asyncio.wait_for(fut, timeout=args.request_timeout_seconds)
    except asyncio.TimeoutError:
        return _json_error(504, "Request timed out waiting for batch worker")
    if isinstance(result, Exception):
        return _json_error(500, str(result))
    return web.json_response(result.model_dump())


async def _stream_completion(
    request: web.Request, rec, body: CompletionRequest, prompt: str
) -> web.StreamResponse:
    """SSE streaming for /v1/completions."""
    app = request.app
    tok = rec.tokenizer_instance
    model = rec.model_instance
    prompt_tokens = G.encode_cached(tok, prompt)
    sp = _sp_from_request(body, body.max_tokens or 16)
    loop = asyncio.get_running_loop()

    resp = web.StreamResponse(
        status=200,
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        },
    )
    await resp.prepare(request)
    sem: asyncio.Semaphore = app["streaming_semaphore"]
    async with sem:
        q: asyncio.Queue = asyncio.Queue()

        def producer():
            try:
                stream = G.batch_stream_generate_text(
                    model,
                    tok,
                    [prompt_tokens],
                    sp.max_tokens,
                    sampling_params=[sp],
                )
                for step in stream:
                    loop.call_soon_threadsafe(q.put_nowait, step[0])
                loop.call_soon_threadsafe(q.put_nowait, None)
            except Exception as e:
                logger.exception("completion stream producer error")
                loop.call_soon_threadsafe(q.put_nowait, ("", "error"))
                loop.call_soon_threadsafe(q.put_nowait, None)

        loop.run_in_executor(None, producer)
        while True:
            item = await q.get()
            if item is None:
                break
            delta, fin = item
            if delta or fin in ("stop", "length", "error"):
                chunk = CompletionChunk(
                    model=body.model,
                    choices=[
                        CompletionStreamChoice(
                            index=0,
                            text=delta,
                            finish_reason=fin
                            if fin in ("stop", "length", "error")
                            else None,
                        )
                    ],
                )
                await resp.write(f"data: {chunk.model_dump_json()}\n\n".encode())
    await resp.write(b"data: [DONE]\n\n")
    await resp.write_eof()
    return resp


async def _completion_with_logprobs(app, rec, body: CompletionRequest, prompt: str):
    """Synchronous logprobs/echo path (parity: reference
    server/main.py:458-625). Teacher-forced prompt logprobs for echo, then
    sampled decode capturing per-token logprob + top-k."""
    tok = rec.tokenizer_instance
    engine: DecodeEngine = rec.engine_instance
    model = rec.model_instance
    loop = asyncio.get_running_loop()
    top_k = int(body.logprobs or 0)
    max_tokens = body.max_tokens if body.max_tokens is not None else 16

    prompt_ids = G.encode_cached(tok, prompt)

    def run() -> CompletionResponse:
        lp_tokens: List[str] = []
        lp_vals: List[Optional[float]] = []
        lp_top: List[Optional[Dict[str, float]]] = []
        offsets: List[int] = []
        text_parts: List[str] = []
        pos = 0

        if body.echo and len(prompt_ids) > 0:
            # Teacher-forced prompt logprobs. First token has no logprob.
            if len(prompt_ids) > 1:
                lp, _ = engine.score_tokens([prompt_ids])
                prompt_lps = [None] + [float(v) for v in lp[0][: len(prompt_ids) - 1]]
            else:
                prompt_lps = [None]
            for i, tid in enumerate(prompt_ids):
                piece = tok.decode([tid])
                lp_tokens.append(piece)
                lp_vals.append(prompt_lps[i])
                lp_top.append(None)
                offsets.append(pos)
                pos += len(piece)
                text_parts.append(piece)

        completion_ids: List[int] = []
        completion_lps: List[float] = []
        finish_reason = None
        if max_tokens > 0:
            sp = _sp_from_request(body, max_tokens)
            for step in engine.decode_batch([prompt_ids], [sp]):
                tid = step.tokens[0]
                if tid is None:
                    continue
                if step.finished[0] == "stop":
                    finish_reason = "stop"
                    break
                completion_ids.append(tid)
                completion_lps.append(step.logprobs[0])
                piece = tok.decode([tid])
                lp_tokens.append(piece)
                lp_vals.append(step.logprobs[0])
                lp_top.append(None)  # filled from the top-k pass below
                offsets.append(pos)
                pos += len(piece)
                text_parts.append(piece)
                if step.finished[0] == "length":
                    finish_reason = "length"
            if finish_reason is None:
                finish_reason = "stop"
        else:
            finish_reason = "stop" if body.echo else None

        if top_k > 0 and (completion_ids or (body.echo and len(prompt_ids) > 1)):
            # Real k-best alternatives per position (reference
            # server/main.py:521-527,585-591): one teacher-forced pass over
            # prompt+completion; position j of the result scores the token
            # at j+1. The sampled/actual token is merged in (it may fall
            # outside the top-k).
            full_ids = list(prompt_ids) + completion_ids
            vals, ids = engine.score_topk([full_ids], top_k)
            for out_idx in range(len(lp_tokens)):
                # Map output row -> position in full_ids.
                if body.echo:
                    pos_in_full = out_idx
                else:
                    pos_in_full = len(prompt_ids) + out_idx
                if pos_in_full == 0:
                    continue  # first token has no distribution
                entry = {
                    tok.decode([int(t)]): float(v)
                    for v, t in zip(
                        vals[0, pos_in_full - 1], ids[0, pos_in_full - 1]
                    )
                }
                actual_piece = lp_tokens[out_idx]
                if lp_vals[out_idx] is not None:
                    entry.setdefault(actual_piece, lp_vals[out_idx])
                lp_top[out_idx] = entry

        logprobs_obj = (
            LogProbs(
                tokens=lp_tokens,
                token_logprobs=lp_vals,
                top_logprobs=lp_top,
                text_offset=offsets,
            )
            if (top_k or body.echo)
            else None
        )
        text = "".join(text_parts) if body.echo else tok.decode(
            completion_ids, skip_special_tokens=True
        )
        return CompletionResponse(
            model=body.model,
            choices=[
                CompletionChoice(
                    index=0,
                    text=text,
                    logprobs=logprobs_obj,
                    finish_reason=finish_reason,
                )
            ],
            usage=UsageInfo(
                prompt_tokens=len(prompt_ids),
                completion_tokens=len(completion_ids),
                total_tokens=len(prompt_ids) + len(completion_ids),
            ),
        )

    try:
        result = await loop.run_in_executor(None, run)
    except ContextLengthError as e:
        return _json_error(400, str(e))
    return web.json_response(result.model_dump())


# ------------------------------------------------------------------- chat


async def create_chat_completion(request: web.Request) -> web.Response:
    METRICS["requests_total"] += 1
    try:
        body = ChatCompletionRequest(**(await request.json()))
    except Exception as e:
        return _json_error(400, f"Invalid request: {e}")
    rec = state.model_registry.get(body.model)
    if rec is None or rec.status != ModelStatus.LOADED:
        return _json_error(404, f"Model {body.model} not found")
    args: ServerArgs = request.app["args"]

    tok = rec.tokenizer_instance
    messages = [m.model_dump() for m in body.messages]
    try:
        prompt = G.apply_chat_template_cached(tok, messages)
    except Exception as e:
        return _json_error(400, f"Chat template error: {e}")

    max_tokens = body.max_tokens if body.max_tokens is not None else 128
    err = _validate_prompt_len(rec, prompt, max_tokens, args)
    if err:
        return _json_error(400, err)

    if body.stream:
        if (body.n or 1) > 1:
            return _json_error(400, "Streaming with n>1 is not supported")
        item = StreamQueuedChat(request=body, prompt=prompt, queue=asyncio.Queue())
        await request.app["stream_chat_queue"].put(item)
        return await _relay_chat_stream(request, item)

    fut: asyncio.Future = asyncio.get_running_loop().create_future()
    qr = QueuedRequest(
        request=body,
        prompt=prompt,
        future=fut,
        n=body.n or 1,
        max_tokens=max_tokens,
        is_chat=True,
    )
    await request.app["request_queue"].put(qr)
    try:
        result = await asyncio.wait_for(fut, timeout=args.request_timeout_seconds)
    except asyncio.TimeoutError:
        return _json_error(504, "Request timed out waiting for batch worker")
    if isinstance(result, Exception):
        return _json_error(500, str(result))
    return web.json_response(result.model_dump())


async def _relay_chat_stream(
    request: web.Request, item: StreamQueuedChat
) -> web.StreamResponse:
    """Relay SSE lines from the worker's per-request queue to the client
    under the streaming semaphore (parity: reference :774-786)."""
    resp = web.StreamResponse(
        status=200,
        headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        },
    )
    await resp.prepare(request)
    sem: asyncio.Semaphore = request.app["streaming_semaphore"]
    async with sem:
        while True:
            line = await item.queue.get()
            if line == DONE_SENTINEL:
                break
            await resp.write(line.encode())
    await resp.write(b"data: [DONE]\n\n")
    await resp.write_eof()
    return resp


# ----------------------------------------------------------------- workers


async def batch_processing_worker(app: web.Application) -> None:
    """Dynamic batching worker (parity: reference server/main.py:808-1276).

    Differences: per-request sampling params are passed through per row
    (no first-request consolidation); ``n`` expansion uses independent RNG
    seeds per choice row instead of zero-width-space prompt mutation."""
    args: ServerArgs = app["args"]
    queue: asyncio.Queue = app["request_queue"]
    logger.info("batch_processing_worker started")
    while True:
        batch: List[QueuedRequest] = [await queue.get()]
        # Fast drain, then timed window fill.
        deadline = time.monotonic() + args.batch_timeout
        while len(batch) < args.max_batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                batch.append(await asyncio.wait_for(queue.get(), timeout))
            except asyncio.TimeoutError:
                break
        METRICS["queue_depth"] = queue.qsize()

        try:
            await _process_batch(app, batch)
        except Exception as e:  # pragma: no cover
            logger.exception("batch worker error")
            for qr in batch:
                if not qr.future.done():
                    qr.future.set_result(e)


async def _process_batch(app: web.Application, batch: List[QueuedRequest]) -> None:
    args: ServerArgs = app["args"]
    rec = state.get_active_record()
    if rec is None:
        for qr in batch:
            qr.future.set_result(RuntimeError("No model loaded"))
        return
    tok = rec.tokenizer_instance
    model = rec.model_instance

    # Expand each request by its n; dedup identical greedy prompts unless
    # diverse mode (reference :1001-1113 semantics, minus the zero-width
    # space hack — sampled rows get independent RNG streams).
    rows: List[Tuple[str, SamplingParams]] = []
    row_map: List[List[int]] = []  # per request, row indices
    dedup: Dict[str, int] = {}
    for qr in batch:
        idxs = []
        greedy = (qr.request.temperature or 0.0) == 0.0
        for choice in range(qr.n):
            if (
                greedy
                and qr.n == 1
                and not args.diverse_mode
                and qr.prompt in dedup
            ):
                idxs.append(dedup[qr.prompt])
                continue
            sp = _sp_from_request(qr.request, qr.max_tokens, seed_offset=choice)
            if sp.seed is None and not greedy:
                sp.seed = int.from_bytes(os.urandom(4), "little") + choice
            rows.append((qr.prompt, sp))
            idx = len(rows) - 1
            if greedy and qr.n == 1 and not args.diverse_mode:
                dedup[qr.prompt] = idx
            idxs.append(idx)
        row_map.append(idxs)

    _record_batch_fill(len(batch), args.max_batch_size)

    prompts = [r[0] for r in rows]
    sps = [r[1] for r in rows]
    results = await G.batch_generate_text(
        model,
        tok,
        prompts,
        [sp.max_tokens for sp in sps],
        max_context_length=args.max_context_length,
        sampling_params=sps,
    )
    if rec.engine_instance:
        _sync_engine_metrics(rec.engine_instance)

    for qr, idxs in zip(batch, row_map):
        if qr.future.done():
            continue
        choices = []
        usage = UsageInfo()
        for ci, ridx in enumerate(idxs[: qr.n]):
            text, n_prompt, n_completion = results[ridx]
            usage.prompt_tokens += n_prompt
            usage.completion_tokens += n_completion
            finish = "length" if n_completion >= qr.max_tokens else "stop"
            if qr.is_chat:
                choices.append(
                    ChatCompletionChoice(
                        index=ci,
                        message=ChatMessage(role="assistant", content=text),
                        finish_reason=finish,
                    )
                )
            else:
                choices.append(
                    CompletionChoice(index=ci, text=text, finish_reason=finish)
                )
        usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
        if qr.is_chat:
            resp = ChatCompletionResponse(
                model=qr.request.model, choices=choices, usage=usage
            )
        else:
            resp = CompletionResponse(
                model=qr.request.model, choices=choices, usage=usage
            )
        qr.future.set_result(resp)


async def streaming_batch_worker(app: web.Application) -> None:
    """Co-batched streaming chat worker (parity: reference
    server/main.py:1286-1401)."""
    args: ServerArgs = app["args"]
    queue: asyncio.Queue = app["stream_chat_queue"]
    stream_batch_timeout = 0.02
    loop = asyncio.get_running_loop()
    logger.info("streaming_batch_worker started")
    while True:
        items: List[StreamQueuedChat] = [await queue.get()]
        deadline = time.monotonic() + stream_batch_timeout
        while len(items) < args.max_batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                items.append(await asyncio.wait_for(queue.get(), timeout))
            except asyncio.TimeoutError:
                break

        rec = state.get_active_record()
        if rec is None:
            for it in items:
                await it.queue.put(DONE_SENTINEL)
            continue
        METRICS["stream_batches"] += 1
        tok = rec.tokenizer_instance
        model = rec.model_instance

        prompt_rows = [G.encode_cached(tok, it.prompt) for it in items]
        sps = [
            _sp_from_request(it.request, it.request.max_tokens or 128)
            for it in items
        ]
        chunk_ids = [None] * len(items)

        def producer(outq: asyncio.Queue):
            try:
                stream = G.batch_stream_generate_text(
                    model,
                    tok,
                    prompt_rows,
                    [sp.max_tokens for sp in sps],
                    sampling_params=sps,
                )
                for step in stream:
                    loop.call_soon_threadsafe(outq.put_nowait, step)
                loop.call_soon_threadsafe(outq.put_nowait, None)
            except Exception as e:
                logger.exception("streaming producer error")
                loop.call_soon_threadsafe(outq.put_nowait, e)
                loop.call_soon_threadsafe(outq.put_nowait, None)

        outq: asyncio.Queue = asyncio.Queue()
        loop.run_in_executor(None, producer, outq)

        first = [True] * len(items)
        while True:
            step = await outq.get()
            if step is None:
                break
            if isinstance(step, Exception):
                for it in items:
                    err_chunk = ChatCompletionChunk(
                        model=it.request.model,
                        choices=[
                            ChatCompletionStreamChoice(
                                index=0,
                                delta=DeltaMessage(),
                                finish_reason="error",
                            )
                        ],
                    )
                    await it.queue.put(f"data: {err_chunk.model_dump_json()}\n\n")
                break
            for i, (delta, fin) in enumerate(step):
                it = items[i]
                if fin == "done":
                    continue
                if first[i]:
                    role_chunk = ChatCompletionChunk(
                        model=it.request.model,
                        choices=[
                            ChatCompletionStreamChoice(
                                index=0,
                                delta=DeltaMessage(role="assistant"),
                                finish_reason=None,
                            )
                        ],
                    )
                    chunk_ids[i] = role_chunk.id
                    await it.queue.put(f"data: {role_chunk.model_dump_json()}\n\n")
                    first[i] = False
                if delta or fin:
                    chunk = ChatCompletionChunk(
                        model=it.request.model,
                        choices=[
                            ChatCompletionStreamChoice(
                                index=0,
                                delta=DeltaMessage(content=delta or None),
                                finish_reason=fin
                                if fin in ("stop", "length")
                                else None,
                            )
                        ],
                    )
                    if chunk_ids[i]:
                        chunk.id = chunk_ids[i]
                    await it.queue.put(f"data: {chunk.model_dump_json()}\n\n")
        for it in items:
            await it.queue.put(DONE_SENTINEL)


async def continuous_scheduler_worker(app: web.Application) -> None:
    """Slot-based continuous scheduler: mixes streaming + non-streaming
    requests in one persistent decode-slot pool.

    Replaces the reference's restart-on-admit contract (reference
    server/main.py:1404-1726, admission at :1657-1671 recomputes running
    sequences) with true in-flight admission: new requests are prefilled into
    free slots between device decode chunks while running sequences keep
    their KV (SURVEY §7.5 planned fix, implemented in core/slot_engine.py)."""
    from ..core.slot_engine import SlotEngine, SlotRequest

    args: ServerArgs = app["args"]
    req_q: asyncio.Queue = app["request_queue"]
    stream_q: asyncio.Queue = app["stream_chat_queue"]
    loop = asyncio.get_running_loop()

    rec = state.get_active_record()
    while rec is None:
        await asyncio.sleep(0.2)
        rec = state.get_active_record()
    tok = rec.tokenizer_instance
    model = rec.model_instance

    engine = SlotEngine(
        model,
        tok,
        num_slots=args.resolved_num_slots,
        max_context_length=min(args.max_context_length, args.slot_context_length),
        kv_bits=args.resolved_kv_bits,
    )
    engine.start()
    if args.warmup:
        # Compile the admission + decode buckets before taking traffic;
        # requests arriving meanwhile queue behind the warmup batches.
        await asyncio.to_thread(
            engine.warmup, tuple(args.warmup_prompt_lens) or (128,)
        )
    app["slot_engine"] = engine
    logger.info("continuous_scheduler_worker started (slot engine)")

    def submit_completion(qr: QueuedRequest) -> None:
        """Expand by n; each choice gets its own slot + RNG stream."""
        n = qr.n
        results: List[Optional[Tuple[str, int, int, str]]] = [None] * n
        prompt_ids = G.encode_cached(tok, qr.prompt)
        remaining = {"n": n}
        base_sp = _sp_from_request(qr.request, qr.max_tokens)
        stops = base_sp.stop or []

        def make_cb(choice: int):
            ids: List[int] = []
            detok = tok.make_detokenizer() if stops else None

            def finish_choice(text: str, finish: str) -> None:
                results[choice] = (text, len(prompt_ids), len(ids), finish)
                remaining["n"] -= 1
                if remaining["n"] == 0:
                    loop.call_soon_threadsafe(finalize)

            def on_token(tid: int, finish: Optional[str]):
                if finish != "stop":
                    ids.append(tid)
                    if detok is not None:
                        detok.add_token(tid)
                        acc = detok.text
                        for s in stops:
                            if s and s in acc:
                                finish_choice(acc[: acc.find(s)], "stop")
                                return False  # cancel the slot
                if finish:
                    text = tok.decode(ids, skip_special_tokens=True)
                    for s in stops:
                        if s and s in text:
                            text = text[: text.find(s)]
                    finish_choice(text, finish)
                return True

            return on_token

        def finalize() -> None:
            if qr.future.done():
                return
            choices = []
            usage = UsageInfo()
            for ci in range(n):
                text, n_p, n_c, finish = results[ci]
                usage.prompt_tokens += n_p
                usage.completion_tokens += n_c
                if qr.is_chat:
                    choices.append(
                        ChatCompletionChoice(
                            index=ci,
                            message=ChatMessage(role="assistant", content=text),
                            finish_reason=finish,
                        )
                    )
                else:
                    choices.append(
                        CompletionChoice(
                            index=ci, text=text, finish_reason=finish
                        )
                    )
            usage.total_tokens = usage.prompt_tokens + usage.completion_tokens
            if qr.is_chat:
                resp = ChatCompletionResponse(
                    model=qr.request.model, choices=choices, usage=usage
                )
            else:
                resp = CompletionResponse(
                    model=qr.request.model, choices=choices, usage=usage
                )
            qr.future.set_result(resp)

        def on_error(reason: str) -> None:
            def fail() -> None:
                if not qr.future.done():
                    qr.future.set_exception(
                        RuntimeError(f"engine aborted: {reason}")
                    )

            loop.call_soon_threadsafe(fail)

        for choice in range(n):
            sp = _sp_from_request(qr.request, qr.max_tokens, seed_offset=choice)
            engine.submit(
                SlotRequest(
                    prompt_tokens=prompt_ids,
                    params=sp,
                    on_token=make_cb(choice),
                    on_error=on_error,
                )
            )

    def submit_stream(it) -> None:
        is_chat = isinstance(it, StreamQueuedChat)
        default_max = 128 if is_chat else 16
        prompt_ids = G.encode_cached(tok, it.prompt)
        sp = _sp_from_request(it.request, it.request.max_tokens or default_max)
        detok = tok.make_detokenizer()
        first = {"v": True}
        chunk_id = {"v": None}

        def emit(line: str) -> None:
            it.queue.put_nowait(line)

        stops = sp.stop or []
        acc_state = {"emitted": 0}

        # SSE chunk construction (pydantic + JSON, ~0.1 ms/token) must NOT
        # run on the engine driver thread — at b8/chunk 8 that is several
        # ms of serialization serialized into every chunk drain. The
        # driver callback only appends raw (tid, finish) pairs and
        # schedules ONE coalesced event-loop flush per drain; ``handle``
        # below (the old callback body) runs on the event loop.
        buf: deque = deque()
        flush_scheduled = [False]
        # Driver-side detokenizer only when host-side stop sequences need
        # a cancel decision inside the callback itself.
        stop_detok = tok.make_detokenizer() if stops else None

        def flush() -> None:
            flush_scheduled[0] = False
            while buf:
                tid, fin = buf.popleft()
                handle(tid, fin)

        def on_token(tid: int, finish: Optional[str]):
            hit = False
            if stop_detok is not None:
                if finish != "stop":
                    stop_detok.add_token(tid)
                # peek_text includes the withheld incomplete-UTF-8 tail, so
                # a stop sequence completed only inside the buffered tail
                # cancels the slot now, not one token late (the emitted
                # text is truncated by ``handle`` either way).
                acc = stop_detok.peek_text
                hit = any(s and s in acc for s in stops)
            buf.append((tid, finish))
            if not flush_scheduled[0]:
                flush_scheduled[0] = True
                loop.call_soon_threadsafe(flush)
            return not hit

        def handle(tid: int, finish: Optional[str]):
            if first["v"] and is_chat:
                role_chunk = ChatCompletionChunk(
                    model=it.request.model,
                    choices=[
                        ChatCompletionStreamChoice(
                            index=0, delta=DeltaMessage(role="assistant")
                        )
                    ],
                )
                chunk_id["v"] = role_chunk.id
                emit(f"data: {role_chunk.model_dump_json()}\n\n")
            first["v"] = False
            delta = ""
            if finish == "stop":
                detok.finalize()
                delta = detok.last_segment
            else:
                detok.add_token(tid)
                delta = detok.last_segment
                if finish == "length":
                    detok.finalize()
                    delta += detok.last_segment
            if stops:
                # Host-side stop sequences: truncate at the first match and
                # cancel the slot.
                acc = detok.text
                cut = -1
                for s in stops:
                    if s:
                        idx = acc.find(s)
                        if idx != -1:
                            cut = idx if cut == -1 else min(cut, idx)
                if cut != -1:
                    keep_text = acc[: cut]
                    already = acc_state["emitted"]
                    delta = keep_text[already:] if len(keep_text) > already else ""
                    finish = "stop"
            acc_state["emitted"] += len(delta)
            if delta or finish:
                if is_chat:
                    chunk = ChatCompletionChunk(
                        model=it.request.model,
                        choices=[
                            ChatCompletionStreamChoice(
                                index=0,
                                delta=DeltaMessage(content=delta or None),
                                finish_reason=finish,
                            )
                        ],
                    )
                    if chunk_id["v"]:
                        chunk.id = chunk_id["v"]
                else:
                    chunk = CompletionChunk(
                        model=it.request.model,
                        choices=[
                            CompletionStreamChoice(
                                index=0, text=delta, finish_reason=finish
                            )
                        ],
                    )
                emit(f"data: {chunk.model_dump_json()}\n\n")
            if finish:
                it.queue.put_nowait(DONE_SENTINEL)

        def on_error(reason: str) -> None:
            err = json.dumps(
                {"error": {"message": f"engine aborted: {reason}"}}
            )
            loop.call_soon_threadsafe(it.queue.put_nowait, f"data: {err}\n\n")
            loop.call_soon_threadsafe(it.queue.put_nowait, DONE_SENTINEL)

        engine.submit(
            SlotRequest(
                prompt_tokens=prompt_ids,
                params=sp,
                on_token=on_token,
                on_error=on_error,
            )
        )

    # Persistent queue getters: cancelling a pending Queue.get that has
    # already dequeued an item silently drops the request (classic asyncio
    # race — reference-era bug class); instead each getter lives until it
    # actually yields an item, then is re-armed.
    get_req: Optional[asyncio.Future] = None
    get_stream: Optional[asyncio.Future] = None
    try:
        while True:
            if get_req is None:
                get_req = asyncio.ensure_future(req_q.get())
            if get_stream is None:
                get_stream = asyncio.ensure_future(stream_q.get())
            done, _ = await asyncio.wait(
                [get_req, get_stream], return_when=asyncio.FIRST_COMPLETED
            )
            items = []
            if get_req in done:
                items.append(get_req.result())
                get_req = None
            if get_stream in done:
                items.append(get_stream.result())
                get_stream = None
            for item in items:
                METRICS["queue_depth"] = req_q.qsize()
                _record_batch_fill(
                    max(1, engine.num_slots - engine.free_slots),
                    engine.num_slots,
                )
                if isinstance(item, QueuedRequest):
                    submit_completion(item)
                else:
                    submit_stream(item)
            m = engine.metrics
            METRICS["decode_tokens_total"] = m["decode_tokens_total"]
            METRICS["decode_time_total"] = m["decode_time_total"]
            METRICS["admitted_total"] = m["admitted_total"]
            METRICS["admission_prefills_total"] = m[
                "admission_prefills_total"
            ]
            METRICS["admit_queue_wait_total"] = m["admit_queue_wait_total"]
            METRICS["admit_prefill_wall_total"] = m[
                "admit_prefill_wall_total"
            ]
            if m["decode_time_total"] > 0:
                METRICS["last_decode_tps"] = (
                    m["decode_tokens_total"] / m["decode_time_total"]
                )
    except asyncio.CancelledError:
        for f in (get_req, get_stream):
            if f is not None:
                f.cancel()
        engine.stop()
        raise



# -------------------------------------------------------------------- main


def run_follower(args: ServerArgs) -> None:
    """Follower-process serving loop for multi-host runs: load + shard the
    same model over the same global mesh, then replay host 0's broadcast
    slot-engine commands. No HTTP surface — host 0 owns the front end
    (SURVEY §5 'host 0 runs the HTTP front end ... all hosts execute the
    same jitted program SPMD-style')."""
    from ..core.slot_engine import SlotEngine
    from ..parallel import mesh as M

    if args.scheduler != "continuous":
        logger.warning(
            "multi-host serving uses the continuous scheduler; overriding "
            "--scheduler %s", args.scheduler,
        )
    mesh = M.make_mesh(tp=args.tp, dp=args.dp)
    model, tokenizer = loader.load(
        args.model_path, adapter_path=args.lora_path,
        n_shards=mesh.shape["tp"],
    )
    M.shard_model(model, mesh)
    engine = SlotEngine(
        model,
        tokenizer,
        num_slots=args.resolved_num_slots,
        max_context_length=min(args.max_context_length, args.slot_context_length),
        kv_bits=args.resolved_kv_bits,
        mesh=mesh,
    )
    logger.info("Follower process ready; replaying host-0 slot schedule")
    try:
        engine.run_follower()
    except RuntimeError as e:
        # Peer loss: host 0 died mid-run and a collective errored.
        logger.error("Peer loss detected — aborting follower: %s", e)
        raise SystemExit(1)
    logger.info("Follower process exiting (OP_STOP received)")


def run_server(args: ServerArgs) -> None:
    global current_server_args
    current_server_args = args

    # Multi-host runtime: must be initialized before any device work.
    from ..parallel import distributed

    multi = distributed.initialize(
        args.coordinator, args.num_processes, args.process_id
    )
    if multi and not distributed.is_primary():
        run_follower(args)
        return

    app = create_app(args)
    web.run_app(app, host=args.host, port=args.port, print=None)
