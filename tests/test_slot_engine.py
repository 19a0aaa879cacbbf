"""Slot-engine tests: in-flight admission without recompute."""

import threading
import time

import pytest

from mlx_parallm_tpu.core import loader
from mlx_parallm_tpu.core.engine import DecodeEngine, SamplingParams
from mlx_parallm_tpu.core.slot_engine import SlotEngine, SlotRequest


@pytest.fixture(scope="module")
def slot_setup(tiny_model_dir):
    model, tok = loader.load(tiny_model_dir)
    engine = SlotEngine(
        model, tok, num_slots=4, max_context_length=256, decode_steps_per_call=4
    )
    engine.start()
    yield model, tok, engine
    engine.stop()


def _run_request(engine, ids, max_tokens, timeout=120.0):
    done = threading.Event()
    out = {"tokens": [], "finish": None}

    def on_token(tid, finish):
        if finish != "stop":
            out["tokens"].append(tid)
        if finish:
            out["finish"] = finish
            done.set()

    engine.submit(
        SlotRequest(
            prompt_tokens=ids,
            params=SamplingParams(temperature=0.0, max_tokens=max_tokens),
            on_token=on_token,
        )
    )
    assert done.wait(timeout), "request did not finish in time"
    return out


def test_single_request_matches_batch_engine(slot_setup):
    model, tok, engine = slot_setup
    ids = tok.encode("The quick brown fox")
    out = _run_request(engine, ids, 6)
    assert out["finish"] in ("stop", "length")

    ref_engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    ref = []
    fin = None
    for step in ref_engine.decode_batch(
        [ids], [SamplingParams(temperature=0.0, max_tokens=6)]
    ):
        if step.tokens[0] is not None and step.finished[0] != "stop":
            ref.append(step.tokens[0])
        if step.finished[0]:
            fin = step.finished[0]
    assert out["tokens"] == ref
    assert out["finish"] == fin


def test_concurrent_admission(slot_setup):
    """Multiple requests admitted at different times; each matches its solo
    greedy result (running KV untouched by admissions)."""
    model, tok, engine = slot_setup
    prompts = [
        tok.encode("The quick brown fox jumps over the lazy dog"),
        tok.encode("Hello world"),
        tok.encode("What is 1 + 2?"),
    ]
    solos = [_run_request(engine, p, 6)["tokens"] for p in prompts]

    results = [None] * 3
    threads = []

    def worker(i):
        results[i] = _run_request(engine, prompts[i], 6)["tokens"]

    for i in range(3):
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(0.05)  # staggered admission
    for th in threads:
        th.join(timeout=120)

    assert results == solos


def test_logit_bias_forces_token_slot(slot_setup):
    """logit_bias must be honored under the continuous scheduler (the
    reference applies it on every path, server/main.py:506-513) — and must
    NOT leak into a later unbiased request that reuses the slot."""
    model, tok, engine = slot_setup
    forced = 7
    done = threading.Event()
    toks = []

    def on_token(tid, fin):
        toks.append(tid)
        if fin:
            done.set()

    engine.submit(
        SlotRequest(
            prompt_tokens=tok.encode("xyz"),
            params=SamplingParams(
                temperature=0.0, max_tokens=4, logit_bias={forced: 1000.0}
            ),
            on_token=on_token,
        )
    )
    assert done.wait(120)
    assert toks and all(t == forced for t in toks)

    # Unbiased request afterwards: greedy output must match the plain
    # DecodeEngine (a leaked bias row would force token 7 again).
    ids = tok.encode("The quick brown fox")
    out = _run_request(engine, ids, 6)
    ref_engine = DecodeEngine(model, tok, disable_prefix_cache=True)
    ref = []
    for step in ref_engine.decode_batch(
        [ids], [SamplingParams(temperature=0.0, max_tokens=6)]
    ):
        if step.tokens[0] is not None and step.finished[0] != "stop":
            ref.append(step.tokens[0])
    assert out["tokens"] == ref


def test_generation_across_hot_window_bucket(tiny_model_dir):
    """Regression: a sequence whose prompt+generated length crosses the
    first 256-position hot-window bucket must keep writing KV (the bug was
    a stale admission-time ``_slot_len`` that froze ``s_hot`` at the first
    bucket, silently zeroing all later KV writes) and must match the
    DecodeEngine token-for-token."""
    import numpy as np
    import jax

    model, tok = loader.load(tiny_model_dir)

    class _NoEos:
        """Tokenizer shim that disables EOS so the run is forced across the
        bucket boundary deterministically."""

        def __init__(self, inner):
            self._inner = inner
            self.eos_token_ids = set()

        def __getattr__(self, name):
            return getattr(self._inner, name)

    no_eos = _NoEos(tok)
    base = tok.encode("The quick brown fox jumps over the lazy dog. ")
    ids = (base * 20)[:200]  # prompt 200 tokens
    max_tokens = 150  # final length 350 > 256 (first bucket)

    engine = SlotEngine(
        model, no_eos, num_slots=2, max_context_length=1024,
        decode_steps_per_call=8,
    )
    engine.start()
    try:
        out = _run_request(engine, ids, max_tokens, timeout=300.0)
        assert out["finish"] == "length"
        assert len(out["tokens"]) == max_tokens

        # The slab must hold real (nonzero) K values past the first bucket.
        final_len = int(jax.device_get(engine._cache.lengths)[0])
        assert final_len == len(ids) + max_tokens - 1  # last token's KV unwritten
        k = np.asarray(
            jax.device_get(engine._cache.k[:, 0, :, 256:final_len]),
            dtype=np.float32,
        )  # (L, H, P, D) slab layout
        mags = np.abs(k).max(axis=(0, 1, 3))  # per-position max |K|
        assert (mags > 0).all(), (
            f"zeroed KV positions past bucket: {np.where(mags == 0)[0] + 256}"
        )
    finally:
        engine.stop()

    ref_engine = DecodeEngine(model, no_eos, disable_prefix_cache=True)
    ref = []
    for step in ref_engine.decode_batch(
        [ids], [SamplingParams(temperature=0.0, max_tokens=max_tokens)]
    ):
        if step.tokens[0] is not None and step.finished[0] != "stop":
            ref.append(step.tokens[0])
    assert out["tokens"] == ref


def _submit_collect(engine, ids, params):
    """Non-blocking submit; returns (done_event, out_dict)."""
    done = threading.Event()
    out = {"tokens": [], "finish": None}

    def on_token(tid, finish):
        if finish != "stop":
            out["tokens"].append(tid)
        if finish:
            out["finish"] = finish
            done.set()

    engine.submit(
        SlotRequest(prompt_tokens=ids, params=params, on_token=on_token)
    )
    return done, out


def _greedy_ref(model, tok, ids, n):
    eng = DecodeEngine(model, tok, disable_prefix_cache=True)
    ref = []
    for step in eng.decode_batch(
        [ids], [SamplingParams(temperature=0.0, max_tokens=n)]
    ):
        if step.tokens[0] is not None and step.finished[0] != "stop":
            ref.append(step.tokens[0])
    return ref


def test_batched_admission_dedupes_n_choices(tiny_model_dir):
    """A burst of n identical prompts must run ONE admission prefill
    (VERDICT r2 #3: one prefill serving n>1 choices), with per-request RNG
    streams still independent."""
    model, tok = loader.load(tiny_model_dir)
    engine = SlotEngine(
        model, tok, num_slots=4, max_context_length=256,
        decode_steps_per_call=4,
    )
    ids = tok.encode("The quick brown fox jumps over the lazy dog")
    waits = [
        _submit_collect(
            engine,
            ids,
            SamplingParams(temperature=0.8, top_p=0.9, max_tokens=5, seed=i),
        )
        for i in range(4)
    ]
    engine.start()  # all four queued -> one admission burst
    try:
        for done, _ in waits:
            assert done.wait(180)
        assert engine.metrics["admitted_total"] == 4
        assert engine.metrics["admission_prefills_total"] == 1
        outs = [tuple(o["tokens"]) for _, o in waits]
        assert all(len(o) >= 1 for o in outs)
        assert len(set(outs)) > 1, "choices identical despite distinct seeds"
    finally:
        engine.stop()


def test_batched_admission_greedy_matches_solo(tiny_model_dir):
    """A burst of DIFFERENT prompts admitted in one batch must produce the
    same greedy tokens as solo DecodeEngine runs (batched prefill + row
    insert correctness)."""
    model, tok = loader.load(tiny_model_dir)
    engine = SlotEngine(
        model, tok, num_slots=4, max_context_length=256,
        decode_steps_per_call=4, disable_prefix_cache=True,
    )
    prompts = [
        tok.encode("The quick brown fox jumps over the lazy dog"),
        tok.encode("Hello world"),
        tok.encode("What is 1 + 2?"),
    ]
    refs = [_greedy_ref(model, tok, p, 6) for p in prompts]
    waits = [
        _submit_collect(
            engine, p, SamplingParams(temperature=0.0, max_tokens=6)
        )
        for p in prompts
    ]
    engine.start()
    try:
        for done, _ in waits:
            assert done.wait(180)
        assert engine.metrics["admission_prefills_total"] == 1
        assert [o["tokens"] for _, o in waits] == refs
    finally:
        engine.stop()


def test_slot_prefix_reuse(tiny_model_dir):
    """Shared-prefix admissions seed from the global prefix-KV LRU
    (reference utils.py:1206-1279, now in the slot engine too) without
    changing greedy outputs."""
    model, tok = loader.load(tiny_model_dir)
    engine = SlotEngine(
        model, tok, num_slots=4, max_context_length=512,
        decode_steps_per_call=4,
    )
    base = tok.encode("The quick brown fox jumps over the lazy dog. ") * 10
    p1 = base[:80] + tok.encode("Hello")
    p2 = base[:80] + tok.encode("Goodbye friend")
    p3 = base[:80] + tok.encode("What")
    refs = [_greedy_ref(model, tok, p, 6) for p in (p1, p2, p3)]

    waits = [
        _submit_collect(
            engine, p, SamplingParams(temperature=0.0, max_tokens=6)
        )
        for p in (p1, p2)
    ]
    engine.start()  # one burst: lcp >= 64 -> snapshot stored
    try:
        for done, _ in waits:
            assert done.wait(180)
        assert [o["tokens"] for _, o in waits] == refs[:2]

        out3 = _run_request(engine, p3, 6)
        assert engine.prefix_cache.hits >= 1, "prefix snapshot not reused"
        assert out3["tokens"] == refs[2]
    finally:
        engine.stop()


def test_abort_fails_live_requests(tiny_model_dir):
    """Failure detection (SURVEY §5): a driver failure (device error /
    peer loss collective error) must fail live requests through on_error
    immediately — not hang them — and fail-fast subsequent submits."""
    model, tok = loader.load(tiny_model_dir)
    engine = SlotEngine(
        model, tok, num_slots=2, max_context_length=256,
        decode_steps_per_call=4,
    )

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    engine._decode_chunk = boom
    engine.start()

    errors = []
    done = threading.Event()

    req = SlotRequest(
        prompt_tokens=tok.encode("hello there friend"),
        params=SamplingParams(temperature=0.0, max_tokens=8),
        on_token=lambda tid, fin: True,
        on_error=lambda reason: (errors.append(reason), done.set()),
    )
    engine.submit(req)
    assert done.wait(120), "on_error never fired"
    assert "injected device failure" in errors[0]
    assert engine.failed

    # Fail-fast for submissions after the abort.
    late = threading.Event()
    engine.submit(
        SlotRequest(
            prompt_tokens=[1],
            params=SamplingParams(max_tokens=1),
            on_token=lambda t, f: True,
            on_error=lambda r: late.set(),
        )
    )
    assert late.wait(5)
    engine.stop()


def test_more_requests_than_slots(slot_setup):
    """Queueing beyond slot capacity drains correctly."""
    model, tok, engine = slot_setup
    ids = tok.encode("counting")
    results = [None] * 6
    threads = []

    def worker(i):
        results[i] = _run_request(engine, ids, 4)["finish"]

    for i in range(6):
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join(timeout=180)
    assert all(r in ("stop", "length") for r in results)
    assert engine.metrics["admitted_total"] >= 6


def test_warmup_compiles_and_serves(slot_setup):
    """warmup() runs the synthetic bucket batches through the normal
    driver and the engine still serves real traffic afterwards."""
    model, tok, engine = slot_setup
    dt = engine.warmup(prompt_lens=(16,))
    assert dt > 0
    assert engine.free_slots == engine.num_slots
    out = _run_request(engine, tok.encode("after warmup"), 4)
    assert out["finish"] in ("stop", "length")
    assert len(out["tokens"]) >= 1


def test_compile_cache_toggle(monkeypatch, tmp_path):
    import importlib

    from mlx_parallm_tpu.core import compile_cache as cc

    importlib.reload(cc)
    monkeypatch.setenv("MLX_PARALLM_NO_COMPILE_CACHE", "1")
    assert cc.enable_compile_cache() is False
    monkeypatch.delenv("MLX_PARALLM_NO_COMPILE_CACHE")
    monkeypatch.setenv("MLX_PARALLM_COMPILE_CACHE_DIR", str(tmp_path / "jc"))
    assert cc.enable_compile_cache() is True
    assert (tmp_path / "jc").is_dir()
    # Idempotent.
    assert cc.enable_compile_cache() is True
