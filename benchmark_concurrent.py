"""Concurrent client benchmark: total time, TTFT (stream-aware), tokens/s.

Parity: reference /root/reference/benchmark_concurrent.py:26-180. Token counts
here are EXACT (counted from usage / streamed chunks), not the reference's
``words * 1.3`` estimate.

Usage: python benchmark_concurrent.py --model <id> [--base-url ...]
       [--concurrency 8] [--stream]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import aiohttp

PROMPTS = [
    "Explain the difference between a process and a thread.",
    "Write a haiku about the ocean.",
    "What are the main causes of the French Revolution?",
    "Describe how a transformer language model generates text.",
    "Give three tips for writing clean Python code.",
    "What is the capital of Australia and why is it not Sydney?",
    "Summarize the plot of Hamlet in two sentences.",
    "How does public-key cryptography work?",
]


async def run_request(session, base, model, prompt, max_tokens, stream):
    t0 = time.perf_counter()
    ttft = None
    n_tokens = 0
    if stream:
        payload = {
            "model": model,
            "messages": [{"role": "user", "content": prompt}],
            "max_tokens": max_tokens,
            "stream": True,
            "temperature": 0.7,
        }
        async with session.post(
            f"{base}/v1/chat/completions", json=payload
        ) as resp:
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                if ttft is None:
                    ttft = time.perf_counter() - t0
                chunk = json.loads(line[len("data: ") :])
                if chunk["choices"][0]["delta"].get("content"):
                    n_tokens += 1
    else:
        payload = {
            "model": model,
            "prompt": prompt,
            "max_tokens": max_tokens,
            "temperature": 0.7,
        }
        async with session.post(f"{base}/v1/completions", json=payload) as resp:
            data = await resp.json()
            ttft = time.perf_counter() - t0
            n_tokens = data.get("usage", {}).get("completion_tokens", 0)
    total = time.perf_counter() - t0
    return total, ttft or total, n_tokens


async def bench(ns):
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=ns.timeout)
    ) as session:
        prompts = (PROMPTS * ((ns.concurrency // len(PROMPTS)) + 1))[
            : ns.concurrency
        ]
        t0 = time.perf_counter()
        results = await asyncio.gather(
            *(
                run_request(
                    session, ns.base_url, ns.model, p, ns.max_tokens, ns.stream
                )
                for p in prompts
            )
        )
        wall = time.perf_counter() - t0

    total_tokens = sum(r[2] for r in results)
    ttfts = sorted(r[1] for r in results)
    print(f"concurrency:      {ns.concurrency}")
    print(f"wall time:        {wall:.2f} s")
    print(f"total tokens:     {total_tokens}")
    print(f"aggregate tok/s:  {total_tokens / wall:.1f}")
    print(f"p50 TTFT:         {ttfts[len(ttfts)//2]*1000:.0f} ms")
    print(f"per-request tok/s: {[round(r[2]/max(r[0],1e-9),1) for r in results]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:8000")
    ap.add_argument("--model", required=True)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=100)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--timeout", type=float, default=600)
    asyncio.run(bench(ap.parse_args()))


if __name__ == "__main__":
    main()
