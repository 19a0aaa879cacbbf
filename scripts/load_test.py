"""Async load generator against a running server.

Parity: reference /root/reference/scripts/load_test.py:42-72 — fires N
concurrent completion requests, reports p50/p95/max latency and req/s.

Usage: python scripts/load_test.py --base-url http://127.0.0.1:8000 \
         --model <model-id> [--num-requests 32] [--concurrency 8]
"""

from __future__ import annotations

import argparse
import asyncio
import statistics
import time

import aiohttp


async def one_request(session, base, model, i, max_tokens):
    payload = {
        "model": model,
        "prompt": f"Request {i}: tell me something interesting about the number {i}.",
        "max_tokens": max_tokens,
        "temperature": 0.7,
    }
    t0 = time.perf_counter()
    async with session.post(f"{base}/v1/completions", json=payload) as resp:
        await resp.json()
        ok = resp.status == 200
    return time.perf_counter() - t0, ok


async def run(ns):
    sem = asyncio.Semaphore(ns.concurrency)
    latencies, failures = [], 0

    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=ns.timeout)
    ) as session:

        async def task(i):
            nonlocal failures
            async with sem:
                try:
                    dt, ok = await one_request(
                        session, ns.base_url, ns.model, i, ns.max_tokens
                    )
                    if ok:
                        latencies.append(dt)
                    else:
                        failures += 1
                except Exception:
                    failures += 1

        t0 = time.perf_counter()
        await asyncio.gather(*(task(i) for i in range(ns.num_requests)))
        wall = time.perf_counter() - t0

    if latencies:
        latencies.sort()
        p50 = statistics.median(latencies)
        p95 = latencies[int(0.95 * (len(latencies) - 1))]
        print(f"requests: {len(latencies)} ok, {failures} failed")
        print(f"p50 latency: {p50*1000:.0f} ms")
        print(f"p95 latency: {p95*1000:.0f} ms")
        print(f"max latency: {latencies[-1]*1000:.0f} ms")
        print(f"throughput:  {len(latencies)/wall:.2f} req/s")
    else:
        print(f"all {failures} requests failed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:8000")
    ap.add_argument("--model", required=True)
    ap.add_argument("--num-requests", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=50)
    ap.add_argument("--timeout", type=float, default=300)
    asyncio.run(run(ap.parse_args()))


if __name__ == "__main__":
    main()
