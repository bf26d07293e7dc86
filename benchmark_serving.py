#!/usr/bin/env python
"""HTTP load generator — the reference's `benchmark.py:7-101` equivalent.

Fires N concurrent `/generate_stream` requests at a running server, counts
streamed tokens, reports per-request and aggregate throughput.

Usage:
  python benchmark_serving.py --url http://localhost:8000 \
      --concurrency 8 --max-tokens 128 --requests 16
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time

import aiohttp

PROMPT_IDS = [list(range(3, 3 + n)) for n in (16, 32, 64, 100, 180)]


def make_prompt(shared_prefix: int) -> list[int]:
    """A benchmark prompt; with --shared-prefix N every request starts with
    the same N-token "system prompt" (the automatic-prefix-caching serving
    scenario: the shared pages prefill once, every later request skips
    them — run the server with --prefix-cache to see the TTFT win)."""
    tail = random.choice(PROMPT_IDS)
    if shared_prefix <= 0:
        return tail
    return [7] * shared_prefix + tail


async def send_request(session: aiohttp.ClientSession, url: str,
                       max_tokens: int, sem: asyncio.Semaphore,
                       results: list, shared_prefix: int = 0) -> None:
    async with sem:
        body = {
            "prompt_token_ids": make_prompt(shared_prefix),
            "max_tokens": max_tokens,
            "temperature": 0.7,
            "ignore_eos": True,
        }
        t0 = time.monotonic()
        first_token_t = None
        n = 0
        async with session.post(f"{url}/generate_stream", json=body) as resp:
            resp.raise_for_status()
            async for line in resp.content:
                line = line.strip()
                if not line.startswith(b"data: "):
                    continue
                payload = json.loads(line[6:])
                if payload.get("done"):
                    break
                if first_token_t is None:
                    first_token_t = time.monotonic()
                n += 1
        dt = time.monotonic() - t0
        results.append({
            "tokens": n,
            "latency_s": dt,
            "ttft_s": (first_token_t - t0) if first_token_t else None,
            "tok_per_s": n / dt if dt else 0.0,
        })


async def main_async(args) -> None:
    sem = asyncio.Semaphore(args.concurrency)
    results: list = []
    conn = aiohttp.TCPConnector(limit=args.concurrency * 2)
    timeout = aiohttp.ClientTimeout(total=1200)
    async with aiohttp.ClientSession(connector=conn, timeout=timeout) as s:
        t0 = time.monotonic()
        await asyncio.gather(*[
            send_request(s, args.url, args.max_tokens, sem, results,
                         args.shared_prefix)
            for _ in range(args.requests)])
        wall = time.monotonic() - t0

    total_tokens = sum(r["tokens"] for r in results)
    ttfts = sorted(r["ttft_s"] for r in results if r["ttft_s"] is not None)
    print(json.dumps({
        "requests": len(results),
        "concurrency": args.concurrency,
        "total_tokens": total_tokens,
        "wall_s": round(wall, 2),
        "aggregate_tok_per_s": round(total_tokens / wall, 2),
        "per_request_tok_per_s": round(
            sum(r["tok_per_s"] for r in results) / max(len(results), 1), 2),
        "p50_ttft_ms": round(ttfts[len(ttfts) // 2] * 1e3, 1) if ttfts else None,
        "p99_ttft_ms": round(ttfts[int(len(ttfts) * 0.99)] * 1e3, 1) if ttfts else None,
    }, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8000")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--shared-prefix", type=int, default=0,
                    help="prepend a common N-token prefix to every prompt "
                         "(prefix-caching scenario; pair with a server "
                         "started with --prefix-cache)")
    args = ap.parse_args()
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
