#!/usr/bin/env python
"""Attribute per-span host+tunnel overhead on the axon TPU.

The r2 xplane trace puts the 7B INT4 device step at ~5.5-5.7 ms/token while
bench.py measures ~7.0 e2e at span 64 — an ~85-95 ms gap per span against
~2 visible round-trips (~28 ms each). This probe times each host-side phase
of one engine decode span to find where the rest goes:

  put_small   7 small jnp.asarray device_puts (tokens/tables/ctx/temp/...)
  rng_split   jax.random.split (a separate tiny device dispatch per span)
  dispatch    the jitted span call itself (axon executes synchronously)
  readback    np.asarray of the [B, span] token output

Usage: timeout 550 python tools/probe_dispatch_overhead.py --span 64
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--span", type=int, default=64)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import build_engine
    from microvllm_tpu.runtime.sequence import SamplingParams

    eng = build_engine(args.model, args.bits, 1, 200, 64, 32, args.span)
    sp = SamplingParams(temperature=0.0, max_new_tokens=1 << 30,
                        ignore_eos=True)
    eng.add_request(prompt_token_ids=list(
        np.random.randint(1, eng.mcfg.vocab_size - 1, size=args.context)),
        sampling=sp)
    while eng.scheduler.prefilling or eng.scheduler.waiting:
        eng.step()
    for _ in range(2):
        eng.step()    # warm the decode span shape

    seq = eng.scheduler.running[0]
    span = args.span
    B = 1
    phases = {k: [] for k in ("put_small", "rng_split", "dispatch",
                              "readback", "host_apply", "e2e")}

    for it in range(args.iters):
        t_all = time.perf_counter()
        eng.allocator.extend(seq.seq_id, span)

        tokens = np.array([seq.last_token_id], np.int32)
        context = np.array(
            [eng.allocator.seq_len(seq.seq_id) - span], np.int32)
        tables = eng.allocator.block_table_row(seq.seq_id)[None]
        temp = np.zeros(B, np.float32)
        top_p = np.ones(B, np.float32)
        top_ks = np.full(B, 64, np.int32)

        t0 = time.perf_counter()
        dev = [jnp.asarray(x) for x in
               (tokens, tables, context, temp, top_p, top_ks)]
        for d in dev:
            d.block_until_ready()
        t1 = time.perf_counter()
        rng = eng._step_rng()
        rng.block_until_ready()
        t2 = time.perf_counter()
        out = eng._decode_fn(eng.params, eng.k_cache, eng.v_cache, *dev,
                             rng, span)
        toks, _lp, eng.k_cache, eng.v_cache = out
        t3 = time.perf_counter()
        host_toks = np.asarray(toks)
        t4 = time.perf_counter()
        for j in range(span):
            eng._apply_token(seq, int(host_toks[0, j]))
        t5 = time.perf_counter()

        phases["put_small"].append(t1 - t0)
        phases["rng_split"].append(t2 - t1)
        phases["dispatch"].append(t3 - t2)
        phases["readback"].append(t4 - t3)
        phases["host_apply"].append(t5 - t4)
        phases["e2e"].append(t5 - t_all)

    log(f"\nspan {span}, {args.iters} iters (ms; median / min):")
    for k, v in phases.items():
        ms = np.array(v) * 1e3
        log(f"  {k:11s} {np.median(ms):8.1f} / {ms.min():8.1f}")
    med = {k: float(np.median(np.array(v) * 1e3)) for k, v in phases.items()}
    med["per_token_e2e"] = med["e2e"] / span
    import json
    print(json.dumps(med))


if __name__ == "__main__":
    main()
