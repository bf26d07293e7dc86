#!/usr/bin/env python
"""Compare host->device input strategies for the decode span on axon.

probe_dispatch_overhead.py showed the span's jitted dispatch is async
(~0.4 ms) and the cost centers are the BLOCKING transfers: each small
jnp.asarray put pays a full tunnel round-trip (~30 ms), and the [B, span]
token readback pays one more. This probe times one full span e2e
(inputs + dispatch + readback) under each input strategy:

  separate   3 x jnp.asarray(tokens/tables/ctx)         (current engine)
  tuple_put  jax.device_put((tokens, tables, ctx))       (one API call)
  combined   1 x jnp.asarray([tokens|ctx|tables]) + 3 device slices
  resident   0 puts: tokens = prev_out[:, -1], ctx += span on device,
             tables reused from a device cache (allocation lookahead)

Usage: timeout 900 python tools/probe_put_strategies.py --span 64
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
    ap.add_argument("--iters", type=int, default=5)
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
    mpps = eng.allocator.block_table_row(seq.seq_id).shape[0]
    samp = (eng._put_cached("temp", np.zeros(B, np.float32)),
            eng._put_cached("top_p", np.ones(B, np.float32)),
            eng._put_cached("top_k", np.full(B, 64, np.int32)))
    rng = eng._greedy_rng

    def host_inputs():
        eng.allocator.extend(seq.seq_id, span)
        tokens = np.array([seq.last_token_id], np.int32)
        context = np.array(
            [eng.allocator.seq_len(seq.seq_id) - span], np.int32)
        tables = eng.allocator.block_table_row(seq.seq_id)[None]
        return tokens, tables, context

    def run(dev):
        toks, _lp, eng.k_cache, eng.v_cache = eng._decode_fn(
            eng.params, eng.k_cache, eng.v_cache, *dev, *samp, rng, span)
        host = np.asarray(toks)
        for j in range(span):
            eng._apply_token(seq, int(host[0, j]))
        return toks

    results = {}

    def measure(name, one_iter):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            one_iter()
            ts.append(time.perf_counter() - t0)
        ms = np.array(ts) * 1e3
        results[name] = {"median_ms": float(np.median(ms)),
                         "min_ms": float(ms.min()),
                         "per_token_ms": float(np.median(ms)) / span}
        log(f"  {name:10s} {np.median(ms):8.1f} / {ms.min():8.1f} ms"
            f"  ({np.median(ms)/span:.2f} ms/tok)")

    # --- separate (current engine behavior) -------------------------------
    def it_separate():
        tokens, tables, context = host_inputs()
        run((jnp.asarray(tokens), jnp.asarray(tables), jnp.asarray(context)))
    measure("separate", it_separate)

    # --- single device_put of a tuple --------------------------------------
    def it_tuple():
        tokens, tables, context = host_inputs()
        dev = jax.device_put((tokens, tables, context))
        run(dev)
    measure("tuple_put", it_tuple)

    # --- one combined array + device slices --------------------------------
    def it_combined():
        tokens, tables, context = host_inputs()
        comb = np.concatenate(
            [tokens[:, None], context[:, None], tables], axis=1)
        d = jnp.asarray(comb)                     # ONE blocking transfer
        run((d[:, 0], d[:, 2:], d[:, 1]))         # async device slices
    measure("combined", it_combined)

    # --- fully device-resident ---------------------------------------------
    # Pre-extend far enough that the table is constant across iters, then
    # feed tokens/ctx from device state. One boot put, zero steady-state.
    eng.allocator.extend(seq.seq_id, span * (args.iters + 1))
    tables_dev = jnp.asarray(eng.allocator.block_table_row(seq.seq_id)[None])
    ctx_dev = jnp.asarray(
        np.array([eng.allocator.seq_len(seq.seq_id)
                  - span * (args.iters + 1)], np.int32))
    toks_dev = jnp.asarray(np.array([seq.last_token_id], np.int32))
    state = {"toks": toks_dev, "ctx": ctx_dev}

    def it_resident():
        out = run((state["toks"], tables_dev, state["ctx"]))
        state["toks"] = out[:, -1]
        state["ctx"] = state["ctx"] + span
    measure("resident", it_resident)

    # --- full engine step (scheduler + allocator + callbacks) ------------
    def it_step():
        eng.step()
    measure("eng_step", it_step)
    results["eng_step"]["per_token_ms"] = (
        results["eng_step"]["median_ms"] / span)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
