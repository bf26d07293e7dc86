#!/usr/bin/env python
"""Attribute decode-step time: per-layer cost vs fixed overhead.

Times the jitted decode span for the same model geometry at two layer
counts (L and L/2) and solves

    t(L)  = fixed + L * per_layer
    t(L/2) = fixed + L/2 * per_layer

so the residual ``fixed`` (embedding + lm_head + sampling + on-device token
feedback + launch tax that doesn't scale with depth) is separated from the
per-layer pipeline. Companion to tools/bench_kernels.py, which times the
kernels in isolation; this tool explains the e2e-vs-kernel-sum gap
(RESULTS.md).

  python tools/bench_step_breakdown.py [--model qwen2.5-7b] [--bits 4]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def time_span(mcfg, bits: int, batch: int, span: int, context: int,
              page_size: int = 64, max_pages: int | None = None) -> float:
    """Median ms per decode span for one jitted program."""
    from microvllm_tpu.config import CacheConfig
    from microvllm_tpu.models import transformer as model_lib
    from microvllm_tpu.ops.quant import quantize_params  # noqa: F401

    if max_pages is None:
        max_pages = max(8, -(-(context + span + 1) // page_size))
    ccfg = CacheConfig(num_pages=batch * max_pages + 8, page_size=page_size,
                      max_pages_per_seq=max_pages)
    params = model_lib.init_params(mcfg, jax.random.PRNGKey(0),
                                   quant_bits=bits, quant_group_size=128)
    k_cache, v_cache = model_lib.init_kv_cache(mcfg, ccfg, dtype=mcfg.jax_dtype)

    B = batch
    tables = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        tables[i] = np.arange(i * max_pages, (i + 1) * max_pages)
    ctx = np.full(B, context, np.int32)
    toks = np.ones(B, np.int32)
    temp = np.zeros(B, np.float32)    # greedy, matching bench.py (the
    f = np.ones(B, np.float32)        # sampler's all-greedy fast path)
    k64 = np.full(B, 64, np.int32)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(params, kc, vc, rng):
        out, _, kc, vc = model_lib.decode_span(
            mcfg, params, kc, vc, jnp.asarray(toks), jnp.asarray(tables),
            jnp.asarray(ctx), jnp.asarray(temp), jnp.asarray(f), rng, span,
            top_ks=jnp.asarray(k64))
        return out, kc, vc

    rng = jax.random.PRNGKey(1)
    t0 = time.monotonic()
    out, k_cache, v_cache = step(params, k_cache, v_cache, rng)
    np.asarray(out)
    print(f"  L={mcfg.num_layers}: first call (compile) "
          f"{time.monotonic()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(7):
        t0 = time.monotonic()
        out, k_cache, v_cache = step(params, k_cache, v_cache, rng)
        np.asarray(out)          # sync via readback (block_until_ready is
        times.append(time.monotonic() - t0)   # unreliable on axon)
    return float(np.median(times)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--span", type=int, default=32)
    ap.add_argument("--context", type=int, default=256)
    args = ap.parse_args()

    from microvllm_tpu.config import ModelConfig, PRESETS
    if args.model == "tiny":      # CPU smoke test
        jax.config.update("jax_platforms", "cpu")
        mcfg = ModelConfig.tiny(dtype="float32")
    else:
        mcfg = PRESETS[args.model]
    L = mcfg.num_layers
    half = dataclasses.replace(mcfg, num_layers=L // 2)

    print(f"timing {args.model} int{args.bits} B={args.batch} "
          f"span={args.span}", file=sys.stderr)
    t_full = time_span(mcfg, args.bits, args.batch, args.span, args.context)
    t_half = time_span(half, args.bits, args.batch, args.span, args.context)

    per_layer_span = (t_full - t_half) / (L - L // 2)
    fixed_span = t_full - L * per_layer_span
    print(f"span({args.span}) ms: L={L}: {t_full:.2f}  "
          f"L={L//2}: {t_half:.2f}", file=sys.stderr)
    print(f"per-token: per-layer {per_layer_span/args.span*1e3:.1f} us x {L} "
          f"= {L*per_layer_span/args.span:.2f} ms, "
          f"fixed (embed+lm_head+sample+feedback) "
          f"{fixed_span/args.span:.2f} ms, "
          f"total {t_full/args.span:.2f} ms", file=sys.stderr)
    import json
    print(json.dumps({
        "per_layer_us_per_token": round(per_layer_span / args.span * 1e3, 1),
        "fixed_ms_per_token": round(fixed_span / args.span, 3),
        "total_ms_per_token": round(t_full / args.span, 3),
    }))


if __name__ == "__main__":
    main()
