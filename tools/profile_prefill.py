#!/usr/bin/env python
"""Device-time attribution for the prefill step (r3 VERDICT #2).

Times the jitted single-chunk prefill at two layer counts (per-layer vs
fixed split, like tools/bench_step_breakdown.py does for decode), then
captures an xplane trace and aggregates 'XLA Ops' per kernel — answering
the standing roadmap question: where does a 256-/2048-token a8 prefill
spend its time (matmuls? attention? activation-quant glue?).

Rooflines for the printed summary (v5e): int8 MXU ~394 TOPS, bf16
~197 TFLOPS, HBM ~819 GB/s. A W4A8 prefill layer at S tokens costs
2*S*(K*(Q+2KV) + K*Q + 3*K*I) MACs on the int8 MXU with the same ~101 MB
weight DMA as decode (fully overlapped at S>=256).

  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      timeout 570 python tools/profile_prefill.py --context 256
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def time_prefill(mcfg, bits: int, batch: int, S: int,
                 page_size: int = 64, kv_pages: int | None = None
                 ) -> tuple[float, object]:
    """Median ms per single-chunk prefill; returns (ms, replay_fn).

    ``kv_pages``: total cache pages. Default: PRODUCTION-sized (240) — a
    tiny just-fits cache changes what is being measured: XLA memory-space
    assignment promotes a <= ~30 MB cache into VMEM inside the layer loop
    and pays a full demotion copy per layer (the r4 "copy-protection
    residue", 2 x ~45 us/layer, was THIS artifact — see RESULTS r5)."""
    from microvllm_tpu.config import CacheConfig
    from microvllm_tpu.models import transformer as model_lib

    max_pages = max(8, -(-(S + 1) // page_size))
    if kv_pages is None:
        # big enough that memory-space assignment cannot promote the cache
        # into VMEM (the artifact above), small enough that weights + two
        # caches + trace buffers fit 16 GB
        kv_pages = max(80, batch * max_pages + 8)
    ccfg = CacheConfig(num_pages=kv_pages, page_size=page_size,
                       max_pages_per_seq=max_pages)
    params = model_lib.init_params(mcfg, jax.random.PRNGKey(0),
                                   quant_bits=bits, quant_group_size=128)
    k_cache, v_cache = model_lib.init_kv_cache(mcfg, ccfg,
                                               dtype=mcfg.jax_dtype)
    B = batch
    tables = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        tables[i] = np.arange(i * max_pages, (i + 1) * max_pages)
    toks = np.ones((B, S), np.int32)
    chunk_lens = np.full(B, S, np.int32)
    hist = np.zeros(B, np.int32)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step(params, kc, vc):
        logits, kc, vc = model_lib.prefill_step(
            mcfg, params, kc, vc, jnp.asarray(toks), jnp.asarray(tables),
            jnp.asarray(chunk_lens), jnp.asarray(hist), has_history=False)
        return jnp.argmax(logits, -1), kc, vc

    t0 = time.monotonic()
    out, k_cache, v_cache = step(params, k_cache, v_cache)
    np.asarray(out)
    print(f"  L={mcfg.num_layers} S={S}: first call (compile) "
          f"{time.monotonic() - t0:.1f}s", file=sys.stderr)

    times = []
    state = {"k": k_cache, "v": v_cache}

    def once():
        t0 = time.monotonic()
        out, state["k"], state["v"] = step(params, state["k"], state["v"])
        np.asarray(out)
        return time.monotonic() - t0

    for _ in range(7):
        times.append(once())
    return float(np.median(times)) * 1e3, once


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--trace-dir", default="/tmp/mvt_trace_prefill")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    from microvllm_tpu.config import ModelConfig, PRESETS
    if args.model == "tiny":
        jax.config.update("jax_platforms", "cpu")
        mcfg = ModelConfig.tiny(dtype="float32")
    else:
        mcfg = PRESETS[args.model]
    L = mcfg.num_layers
    S, B = args.context, args.batch

    t_full, replay = time_prefill(mcfg, args.bits, B, S)
    half = dataclasses.replace(mcfg, num_layers=L // 2)
    t_half, _ = time_prefill(half, args.bits, B, S)
    per_layer = (t_full - t_half) / (L - L // 2)
    fixed = t_full - L * per_layer

    # rooflines
    K, Q, KV, I = (mcfg.hidden_size, mcfg.q_dim, mcfg.kv_dim,
                   mcfg.intermediate_size)
    macs_layer = B * S * (K * (Q + 2 * KV) + K * Q + 3 * K * I)
    int8_us = 2 * macs_layer / 394e12 * 1e6
    bf16_us = 2 * macs_layer / 197e12 * 1e6
    dma_us = (K * (Q + 2 * KV) + K * Q + 3 * K * I) / 2 / 819e9 * 1e6
    print(f"prefill S={S} B={B}: total {t_full:.1f} ms; per-layer "
          f"{per_layer * 1e3:.0f} us (int8-MXU roofline {int8_us:.0f}, "
          f"bf16 {bf16_us:.0f}, weight-DMA {dma_us:.0f}); fixed "
          f"{fixed:.1f} ms", file=sys.stderr)

    import json
    print(json.dumps({
        "probe": "prefill_attribution", "S": S, "batch": B,
        "total_ms": round(t_full, 2),
        "per_layer_us": round(per_layer * 1e3, 1),
        "fixed_ms": round(fixed, 2),
        "roofline_us": {"int8_mxu": round(int8_us, 1),
                        "bf16_mxu": round(bf16_us, 1),
                        "weight_dma": round(dma_us, 1)},
        "pct_of_int8_roofline": round(100 * int8_us / (per_layer * 1e3), 1),
    }))

    if not args.no_trace:
        from profile_decode import aggregate
        with jax.profiler.trace(args.trace_dir):
            replay()
        aggregate(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
