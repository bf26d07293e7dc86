#!/usr/bin/env python
"""Sweep the a8 lm_head kernel's N-tile width on the real TPU.

The lm_head (final-norm-fused a8 kernel, 1-layer stack view) measured
443 us at block_n=2048 in r2 — 75% of its 333 us HBM roofline. Bigger
tiles amortize per-grid-step overhead; bounded by VMEM (weight block =
block_k x block_n x 0.5 B int4, double-buffered).

Usage: timeout 1800 python tools/sweep_lm_head.py [--m 1 8] [--n 152064]
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
    ap.add_argument("--m", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--n", type=int, default=152064)
    ap.add_argument("--k", type=int, default=3584)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[1024, 2048, 4096, 8448])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=32)
    args = ap.parse_args()

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from microvllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_stacked_a8_fused)
    from microvllm_tpu.ops.quant import quantize

    K, N, gs = args.k, args.n, 128
    qt = quantize(jax.random.normal(jax.random.PRNGKey(0), (K, N),
                                    jnp.float32) * 0.02, args.bits, gs)
    q, st = qt.q[None], qt.scales_tiled[None]
    nw = jnp.ones((K,), jnp.float32)
    bytes_w = K * N * (0.5 if args.bits == 4 else 1.0)
    log(f"K={K} N={N} int{args.bits}: roofline "
        f"{bytes_w / 819e9 * 1e3:.3f} ms @ 819 GB/s")

    results = {}
    for M in args.m:
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
        for bn in args.blocks:
            if N % bn and bn > N:
                continue

            def call(xx, qq, ss):
                # weights as ARGUMENTS, not closures: closed-over arrays
                # would be baked into the HLO as constants and blow the
                # remote-compile request size limit
                return quant_matmul_stacked_a8_fused(
                    xx, nw, qq, ss, jnp.int32(0), group_size=gs,
                    bits=args.bits, block_k=qt.block_k, block_n=bn,
                    has_norm=True, eps=1e-6, out_dtype=jnp.bfloat16)

            try:
                jitted = jax.jit(call)
                y = jitted(x, q, st)
                np.asarray(y[0, :8])  # force compile + one exec
            except Exception as e:
                log(f"  M={M} block_n={bn}: FAILED ({type(e).__name__}: "
                    f"{str(e)[:120]})")
                continue
            # time: chain inner calls via data dependence on x (output
            # feeds a cheap reduction folded into the next input)
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                out = None
                for _ in range(args.inner):
                    out = jitted(x, q, st)
                np.asarray(out[0, 0])
                ts.append((time.perf_counter() - t0) / args.inner)
            ms = float(np.median(ts) * 1e3)
            results[(M, bn)] = ms
            log(f"  M={M} block_n={bn}: {ms:.3f} ms "
                f"({bytes_w / 819e9 * 1e3 / ms * 100:.0f}% roofline)")

    import json
    print(json.dumps({f"M{m}_bn{bn}": v for (m, bn), v in results.items()}))


if __name__ == "__main__":
    main()
