#!/usr/bin/env python
"""Isolate why spec-decode throughput differs 9x between prompt classes at
identical shapes (bench_spec: random 67 tok/s vs templated 612 at the same
round/dispatch counts). Times the raw jitted spec span with synthetic
histories — cyclic (high n-gram acceptance) vs i.i.d. random (the slow
class) — holding every shape, ctx, and block table constant. If the span
itself is value-dependent, the gap shows here; if not, the cost is in the
engine's host path (e.g. fragmented page reuse after truncate)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microvllm_tpu.config import CacheConfig, PRESETS
from microvllm_tpu.models import transformer as model_lib
from microvllm_tpu.models.speculative import spec_decode_span


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "qwen2.5-7b"
    cfg = PRESETS[model]
    B, pages, page_size, mpps = 4, 200, 64, 8
    steps, k, ngram = 4, 4, 2
    Lmax = page_size * mpps + steps * (k + 1)

    key = jax.random.PRNGKey(0)
    params = model_lib.init_params(cfg, key, quant_bits=4)
    kc, vc = model_lib.init_kv_cache(
        cfg, CacheConfig(num_pages=pages, page_size=page_size,
                         max_pages_per_seq=mpps))

    ctx = 192
    rng = np.random.default_rng(0)
    tables = np.arange(B * mpps, dtype=np.int32).reshape(B, mpps)

    span = jax.jit(spec_decode_span, static_argnames=(
        "cfg", "num_steps", "k", "ngram", "tp_axis", "tp_size"))

    def run(kind, kc, vc, n=8):
        if kind == "cyclic":
            cyc = rng.integers(1, cfg.vocab_size - 1, size=8)
            h = np.tile(cyc, Lmax // 8 + 1)[:Lmax]
            hist = np.tile(h, (B, 1)).astype(np.int32)
        else:
            hist = rng.integers(1, cfg.vocab_size - 1,
                                size=(B, Lmax)).astype(np.int32)
        hist_lens = np.full(B, ctx, np.int32)
        last = hist[np.arange(B), ctx - 1].astype(np.int32)
        ctx0 = np.full(B, ctx, np.int32)
        args = (jnp.asarray(last), jnp.asarray(hist),
                jnp.asarray(hist_lens), jnp.asarray(tables),
                jnp.asarray(ctx0))
        out = span(cfg, params, kc, vc, *args, num_steps=steps, k=k,
                   ngram=ngram)
        emitted = np.asarray(out[0])  # sync
        t0 = time.monotonic()
        for _ in range(n):
            out = span(cfg, params, kc, vc, *args, num_steps=steps, k=k,
                       ngram=ngram)
            np.asarray(out[0])
        dt = (time.monotonic() - t0) / n
        print(f"{kind:8s}: {dt*1e3:8.1f} ms/span  "
              f"(first emitted row: {emitted[0,0,:5]})", flush=True)
        return out[2], out[3]

    kc, vc = run("cyclic", kc, vc)
    kc, vc = run("random", kc, vc)
    kc, vc = run("cyclic", kc, vc)


if __name__ == "__main__":
    main()
