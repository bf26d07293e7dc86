#!/usr/bin/env python
"""Attribute the spec-decode host-path gap between prompt classes.

probe_spec_values.py showed the raw device span is value-independent
(~54 ms both classes), yet bench_spec measures 67 tok/s (random) vs 612
(templated) at identical dispatch counts. This wraps the engine internals
with timers during a real generate to find where the host time goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_engine
from tools.bench_spec import make_prompts


def main():
    eng = build_engine("qwen2.5-7b", 4, batch=4, kv_pages=200, page_size=64,
                       max_pages_per_seq=8, span=8, kv_bits=16,
                       spec_k=4, spec_steps=4)
    from microvllm_tpu.runtime.sequence import SamplingParams

    acc = {}

    def wrap(obj, name):
        fn = getattr(obj, name)
        def inner(*a, **kw):
            t0 = time.monotonic()
            r = fn(*a, **kw)
            acc[name] = acc.get(name, 0.0) + (time.monotonic() - t0)
            acc[name + "_n"] = acc.get(name + "_n", 0) + 1
            return r
        setattr(obj, name, inner)

    wrap(eng, "_call_spec")
    wrap(eng, "_spec_decode")
    wrap(eng, "step")

    rng = np.random.default_rng(0)
    vocab = eng.mcfg.vocab_size
    for kind in ("templated", "random", "templated"):
        prompts = make_prompts(kind, 4, 192, vocab, rng)
        sp = SamplingParams(temperature=0.0, max_new_tokens=96,
                            ignore_eos=True)
        eng.generate(prompts, sampling=sp)   # warm shapes
        acc.clear()
        t0 = time.monotonic()
        seqs = eng.generate(prompts, sampling=sp)
        dt = time.monotonic() - t0
        toks = sum(len(s.output_token_ids) for s in seqs)
        print(f"{kind:10s}: {toks/dt:7.1f} tok/s total {dt:6.2f}s | "
              + " ".join(f"{k}={v:.2f}s/{acc[k + '_n']}x"
                         for k, v in sorted(acc.items())
                         if not k.endswith("_n")), flush=True)


if __name__ == "__main__":
    main()
