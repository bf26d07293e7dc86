"""Attribute the bench TTFT (p50 ~58 ms in BENCH_r04/r05 vs the 48-52 ms
claimed floor in RESULTS r4).

TTFT = one engine.generate(max_new_tokens=1) = host scheduling + ONE
prefill dispatch (256-token chunk) + readback. Decomposition measured
here on the same engine the bench builds:

  rtt      — device round-trip on a trivial jitted op (tunnel floor)
  prefill  — the jitted prefill fn alone, device-timed via chained
             readback (device prefill compute)
  e2e      — engine.generate(1 token) exactly as bench_ttft does

e2e - rtt - prefill = host-side scheduling/allocator/upload overhead.

Usage: python tools/probe_ttft_floor.py [--model qwen2.5-7b --bits 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--n", type=int, default=15)
    args = ap.parse_args()

    import bench
    eng = bench.build_engine(args.model, args.bits, batch=8, kv_pages=240,
                             page_size=64, max_pages_per_seq=40, span=128)

    from microvllm_tpu.runtime.sequence import SamplingParams

    # 1) tunnel RTT on a trivial op
    tiny = jax.jit(lambda x: x + 1)
    v = tiny(jnp.zeros((8,), jnp.int32))
    np.asarray(v)
    rtts = []
    for _ in range(args.n):
        t0 = time.monotonic()
        np.asarray(tiny(v)[0])
        rtts.append((time.monotonic() - t0) * 1e3)

    # 2) e2e generate (the bench's TTFT), warm
    samp = SamplingParams(temperature=0.0, max_new_tokens=1)
    prompt = list(np.random.randint(1, eng.mcfg.vocab_size - 1,
                                    size=args.context))
    eng.generate([prompt], sampling=samp)          # warm all shapes
    e2es = []
    for _ in range(args.n):
        p = list(np.random.randint(1, eng.mcfg.vocab_size - 1,
                                   size=args.context))
        t0 = time.monotonic()
        eng.generate([p], sampling=samp)
        e2es.append((time.monotonic() - t0) * 1e3)

    rtt = float(np.percentile(rtts, 50))
    e2e = float(np.percentile(e2es, 50))
    print(f"rtt p50: {rtt:.1f} ms (min {min(rtts):.1f}, "
          f"p90 {float(np.percentile(rtts, 90)):.1f})")
    print(f"e2e TTFT p50: {e2e:.1f} ms (min {min(e2es):.1f}, "
          f"p90 {float(np.percentile(e2es, 90)):.1f})")
    print(f"=> host+device beyond one RTT: {e2e - rtt:.1f} ms")


if __name__ == "__main__":
    main()
