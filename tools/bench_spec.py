#!/usr/bin/env python
"""Speculative-decoding acceptance sweep over a structured prompt set.

r2's "up to 2x" spec number was a 100%-acceptance upper bound on degenerate
cyclic output. This bench measures tok/s at *observed* acceptance across
prompt classes with different n-gram repetitiveness (new capability — the
reference has no speculation):

* ``random``     — i.i.d. token ids: worst case for n-gram lookup.
* ``templated``  — code-like records: a shuffled field pattern repeated with
                   varying values (think JSON/log lines), the realistic
                   mid-acceptance regime n-gram speculation targets.
* ``cyclic``     — short literal loop: the upper-bound regime.

Acceptance here depends on the model's greedy continuation (random weights),
so acceptance is MEASURED per class and reported next to tok/s — the number
pairs are the deliverable, not a fixed target.

Usage (TPU):  python tools/bench_spec.py --model qwen2.5-7b --bits 4
CPU smoke:    python tools/bench_spec.py --model tiny --platform cpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_prompts(kind: str, n: int, length: int, vocab: int,
                 rng: np.random.Generator) -> list[list[int]]:
    out = []
    for _ in range(n):
        if kind == "random":
            ids = rng.integers(1, vocab - 1, size=length)
        elif kind == "templated":
            # repeated "record": fixed 6-token field skeleton with 2
            # varying value slots — high bigram repetition, not a cycle
            skel = rng.integers(1, vocab - 1, size=6)
            recs = []
            while sum(len(r) for r in recs) < length:
                vals = rng.integers(1, vocab - 1, size=2)
                recs.append(np.concatenate([skel[:3], vals[:1],
                                            skel[3:], vals[1:]]))
            ids = np.concatenate(recs)[:length]
        elif kind == "cyclic":
            cycle = rng.integers(1, vocab - 1, size=8)
            reps = length // len(cycle) + 1
            ids = np.tile(cycle, reps)[:length]
        else:
            raise ValueError(kind)
        out.append([int(x) for x in ids])
    return out


def run(eng, prompts, max_tokens: int):
    from microvllm_tpu.runtime.sequence import SamplingParams
    sp = SamplingParams(temperature=0.0, max_new_tokens=max_tokens,
                        ignore_eos=True)
    m = eng.metrics
    r0, a0 = m.spec_rounds, m.spec_drafts_accepted
    d0 = m.spec_disengagements
    t0 = time.monotonic()
    seqs = eng.generate(prompts, sampling=sp)
    dt = time.monotonic() - t0
    toks = sum(len(s.output_token_ids) for s in seqs)
    rounds = m.spec_rounds - r0
    accepted = m.spec_drafts_accepted - a0
    k = max(eng.config.spec_k, 1)
    acceptance = accepted / max(rounds * k, 1)
    return {"toks_per_s": round(toks / dt, 1),
            "tokens": toks,
            "spec_rounds": rounds,
            "acceptance": round(acceptance, 3),
            "disengagements": m.spec_disengagements - d0}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--kv-bits", type=int, default=16)
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--spec-steps", type=int, default=4)
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--context", type=int, default=192)
    ap.add_argument("--max-tokens", type=int, default=96)
    ap.add_argument("--kv-pages", type=int, default=200)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--max-pages-per-seq", type=int, default=8)
    ap.add_argument("--kinds", default="random,templated,cyclic",
                    help="comma-separated prompt classes, run in order")
    ap.add_argument("--spec-only", action="store_true",
                    help="skip the spec_k=0 baseline engine")
    ap.add_argument("--adaptive", default="on", choices=["on", "off"],
                    help="adaptive acceptance-floor disengagement "
                         "(engine default on; 'off' reproduces the r3 "
                         "always-speculate rows)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import build_engine

    rng = np.random.default_rng(0)
    results = {}
    for spec in ((args.spec_k,) if args.spec_only else (0, args.spec_k)):
        eng = build_engine(args.model, args.bits, batch=args.prompts,
                           kv_pages=args.kv_pages, page_size=args.page_size,
                           max_pages_per_seq=args.max_pages_per_seq,
                           span=8, kv_bits=args.kv_bits,
                           spec_k=spec, spec_steps=args.spec_steps,
                           spec_adaptive=args.adaptive == "on")
        # Warm ALL decode-bucket shapes (incl. the bucket-1 spec span).
        # Without this, the first ramp-down straggler — which only exists
        # when acceptance < 1.0 breaks batch lockstep — pays a remote
        # compile / cache load mid-measurement and craters the class's
        # tok/s (observed: 642 -> 75 tok/s at acceptance 0.953).
        eng.warmup()
        vocab = eng.mcfg.vocab_size
        for kind in args.kinds.split(","):
            prompts = make_prompts(kind, args.prompts, args.context, vocab,
                                   rng)
            # warm the shapes once, measure on the second run
            run(eng, prompts, max_tokens=8)
            # fresh adaptive state per class: a cooldown earned on the
            # previous class (or the warm run) must not suppress this
            # class's measurement — each row shows the class's own
            # engage/disengage behavior
            eng._spec_cooldown = 0
            eng._spec_accept_num = eng._spec_accept_den = 0
            r = run(eng, prompts, args.max_tokens)
            results[f"{kind}_spec{spec}"] = r
            print(f"{kind:10s} spec_k={spec}: {r}", file=sys.stderr,
                  flush=True)
        del eng

    print(json.dumps({"metric": "spec_acceptance_sweep",
                      "model": args.model, "bits": args.bits,
                      "spec_k": args.spec_k, "results": results}))


if __name__ == "__main__":
    main()
