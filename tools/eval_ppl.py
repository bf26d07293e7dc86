#!/usr/bin/env python
"""Perplexity / quantization-fidelity harness.

Computes token perplexity of a model under fp16/INT8/INT4 weights and
reports the deltas (BASELINE target: <= 0.1 PPL delta vs fp16).

With a local HF snapshot + a text file this evaluates real perplexity; in
the zero-egress sandbox it falls back to random weights + random token
streams, where the *delta* between precisions still measures quantization
fidelity (identical inputs, identical weights, only the arithmetic differs).

Usage:
  python tools/eval_ppl.py --model qwen2.5-0.5b --seq-len 512 --batches 4
  python tools/eval_ppl.py --model /path/to/snapshot --text wiki.txt
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def batch_ppl(cfg, params, tokens: np.ndarray, batch_size: int = 1) -> float:
    """Mean token perplexity over [N, S] token batches."""
    from microvllm_tpu.models import transformer as T

    @jax.jit
    def nll(params, toks):
        logits = T.forward_logits(cfg, params, toks)          # [B, S, V]
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = toks[:, 1:]
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return -ll.mean()

    losses = []
    for i in range(0, len(tokens), batch_size):
        chunk = jnp.asarray(tokens[i:i + batch_size])
        losses.append(float(nll(params, chunk)))
    return float(np.exp(np.mean(losses)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-0.5b")
    ap.add_argument("--text", default=None, help="text file to evaluate")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--group-size", type=int, default=128)
    args = ap.parse_args()

    from microvllm_tpu.config import PRESETS
    from microvllm_tpu.models import transformer as T
    from microvllm_tpu.ops.quant import quantize_params

    tokenizer = None
    if args.model in PRESETS:
        cfg = PRESETS[args.model]
        params = T.init_params(cfg, jax.random.PRNGKey(0))
        print(f"[ppl] preset {args.model}: random weights "
              f"(deltas still measure quant fidelity)", file=sys.stderr)
    else:
        from microvllm_tpu.models.loader import load_params
        cfg, params = load_params(args.model)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            pass

    if args.text and tokenizer is not None:
        ids = tokenizer(open(args.text).read())["input_ids"]
        n = (len(ids) - 1) // args.seq_len
        tokens = np.asarray(ids[: n * args.seq_len]).reshape(n, args.seq_len)
        tokens = tokens[: args.batches]
    else:
        rng = np.random.default_rng(0)
        tokens = rng.integers(1, cfg.vocab_size - 1,
                              size=(args.batches, args.seq_len))
    tokens = tokens.astype(np.int32)

    results = {}
    results["fp"] = batch_ppl(cfg, params, tokens)
    for bits in (8, 4):
        qparams = quantize_params(params, bits, args.group_size)
        results[f"int{bits}"] = batch_ppl(cfg, qparams, tokens)

    out = {
        "model": args.model,
        "seq_len": args.seq_len,
        "tokens_evaluated": int(tokens.size),
        "ppl_fp": round(results["fp"], 4),
        "ppl_int8": round(results["int8"], 4),
        "ppl_int4": round(results["int4"], 4),
        "delta_int8": round(results["int8"] - results["fp"], 4),
        "delta_int4": round(results["int4"] - results["fp"], 4),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
