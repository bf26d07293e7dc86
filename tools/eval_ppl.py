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


def logits_fidelity(cfg, params, qparams, tokens: np.ndarray,
                    k: int = 8) -> dict:
    """Logit-level quantization-fidelity differential on IDENTICAL inputs:

    * kl      — mean KL(fp || quant) per token position, nats (how much
                probability mass the quantized model redistributes);
    * topk    — mean |top-k(fp) ∩ top-k(quant)| / k (whether the tokens a
                sampler would consider survive quantization);
    * top1    — greedy-agreement fraction (the decode-visible signal).

    A leading indicator for the ≤0.1-PPL BASELINE target while real
    checkpoints are unavailable: KL bounds the PPL delta from above
    (delta log-PPL = E[KL] + E[log-prob shift of the true token]).
    """
    from microvllm_tpu.models import transformer as T

    @jax.jit
    def logp_of(params, toks):
        return jax.nn.log_softmax(
            T.forward_logits(cfg, params, toks).astype(jnp.float32),
            axis=-1)

    kls, overlaps, top1s = [], [], []
    for i in range(len(tokens)):
        toks = jnp.asarray(tokens[i:i + 1])
        lp_f = logp_of(params, toks)[0]                  # [S, V]
        lp_q = logp_of(qparams, toks)[0]
        kl = jnp.sum(jnp.exp(lp_f) * (lp_f - lp_q), axis=-1)
        kls.append(float(kl.mean()))
        tf = jax.lax.top_k(lp_f, k)[1]                   # [S, k]
        tq = jax.lax.top_k(lp_q, k)[1]
        inter = (tf[:, :, None] == tq[:, None, :]).any(-1).mean()
        overlaps.append(float(inter))
        top1s.append(float((tf[:, 0] == tq[:, 0]).mean()))
    return {"kl": float(np.mean(kls)),
            "topk_overlap": float(np.mean(overlaps)),
            "top1_agree": float(np.mean(top1s))}


# The four quantization-sensitive architecture features (VERDICT r4 #7):
# sparse routing (a flipped expert changes the whole FFN), the MLA shared
# latent (one tensor feeds every head), logit softcaps (tanh compresses
# the logit scale quantization noise rides on), and QK-norm (per-head
# renormalization amplifies small weight shifts). Small geometries with
# the feature ON — same code paths as the full presets, CPU-runnable.
FIDELITY_FAMILIES = {
    "dense (qwen2-class)": dict(),
    "moe-routing (olmoe-class)": dict(
        num_experts=8, num_experts_per_tok=2, tie_word_embeddings=False,
        qkv_bias=False),
    "qk-norm (qwen3-class)": dict(qk_norm=True, qkv_bias=False),
    "softcap (gemma2-class)": dict(attn_logit_softcap=50.0,
                                   final_logit_softcap=30.0,
                                   post_norms=True,
                                   hidden_act="gelu_tanh"),
}


def _mla_fidelity_cfg():
    from microvllm_tpu.config import ModelConfig
    return ModelConfig(
        vocab_size=8192, hidden_size=512, intermediate_size=1024,
        dense_intermediate_size=1024, num_layers=8, num_heads=8,
        num_kv_heads=1, head_dim=96, kv_lora_rank=256, q_lora_rank=None,
        qk_rope_head_dim=32, v_head_dim=64, num_experts=8,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        moe_renorm=False, routed_scaling_factor=1.5, dtype="float32",
        qkv_bias=False, tie_word_embeddings=False, model_type="deepseek_v2")


def run_fidelity(seq_len: int, batches: int, group_size: int) -> None:
    from microvllm_tpu.config import ModelConfig
    from microvllm_tpu.models import transformer as T
    from microvllm_tpu.ops.quant import quantize_params

    rows = []
    # hidden 512 / 8 layers / vocab 8k: large enough that per-group int4
    # noise is representative (at hidden 128 the near-uniform random-weight
    # logit margins make every family look catastrophic), small enough for
    # CPU. The table's signal is the PER-FAMILY ORDERING and the int8
    # margin, not absolute PPL (random weights).
    cases = [(name, ModelConfig.tiny(
        num_heads=8, num_kv_heads=4, head_dim=64, hidden_size=512,
        intermediate_size=1024, num_layers=8, vocab_size=8192, **over))
        for name, over in FIDELITY_FAMILIES.items()]
    cases.append(("mla-latent (deepseek-class)", _mla_fidelity_cfg()))
    for name, cfg in cases:
        params = T.init_params(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        tokens = rng.integers(1, cfg.vocab_size - 1,
                              size=(batches, seq_len)).astype(np.int32)
        row = {"family": name}
        row["ppl_fp"] = batch_ppl(cfg, params, tokens)
        for bits in (8, 4):
            q = quantize_params(params, bits, group_size)
            fid = logits_fidelity(cfg, params, q, tokens)
            row[f"ppl_delta_int{bits}"] = round(
                batch_ppl(cfg, q, tokens) - row["ppl_fp"], 4)
            row[f"kl_int{bits}"] = round(fid["kl"], 5)
            row[f"top8_int{bits}"] = round(fid["topk_overlap"], 4)
            row[f"top1_int{bits}"] = round(fid["top1_agree"], 4)
        row["ppl_fp"] = round(row["ppl_fp"], 2)
        rows.append(row)
        print(json.dumps(row))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-0.5b")
    ap.add_argument("--text", default=None, help="text file to evaluate")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--fidelity", action="store_true",
                    help="per-family KL/top-k quantization differential "
                         "(small geometries, CPU-runnable)")
    args = ap.parse_args()

    if args.fidelity:
        run_fidelity(args.seq_len, args.batches, args.group_size)
        return

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
