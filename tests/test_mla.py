"""Multi-head Latent Attention (deepseek_v2) engine behavior.

HF-exactness (logits + paged greedy) is anchored in
test_hf_differential.py::[deepseek_v2]; here: engine invariants on the
latent paged cache — determinism, batch-size independence, int8-KV latent
quantization, speculative decoding through the MLA verify path, quantized
expert stacks, and the unsupported-combination guards.
"""

import dataclasses

import jax
import numpy as np
import pytest

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  ParallelConfig, QuantConfig,
                                  SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def _mla_cfg(**over):
    base = dict(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        dense_intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=1, head_dim=24, kv_lora_rank=32, q_lora_rank=None,
        qk_rope_head_dim=8, v_head_dim=16, num_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        moe_renorm=False, routed_scaling_factor=1.5, dtype="float32",
        qkv_bias=False, tie_word_embeddings=False,
        model_type="deepseek_v2")
    base.update(over)
    return ModelConfig(**base)


def _engine(mcfg=None, **over):
    cfg = EngineConfig(
        model=mcfg or _mla_cfg(),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128, default_max_new_tokens=6, **over)
    return InferenceEngine(cfg)


def test_mla_cache_is_latent_sized():
    """The paged cache stores the [c | k_pe] latent: 1 kv head of
    kv_lora_rank + qk_rope_head_dim (lane-padded), NOT heads*head_dim."""
    eng = _engine()
    L, P, KV, ps, D = eng.k_cache.shape
    assert KV == 1
    assert D == 128            # 32 + 8 padded up to the 128 lane width
    # a same-geometry MHA layout would need 2 * 4 heads * 24 dims


def test_mla_engine_greedy_deterministic_and_batch_invariant():
    eng = _engine()
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6]]
    a = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    b = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert a == b
    singles = [eng.generate([p], sampling=sp)[0].output_token_ids
               for p in prompts]
    assert a == singles
    assert eng.cache_stats.used_pages == 0


def test_mla_int8_kv_latent_matches_bf16():
    """INT8 quantization of the latent cache keeps greedy outputs exact
    on the tiny model (per-token scales over the [c | k_pe] row)."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    ref = _engine().generate(prompts, sampling=sp)
    eng = _engine(quant=QuantConfig(kv_bits=8))
    assert eng.k_scales is not None
    got = eng.generate(prompts, sampling=sp)
    assert [s.output_token_ids for s in got] == \
        [s.output_token_ids for s in ref]


def test_mla_speculative_matches_plain():
    """n-gram speculation verifies through the MLA prefill path
    (slot-exact latent store): greedy outputs unchanged."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=16)
    prompts = [[1, 2, 3, 4, 5], [4, 4, 4, 4]]
    ref = [s.output_token_ids
           for s in _engine().generate(prompts, sampling=sp)]
    eng = _engine(spec_k=3, spec_steps=2, spec_adaptive=False)
    got = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert got == ref
    assert eng.metrics.spec_rounds > 0
    assert eng.cache_stats.used_pages == 0


def test_mla_quantized_experts_run():
    """weight_bits=4 quantizes the routed expert stacks (expert-major
    [E*L_moe]); the engine stays deterministic."""
    eng = _engine(quant=QuantConfig(weight_bits=4, weight_group_size=32))
    assert "w_gate_up_e" in eng.params["layers"]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    a = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    b = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert a == b


def test_mla_tensor_parallel_matches_single_device():
    """MLA under TPxDP: head-sharded q/kv_b/o projections over a
    REPLICATED latent cache, shared-expert + dense-prefix MLPs
    intermediate-sharded, routed experts expert-parallel (E % tp == 0) —
    greedy outputs match the single-rank engine."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]

    def run(parallel):
        eng = _engine(parallel=parallel or ParallelConfig())
        return [s.output_token_ids
                for s in eng.generate(prompts, sampling=sp)]

    ref = run(None)
    got = run(ParallelConfig(tp_size=2, dp_size=2))
    assert got == ref


def test_mla_rejects_lora():
    from microvllm_tpu.config import LoRAConfig
    with pytest.raises(NotImplementedError, match="LoRA"):
        _engine(lora=LoRAConfig(rank=4, max_adapters=2))


def test_interleaved_rope_matches_complex_oracle():
    """apply_rope_interleaved == HF's view_as_complex rotation."""
    import jax.numpy as jnp

    from microvllm_tpu.ops.rope import apply_rope_interleaved, rope_cos_sin

    B, H, D = 2, 3, 8
    x = np.random.default_rng(0).normal(size=(B, H, D)).astype(np.float32)
    pos = np.array([5, 11], np.int32)
    cos, sin = rope_cos_sin(jnp.asarray(pos), D, 10000.0)
    got = np.asarray(apply_rope_interleaved(jnp.asarray(x), cos, sin))

    half = D // 2
    inv = 1.0 / (10000.0 ** (np.arange(half) / half))
    ang = pos[:, None].astype(np.float64) * inv[None, :]       # [B, half]
    z = x[..., 0::2] + 1j * x[..., 1::2]                       # pairs
    rot = z * np.exp(1j * ang)[:, None, :]
    ref = np.empty_like(x)
    ref[..., 0::2] = rot.real
    ref[..., 1::2] = rot.imag
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_mla_quantized_under_tp_bounded_drift():
    """Quantized deepseek under TP (EP experts + row-parallel quantized
    wo): outputs are NOT asserted bit-equal to single-rank — the f32
    partial sums cross the psum in a different association order than the
    single-kernel accumulation, so near-ties on this random-weight tiny
    model can flip (same caveat class as adaptive spec under TP,
    models/speculative.py). Pinned contract: the engine runs, emits
    full-length outputs, and the chosen-token logprob drift vs
    single-rank stays small (<< any real model's logit margins)."""
    import numpy as np
    q = QuantConfig(weight_bits=4, weight_group_size=32)
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, logprobs=1)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]

    def run(parallel):
        eng = _engine(quant=q, logprobs_k=1,
                      parallel=parallel or ParallelConfig())
        return eng.generate(prompts, sampling=sp)

    ref = run(None)
    got = run(ParallelConfig(tp_size=2))
    for r, g in zip(ref, got):
        assert len(g.output_token_ids) == len(r.output_token_ids) == 5
        lr = [t["logprob"] for t in r.logprobs]
        lg = [t["logprob"] for t in g.logprobs]
        assert np.max(np.abs(np.asarray(lr) - np.asarray(lg))) < 0.1


def test_mla_fused_moe_dispatch_matches_fallback(monkeypatch):
    """The one-launch fused MoE dispatch (routed experts + shared experts
    via extra_fn + routed_scaling in the routing weights) is greedy-exact
    vs the per-expert fallback path (MVT_FUSED_MOE=0)."""
    q = QuantConfig(weight_bits=4, weight_group_size=32)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6]]
    monkeypatch.setenv("MVT_FUSED_MOE", "0")
    ref = [s.output_token_ids
           for s in _engine(quant=q).generate(prompts, sampling=sp)]
    monkeypatch.setenv("MVT_FUSED_MOE", "1")
    got = [s.output_token_ids
           for s in _engine(quant=q).generate(prompts, sampling=sp)]
    assert got == ref
