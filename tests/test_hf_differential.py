"""Differential correctness vs HuggingFace transformers.

The reference inherits model correctness from HF (`core/model_loader.py:6-47`
loads `AutoModelForCausalLM`); this framework re-implements the decoder from
scratch, so an independent anchor is required (VERDICT r1 missing #1): build
a tiny random HF checkpoint, load it through `models/loader.py`, and assert
logits match the HF implementation within fp32 tolerance. Catches RoPE
convention, bias layout, GQA head-ordering, and norm-placement divergence
that self-referential tests cannot.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
from microvllm_tpu.models import transformer as T
from microvllm_tpu.models.loader import load_params


def _build_hf(family: str):
    torch.manual_seed(0)
    if family == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM
        cfg = Qwen2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            max_position_embeddings=512, tie_word_embeddings=False)
        return Qwen2ForCausalLM(cfg)
    if family == "qwen3":
        # qk-norm: RMSNorm on each q/k head before RoPE
        from transformers import Qwen3Config, Qwen3ForCausalLM
        cfg = Qwen3Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, rope_theta=10000.0, rms_norm_eps=1e-6,
            max_position_embeddings=512, tie_word_embeddings=False,
            attn_implementation="eager")
        return Qwen3ForCausalLM(cfg)
    if family == "mistral":
        # sliding_window=4 on a longer-than-4 prompt: the window mask bites,
        # anchoring our SWA convention against HF's
        from transformers import MistralConfig, MistralForCausalLM
        cfg = MistralConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            max_position_embeddings=512, tie_word_embeddings=False,
            sliding_window=4, attn_implementation="eager")
        return MistralForCausalLM(cfg)
    if family == "gemma2":
        # sandwich norms, (1+w) RMSNorm, GeGLU, softcaps, embed scaling,
        # ALTERNATING sliding/global attention (layer 0 sliding w=4 bites
        # on a 9-token prompt; layer 1 global)
        from transformers import Gemma2Config, Gemma2ForCausalLM
        cfg = Gemma2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            sliding_window=4, rope_theta=10000.0, rms_norm_eps=1e-6,
            hidden_activation="gelu_pytorch_tanh",
            max_position_embeddings=512, tie_word_embeddings=True,
            attn_implementation="eager")
        return Gemma2ForCausalLM(cfg)
    if family == "olmoe":
        # MoE with full-width QK-norm (RMSNorm over the flat q/k
        # projections pre-RoPE) and norm_topk_prob=False (the selected
        # routing weights are NOT renormalized)
        from transformers import OlmoeConfig, OlmoeForCausalLM
        cfg = OlmoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            max_position_embeddings=512, tie_word_embeddings=False,
            attn_implementation="eager")
        return OlmoeForCausalLM(cfg)
    if family == "phi3":
        # fused qkv_proj / gate_up_proj checkpoint layout (the loader must
        # split them into our standard keys); sliding_window=4 bites on a
        # 9-token prompt
        from transformers import Phi3Config, Phi3ForCausalLM
        cfg = Phi3Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, rms_norm_eps=1e-5, pad_token_id=0,
            max_position_embeddings=512, tie_word_embeddings=False,
            sliding_window=4, attn_implementation="eager")
        return Phi3ForCausalLM(cfg)
    if family == "qwen3moe":
        # qk-norm (per-head, pre-RoPE) COMBINED with MoE routing; HF
        # default norm_topk_prob=False must flow through to moe_renorm
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
        cfg = Qwen3MoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_experts=4, num_experts_per_tok=2,
            rope_theta=10000.0, rms_norm_eps=1e-6,
            max_position_embeddings=512, tie_word_embeddings=False,
            attn_implementation="eager")
        return Qwen3MoeForCausalLM(cfg)
    if family == "deepseek_v2":
        # Multi-head Latent Attention (q-LoRA + compressed KV latent +
        # interleaved RoPE on the decoupled rope slice) COMBINED with
        # deepseek MoE: a dense first layer (first_k_dense_replace=1),
        # shared experts, routed_scaling_factor that bites, and
        # GROUP-LIMITED top-k routing
        from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
        cfg = DeepseekV2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16,
            n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=2,
            first_k_dense_replace=1, routed_scaling_factor=2.5,
            topk_method="group_limited_greedy", n_group=2, topk_group=1,
            norm_topk_prob=False, rope_theta=10000.0, rms_norm_eps=1e-6,
            max_position_embeddings=512, tie_word_embeddings=False,
            attn_implementation="eager")
        return DeepseekV2ForCausalLM(cfg)
    if family == "mixtral":
        # Mixture-of-Experts: 4 experts, top-2 routing
        from transformers import MixtralConfig, MixtralForCausalLM
        cfg = MixtralConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            max_position_embeddings=512, tie_word_embeddings=False,
            sliding_window=None, attn_implementation="eager")
        return MixtralForCausalLM(cfg)
    from transformers import LlamaConfig, LlamaForCausalLM
    if family == "llama3.1":
        # llama3 rope scaling with parameters that BITE on a 9-token
        # prompt (original_max_position=8 << prompt length, so low- and
        # mid-frequency bands are remapped)
        cfg = LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=10000.0, rms_norm_eps=1e-5,
            max_position_embeddings=512, tie_word_embeddings=False,
            attention_bias=False,
            rope_scaling={"rope_type": "llama3", "factor": 4.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 2.0,
                          "original_max_position_embeddings": 8})
        return LlamaForCausalLM(cfg)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, max_position_embeddings=512,
        tie_word_embeddings=True, attention_bias=False)
    return LlamaForCausalLM(cfg)


@pytest.fixture(scope="module",
                params=["qwen2", "qwen3", "gemma2", "llama", "llama3.1",
                        "mistral", "mixtral", "olmoe", "phi3", "qwen3moe",
                        "deepseek_v2"])
def snapshot(request, tmp_path_factory):
    hf = _build_hf(request.param).eval()
    d = tmp_path_factory.mktemp(f"hf_{request.param}")
    hf.save_pretrained(d, safe_serialization=True)
    return request.param, str(d), hf


def test_logits_match_transformers(snapshot):
    family, path, hf = snapshot
    mcfg = dataclasses.replace(ModelConfig.from_pretrained(path),
                               dtype="float32")
    mcfg2, params = load_params(path, cfg=mcfg)

    rng = np.random.default_rng(7)
    tokens = rng.integers(0, 256, size=(2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.float().numpy()
    got = np.asarray(T.forward_logits(mcfg, params, jnp.asarray(tokens,
                                                                jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_greedy_generation_matches_transformers(snapshot):
    """End-to-end anchor: the engine's paged prefill+decode path produces
    the same greedy continuation as HF `generate` on the same checkpoint."""
    from microvllm_tpu.runtime.engine import InferenceEngine
    from microvllm_tpu.runtime.sequence import SamplingParams

    family, path, hf = snapshot
    mcfg = dataclasses.replace(ModelConfig.from_pretrained(path),
                               dtype="float32")
    _, params = load_params(path, cfg=mcfg)

    prompt = [3, 17, 42, 99, 5]
    n_new = 8
    with torch.no_grad():
        out = hf.generate(torch.tensor([prompt]), max_new_tokens=n_new,
                          do_sample=False)
    ref_tokens = out[0, len(prompt):].tolist()

    eng = InferenceEngine(EngineConfig(
        model=mcfg,
        cache=CacheConfig(num_pages=32, page_size=16, max_pages_per_seq=4),
        scheduler=SchedulerConfig(max_batch_size=2, prefill_wait_s=0.0,
                                  decode_buckets=(1,),
                                  prefill_len_buckets=(16,),
                                  prefill_batch_buckets=(1,),
                                  decode_spans=(1, 4)),
        max_model_len=64), params=params)
    seqs = eng.generate([prompt], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=n_new))
    assert seqs[0].output_token_ids == ref_tokens
