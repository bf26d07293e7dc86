"""Mixture-of-Experts (mixtral family).

HF differential coverage (logits + paged-engine greedy vs transformers
Mixtral) lives in test_hf_differential.py; here: routing math against a
hand-rolled oracle, engine batching with MoE, and TP equivalence of the
expert-sharded model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  ParallelConfig, SchedulerConfig)
from microvllm_tpu.models import transformer as T
from microvllm_tpu.models.moe import moe_mlp
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def _moe_cfg(**over):
    base = dict(dtype="float32", num_experts=4, num_experts_per_tok=2,
                qkv_bias=False, tie_word_embeddings=False)
    base.update(over)
    return ModelConfig.tiny(**base)


def test_moe_mlp_matches_oracle():
    H, I, E, k, B = 16, 32, 4, 2, 5
    kg = jax.random.PRNGKey
    x = jax.random.normal(kg(0), (B, H))
    wr = jax.random.normal(kg(1), (H, E))
    wg = jax.random.normal(kg(2), (E, H, I))
    wu = jax.random.normal(kg(3), (E, H, I))
    wd = jax.random.normal(kg(4), (E, I, H))

    got = moe_mlp(x, wr, wg, wu, wd, k)

    # hand-rolled per-row oracle (HF MixtralSparseMoeBlock semantics)
    for b in range(B):
        probs = jax.nn.softmax(x[b] @ wr)
        top = np.argsort(-np.asarray(probs))[:k]
        w_sel = np.asarray(probs)[top]
        w_sel = w_sel / w_sel.sum()
        out = 0.0
        for wgt, e in zip(w_sel, top):
            a = jax.nn.silu(x[b] @ wg[e]) * (x[b] @ wu[e])
            out = out + wgt * (a @ wd[e])
        np.testing.assert_allclose(got[b], out, rtol=1e-4, atol=1e-4)


def test_moe_engine_batch():
    """MoE model through the full engine: mixed batch, greedy determinism,
    pages conserved."""
    cfg = EngineConfig(
        model=_moe_cfg(),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128, default_max_new_tokens=6)
    eng = InferenceEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6]]
    a = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    b = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert a == b
    singles = [eng.generate([p], sampling=sp)[0].output_token_ids
               for p in prompts]
    assert a == singles
    assert eng.cache_stats.used_pages == 0


def _run_sharded(mcfg, params, parallel):
    cfg = EngineConfig(
        model=mcfg,
        cache=CacheConfig(num_pages=64, page_size=16,
                          max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=8, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(2, 4), decode_spans=(1, 4)),
        max_model_len=128, default_max_new_tokens=6,
        parallel=parallel or ParallelConfig())
    eng = InferenceEngine(cfg, params=jax.tree.map(jnp.copy, params))
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
    return [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]


def test_moe_expert_parallel_matches_single_device():
    """num_experts % tp == 0 -> EXPERT parallelism (whole experts per rank,
    contributions psummed): TP/DP outputs match the single-device engine."""
    from microvllm_tpu.config import moe_uses_ep

    mcfg = _moe_cfg(num_heads=8, num_kv_heads=4, head_dim=32,
                    hidden_size=128, intermediate_size=256)
    assert moe_uses_ep(mcfg, 2)              # 4 experts over 2 ranks
    params = T.init_params(mcfg, jax.random.PRNGKey(3))
    ref = _run_sharded(mcfg, params, None)
    got = _run_sharded(mcfg, params, ParallelConfig(tp_size=2, dp_size=2))
    assert got == ref


def test_moe_intermediate_tp_fallback_matches_single_device():
    """num_experts NOT divisible by tp -> every expert's intermediate dim
    shards like the dense MLP; outputs still match single-device."""
    from microvllm_tpu.config import moe_uses_ep

    mcfg = _moe_cfg(num_heads=8, num_kv_heads=4, head_dim=32,
                    hidden_size=128, intermediate_size=256, num_experts=3)
    assert not moe_uses_ep(mcfg, 2)          # 3 experts, tp 2
    params = T.init_params(mcfg, jax.random.PRNGKey(5))
    ref = _run_sharded(mcfg, params, None)
    got = _run_sharded(mcfg, params, ParallelConfig(tp_size=2, dp_size=1))
    assert got == ref
