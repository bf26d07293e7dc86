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


def test_moe_route_no_renorm():
    """olmoe semantics (HF norm_topk_prob=False): the selected routing
    weights are the raw softmax probabilities, NOT renormalized."""
    from microvllm_tpu.models.moe import moe_route

    H, E, k = 16, 8, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (4, H))
    wr = jax.random.normal(jax.random.PRNGKey(1), (H, E))
    sel, top_w, _ = moe_route(x, wr, k, renorm=False)
    probs = np.asarray(jax.nn.softmax((x @ wr).astype(jnp.float32)))
    for b in range(4):
        top = np.argsort(-probs[b])[:k]
        np.testing.assert_allclose(np.asarray(sel)[b, top], probs[b, top],
                                   rtol=1e-6)
        # NOT renormalized: total selected mass == raw top-k softmax mass
        np.testing.assert_allclose(np.asarray(sel)[b].sum(),
                                   probs[b, top].sum(), rtol=1e-5)
    sel_rn, _, _ = moe_route(x, wr, k, renorm=True)
    np.testing.assert_allclose(np.asarray(sel_rn).sum(-1), 1.0, rtol=1e-5)


def test_moe_quant_paths_match_dense_eval():
    """moe_mlp_quant (B=1 gather AND batched masked sweep) equals the bf16
    dense-eval oracle run on the dequantized expert weights."""
    from microvllm_tpu.models.moe import moe_mlp, moe_mlp_quant
    from microvllm_tpu.ops.quant import quantize

    H, I, E, k, L = 16, 32, 4, 2, 3
    kg = jax.random.PRNGKey
    gu = jax.random.normal(kg(0), (E * L, H, 2 * I))
    dn = jax.random.normal(kg(1), (E * L, I, H))
    wr = jax.random.normal(kg(2), (H, E))
    qgu = jax.lax.map(lambda t: quantize(t, 4, 8, 1), gu)
    qdn = jax.lax.map(lambda t: quantize(t, 4, 8, 1), dn)
    # oracle weights: exactly what the quantized kernels see (stacks are
    # EXPERT-MAJOR [E*L, ...]: flat index e*L + l)
    dgu = np.asarray(qgu.dequant(jnp.float32)).reshape(E, L, H, 2 * I)
    ddn = np.asarray(qdn.dequant(jnp.float32)).reshape(E, L, I, H)

    for renorm in (True, False):
        for rows in (1, 5):
            x = jax.random.normal(kg(10 + rows), (rows, H))
            for layer in (0, L - 1):
                got = moe_mlp_quant(x, wr, qgu, qdn, jnp.int32(layer), E,
                                    k, L, renorm=renorm)
                ref = moe_mlp(x, wr,
                              jnp.asarray(dgu[:, layer, :, :I]),
                              jnp.asarray(dgu[:, layer, :, I:]),
                              jnp.asarray(ddn[:, layer]), k, renorm=renorm)
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           rtol=2e-4, atol=2e-4)


def test_moe_quant_engine_gather_matches_batched():
    """Quantized-MoE engine end-to-end: the B=1 decode (expert GATHER path)
    and the batched decode (masked all-E sweep) produce identical greedy
    tokens, and runs are deterministic."""
    from microvllm_tpu.config import QuantConfig

    cfg = EngineConfig(
        model=_moe_cfg(),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        quant=QuantConfig(weight_bits=4),
        max_model_len=128, default_max_new_tokens=6)
    eng = InferenceEngine(cfg)
    assert "w_gate_up_e" in eng.params["layers"]  # quantized stacks active
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6]]
    batched = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    again = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert batched == again
    singles = [eng.generate([p], sampling=sp)[0].output_token_ids
               for p in prompts]
    assert batched == singles
    assert eng.cache_stats.used_pages == 0


def test_olmoe_engine():
    """olmoe-family tiny model (full-width QK-norm, no routing renorm)
    through the engine: greedy determinism, B=1 == batched."""
    cfg = EngineConfig(
        model=_moe_cfg(model_type="olmoe", num_experts=8,
                       num_experts_per_tok=3, qk_norm=True,
                       qk_norm_kind="full", moe_renorm=False),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128, default_max_new_tokens=6)
    eng = InferenceEngine(cfg)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    a = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    singles = [eng.generate([p], sampling=sp)[0].output_token_ids
               for p in prompts]
    assert a == singles


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


def test_moe_quant_expert_parallel_matches_single_device():
    """Quantized expert stacks under EXPERT parallelism: the expert-major
    [E*L, ...] INT4 stacks shard whole-expert on the first axis, the
    gather/sweep paths run per rank with cond-skipped remote experts, and
    the TP×DP engine's greedy outputs match the single-rank quantized
    engine exactly (same quantized values; only tiling metadata differs)."""
    from microvllm_tpu.config import QuantConfig, moe_uses_ep

    mcfg = _moe_cfg(num_heads=8, num_kv_heads=4, head_dim=32,
                    hidden_size=128, intermediate_size=256)
    assert moe_uses_ep(mcfg, 2)
    q = QuantConfig(weight_bits=4, weight_group_size=64)

    def run(parallel):
        cfg = EngineConfig(
            model=mcfg,
            cache=CacheConfig(num_pages=64, page_size=16,
                              max_pages_per_seq=8),
            scheduler=SchedulerConfig(
                max_batch_size=8, max_prefill_tokens=256,
                prefill_wait_s=0.0, decode_buckets=(2, 4),
                prefill_len_buckets=(16, 32), prefill_batch_buckets=(2, 4),
                decode_spans=(1, 4)),
            quant=q, max_model_len=128, default_max_new_tokens=6,
            parallel=parallel or ParallelConfig())
        eng = InferenceEngine(cfg)
        assert "w_gate_up_e" in eng.params["layers"]  # quantized stacks
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
        out = [s.output_token_ids for s in eng.generate(prompts,
                                                        sampling=sp)]
        single = eng.generate([prompts[0]], sampling=sp)[0].output_token_ids
        return out, single

    ref, ref_single = run(None)
    got, got_single = run(ParallelConfig(tp_size=2, dp_size=2))
    assert got == ref
    assert got_single == ref_single       # B=1 gather path under EP


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
