"""Multi-device tests on the 8-way virtual CPU mesh: shardings, collectives,
and a full sharded engine vs the single-device engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  ParallelConfig, SchedulerConfig)
from microvllm_tpu.parallel.mesh import make_mesh
from microvllm_tpu.parallel.sharding import cache_spec, param_specs
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def tiny_cfg(parallel=None, quant=None):
    from microvllm_tpu.config import QuantConfig
    return EngineConfig(
        quant=quant or QuantConfig(),
        model=ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                               hidden_size=128, intermediate_size=256),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=8, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(2, 4, 8), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(2, 4), decode_spans=(1, 4)),
        max_model_len=128,
        default_max_new_tokens=6,
        parallel=parallel or ParallelConfig(),
    )


def test_mesh_shapes():
    mesh = make_mesh(ParallelConfig(tp_size=4, dp_size=2))
    assert mesh.shape == {"data": 2, "seq": 1, "model": 4}
    mesh = make_mesh(ParallelConfig(tp_size=2, dp_size=2, sp_size=2))
    assert mesh.shape == {"data": 2, "seq": 2, "model": 2}


def test_param_specs_cover_tree():
    from microvllm_tpu.models import transformer as T
    cfg = ModelConfig.tiny()
    params = T.init_params(cfg, jax.random.PRNGKey(0))
    specs = param_specs(params)
    assert specs["layers"]["wq"][-1] == "model"
    assert specs["layers"]["wo"][1] == "model"
    flat_p = jax.tree_util.tree_structure(params)
    flat_s = jax.tree_util.tree_structure(specs)
    assert flat_p == flat_s


def test_cache_spec_replicates_when_indivisible():
    cfg = ModelConfig.tiny(num_kv_heads=2)
    assert cache_spec(cfg, 4) == jax.sharding.PartitionSpec()
    assert cache_spec(cfg, 2)[2] == "model"


@pytest.mark.parametrize("tp,dp", [(2, 1), (1, 2), (2, 2), (4, 2)])
def test_sharded_engine_matches_single_device(tp, dp):
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)

    ref_eng = InferenceEngine(tiny_cfg())
    ref_out = [s.output_token_ids
               for s in ref_eng.generate(prompts, sampling=sp)]

    eng = InferenceEngine(tiny_cfg(ParallelConfig(tp_size=tp, dp_size=dp)))
    out = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]

    assert out == ref_out


@pytest.mark.parametrize("kv_bits", [16, 8])
def test_dp_kv_consistent_across_batch_layout_changes(kv_bits):
    """DP regression: a sequence prefilled in one batch layout must decode
    correctly from ANY decode-bucket row. With prefill_batch_buckets=(1,2)
    and a decode bucket of 4, seqs 1 and 2 swap data replicas between
    prefill and decode; before the KV-write replication fix
    (`transformer._dp_store_remote_decode`) their decode read a replica
    cache copy missing their prefill KV and silently diverged."""
    from microvllm_tpu.config import QuantConfig

    def cfg(parallel=None):
        return EngineConfig(
            model=ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                                   hidden_size=128, intermediate_size=256),
            quant=QuantConfig(kv_bits=kv_bits),
            cache=CacheConfig(num_pages=64, page_size=16,
                              max_pages_per_seq=8),
            scheduler=SchedulerConfig(
                max_batch_size=4, max_prefill_tokens=256,
                prefill_wait_s=0.0, decode_buckets=(1, 4),
                prefill_len_buckets=(16, 32), prefill_batch_buckets=(1, 2),
                decode_spans=(1, 4)),
            max_model_len=128, default_max_new_tokens=6,
            parallel=parallel or ParallelConfig())

    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    ref = [s.output_token_ids
           for s in InferenceEngine(cfg()).generate(prompts, sampling=sp)]
    got = [s.output_token_ids
           for s in InferenceEngine(cfg(ParallelConfig(dp_size=2)))
           .generate(prompts, sampling=sp)]
    assert got == ref


def test_sharded_engine_streaming_and_preemption():
    eng = InferenceEngine(tiny_cfg(ParallelConfig(tp_size=2, dp_size=2)))
    events = []
    sid = eng.add_request(prompt_token_ids=[4, 5, 6],
                          sampling=SamplingParams(temperature=0.0,
                                                  max_new_tokens=4))
    eng.register_stream_callback(sid, lambda s, t, f: events.append((t, f)))
    while not eng.scheduler.is_finished():
        eng.step()
    eng.scheduler.pop_finished()
    assert len(events) == 4
    assert events[-1][1] is True


@pytest.mark.parametrize("tp,dp", [(2, 1), (2, 2)])
def test_sharded_engine_with_int8_kv(tp, dp):
    """INT8 KV cache + TP (hard NotImplementedError in r1): sharded scale
    pages, outputs match the single-device int8-KV engine exactly."""
    from microvllm_tpu.config import QuantConfig
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=5)
    q = QuantConfig(kv_bits=8)

    ref = InferenceEngine(tiny_cfg(quant=q))
    ro = [s.output_token_ids for s in ref.generate(prompts, sampling=sp)]

    eng = InferenceEngine(tiny_cfg(ParallelConfig(tp_size=tp, dp_size=dp),
                                   quant=q))
    assert eng.k_scales is not None
    qo = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert qo == ro


def test_sharded_engine_int8_kv_and_int8_weights():
    """The full BASELINE config shape: quantized weights + int8 KV + TP."""
    from microvllm_tpu.config import QuantConfig
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=4)
    q = QuantConfig(weight_bits=8, weight_group_size=64, kv_bits=8)

    ref = InferenceEngine(tiny_cfg(quant=q))
    ro = [s.output_token_ids for s in ref.generate(prompts, sampling=sp)]

    eng = InferenceEngine(tiny_cfg(ParallelConfig(tp_size=2, dp_size=2),
                                   quant=q))
    qo = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert qo == ro


class _KernelCounter:
    """Wraps the Pallas a8 kernel entry points with trace-time counters
    (+ interpret=True so they execute on CPU). lax.scan traces the layer
    body once, so each hot call site registers exactly once per trace."""

    def __init__(self, monkeypatch):
        import functools

        import importlib

        # ops/__init__ re-exports the `linear` FUNCTION, shadowing the
        # submodule on attribute access — go through importlib
        linear_mod = importlib.import_module("microvllm_tpu.ops.linear")
        from microvllm_tpu.ops.pallas import fused_mlp as fm
        from microvllm_tpu.ops.pallas import quant_matmul as qm
        from microvllm_tpu.ops.quant import QuantizedTensor

        self.calls: list[str] = []

        def wrap(mod, name, tag):
            orig = getattr(mod, name)

            def wrapper(*a, **kw):
                self.calls.append(tag)
                kw["interpret"] = True
                return orig(*a, **kw)

            monkeypatch.setattr(mod, name, wrapper)

        wrap(qm, "quant_matmul_stacked_a8_fused", "a8_normed")
        wrap(qm, "quant_matmul_stacked_a8", "a8")
        wrap(fm, "fused_mlp_block", "fused_mlp")

        # bypass the use_pallas() backend check only — keep the real
        # shape/layout eligibility logic in the callers
        monkeypatch.setattr(
            linear_mod, "_a8_fusion_ok",
            lambda *ws: all(isinstance(w, QuantizedTensor)
                            and w.scales_tiled is not None and w.bits == 4
                            for w in ws))


def _kernel_test_cfg():
    return ModelConfig.tiny(num_heads=4, num_kv_heads=2, head_dim=64,
                            hidden_size=256, intermediate_size=512,
                            vocab_size=512, num_layers=2,
                            tie_word_embeddings=False)


def _decode_inputs(mcfg, cache, B=4):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, mcfg.vocab_size, size=B),
                         jnp.int32)
    tables = jnp.asarray(
        np.arange(1, 1 + B * cache.max_pages_per_seq)
        .reshape(B, cache.max_pages_per_seq), jnp.int32)
    ctx = jnp.full((B,), 5, jnp.int32)
    return tokens, tables, ctx


def test_tp_path_runs_fused_a8_kernel_set(monkeypatch):
    """VERDICT r2 #1: the sharded (TP) decode must execute the SAME fused
    W4A8 kernel sequence as single-rank — fused qkv (norm+quant prologue),
    fused o-proj, one-launch MLP block, fused lm_head — and produce
    matching logits (rank-interleaved fused weights + psum placement)."""
    from jax.sharding import PartitionSpec as P

    from microvllm_tpu.models import transformer as T
    from microvllm_tpu.parallel.mesh import MODEL_AXIS
    from microvllm_tpu.parallel.sharding import cache_spec

    mcfg = _kernel_test_cfg()
    cache = CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=4)
    tp = 2

    base = T.init_params(mcfg, jax.random.PRNGKey(1))
    from microvllm_tpu.ops.quant import quantize_params
    p_single = quantize_params(base, 4, 128, tp=1)
    p_tp = quantize_params(base, 4, 128, tp=tp)

    kc, vc = T.init_kv_cache(mcfg, cache)
    tokens, tables, ctx = _decode_inputs(mcfg, cache)

    counter = _KernelCounter(monkeypatch)
    logits_ref, _, _ = jax.jit(
        lambda p, k, v: T.decode_step(mcfg, p, k, v, tokens, tables, ctx)
    )(p_single, kc, vc)
    single_calls = list(counter.calls)
    assert single_calls == ["a8_normed", "a8_normed", "fused_mlp",
                            "a8_normed"], single_calls

    mesh = make_mesh(ParallelConfig(tp_size=tp, dp_size=1))
    pspecs = param_specs(p_tp)
    cspec = cache_spec(mcfg, tp)

    def local_step(p, k, v):
        return T.decode_step(mcfg, p, k, v, tokens, tables, ctx,
                             tp_axis=MODEL_AXIS, tp_size=tp)

    counter.calls.clear()
    sharded = jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspecs, cspec, cspec),
        out_specs=(P(), cspec, cspec), check_vma=False))
    logits_tp, _, _ = sharded(p_tp, kc, vc)
    assert list(counter.calls) == single_calls, (
        "TP path dispatched a different kernel set: "
        f"{counter.calls} vs {single_calls}")

    # numerics: same fused kernels on rank-interleaved shards + f32 psum.
    # Not bit-exact vs single-rank — the fused MLP re-quantizes its
    # intermediate per (row, TI-tile) and the per-rank tile (I/tp) is finer
    # than the single-rank one, a genuine (slightly tighter) grouping
    # change. Greedy tokens must still agree.
    np.testing.assert_allclose(np.asarray(logits_tp),
                               np.asarray(logits_ref), rtol=0.25, atol=0.25)
    assert (np.argmax(np.asarray(logits_tp), -1)
            == np.argmax(np.asarray(logits_ref), -1)).all()


def test_sharded_engine_with_quantized_weights():
    from microvllm_tpu.config import QuantConfig
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=5)

    ref = InferenceEngine(tiny_cfg(quant=QuantConfig(weight_bits=8,
                                                     weight_group_size=64)))
    ro = [s.output_token_ids for s in ref.generate(prompts, sampling=sp)]

    eng = InferenceEngine(tiny_cfg(ParallelConfig(tp_size=2, dp_size=2))
                          .replace(quant=QuantConfig(weight_bits=8,
                                                     weight_group_size=64)))
    qo = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert qo == ro


@pytest.mark.parametrize("tp,dp", [(2, 1), (2, 2)])
def test_sharded_engine_lora_matches_single_device(tp, dp):
    """Multi-LoRA under TP/DP: a mixed-adapter batch on the sharded engine
    reproduces the single-device LoRA engine exactly. Exercises the
    rank-interleaved lora_qkv_b column shard (matching the fused wqkv
    layout) and the psummed [B, r] o-proj intermediate."""
    from microvllm_tpu.config import LoRAConfig

    mcfg = ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                            hidden_size=128, intermediate_size=256,
                            dtype="float32")
    lc = LoRAConfig(rank=4, max_adapters=4, alpha=8.0)

    def cfg(parallel=None):
        return tiny_cfg(parallel).replace(model=mcfg, lora=lc)

    def adapter(seed):
        kg = jax.random.PRNGKey
        L, H, r = mcfg.num_layers, mcfg.hidden_size, lc.rank
        qkv_out = mcfg.q_dim + 2 * mcfg.kv_dim
        return {
            "qkv_a": jax.random.normal(kg(seed), (L, H, r)) * 0.3,
            "qkv_b": jax.random.normal(kg(seed + 1), (L, r, qkv_out)) * 0.3,
            "o_a": jax.random.normal(kg(seed + 2), (L, mcfg.q_dim, r)) * 0.3,
            "o_b": jax.random.normal(kg(seed + 3), (L, r, mcfg.hidden_size))
                   * 0.3,
        }

    from microvllm_tpu.models import transformer as T
    base_params = T.init_params(mcfg, jax.random.PRNGKey(7))
    ad1, ad2 = adapter(10), adapter(20)

    def run(engine):
        engine.load_adapter(jax.tree.map(jnp.copy, ad1))
        engine.load_adapter(jax.tree.map(jnp.copy, ad2))
        sp = SamplingParams(temperature=0.0, max_new_tokens=6)
        prompts = [[3, 1, 4, 1], [9, 2, 6], [5, 5, 5], [2, 7]]
        sids = [engine.add_request(prompt_token_ids=p, sampling=sp,
                                   adapter_id=aid)
                for p, aid in zip(prompts, [1, 0, 2, 1])]
        while not engine.scheduler.is_finished():
            engine.step()
        done = {q.seq_id: q for q in engine.scheduler.pop_finished()}
        return [done[s].output_token_ids for s in sids]

    ref = run(InferenceEngine(cfg(), params=jax.tree.map(jnp.copy,
                                                         base_params)))
    got = run(InferenceEngine(cfg(ParallelConfig(tp_size=tp, dp_size=dp)),
                              params=jax.tree.map(jnp.copy, base_params)))
    assert got == ref


def test_sharded_engine_spec_with_lora():
    """Speculation + LoRA + TP compose: greedy outputs of the sharded
    speculative engine match the sharded non-speculative one, speculation
    engages, and no tp_lora fallback is counted (the r2 gate is lifted)."""
    import dataclasses

    from microvllm_tpu.config import LoRAConfig
    from microvllm_tpu.models import transformer as T

    mcfg = ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                            hidden_size=128, intermediate_size=256,
                            dtype="float32")
    lc = LoRAConfig(rank=4, max_adapters=2, alpha=8.0)
    base = tiny_cfg(ParallelConfig(tp_size=2, dp_size=1)).replace(
        model=mcfg, lora=lc)
    params = T.init_params(mcfg, jax.random.PRNGKey(3))
    kg = jax.random.PRNGKey
    L, H, r = mcfg.num_layers, mcfg.hidden_size, lc.rank
    ad = {"qkv_a": jax.random.normal(kg(1), (L, H, r)) * 0.3,
          "qkv_b": jax.random.normal(
              kg(2), (L, r, mcfg.q_dim + 2 * mcfg.kv_dim)) * 0.3,
          "o_a": jax.random.normal(kg(3), (L, mcfg.q_dim, r)) * 0.3,
          "o_b": jax.random.normal(kg(4), (L, r, H)) * 0.3}

    def run(cfg_):
        eng = InferenceEngine(cfg_, params=jax.tree.map(jnp.copy, params))
        eng.load_adapter(jax.tree.map(jnp.copy, ad))
        sp = SamplingParams(temperature=0.0, max_new_tokens=12)
        prompts = [[1, 2, 3, 4, 5], [4, 4, 4, 4]]
        sids = [eng.add_request(prompt_token_ids=p, sampling=sp,
                                adapter_id=aid)
                for p, aid in zip(prompts, [1, 0])]
        while not eng.scheduler.is_finished():
            eng.step()
        done = {q.seq_id: q for q in eng.scheduler.pop_finished()}
        return [done[s].output_token_ids for s in sids], eng

    ref, _ = run(base)
    got, eng = run(dataclasses.replace(base, spec_k=3, spec_steps=2))
    assert got == ref
    assert eng.metrics.spec_rounds > 0
    assert eng.metrics.spec_fallbacks.get("tp_lora", 0) == 0


def test_sharded_engine_speculative_matches_plain_tp():
    """The speculative span runs under TP/DP (ShardedStepFns.spec_fn):
    greedy outputs match the non-speculative sharded engine and
    speculation actually engages (spec_rounds > 0) — r2's blanket "tp"
    fallback is gone."""
    import dataclasses
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4], [2, 6, 2, 6]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=16)

    base = tiny_cfg(ParallelConfig(tp_size=2, dp_size=2))
    ref = InferenceEngine(base)
    ro = [s.output_token_ids for s in ref.generate(prompts, sampling=sp)]

    # spec_adaptive off: this asserts FULL-spec vs plain parity. Adaptive
    # mode (default) mixes verify-path and decode-path forwards mid-run,
    # which may disagree on near-ties under TP (documented caveat,
    # models/speculative.py) — correctness holds, bit-equality may not.
    eng = InferenceEngine(dataclasses.replace(base, spec_k=3, spec_steps=2,
                                              spec_adaptive=False))
    so = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert so == ro
    assert eng.metrics.spec_rounds > 0
    assert eng.metrics.spec_fallbacks.get("tp_lora", 0) == 0
    assert eng.cache_stats.used_pages == 0


def test_sharded_engine_sampled_speculation():
    """Rejection-sampling speculative verification runs under TP/DP too:
    temperature>0 traffic engages the sharded sampled spec variant and
    completes deterministically per engine seed."""
    import dataclasses
    base = tiny_cfg(ParallelConfig(tp_size=2, dp_size=2))
    eng = InferenceEngine(dataclasses.replace(base, spec_k=3, spec_steps=2,
                                              spec_adaptive=False))
    sp = SamplingParams(temperature=0.8, top_p=0.9, max_new_tokens=10,
                        ignore_eos=True)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4], [2, 6, 2, 6]]
    seqs = eng.generate(prompts, sampling=sp)
    assert all(len(s.output_token_ids) == 10 for s in seqs)
    assert eng.metrics.spec_rounds > 0
    assert eng.metrics.spec_fallbacks.get("sampled", 0) == 0
    assert eng.cache_stats.used_pages == 0


# ---------------------------------------------------------------------------
# Sequence-parallel KV (page sharding over the 'seq' mesh axis) — the
# engine-level legs of tests/test_kv_sharding.py's op-level parity suite.
# SURVEY.md §5's long-context mandate: KV capacity scales with sp.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sp_size,tp,dp", [(2, 1, 1), (4, 2, 1), (2, 1, 2),
                                           (2, 2, 2)])
def test_sp_engine_matches_single_device(sp_size, tp, dp):
    """Page-sharded KV engine == single-device engine, greedy bit-parity,
    composed with TP (head sharding) and DP (batch replicas)."""
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
    samp = SamplingParams(temperature=0.0, max_new_tokens=6)

    ref = [s.output_token_ids
           for s in InferenceEngine(tiny_cfg()).generate(prompts,
                                                         sampling=samp)]
    eng = InferenceEngine(tiny_cfg(ParallelConfig(
        sp_size=sp_size, tp_size=tp, dp_size=dp)))
    out = [s.output_token_ids for s in eng.generate(prompts, sampling=samp)]
    assert out == ref
    # pages 0..sp-1 are reserved per-rank trash slots
    assert eng.config.cache.reserved_pages == sp_size
    assert eng.cache_stats.total_pages == 64 - sp_size


def test_sp_engine_int8_kv_matches_single_device():
    """INT8-KV latent scatter under sp (per-token scale pages shard their
    page axis with the cache) keeps greedy outputs exact."""
    from microvllm_tpu.config import QuantConfig
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6]]
    samp = SamplingParams(temperature=0.0, max_new_tokens=6)
    ref = [s.output_token_ids
           for s in InferenceEngine(tiny_cfg(quant=QuantConfig(kv_bits=8)))
           .generate(prompts, sampling=samp)]
    out = [s.output_token_ids
           for s in InferenceEngine(
               tiny_cfg(ParallelConfig(sp_size=2),
                        quant=QuantConfig(kv_bits=8)))
           .generate(prompts, sampling=samp)]
    assert out == ref


def test_sp_kv_consistent_across_batch_layout_changes():
    """The dp-layout-change regression (r4) re-run with sp in the mesh:
    prefill-vs-decode row moves must not corrupt the page-sharded cache
    (stores key off GLOBAL page ids, not batch rows, so this holds by
    construction — pinned here)."""
    def cfg(parallel=None):
        return EngineConfig(
            model=ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                                   hidden_size=128, intermediate_size=256),
            cache=CacheConfig(num_pages=64, page_size=16,
                              max_pages_per_seq=8),
            scheduler=SchedulerConfig(
                max_batch_size=4, max_prefill_tokens=256,
                prefill_wait_s=0.0, decode_buckets=(1, 4),
                prefill_len_buckets=(16, 32), prefill_batch_buckets=(1, 2),
                decode_spans=(1, 4)),
            max_model_len=128, default_max_new_tokens=6,
            parallel=parallel or ParallelConfig())

    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
    samp = SamplingParams(temperature=0.0, max_new_tokens=6)
    ref = [s.output_token_ids
           for s in InferenceEngine(cfg()).generate(prompts, sampling=samp)]
    got = [s.output_token_ids
           for s in InferenceEngine(cfg(ParallelConfig(sp_size=2,
                                                       dp_size=2)))
           .generate(prompts, sampling=samp)]
    assert got == ref


def test_sp_mla_matches_single_device():
    """MLA's latent paged cache — REPLICATED under TP — page-shards over
    'seq': sp is the capacity-scaling axis for deepseek models. Greedy
    parity incl. the full sp x tp x dp composition."""
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(__file__))
    from test_mla import _engine
    samp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6], [11, 12, 13]]
    ref = [s.output_token_ids
           for s in _engine().generate(prompts, sampling=samp)]
    got = [s.output_token_ids
           for s in _engine(parallel=ParallelConfig(sp_size=2))
           .generate(prompts, sampling=samp)]
    assert got == ref
    got = [s.output_token_ids
           for s in _engine(parallel=ParallelConfig(sp_size=2, tp_size=2,
                                                    dp_size=2))
           .generate(prompts, sampling=samp)]
    assert got == ref


def test_sp_rejects_unsupported_combinations():
    """Windowed models, speculation, and penalties are gated off under sp
    with actionable errors; num_pages must divide by sp."""
    import dataclasses as _dc
    with pytest.raises(NotImplementedError, match="sliding-window"):
        InferenceEngine(_dc.replace(
            tiny_cfg(ParallelConfig(sp_size=2)),
            model=ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                                   hidden_size=128, intermediate_size=256,
                                   sliding_window=32)))
    with pytest.raises(NotImplementedError, match="speculative"):
        InferenceEngine(_dc.replace(tiny_cfg(ParallelConfig(sp_size=2)),
                                    spec_k=3))
    bad = tiny_cfg(ParallelConfig(sp_size=3))   # 64 % 3 != 0
    with pytest.raises(ValueError, match="divisible"):
        InferenceEngine(bad)


def test_dp_capacity_contract():
    """DP multiplies decode compute, NOT KV capacity: the paged cache is
    replicated per data replica, so usable pages are identical at dp=1 and
    dp=2 (the honest capacity model — README 'DP replicas never own
    sequences'). Capacity scales with sp instead (tests above)."""
    e1 = InferenceEngine(tiny_cfg())
    e2 = InferenceEngine(tiny_cfg(ParallelConfig(dp_size=2)))
    assert e1.cache_stats.total_pages == e2.cache_stats.total_pages == 63
    # sp=2 halves per-rank page count but total capacity spans both ranks:
    # usable GLOBAL pages only lose the extra trash page
    e3 = InferenceEngine(tiny_cfg(ParallelConfig(sp_size=2)))
    assert e3.cache_stats.total_pages == 62
