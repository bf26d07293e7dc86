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
    assert mesh.shape == {"data": 2, "model": 4}


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
