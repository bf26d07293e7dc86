"""The naive A/B baseline must be *correct* (greedy-identical to the real
engine on the same weights) so its slowness is attributable purely to the
missing optimizations. Role twin of the reference's `vllm_server.py:54-291`
(their A/B is vLLM; ours is a deliberately naive JAX engine, since vLLM
cannot run on this TPU sandbox)."""

import numpy as np

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
from microvllm_tpu.baselines.naive import NaiveEngine
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def test_naive_greedy_matches_engine():
    mcfg = ModelConfig.tiny(dtype="float32")
    naive = NaiveEngine(mcfg, max_model_len=128, seed=1)  # engine inits with key 1
    eng = InferenceEngine(EngineConfig(
        model=mcfg,
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 2), prefill_len_buckets=(16,),
            prefill_batch_buckets=(1,), decode_spans=(1,)),
        max_model_len=128))
    prompt = [1, 2, 3, 4, 5]
    want = eng.generate([prompt], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=8))[0].output_token_ids
    got = naive.generate(prompt, max_tokens=8)
    assert got == want, (got, want)


def test_naive_stream_callback_order():
    naive = NaiveEngine(ModelConfig.tiny(dtype="float32"), max_model_len=64)
    events = []
    out = naive.generate([3, 4, 5], max_tokens=4,
                         callback=lambda t, f: events.append((t, f)))
    assert [t for t, _ in events] == out
    assert [f for _, f in events] == [False, False, False, True]


def test_naive_rejects_overlength():
    naive = NaiveEngine(ModelConfig.tiny(dtype="float32"), max_model_len=16)
    import pytest
    with pytest.raises(ValueError):
        naive.generate(list(range(14)), max_tokens=8)
