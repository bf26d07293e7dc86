"""Randomized engine stress: arbitrary arrival/abort/length patterns must
conserve pages, never deadlock, and finish every request."""

import random

import pytest

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import FinishReason, SamplingParams


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_fuzz(seed):
    rng = random.Random(seed)
    eng = InferenceEngine(EngineConfig(
        model=ModelConfig.tiny(),
        cache=CacheConfig(num_pages=24, page_size=16, max_pages_per_seq=6),
        scheduler=SchedulerConfig(
            max_batch_size=6, max_prefill_tokens=128, prefill_wait_s=0.0,
            decode_buckets=(2, 4, 8), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2, 4), decode_spans=(1, 2, 4)),
        max_model_len=96,
        default_max_new_tokens=8,
    ))
    total_usable = eng.config.cache.num_usable_pages

    live: list[int] = []
    submitted = finished = aborted = 0
    for step in range(220):
        action = rng.random()
        if action < 0.25 and submitted < 60:
            n = rng.randint(1, 80)            # some prompts exceed capacity
            sid = eng.add_request(
                prompt_token_ids=[rng.randint(1, 400) for _ in range(n)],
                sampling=SamplingParams(
                    temperature=rng.choice([0.0, 0.8]),
                    max_new_tokens=rng.randint(1, 12)))
            live.append(sid)
            submitted += 1
        elif action < 0.30 and live:
            sid = live.pop(rng.randrange(len(live)))
            if eng.abort_request(sid):
                aborted += 1
        else:
            eng.step()
        # invariant: pages conserved
        stats = eng.cache_stats
        assert stats.free_pages + stats.used_pages == total_usable
        for seq in eng.scheduler.pop_finished():
            finished += 1
            if seq.seq_id in live:
                live.remove(seq.seq_id)

    # drain: everything must terminate without deadlock
    for _ in range(2000):
        if eng.scheduler.is_finished():
            break
        eng.step()
        for seq in eng.scheduler.pop_finished():
            finished += 1
    assert eng.scheduler.is_finished(), "engine did not drain"
    assert finished + aborted >= submitted
    assert eng.cache_stats.used_pages == 0, "leaked pages"


@pytest.mark.parametrize("kv_bits,spec_k", [(8, 0), (16, 2)])
def test_engine_fuzz_variants(kv_bits, spec_k):
    """Same stress under int8 KV cache and under speculative decoding
    (mixed greedy/sampled requests exercise both the spec and plain decode
    paths; spec reserves worst-case pages and truncates after)."""
    from microvllm_tpu.config import QuantConfig

    rng = random.Random(7 * kv_bits + spec_k)
    eng = InferenceEngine(EngineConfig(
        model=ModelConfig.tiny(),
        cache=CacheConfig(num_pages=24, page_size=16, max_pages_per_seq=6),
        scheduler=SchedulerConfig(
            max_batch_size=6, max_prefill_tokens=128, prefill_wait_s=0.0,
            decode_buckets=(2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 2, 4)),
        quant=QuantConfig(weight_bits=8, kv_bits=kv_bits),
        max_model_len=96,
        default_max_new_tokens=8,
        spec_k=spec_k,
        spec_steps=2,
    ))
    total_usable = eng.config.cache.num_usable_pages

    live: list[int] = []
    submitted = finished = aborted = 0
    for step in range(160):
        action = rng.random()
        if action < 0.3 and submitted < 40:
            n = rng.randint(1, 60)
            sid = eng.add_request(
                prompt_token_ids=[rng.randint(1, 400) for _ in range(n)],
                sampling=SamplingParams(
                    temperature=rng.choice([0.0, 0.0, 0.8]),
                    max_new_tokens=rng.randint(1, 10)))
            live.append(sid)
            submitted += 1
        elif action < 0.35 and live:
            sid = live.pop(rng.randrange(len(live)))
            if eng.abort_request(sid):
                aborted += 1
        else:
            eng.step()
        stats = eng.cache_stats
        assert stats.free_pages + stats.used_pages == total_usable
        for seq in eng.scheduler.pop_finished():
            finished += 1
            if seq.seq_id in live:
                live.remove(seq.seq_id)

    for _ in range(2000):
        if eng.scheduler.is_finished():
            break
        eng.step()
        for seq in eng.scheduler.pop_finished():
            finished += 1
    assert eng.scheduler.is_finished(), "engine did not drain"
    assert finished + aborted >= submitted
    assert eng.cache_stats.used_pages == 0, "leaked pages"
    if spec_k:
        assert eng.metrics.spec_rounds > 0, "spec path never exercised"


@pytest.mark.parametrize("seed", [3, 4])
def test_engine_fuzz_prefix_cache(seed):
    """The base fuzz under prefix caching: shared-prefix prompts exercise
    page sharing (refcounts), LRU eviction under pressure, preemption of
    sequences holding shared pages, and abort-while-shared — with the same
    conservation invariant (free counts LRU pages: they are reclaimable)."""
    rng = random.Random(seed)
    eng = InferenceEngine(EngineConfig(
        model=ModelConfig.tiny(),
        cache=CacheConfig(num_pages=24, page_size=16, max_pages_per_seq=6,
                          prefix_cache=True),
        scheduler=SchedulerConfig(
            max_batch_size=6, max_prefill_tokens=128, prefill_wait_s=0.0,
            decode_buckets=(2, 4, 8), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2, 4), decode_spans=(1, 2, 4)),
        max_model_len=96,
        default_max_new_tokens=8,
    ))
    total_usable = eng.config.cache.num_usable_pages
    prefixes = [[100 * p + t for t in range(40)] for p in range(3)]

    live: list[int] = []
    submitted = finished = aborted = 0
    for step in range(220):
        action = rng.random()
        if action < 0.25 and submitted < 60:
            prompt = (list(rng.choice(prefixes))[:rng.choice([16, 32, 40])]
                      + [rng.randint(1, 400)
                         for _ in range(rng.randint(0, 30))])
            sid = eng.add_request(
                prompt_token_ids=prompt,
                sampling=SamplingParams(
                    temperature=rng.choice([0.0, 0.8]),
                    max_new_tokens=rng.randint(1, 12)))
            live.append(sid)
            submitted += 1
        elif action < 0.30 and live:
            sid = live.pop(rng.randrange(len(live)))
            if eng.abort_request(sid):
                aborted += 1
        else:
            eng.step()
        stats = eng.cache_stats
        assert stats.free_pages + stats.used_pages == total_usable
        for seq in eng.scheduler.pop_finished():
            finished += 1
            if seq.seq_id in live:
                live.remove(seq.seq_id)

    for _ in range(2000):
        if eng.scheduler.is_finished():
            break
        eng.step()
        for seq in eng.scheduler.pop_finished():
            finished += 1
    assert eng.scheduler.is_finished(), "engine did not drain"
    assert finished + aborted >= submitted
    assert eng.cache_stats.used_pages == 0, "leaked pages"
    assert eng.allocator.hits > 0          # sharing actually happened
