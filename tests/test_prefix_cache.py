"""Automatic prefix caching: content-addressed reuse of full KV pages.

Beyond the reference (which has no prefix reuse; vLLM calls this automatic
prefix caching). Correctness anchor: an engine with prefix caching ON must
produce exactly the tokens of one with it OFF — a cache hit changes which
pages back the prompt, never the math. Greedy float32 tiny model -> exact
token match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
from microvllm_tpu.runtime.kv_cache import (OutOfPagesError, PageAllocator,
                                            PrefixCachingAllocator, page_keys)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams

PS = 16


def _cache(num_pages=64, **over):
    return CacheConfig(num_pages=num_pages, page_size=PS,
                       max_pages_per_seq=8, prefix_cache=True, **over)


def _cfg(prefix=True, num_pages=64):
    cache = CacheConfig(num_pages=num_pages, page_size=PS,
                        max_pages_per_seq=8, prefix_cache=prefix)
    return EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=cache,
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128,
        default_max_new_tokens=6,
    )


# ---------------------------------------------------------------------------
# page_keys
# ---------------------------------------------------------------------------


def test_page_keys_chain():
    toks = list(range(100, 100 + 3 * PS))
    k1 = page_keys(toks, PS, 3)
    assert len(k1) == 3 and len(set(k1)) == 3
    # deterministic
    assert page_keys(toks, PS, 3) == k1
    # same page tokens after a different prefix -> different key (KV content
    # depends on the whole prefix, so the chain must too)
    other = [1] * PS + toks[PS:]
    k2 = page_keys(other, PS, 3)
    assert k2[1] != k1[1] and k2[2] != k1[2]
    # shared prefix -> shared leading keys
    assert page_keys(toks[:PS] + [7] * PS, PS, 2)[0] == k1[0]


# ---------------------------------------------------------------------------
# allocator unit behavior
# ---------------------------------------------------------------------------


def test_match_register_share_and_refcounts():
    a = PrefixCachingAllocator(_cache())
    toks = list(range(1, 1 + 40))          # 2 full pages + 8 tail tokens

    assert a.allocate_prefix(1, toks, len(toks)) == 0   # cold
    a.allocate(1, 40)
    a.register_seq(1, toks, 40)

    # an identical prompt shares the 2 full pages
    matched = a.allocate_prefix(2, toks, len(toks))
    assert matched == 2 * PS
    t1, t2 = a.block_table_row(1), a.block_table_row(2)
    assert list(t1[:2]) == list(t2[:2])
    a.extend(2, 8)                          # its fresh tail
    assert a.block_table_row(2)[2] not in list(t1[:3])

    # freeing the original keeps the shared pages alive for seq 2
    a.free(1)
    assert list(a.block_table_row(2)[:2]) == list(t1[:2])
    # and seq 3 can still match them
    assert a.allocate_prefix(3, toks, len(toks)) == 2 * PS
    a.free(2)
    a.free(3)
    assert a.stats.used_pages == 0          # LRU pages count as reclaimable


def test_match_stops_at_divergence_and_leaves_last_token():
    a = PrefixCachingAllocator(_cache())
    toks = list(range(1, 1 + 3 * PS))       # exactly 3 full pages
    a.allocate(1, len(toks))
    a.register_seq(1, toks, len(toks))

    # page-aligned prompt: at most pages covering len-1 tokens are matched,
    # so the final page is recomputed and the next-token logits exist
    assert a.allocate_prefix(2, toks, len(toks)) == 2 * PS
    a.free(2)

    # divergence in page 2 stops the chain after page 1
    fork = toks[:PS] + [999] * PS + toks[2 * PS:]
    assert a.allocate_prefix(3, fork, len(fork)) == PS
    a.free(3)
    a.free(1)


def test_lru_eviction_under_pressure():
    # 8 usable pages (9 minus trash)
    a = PrefixCachingAllocator(_cache(num_pages=9))
    for i in range(4):
        toks = [100 * i + t for t in range(2 * PS)]
        a.allocate(i, 2 * PS)
        a.register_seq(i, toks, 2 * PS)
        a.free(i)
    assert a.num_free == 8
    # a new 6-page request must evict 6 cached pages (oldest first)
    a.allocate(99, 6 * PS)
    assert a.evictions >= 4
    # seq 0/1/2's pages are gone from the index; seq 3's newest may survive
    assert a.allocate_prefix(50, [0 + t for t in range(2 * PS)],
                             2 * PS + 1) == 0
    a.free(99)
    a.free(50) if a.has_seq(50) else None


def test_out_of_pages_still_raises():
    a = PrefixCachingAllocator(_cache(num_pages=5))
    a.allocate(1, 4 * PS)
    with pytest.raises(OutOfPagesError):
        a.allocate(2, PS)
    a.free(1)


# ---------------------------------------------------------------------------
# engine end-to-end
# ---------------------------------------------------------------------------


def _params():
    from microvllm_tpu.models import transformer as T
    return T.init_params(ModelConfig.tiny(dtype="float32"),
                         jax.random.PRNGKey(11))


def test_engine_hit_matches_cold_engine_exactly():
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompt = list(np.random.default_rng(0).integers(1, 250, size=40))

    base = InferenceEngine(_cfg(prefix=False),
                           params=jax.tree.map(jnp.copy, _params()))
    [ref] = base.generate([prompt], sampling=sp)

    eng = InferenceEngine(_cfg(prefix=True),
                          params=jax.tree.map(jnp.copy, _params()))
    [cold] = eng.generate([prompt], sampling=sp)
    assert eng.allocator.hits == 0
    [warm] = eng.generate([prompt], sampling=sp)
    assert eng.allocator.hits == 2          # 40 tokens @ 16/page -> 2 full
    assert cold.output_token_ids == ref.output_token_ids
    assert warm.output_token_ids == ref.output_token_ids
    assert eng.cache_stats.used_pages == 0


def test_shared_prefix_divergent_tails():
    sp = SamplingParams(temperature=0.0, max_new_tokens=5)
    rng = np.random.default_rng(1)
    prefix = list(rng.integers(1, 250, size=2 * PS))
    a = prefix + list(rng.integers(1, 250, size=7))
    b = prefix + list(rng.integers(1, 250, size=9))

    base = InferenceEngine(_cfg(prefix=False),
                           params=jax.tree.map(jnp.copy, _params()))
    ra = [s.output_token_ids for s in base.generate([a], sampling=sp)]
    rb = [s.output_token_ids for s in base.generate([b], sampling=sp)]

    eng = InferenceEngine(_cfg(prefix=True),
                          params=jax.tree.map(jnp.copy, _params()))
    ga = [s.output_token_ids for s in eng.generate([a], sampling=sp)]
    gb = [s.output_token_ids for s in eng.generate([b], sampling=sp)]
    assert ga == ra and gb == rb
    assert eng.allocator.hits == 2          # b reused a's two prefix pages


def test_sharing_while_donor_is_live():
    """seq2 admitted while seq1 (same prompt) is still decoding: pages are
    shared by refcount, outputs match the base engine, and finishing either
    sequence never corrupts the other."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=8)
    prompt = list(np.random.default_rng(2).integers(1, 250, size=40))

    base = InferenceEngine(_cfg(prefix=False),
                           params=jax.tree.map(jnp.copy, _params()))
    [ref] = base.generate([prompt], sampling=sp)

    eng = InferenceEngine(_cfg(prefix=True),
                          params=jax.tree.map(jnp.copy, _params()))
    s1 = eng.add_request(prompt_token_ids=list(prompt), sampling=sp)
    # prefill seq1 fully and take a couple of decode steps
    while eng.scheduler.prefilling or eng.scheduler.waiting:
        eng.step()
    eng.step()
    s2 = eng.add_request(prompt_token_ids=list(prompt), sampling=sp)
    while not eng.scheduler.is_finished():
        eng.step()
    done = {q.seq_id: q for q in eng.scheduler.pop_finished()}
    assert done[s1].output_token_ids == ref.output_token_ids
    assert done[s2].output_token_ids == ref.output_token_ids
    assert eng.allocator.hits == 2
    assert eng.cache_stats.used_pages == 0


def test_chunked_prefill_hit():
    """Prompt longer than the largest prefill bucket: the repeat skips
    whole chunks (num_prefilled jumps past them at admission)."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=4)
    prompt = list(np.random.default_rng(3).integers(1, 250, size=70))

    base = InferenceEngine(_cfg(prefix=False),
                           params=jax.tree.map(jnp.copy, _params()))
    [ref] = base.generate([prompt], sampling=sp)

    eng = InferenceEngine(_cfg(prefix=True),
                          params=jax.tree.map(jnp.copy, _params()))
    [cold] = eng.generate([prompt], sampling=sp)
    pre_steps = eng.metrics.prefill_steps
    [warm] = eng.generate([prompt], sampling=sp)
    assert cold.output_token_ids == ref.output_token_ids
    assert warm.output_token_ids == ref.output_token_ids
    assert eng.allocator.hits == 4          # 70 @ 16/page -> 4 full pages
    # the warm run prefilled only the tail (one chunk vs three)
    assert eng.metrics.prefill_steps - pre_steps < pre_steps


def test_native_prefix_allocator_lockstep():
    """Randomized python <-> C++ lockstep for the prefix-caching allocator:
    identical page tables, free counts, hit/miss/eviction counters after
    every operation (same discipline as the base-allocator lockstep)."""
    import random

    from microvllm_tpu.runtime import native_alloc as native

    if not native.native_available():
        pytest.skip("native allocator not buildable here")
    cfg = _cache(num_pages=17)
    py = PrefixCachingAllocator(cfg)
    nat = native.NativePrefixCachingAllocator(cfg)
    rng = random.Random(7)
    # small pool of shared prefixes so matches actually happen
    prefixes = [[100 * p + t for t in range(2 * PS)] for p in range(3)]
    live: dict[int, list[int]] = {}

    def check(sid=None):
        assert py.num_free == nat.num_free
        assert py.hits == nat.hits and py.misses == nat.misses
        assert py.evictions == nat.evictions
        for s in live:
            assert py.seq_len(s) == nat.seq_len(s)
            np.testing.assert_array_equal(py.block_table_row(s),
                                          nat.block_table_row(s))

    for step in range(400):
        op = rng.random()
        if op < 0.45 or not live:
            sid = 1000 + step
            toks = rng.choice(prefixes) + [sid] * rng.randint(0, PS)
            m_py = py.allocate_prefix(sid, toks, len(toks))
            m_nat = nat.allocate_prefix(sid, toks, len(toks))
            assert m_py == m_nat
            rest = len(toks) - m_py
            ok_py = ok_nat = True
            try:
                (py.extend if m_py else py.allocate)(sid, rest)
            except OutOfPagesError:
                ok_py = False
            try:
                (nat.extend if m_nat else nat.allocate)(sid, rest)
            except OutOfPagesError:
                ok_nat = False
            assert ok_py == ok_nat
            if ok_py:
                py.register_seq(sid, toks, len(toks))
                nat.register_seq(sid, toks, len(toks))
                live[sid] = toks
            else:
                py.free(sid)
                nat.free(sid)
        elif op < 0.65:
            sid = rng.choice(list(live))
            ok_py = ok_nat = True
            try:
                py.append_token(sid)
            except OutOfPagesError:
                ok_py = False
            try:
                nat.append_token(sid)
            except OutOfPagesError:
                ok_nat = False
            assert ok_py == ok_nat
        elif op < 0.75:
            sid = rng.choice(list(live))
            new_len = rng.randint(len(live[sid]), py.seq_len(sid))
            py.truncate(sid, new_len)
            nat.truncate(sid, new_len)
        else:
            sid = rng.choice(list(live))
            py.free(sid)
            nat.free(sid)
            del live[sid]
        check()

    for sid in list(live):
        py.free(sid)
        nat.free(sid)
        del live[sid]
    check()
    assert py.stats.used_pages == nat.stats.used_pages == 0
    assert py.evictions > 0   # the random walk actually hit the LRU path


def test_server_metrics_surface():
    """The HTTP server exposes hit/miss/eviction counters under
    /metrics["prefix_cache"] when prefix caching is on."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer
    from microvllm_tpu.server.api import EngineServer, build_app

    eng = InferenceEngine(_cfg(prefix=True),
                          params=jax.tree.map(jnp.copy, _params()))
    srv = EngineServer(eng)
    srv.start()
    loop = asyncio.new_event_loop()
    try:
        client = TestClient(TestServer(build_app(srv)), loop=loop)
        loop.run_until_complete(client.start_server())

        async def go():
            body = {"prompt_token_ids": list(range(1, 41)),
                    "max_tokens": 3, "temperature": 0.0}
            r1 = await client.post("/generate", json=body)
            r2 = await client.post("/generate", json=body)
            assert r1.status == r2.status == 200
            assert ((await r1.json())["token_ids"]
                    == (await r2.json())["token_ids"])
            m = await (await client.get("/metrics")).json()
            pc = m["prefix_cache"]
            assert pc["page_hits"] == 2 and pc["hit_rate"] > 0

        loop.run_until_complete(go())
        loop.run_until_complete(client.close())
    finally:
        loop.close()


def test_engine_eviction_pressure_keeps_serving():
    """Many distinct prompts through a small pool: the cache evicts instead
    of leaking, and every request still completes."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=3)
    eng = InferenceEngine(_cfg(prefix=True, num_pages=20),
                          params=jax.tree.map(jnp.copy, _params()))
    rng = np.random.default_rng(4)
    for i in range(12):
        prompt = list(rng.integers(1, 250, size=40))
        [out] = eng.generate([prompt], sampling=sp)
        assert len(out.output_token_ids) == 3
    assert eng.allocator.evictions > 0
    assert eng.cache_stats.used_pages == 0
