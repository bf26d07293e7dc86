"""Sliding-window attention (mistral family).

Anchors: (1) window >= context is exactly full attention; (2) the paged
decode/chunked-prefill engine path matches a windowed full-recompute
oracle token for token; (3) HF differential for the mistral family lives
in test_hf_differential.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
from microvllm_tpu.models import transformer as T
from microvllm_tpu.ops.attention import (chunked_prefill_attention_ref,
                                         paged_decode_attention_ref,
                                         prefill_attention_ref)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_prefill_window_mask():
    B, S, H, KV, D = 2, 12, 4, 2, 16
    q, k, v = _rand(0, B, S, H, D), _rand(1, B, S, KV, D), _rand(2, B, S, KV, D)
    full = prefill_attention_ref(q, k, v, 0.25)
    # window >= S: identical
    np.testing.assert_allclose(prefill_attention_ref(q, k, v, 0.25, window=S),
                               full, rtol=1e-6, atol=1e-6)
    # window bites: position p must equal attention over keys (p-w, p]
    w = 5
    got = prefill_attention_ref(q, k, v, 0.25, window=w)
    for p in range(S):
        lo = max(0, p - w + 1)
        sub = prefill_attention_ref(q[:, lo:p + 1], k[:, lo:p + 1],
                                    v[:, lo:p + 1], 0.25)
        np.testing.assert_allclose(got[:, p], sub[:, -1],
                                   rtol=1e-5, atol=1e-5)


def test_decode_window_equals_truncated_context():
    """Windowed paged decode == full decode over only the last w tokens."""
    B, H, KV, D, ps, n_pages = 2, 4, 2, 16, 4, 9
    max_pages = 4
    q = _rand(3, B, H, D)
    k_pages = _rand(4, n_pages, KV, ps, D)
    v_pages = _rand(5, n_pages, KV, ps, D)
    tables = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([14, 11], jnp.int32)
    w = 6
    got = paged_decode_attention_ref(q, k_pages, v_pages, tables, lens,
                                     0.25, window=w)

    # oracle: materialize each row's last-w keys and run dense attention
    for b in range(B):
        L = int(lens[b])
        ks = jnp.concatenate([k_pages[tables[b, i]] for i in range(max_pages)],
                             axis=1)[:, :L]     # [KV, L, D]
        vs = jnp.concatenate([v_pages[tables[b, i]] for i in range(max_pages)],
                             axis=1)[:, :L]
        ks, vs = ks[:, L - w:], vs[:, L - w:]
        qg = q[b].reshape(KV, H // KV, D)
        sc = jnp.einsum("kgd,ksd->kgs", qg, ks) * 0.25
        pr = jax.nn.softmax(sc, axis=-1)
        ref = jnp.einsum("kgs,ksd->kgd", pr, vs).reshape(H, D)
        np.testing.assert_allclose(got[b], ref, rtol=1e-5, atol=1e-5)


def test_engine_windowed_matches_full_recompute_oracle():
    """Greedy generation on a sliding-window tiny model: the paged engine
    (chunked prefill + decode appends) must match a step-by-step
    full-recompute oracle using forward_logits (which applies the same
    window mask on absolute positions)."""
    W = 8
    mcfg = ModelConfig.tiny(dtype="float32", sliding_window=W)
    params = T.init_params(mcfg, jax.random.PRNGKey(2))

    prompt = list((np.arange(37) % 200 + 1).astype(int))
    n_new = 6

    # oracle: recompute the whole (windowed) sequence each step
    ids = list(prompt)
    oracle = []
    for _ in range(n_new):
        logits = T.forward_logits(mcfg, params,
                                  jnp.asarray([ids], jnp.int32))
        nxt = int(jnp.argmax(logits[0, len(ids) - 1]))
        oracle.append(nxt)
        ids.append(nxt)

    eng = InferenceEngine(EngineConfig(
        model=mcfg,
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=2, max_prefill_tokens=128, prefill_wait_s=0.0,
            decode_buckets=(1, 2), prefill_len_buckets=(16,),  # forces chunks
            prefill_batch_buckets=(1,), decode_spans=(1, 2)),
        max_model_len=128), params=jax.tree.map(jnp.copy, params))
    [seq] = eng.generate([prompt], sampling=SamplingParams(
        temperature=0.0, max_new_tokens=n_new))
    assert seq.output_token_ids == oracle


def test_window_noop_when_capacity_below_window():
    """A model with window >= the cache capacity behaves exactly like the
    same model with no window (the mask is statically dropped, keeping the
    Pallas kernel path eligible on TPU)."""
    mcfg_w = ModelConfig.tiny(dtype="float32", sliding_window=512)
    mcfg_f = ModelConfig.tiny(dtype="float32")
    params = T.init_params(mcfg_f, jax.random.PRNGKey(4))

    def run(mcfg):
        eng = InferenceEngine(EngineConfig(
            model=mcfg,
            cache=CacheConfig(num_pages=32, page_size=16,
                              max_pages_per_seq=4),   # capacity 64 < 512
            scheduler=SchedulerConfig(
                max_batch_size=2, max_prefill_tokens=128, prefill_wait_s=0.0,
                decode_buckets=(1,), prefill_len_buckets=(16,),
                prefill_batch_buckets=(1,), decode_spans=(1, 2)),
            max_model_len=48), params=jax.tree.map(jnp.copy, params))
        [s] = eng.generate([[5, 3, 8, 2, 9]], sampling=SamplingParams(
            temperature=0.0, max_new_tokens=6))
        return s.output_token_ids

    assert run(mcfg_w) == run(mcfg_f)


def test_chunked_prefill_window_consistency():
    """Chunked windowed prefill == unchunked windowed prefill: the engine
    oracle test above covers it end-to-end; here the attention op level —
    a chunk attending to paged history with a window must equal the same
    positions of a full windowed prefill."""
    B, KV, H, D, ps = 1, 2, 4, 16, 4
    S_total, S_chunk, w = 12, 4, 5
    hist_len = S_total - S_chunk
    k_all = _rand(7, B, S_total, KV, D)
    v_all = _rand(8, B, S_total, KV, D)
    q_all = _rand(9, B, S_total, H, D)

    full = prefill_attention_ref(q_all, k_all, v_all, 0.25, window=w)

    # paged history: first hist_len tokens in pages
    n_pages = hist_len // ps
    tables = jnp.arange(1, 1 + n_pages, dtype=jnp.int32)[None]
    k_pages = jnp.zeros((1 + n_pages, KV, ps, D), jnp.float32)
    v_pages = jnp.zeros((1 + n_pages, KV, ps, D), jnp.float32)
    hk = k_all[0, :hist_len].transpose(1, 0, 2).reshape(KV, n_pages, ps, D)
    hv = v_all[0, :hist_len].transpose(1, 0, 2).reshape(KV, n_pages, ps, D)
    k_pages = k_pages.at[1:].set(hk.transpose(1, 0, 2, 3))
    v_pages = v_pages.at[1:].set(hv.transpose(1, 0, 2, 3))

    got = chunked_prefill_attention_ref(
        q_all[:, hist_len:], k_all[:, hist_len:], v_all[:, hist_len:],
        k_pages, v_pages, tables, jnp.asarray([hist_len], jnp.int32),
        0.25, window=w)
    np.testing.assert_allclose(got, full[:, hist_len:], rtol=1e-5, atol=1e-5)


def test_window_eviction_frees_pages_and_preserves_outputs():
    """Uniformly-windowed models free KV pages behind the window as they
    decode; outputs are bit-identical to the no-eviction run (the freed
    positions were already masked) and live pages stay O(window)."""
    import dataclasses

    from microvllm_tpu.config import (CacheConfig, EngineConfig,
                                      SchedulerConfig)
    from microvllm_tpu.runtime.engine import InferenceEngine
    from microvllm_tpu.runtime.sequence import SamplingParams

    mcfg = ModelConfig.tiny(sliding_window=24, model_type="mistral",
                            qkv_bias=False, tie_word_embeddings=True)
    cfg = EngineConfig(
        model=mcfg,
        cache=CacheConfig(num_pages=32, page_size=16, max_pages_per_seq=16),
        scheduler=SchedulerConfig(max_batch_size=2, prefill_wait_s=0.0,
                                  decode_buckets=(1,),
                                  prefill_len_buckets=(16,),
                                  prefill_batch_buckets=(1,),
                                  decode_spans=(1, 8)),
        max_model_len=256, seed=0)
    eng = InferenceEngine(cfg)
    assert eng._window_evict
    import jax
    params = eng.params
    prompt = list(range(1, 40))
    sp = SamplingParams(temperature=0.0, max_new_tokens=120, ignore_eos=True)

    seqs = eng.generate([prompt], sampling=sp)
    out_evict = seqs[0].output_token_ids
    assert eng.metrics.window_pages_evicted > 0
    # all pages returned at the end
    assert eng.allocator.num_free == cfg.cache.num_usable_pages

    # reference run: same engine config, eviction disabled
    eng2 = InferenceEngine(cfg, params=params)
    eng2._window_evict = False
    out_plain = eng2.generate([prompt], sampling=sp)[0].output_token_ids
    assert out_evict == out_plain

    # live-page bound mid-run: window 24 + span slack fits in ~4 pages;
    # run a fresh stream and check the held pages never exceed the bound
    eng3 = InferenceEngine(cfg, params=params)
    eng3.add_request(prompt_token_ids=prompt, sampling=sp)
    max_live = 0
    while not eng3.scheduler.finished:
        eng3.step()
        st = eng3.cache_stats
        max_live = max(max_live, st.used_pages)
    # no-eviction worst case: pages for 40 + 120 tokens = 10 pages
    assert max_live <= 6, max_live
