"""Speculative decoding: proposals, verification, and the bit-identical
guarantee vs non-speculative greedy decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
from microvllm_tpu.models.speculative import ngram_propose
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def test_ngram_propose_finds_last_match():
    #        0  1  2  3  4  5  6  7  8
    hist = [[5, 6, 7, 8, 1, 5, 6, 9, 5],   # tail gram (9,5)? len=9 tail=[9,5]
            [1, 2, 3, 1, 2, 4, 1, 2, 0]]   # len=8, tail=[1,2] -> match at 3
    hist = jnp.asarray(np.array(hist, np.int32))
    lens = jnp.asarray(np.array([9, 8], np.int32))
    props = np.asarray(ngram_propose(hist, lens, k=3, n=2))
    # row 0: no earlier (9,5) -> fallback = last token repeated
    assert list(props[0]) == [5, 5, 5]
    # row 1: last match of (1,2) before the tail is at i=3 -> proposes 4,1,2
    assert list(props[1]) == [4, 1, 2]


def test_ngram_propose_handles_empty_history():
    hist = jnp.zeros((1, 16), jnp.int32)
    props = np.asarray(ngram_propose(hist, jnp.array([0], jnp.int32), k=4))
    assert props.shape == (1, 4)     # no crash; content irrelevant


def _cfg(spec_k=0, **kw):
    return EngineConfig(
        model=ModelConfig.tiny(),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128,
        default_max_new_tokens=8,
        spec_k=spec_k,
        **kw,
    )


@pytest.mark.parametrize("nsteps,k", [(2, 3), (4, 4)])
def test_spec_outputs_bit_identical_to_greedy(nsteps, k):
    """The core speculation contract: greedy outputs are unchanged."""
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4, 4, 4]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=24)

    ref = InferenceEngine(_cfg())
    ro = [s.output_token_ids for s in ref.generate(prompts, sampling=sp)]

    eng = InferenceEngine(_cfg(spec_k=k, spec_steps=nsteps))
    so = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]

    assert so == ro
    assert eng.metrics.spec_rounds > 0
    # pages fully released afterwards (truncate + free worked)
    assert eng.cache_stats.used_pages == 0


def test_spec_with_eos_mid_span():
    """EOS produced inside a speculative span finishes the sequence and
    discards the tail, like decode_span."""

    class Tok:
        eos_token_id = None

    eng = InferenceEngine(_cfg(spec_k=3, spec_steps=4))
    ref = InferenceEngine(_cfg())
    sp = SamplingParams(temperature=0.0, max_new_tokens=50)
    r = ref.generate([[3, 1, 4, 1, 5]], sampling=sp)[0]
    # pick an eos that appears in the reference output to force a mid-span stop
    eos = r.output_token_ids[len(r.output_token_ids) // 2]
    sp2 = SamplingParams(temperature=0.0, max_new_tokens=50,
                         stop_token_ids=(int(eos),))
    ref2 = InferenceEngine(_cfg())
    expect = ref2.generate([[3, 1, 4, 1, 5]], sampling=sp2)[0]
    got = eng.generate([[3, 1, 4, 1, 5]], sampling=sp2)[0]
    assert got.output_token_ids == expect.output_token_ids
    assert got.finish_reason == expect.finish_reason
    assert eng.cache_stats.used_pages == 0


def test_spec_mixed_with_sampling_falls_back_when_opted_out():
    """spec_sampled=False restores the greedy-only gate: a stochastic
    request in the batch turns speculation off — and still completes."""
    eng = InferenceEngine(_cfg(spec_k=3, spec_sampled=False))
    seqs = eng.generate(
        [[1, 2, 3], [7, 8, 9]],
        sampling=SamplingParams(temperature=0.8, max_new_tokens=6))
    assert all(len(s.output_token_ids) == 6 for s in seqs)
    assert eng.metrics.spec_rounds == 0
    assert eng.metrics.spec_fallbacks.get("sampled", 0) > 0


def test_spec_with_logprobs_keeps_speculating():
    """logprobs>0 requests no longer disable speculation: the verify
    pass's logits supply per-token logprob records, tokens stay
    bit-identical to the plain logprobs engine, and the records agree."""
    prompts = [[3, 1, 4, 1, 5]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, logprobs=3)

    ref = InferenceEngine(_cfg(logprobs_k=4))
    r = ref.generate(prompts, sampling=sp)[0]

    eng = InferenceEngine(_cfg(spec_k=3, spec_steps=2, logprobs_k=4,
                               spec_adaptive=False))
    g = eng.generate(prompts, sampling=sp)[0]

    assert g.output_token_ids == r.output_token_ids
    assert eng.metrics.spec_rounds > 0                 # spec actually ran
    assert eng.metrics.spec_fallbacks.get("logprobs", 0) == 0
    assert len(g.logprobs) == len(g.output_token_ids)
    for tok, mine, theirs in zip(g.output_token_ids, g.logprobs,
                                 r.logprobs):
        assert len(mine["top"]) == 3
        assert mine["top"][0][0] == tok                # greedy = top-1
        assert [t for t, _ in mine["top"]] == [t for t, _ in theirs["top"]]
        np.testing.assert_allclose(mine["logprob"], theirs["logprob"],
                                   rtol=1e-4, atol=1e-5)


def test_spec_sampled_engages_and_near_zero_temp_matches_greedy():
    """temperature>0 batches now speculate via rejection sampling. At
    temperature ~ 0 the filtered pool is a near-point-mass at the argmax,
    so the sampled spec path must reproduce the greedy engine's outputs
    exactly — and speculation must actually engage (no 'sampled'
    fallback)."""
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    ref = InferenceEngine(_cfg())
    ro = [s.output_token_ids for s in ref.generate(
        prompts, sampling=SamplingParams(temperature=0.0,
                                         max_new_tokens=24))]

    eng = InferenceEngine(_cfg(spec_k=3, spec_steps=2,
                               spec_adaptive=False))
    sp = SamplingParams(temperature=1e-6, top_p=1.0, max_new_tokens=24)
    so = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert so == ro
    assert eng.metrics.spec_rounds > 0
    assert eng.metrics.spec_fallbacks.get("sampled", 0) == 0


def test_spec_sampled_distribution_matches_plain_decode():
    """The rejection-sampling verifier is EXACT for a point-mass draft:
    over many runs the spec engine's stochastic outputs must follow the
    same distribution as the plain engine's. Small per-request top_k
    collapses the outcome space so N=300 runs give a sharp comparison
    (total variation distance over 3-token outputs)."""
    from collections import Counter

    prompt = [[3, 1, 4, 1, 5]]
    # top_k=2 collapses each position to <=2 candidates; the MARGINAL of
    # the first spec-produced token (index 1 — index 0 comes from the
    # shared prefill sampler) then has ~4 outcomes, so N=500 runs bound
    # same-distribution sampling noise at TV ~ 0.05 (3-sigma ~ 0.1).
    sp = SamplingParams(temperature=0.8, top_p=1.0, top_k=2,
                        max_new_tokens=3, ignore_eos=True)
    N = 500

    def sample_dist(eng):
        c = Counter()
        for _ in range(N):
            c[eng.generate(prompt, sampling=sp)[0].output_token_ids[1]] += 1
        return c

    plain = sample_dist(InferenceEngine(_cfg()))
    eng = InferenceEngine(_cfg(spec_k=3, spec_steps=2,
                               spec_adaptive=False))
    spec = sample_dist(eng)
    assert eng.metrics.spec_rounds > 0          # the spec path produced it

    keys = set(plain) | set(spec)
    tv = 0.5 * sum(abs(plain.get(t, 0) - spec.get(t, 0)) / N for t in keys)
    assert tv < 0.12, (tv, plain.most_common(5), spec.most_common(5))


def test_spec_sampled_seeded_rows_fall_back():
    """Per-request seeds need the (seed, pos)-keyed stream of the plain
    path; a seeded row in the batch turns speculation off with a counted
    reason."""
    eng = InferenceEngine(_cfg(spec_k=3))
    seqs = eng.generate(
        [[1, 2, 3]],
        sampling=SamplingParams(temperature=0.8, seed=7, max_new_tokens=6))
    assert len(seqs[0].output_token_ids) == 6
    assert eng.metrics.spec_rounds == 0
    assert eng.metrics.spec_fallbacks.get("seeded", 0) > 0


def test_spec_adaptive_disengages_on_low_acceptance():
    """Acceptance collapse flips the engine back to plain spans: with an
    unreachable acceptance floor the engine disengages as soon as the
    trailing window fills, keeps producing correct greedy tokens through
    plain decode, and re-probes after the cooldown (spec_rounds keeps
    growing across cooldown cycles)."""
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=40)

    ref = InferenceEngine(_cfg())
    ro = [s.output_token_ids for s in ref.generate(prompts, sampling=sp)]

    eng = InferenceEngine(_cfg(spec_k=3, spec_steps=2, spec_adaptive=True,
                               spec_accept_floor=1.1,   # unreachable
                               spec_min_rounds=2, spec_reprobe_spans=3))
    so = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert so == ro                                  # correctness unchanged
    m = eng.metrics
    assert m.spec_disengagements > 0                 # cooldown triggered
    assert m.spec_fallbacks.get("acceptance", 0) > 0  # plain spans ran
    first_rounds = m.spec_rounds
    assert first_rounds > 0
    # a second wave of traffic: the engine must re-probe (spec_rounds
    # grows) rather than staying disengaged forever
    so2 = [s.output_token_ids
           for s in eng.generate(prompts, sampling=sp)]
    assert so2 == ro
    assert eng.metrics.spec_rounds > first_rounds


def test_spec_adaptive_stays_engaged_above_floor():
    """With a floor of 0 the window never disengages speculation."""
    eng = InferenceEngine(_cfg(spec_k=3, spec_steps=2, spec_adaptive=True,
                               spec_accept_floor=0.0, spec_min_rounds=2))
    sp = SamplingParams(temperature=0.0, max_new_tokens=30)
    eng.generate([[1, 2, 3, 4, 5]], sampling=sp)
    assert eng.metrics.spec_disengagements == 0
    assert eng.metrics.spec_fallbacks.get("acceptance", 0) == 0
    assert eng.metrics.spec_rounds > 0


def test_allocator_truncate_python_and_native():
    from microvllm_tpu.config import CacheConfig
    from microvllm_tpu.runtime.kv_cache import PageAllocator
    from microvllm_tpu.runtime.native_alloc import (NativePageAllocator,
                                                    native_available)

    cfg = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8)
    allocs = [PageAllocator(cfg)]
    if native_available():
        allocs.append(NativePageAllocator(cfg))
    for a in allocs:
        a.allocate(1, 3)
        a.extend(1, 10)            # 13 tokens -> 4 pages
        free_before = a.num_free
        a.truncate(1, 5)           # -> 2 pages
        assert a.seq_len(1) == 5
        assert a.num_free == free_before + 2
        row = a.block_table_row(1)
        assert (row[2:] == 0).all()
        a.free(1)


def test_spec_with_int8_kv_matches_nonspec_int8():
    """r2 gated spec off under int8 KV; verification routes through
    prefill_step which handles quantized caches, so spec + int8 KV must
    produce the same greedy outputs as non-spec int8 KV."""
    from microvllm_tpu.config import QuantConfig
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    sp = SamplingParams(temperature=0.0, max_new_tokens=20)

    ref = InferenceEngine(_cfg(quant=QuantConfig(kv_bits=8)))
    ro = [s.output_token_ids for s in ref.generate(prompts, sampling=sp)]

    eng = InferenceEngine(_cfg(spec_k=3, spec_steps=2,
                               quant=QuantConfig(kv_bits=8)))
    so = [s.output_token_ids for s in eng.generate(prompts, sampling=sp)]
    assert so == ro
    assert eng.metrics.spec_rounds > 0
    assert eng.cache_stats.used_pages == 0


def test_spec_with_lora_adapter_matches_nonspec():
    """Spec span threads per-row adapter ids: a LoRA request under
    speculation matches its non-speculative greedy output."""
    from microvllm_tpu.config import LoRAConfig
    from microvllm_tpu.models import transformer as model_lib

    rank = 4
    mcfg = ModelConfig.tiny(dtype="float32")
    lc = LoRAConfig(rank=rank, max_adapters=4)

    def adapter():
        kg = jax.random.PRNGKey
        L, H = mcfg.num_layers, mcfg.hidden_size
        qkv_out = mcfg.q_dim + 2 * mcfg.kv_dim
        return {
            "qkv_a": jax.random.normal(kg(5), (L, H, rank)) * 0.3,
            "qkv_b": jax.random.normal(kg(6), (L, rank, qkv_out)) * 0.3,
            "o_a": jax.random.normal(kg(7), (L, mcfg.q_dim, rank)) * 0.3,
            "o_b": jax.random.normal(kg(8), (L, rank, mcfg.hidden_size)) * 0.3,
        }

    sp = SamplingParams(temperature=0.0, max_new_tokens=16)
    ref = InferenceEngine(_cfg().replace(model=mcfg, lora=lc))
    ref.load_adapter(adapter())
    ref.add_request(prompt_token_ids=[1, 2, 3, 4, 5], sampling=sp,
                    adapter_id=1)
    while not ref.scheduler.is_finished():
        ref.step()
    ro = ref.scheduler.pop_finished()[0].output_token_ids

    eng = InferenceEngine(
        _cfg(spec_k=3, spec_steps=2).replace(model=mcfg, lora=lc))
    eng.load_adapter(adapter())
    eng.add_request(prompt_token_ids=[1, 2, 3, 4, 5], sampling=sp,
                    adapter_id=1)
    while not eng.scheduler.is_finished():
        eng.step()
    so = eng.scheduler.pop_finished()[0].output_token_ids
    assert so == ro
    assert eng.metrics.spec_rounds > 0


def test_spec_fallback_reasons_counted():
    # temp>0 now speculates (rejection sampling); the counted fallback for
    # stochastic traffic survives via the spec_sampled=False opt-out
    eng = InferenceEngine(_cfg(spec_k=3, spec_sampled=False))
    eng.generate([[1, 2, 3]],
                 sampling=SamplingParams(temperature=0.9, max_new_tokens=4))
    assert eng.metrics.spec_fallbacks.get("sampled", 0) > 0
