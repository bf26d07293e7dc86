"""Per-token logprobs (SamplingParams.logprobs / EngineConfig.logprobs_k).

Correctness anchor: the reported chosen-token logprob must equal the raw
log-softmax of the same forward's logits, and under greedy decoding the
chosen token must be the top-1 alternative. Enabling logprobs must not
change which tokens are generated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  ParallelConfig, SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams


def _cfg(lp_k=4, parallel=None):
    return EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128,
        default_max_new_tokens=6,
        logprobs_k=lp_k,
        parallel=parallel or ParallelConfig(),
    )


def _params():
    from microvllm_tpu.models import transformer as T
    return T.init_params(ModelConfig.tiny(dtype="float32"),
                         jax.random.PRNGKey(5))


def test_token_logprobs_op():
    from microvllm_tpu.ops.sampling import token_logprobs
    logits = jax.random.normal(jax.random.PRNGKey(0), (3, 50))
    toks = jnp.array([4, 0, 49], jnp.int32)
    chosen, top, ids = token_logprobs(logits, toks, 5)
    ref = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for b in range(3):
        np.testing.assert_allclose(chosen[b], ref[b, int(toks[b])],
                                   rtol=1e-5, atol=1e-6)
        order = np.argsort(-ref[b])[:5]
        np.testing.assert_array_equal(np.asarray(ids[b]), order)
        np.testing.assert_allclose(np.asarray(top[b]), ref[b, order],
                                   rtol=1e-5, atol=1e-6)


def test_greedy_logprobs_consistency():
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, logprobs=3)
    prompt = [3, 1, 4, 1, 5]

    base = InferenceEngine(_cfg(lp_k=0),
                           params=jax.tree.map(jnp.copy, _params()))
    [ref] = base.generate([prompt],
                          sampling=SamplingParams(temperature=0.0,
                                                  max_new_tokens=6))

    eng = InferenceEngine(_cfg(lp_k=4),
                          params=jax.tree.map(jnp.copy, _params()))
    [seq] = eng.generate([prompt], sampling=sp)
    # same tokens with logprobs enabled
    assert seq.output_token_ids == ref.output_token_ids
    assert len(seq.logprobs) == len(seq.output_token_ids)
    for tok, entry in zip(seq.output_token_ids, seq.logprobs):
        assert len(entry["top"]) == 3          # trimmed to the request
        top_id, top_lp = entry["top"][0]
        assert top_id == tok                   # greedy = argmax = top-1
        assert abs(entry["logprob"] - top_lp) < 1e-5
        assert entry["logprob"] <= 0.0
        # descending alternatives
        lps = [p for _, p in entry["top"]]
        assert lps == sorted(lps, reverse=True)

    # rows that don't ask for logprobs get none (same engine)
    [quiet] = eng.generate([prompt],
                           sampling=SamplingParams(temperature=0.0,
                                                   max_new_tokens=6))
    assert quiet.logprobs == []
    assert quiet.output_token_ids == ref.output_token_ids


def test_logprobs_rejected_when_disabled():
    eng = InferenceEngine(_cfg(lp_k=0))
    with pytest.raises(ValueError, match="logprobs"):
        eng.add_request(prompt_token_ids=[1, 2, 3],
                        sampling=SamplingParams(logprobs=2))


def test_sharded_logprobs_match_single_device():
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, logprobs=2)
    mcfg = ModelConfig.tiny(num_heads=8, num_kv_heads=4, head_dim=32,
                            hidden_size=128, intermediate_size=256,
                            dtype="float32")
    prompt = [[2, 7, 1, 8], [3, 1, 4]]

    def run(parallel):
        from microvllm_tpu.models import transformer as T
        params = T.init_params(mcfg, jax.random.PRNGKey(9))
        cfg = _cfg(lp_k=4, parallel=parallel).replace(model=mcfg)
        eng = InferenceEngine(cfg, params=params)
        return eng.generate(prompt, sampling=sp)

    ref = run(None)
    got = run(ParallelConfig(tp_size=2, dp_size=2))
    for r, g in zip(ref, got):
        assert g.output_token_ids == r.output_token_ids
        assert len(g.logprobs) == len(r.logprobs) == 5
        for er, eg in zip(r.logprobs, g.logprobs):
            assert [i for i, _ in eg["top"]] == [i for i, _ in er["top"]]
            np.testing.assert_allclose(eg["logprob"], er["logprob"],
                                       rtol=1e-4, atol=1e-5)


def test_server_logprobs():
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer
    from microvllm_tpu.server.api import EngineServer, build_app

    eng = InferenceEngine(_cfg(lp_k=4),
                          params=jax.tree.map(jnp.copy, _params()))
    srv = EngineServer(eng)
    srv.start()
    loop = asyncio.new_event_loop()
    try:
        client = TestClient(TestServer(build_app(srv)), loop=loop)
        loop.run_until_complete(client.start_server())

        async def go():
            r = await client.post("/generate", json={
                "prompt_token_ids": [1, 2, 3, 4], "max_tokens": 4,
                "temperature": 0.0, "logprobs": 2})
            assert r.status == 200
            data = await r.json()
            assert len(data["logprobs"]) == 4
            assert data["logprobs"][0]["top"][0][0] == data["token_ids"][0]
            # over the engine cap -> 400
            r = await client.post("/generate", json={
                "prompt_token_ids": [1, 2], "logprobs": 99})
            assert r.status == 400
            # SSE: per-token logprobs field
            async with client.post("/generate_stream", json={
                    "prompt_token_ids": [1, 2, 3], "max_tokens": 3,
                    "temperature": 0.0, "logprobs": 1}) as resp:
                events = []
                async for line in resp.content:
                    line = line.strip()
                    if line.startswith(b"data: "):
                        events.append(__import__("json").loads(line[6:]))
                toks = [e for e in events if "token_id" in e]
                assert len(toks) == 3
                assert all("logprobs" in e for e in toks)
                assert toks[0]["logprobs"]["top"][0][0] == toks[0]["token_id"]

        loop.run_until_complete(go())
        loop.run_until_complete(client.close())
    finally:
        loop.close()
