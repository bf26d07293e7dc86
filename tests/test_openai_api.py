"""OpenAI-compatible API (/v1/completions, /v1/chat/completions, /v1/models).

Drop-in schema over the same engine as the native endpoints (the reference
serves only its bespoke /generate — most clients speak OpenAI, so a
switch-in server needs this dialect). Tested with a deterministic fake
tokenizer: token id i <-> the text "<i>".
"""

import asyncio
import json
import re

import jax
import jax.numpy as jnp
import pytest
from aiohttp.test_utils import TestClient, TestServer

from microvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.server.api import EngineServer, build_app


class FakeTokenizer:
    """id i <-> "<i>"; reversible so text->ids->text round-trips."""
    eos_token_id = None

    def encode(self, text):
        return [int(t) % 256 + 1 for t in re.findall(r"<(\d+)>", text)] \
            or [ord(c) % 256 + 1 for c in text][:16]

    def decode(self, ids, **kw):
        return "".join(f"<{i}>" for i in ids)


def make_server(lp_k=4, penalties=False) -> EngineServer:
    cfg = EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=8, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128,
        default_max_new_tokens=8,
        logprobs_k=lp_k,
        enable_penalties=penalties,
    )
    engine = InferenceEngine(cfg, tokenizer=FakeTokenizer())
    srv = EngineServer(engine)
    srv.start()
    return srv


@pytest.fixture(scope="module")
def loop():
    loop = asyncio.new_event_loop()
    yield loop
    loop.close()


@pytest.fixture(scope="module")
def client(loop):
    srv = make_server()
    app = build_app(srv)
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield client
    loop.run_until_complete(client.close())


def test_models(client, loop):
    async def go():
        resp = await client.get("/v1/models")
        assert resp.status == 200
        data = await resp.json()
        assert data["object"] == "list" and len(data["data"]) == 1
    loop.run_until_complete(go())


def test_completions_token_ids(client, loop):
    async def go():
        resp = await client.post("/v1/completions", json={
            "model": "x", "prompt": [1, 2, 3, 4],
            "max_tokens": 5, "temperature": 0.0})
        assert resp.status == 200
        data = await resp.json()
        c = data["choices"][0]
        assert data["object"] == "text_completion"
        assert len(c["token_ids"]) == 5
        assert c["text"] == "".join(f"<{i}>" for i in c["token_ids"])
        assert c["finish_reason"] == "length"
        assert data["usage"]["total_tokens"] == 9
    loop.run_until_complete(go())


def test_completions_text_prompt_and_stop(client, loop):
    async def go():
        # probe an unstopped run, then stop on the 2nd token's text
        r = await client.post("/v1/completions", json={
            "prompt": "<1><2><3>", "max_tokens": 6, "temperature": 0.0})
        toks = (await r.json())["choices"][0]["token_ids"]
        stop = f"<{toks[1]}>"
        expect = next(k for k in range(1, 7)
                      if stop in "".join(f"<{t}>" for t in toks[:k]))
        r = await client.post("/v1/completions", json={
            "prompt": "<1><2><3>", "max_tokens": 6, "temperature": 0.0,
            "stop": stop})
        c = (await r.json())["choices"][0]
        assert c["token_ids"] == toks[:expect]
        assert c["finish_reason"] == "stop"
    loop.run_until_complete(go())


def test_completions_logprobs(client, loop):
    async def go():
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3], "max_tokens": 3, "temperature": 0.0,
            "logprobs": 2})
        c = (await r.json())["choices"][0]
        lp = c["logprobs"]
        assert len(lp["tokens"]) == 3
        assert len(lp["top_logprobs"][0]) == 2
        # greedy: the chosen token is the argmax -> its lp equals the max
        first_tok = lp["tokens"][0]
        assert lp["top_logprobs"][0][first_tok] == lp["token_logprobs"][0]
        assert lp["text_offset"][0] == 0
    loop.run_until_complete(go())


def test_completions_unsupported_400(client, loop):
    async def go():
        for body in ({"prompt": [1], "n": 2, "temperature": 0.0},
                     {"prompt": [1], "n": 2, "stream": True},
                     {"prompt": [1], "n": 99},
                     {"prompt": [1], "best_of": 4, "temperature": 0.0},
                     {"prompt": [1], "n": 3, "best_of": 2},
                     {"prompt": [1], "echo": True},
                     {"prompt": [1], "suffix": "x"},
                     {"prompt": {"bad": 1}}):
            resp = await client.post("/v1/completions", json=body)
            assert resp.status == 400, body
            err = (await resp.json())["error"]
            assert "message" in err
    loop.run_until_complete(go())


def test_completions_n_parallel_samples(client, loop):
    async def go():
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3, 4], "max_tokens": 6, "temperature": 0.9,
            "n": 3, "top_p": 1.0})
        assert r.status == 200
        data = await r.json()
        assert [c["index"] for c in data["choices"]] == [0, 1, 2]
        assert all(len(c["token_ids"]) == 6 for c in data["choices"])
        assert data["usage"]["completion_tokens"] == 18
        # stochastic: at least two of the three samples should differ
        outs = {tuple(c["token_ids"]) for c in data["choices"]}
        assert len(outs) >= 2
    loop.run_until_complete(go())


def test_completions_streaming(client, loop):
    async def go():
        async with client.post("/v1/completions", json={
                "prompt": [5, 6, 7], "max_tokens": 4, "temperature": 0.0,
                "stream": True}) as resp:
            assert resp.status == 200
            events, done = [], False
            async for line in resp.content:
                line = line.strip()
                if not line.startswith(b"data: "):
                    continue
                if line == b"data: [DONE]":
                    done = True
                    break
                events.append(json.loads(line[6:]))
            assert done
            assert len(events) == 4
            assert all(e["object"] == "text_completion" for e in events)
            assert events[-1]["choices"][0]["finish_reason"] == "length"
            text = "".join(e["choices"][0]["text"] for e in events)
            assert text.count("<") == 4
    loop.run_until_complete(go())


def test_completions_best_of(client, loop):
    async def go():
        r = await client.post("/v1/completions", json={
            "prompt": [1, 2, 3], "max_tokens": 4, "temperature": 1.2,
            "n": 1, "best_of": 4})
        assert r.status == 200
        data = await r.json()
        assert len(data["choices"]) == 1
        c = data["choices"][0]
        assert c["logprobs"] is None        # client didn't ask for them
        assert len(c["token_ids"]) == 4
        # usage counts every generated candidate? no — returned choices only
        assert data["usage"]["completion_tokens"] == 4
        # chat endpoint rejects best_of
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "<1>"}],
            "best_of": 2})
        assert r.status == 400
    loop.run_until_complete(go())


def test_tokenize_detokenize(client, loop):
    async def go():
        r = await client.post("/tokenize", json={"text": "<5><9><200>"})
        ids = (await r.json())["token_ids"]
        assert ids == [6, 10, 201]          # fake tokenizer: id = t%256+1
        r = await client.post("/detokenize", json={"token_ids": ids})
        assert (await r.json())["text"] == "<6><10><201>"
        r = await client.post("/tokenize", json={})
        assert r.status == 400
        r = await client.post("/detokenize", json={"token_ids": ["x"]})
        assert r.status == 400
    loop.run_until_complete(go())


def test_chat_completions(client, loop):
    async def go():
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "system", "content": "<9>"},
                         {"role": "user", "content": "<1><2>"}],
            "max_tokens": 4, "temperature": 0.0})
        assert r.status == 200
        data = await r.json()
        c = data["choices"][0]
        assert data["object"] == "chat.completion"
        assert c["message"]["role"] == "assistant"
        assert c["message"]["content"].count("<") == 4
        assert c["finish_reason"] == "length"
        assert data["usage"]["completion_tokens"] == 4
    loop.run_until_complete(go())


def test_chat_streaming_and_logprobs(client, loop):
    async def go():
        async with client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "<3>"}],
                "max_tokens": 3, "temperature": 0.0,
                "stream": True}) as resp:
            chunks = []
            async for line in resp.content:
                line = line.strip()
                if line == b"data: [DONE]":
                    break
                if line.startswith(b"data: "):
                    chunks.append(json.loads(line[6:]))
            assert chunks[0]["choices"][0]["delta"]["role"] == "assistant"
            content = "".join(c["choices"][0]["delta"].get("content", "")
                              for c in chunks)
            assert content.count("<") == 3
            assert chunks[-1]["choices"][0]["finish_reason"] == "length"

        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "<3>"}],
            "max_tokens": 2, "temperature": 0.0,
            "logprobs": True, "top_logprobs": 2})
        lp = (await r.json())["choices"][0]["logprobs"]["content"]
        assert len(lp) == 2 and len(lp[0]["top_logprobs"]) == 2
        assert lp[0]["top_logprobs"][0]["token"] == lp[0]["token"]
    loop.run_until_complete(go())


def test_penalties_flow_through_openai_dialect(loop):
    """presence/frequency/repetition penalties map onto the native sampler
    when the engine enables them; logit_bias stays explicitly rejected."""
    srv = make_server(penalties=True)
    app = build_app(srv)

    async def go():
        client = TestClient(TestServer(app), loop=asyncio.get_running_loop())
        await client.start_server()
        try:
            resp = await client.post("/v1/completions", json={
                "model": "m", "prompt": "<5><9><2>", "max_tokens": 10,
                "temperature": 0.0, "frequency_penalty": 2.0,
                "presence_penalty": 2.0, "ignore_eos": True})
            assert resp.status == 200, await resp.text()
            text = (await resp.json())["choices"][0]["text"]
            ids = re.findall(r"<(\d+)>", text)
            assert len(set(ids)) == len(ids)     # all-distinct under penalty
            # logit_bias now flows through too: +100 forces the token
            resp = await client.post("/v1/completions", json={
                "model": "m", "prompt": "<5>", "max_tokens": 2,
                "temperature": 0.0, "ignore_eos": True,
                "logit_bias": {"123": 100}})
            assert resp.status == 200, await resp.text()
            assert (await resp.json())["choices"][0]["text"] == "<123><123>"
        finally:
            await client.close()
    loop.run_until_complete(go())
    srv.shutdown()
