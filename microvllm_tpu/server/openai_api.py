"""OpenAI-compatible endpoints: /v1/completions, /v1/chat/completions,
/v1/models.

Beyond the reference (which serves a bespoke ``/generate`` API only,
`api_server.py:96-184`): most LLM clients speak the OpenAI schema, so a
drop-in server needs it. Implemented as a thin adapter over the same
EngineServer request plumbing as the native endpoints — one engine, both
dialects.

Supported: string / token-id prompts, chat messages (tokenizer chat
template when available, a plain role-prefix fallback otherwise),
streaming (SSE with ``data: [DONE]``), stop strings/ids, temperature /
top_p / max_tokens, per-token logprobs (completions ``logprobs: N`` and
chat ``logprobs: true`` + ``top_logprobs``), usage accounting.
Unsupported (explicit 400): ``n > 1``, ``best_of > 1``, ``echo``,
``suffix``.
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Any, Optional

from aiohttp import web

from ..runtime.sequence import FinishReason, Sequence


def _err(msg: str, status: int = 400, type_: str = "invalid_request_error"):
    body = json.dumps({"error": {"message": msg, "type": type_,
                                 "param": None, "code": None}})
    cls = {400: web.HTTPBadRequest, 404: web.HTTPNotFound,
           503: web.HTTPServiceUnavailable}.get(status, web.HTTPBadRequest)
    return cls(text=body, content_type="application/json")


def _finish(seq: Sequence) -> str:
    return {FinishReason.STOP: "stop", FinishReason.LENGTH: "length",
            FinishReason.ABORTED: "abort"}.get(seq.finish_reason, "stop")


def add_openai_routes(app: web.Application, server, default_max: int) -> None:
    from .api import (_IncrementalDetokenizer, _json_body, _parse_sampling,
                      _PendingRequest)

    engine = server.engine
    model_id = "microvllm-tpu"
    for name, preset in __import__(
            "microvllm_tpu.config", fromlist=["PRESETS"]).PRESETS.items():
        if preset == engine.mcfg:
            model_id = name
            break

    def _not_follower() -> None:
        if server.is_follower:
            raise _err("this host is a follower; send requests to the "
                       "leader", 503, "service_unavailable")

    def _reject_unsupported(data: dict, allow_best_of: bool = False
                            ) -> tuple[int, int]:
        """Returns (n, best_of): generate best_of candidates, return the
        top n (ranked by mean token logprob when best_of > n)."""
        n = int(data.get("n", 1) or 1)
        best_of = int(data.get("best_of", 0) or n)
        if not 1 <= n <= 16:
            raise _err("n must be in [1, 16]")
        if not n <= best_of <= 16:
            raise _err("best_of must be in [n, 16]")
        if not allow_best_of and best_of != n:
            raise _err("best_of is only supported on /v1/completions")
        if (n > 1 or best_of > 1) and data.get("stream"):
            raise _err("n/best_of > 1 with stream is not supported")
        if (n > 1 or best_of > 1) and float(
                data.get("temperature", 1.0)) <= 0.0:
            raise _err("n/best_of > 1 requires temperature > 0 (greedy "
                       "candidates would be identical)")
        if best_of > n and engine.config.logprobs_k < 1:
            raise _err("best_of ranking needs token logprobs; start the "
                       "server with --logprobs-k >= 1")
        if data.get("echo"):
            raise _err("echo is not supported")
        if data.get("suffix"):
            raise _err("suffix is not supported")
        return n, best_of

    def _sampling(data: dict, lp_count: int, chat: bool):
        """Map OpenAI fields onto the native sampling parser (shared
        validation)."""
        native = {
            "temperature": data.get("temperature", 1.0),
            "top_p": data.get("top_p", 1.0),
            "max_tokens": data.get(
                "max_tokens", 16 if not chat else default_max),
            "ignore_eos": bool(data.get("ignore_eos", False)),
            "logprobs": lp_count,
        }
        if "top_k" in data:                      # common extension
            native["top_k"] = data["top_k"]
        stop = data.get("stop")
        if stop:
            native["stop"] = [stop] if isinstance(stop, str) else stop
        if data.get("stop_token_ids"):
            native["stop_token_ids"] = data["stop_token_ids"]
        for pen in ("presence_penalty", "frequency_penalty",
                    "repetition_penalty", "seed", "logit_bias"):
            if data.get(pen) is not None:
                native[pen] = data[pen]
        try:
            return _parse_sampling(native, default_max,
                                   engine.config.logprobs_k,
                                   engine.config.enable_penalties)
        except web.HTTPBadRequest as e:
            msg = json.loads(e.text).get("error", "bad sampling params")
            raise _err(msg)

    def _encode_prompt(prompt) -> list[int]:
        if isinstance(prompt, list) and len(prompt) == 1 \
                and isinstance(prompt[0], (str, list)):
            prompt = prompt[0]                   # [prompt] -> prompt
        if isinstance(prompt, str):
            if engine.tokenizer is None:
                raise _err("server has no tokenizer; send token ids")
            return list(engine.tokenizer.encode(prompt))
        if isinstance(prompt, list) and all(isinstance(t, int)
                                            for t in prompt):
            return prompt
        raise _err("prompt must be a string, a token-id list, or a "
                   "singleton list of either (n=1 server)")

    def _chat_ids(messages) -> list[int]:
        if engine.tokenizer is None:
            raise _err("server has no tokenizer; use /v1/completions with "
                       "token ids")
        if not (isinstance(messages, list) and messages
                and all(isinstance(m, dict) and "role" in m
                        and "content" in m for m in messages)):
            raise _err("messages must be a non-empty list of "
                       "{role, content}")
        tok = engine.tokenizer
        if hasattr(tok, "apply_chat_template"):
            try:
                return list(tok.apply_chat_template(
                    messages, tokenize=True, add_generation_prompt=True))
            except Exception:
                pass                             # template missing: fall back
        text = "\n".join(f"{m['role']}: {m['content']}" for m in messages)
        return list(tok.encode(text + "\nassistant:"))

    def _piece(token_id: int) -> str:
        try:
            return engine.tokenizer.decode([token_id])
        except Exception:
            return ""

    def _completions_logprobs(seq: Sequence) -> Optional[dict]:
        """OpenAI text-completions logprobs block."""
        if not seq.logprobs:
            return None
        tokens, tlp, top, offsets = [], [], [], []
        pos = 0
        for tok, entry in zip(seq.output_token_ids, seq.logprobs):
            piece = _piece(tok) if engine.tokenizer is not None else str(tok)
            tokens.append(piece)
            tlp.append(entry["logprob"])
            top.append({(_piece(i) if engine.tokenizer is not None
                         else str(i)): lp for i, lp in entry["top"]})
            offsets.append(pos)
            pos += len(piece)
        return {"tokens": tokens, "token_logprobs": tlp,
                "top_logprobs": top, "text_offset": offsets}

    def _chat_logprobs(seq: Sequence) -> Optional[dict]:
        if not seq.logprobs:
            return None
        content = []
        for tok, entry in zip(seq.output_token_ids, seq.logprobs):
            piece = _piece(tok) if engine.tokenizer is not None else str(tok)
            content.append({
                "token": piece, "logprob": entry["logprob"],
                "top_logprobs": [
                    {"token": (_piece(i) if engine.tokenizer is not None
                               else str(i)), "logprob": lp}
                    for i, lp in entry["top"]],
            })
        return {"content": content}

    async def _run(ids: list[int], sampling, n: int = 1) -> list[Sequence]:
        """Submit n parallel samples of the same prompt (n > 1: distinct
        stochastic rows in the same decode batches; with --prefix-cache the
        later rows reuse the first's prompt pages)."""
        loop = asyncio.get_running_loop()
        reqs = []
        for _ in range(n):
            req = _PendingRequest(prompt=None, prompt_token_ids=list(ids),
                                  sampling=sampling, loop=loop,
                                  done=loop.create_future())
            server.submit(req)
            reqs.append(req)
        try:
            return list(await asyncio.gather(*[r.done for r in reqs]))
        except ValueError as e:
            raise _err(str(e))

    async def _stream(request, ids, sampling, make_chunk, first_chunk=None):
        """Shared SSE loop for both streaming endpoints."""
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        req = _PendingRequest(prompt=None, prompt_token_ids=ids,
                              sampling=sampling, stream_queue=q, loop=loop,
                              done=loop.create_future())
        server.submit(req)
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        detok = (_IncrementalDetokenizer(engine.tokenizer)
                 if engine.tokenizer is not None else None)
        try:
            if first_chunk is not None:
                await resp.write(
                    f"data: {json.dumps(first_chunk)}\n\n".encode())
            while True:
                item = await q.get()
                if item[0] == "error":
                    await resp.write(
                        f"data: {json.dumps({'error': {'message': item[1]}})}\n\n".encode())
                    break
                token_id, finished, lp = item
                if detok is not None:
                    text = detok.push(token_id)
                    if finished:
                        text += detok.flush()
                else:
                    text = str(token_id)
                chunk = make_chunk(text, finished, lp, req.seq_obj)
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
                if finished:
                    await resp.write(b"data: [DONE]\n\n")
                    break
        except (asyncio.CancelledError, ConnectionResetError):
            req.cancelled = True
            if req.seq_id is not None:
                server.abort(req.seq_id)
            raise
        await resp.write_eof()
        return resp

    def _created() -> int:
        return int(time.time())

    # -- endpoints -----------------------------------------------------------

    async def models(request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{"id": model_id, "object": "model",
                      "created": _created(), "owned_by": "microvllm_tpu"}],
        })

    async def completions(request: web.Request) -> web.Response:
        _not_follower()
        data = await _json_body(request)
        n, best_of = _reject_unsupported(data, allow_best_of=True)
        lp = data.get("logprobs") or 0
        if not isinstance(lp, int) or lp < 0:
            raise _err("logprobs must be a non-negative integer")
        # best_of ranking needs per-token logprobs even if the client
        # didn't ask for them
        lp_internal = max(lp, 1) if best_of > n else lp
        sampling = _sampling(data, lp_internal, chat=False)
        ids = _encode_prompt(data.get("prompt"))

        if data.get("stream"):
            def chunk(text, finished, lp_entry, seq):
                c = {"id": f"cmpl-{id(data)}", "object": "text_completion",
                     "created": _created(), "model": model_id,
                     "choices": [{"index": 0, "text": text,
                                  "logprobs": None,
                                  "finish_reason": (_finish(seq) if finished
                                                    and seq is not None
                                                    else None)}]}
                if lp_entry is not None:
                    c["choices"][0]["logprobs"] = {
                        "tokens": [text],
                        "token_logprobs": [lp_entry["logprob"]],
                        "top_logprobs": [{(_piece(i) if engine.tokenizer
                                           is not None else str(i)): v
                                          for i, v in lp_entry["top"]}],
                    }
                return c
            return await _stream(request, ids, sampling, chunk)

        seqs = await _run(ids, sampling, best_of)
        if best_of > n:
            # rank candidates by mean token logprob, keep the top n
            def score(s: Sequence) -> float:
                if not s.logprobs:
                    return float("-inf")
                return sum(e["logprob"] for e in s.logprobs) / len(s.logprobs)
            seqs = sorted(seqs, key=score, reverse=True)[:n]
            if lp == 0:        # client didn't ask for logprobs
                for s in seqs:
                    s.logprobs = []
        completion_tokens = sum(len(s.output_token_ids) for s in seqs)
        out = {
            "id": f"cmpl-{seqs[0].seq_id}", "object": "text_completion",
            "created": _created(), "model": model_id,
            "choices": [{"index": i,
                         "text": (engine.decode_text(s)
                                  if engine.tokenizer is not None else ""),
                         "token_ids": s.output_token_ids,
                         "logprobs": _completions_logprobs(s),
                         "finish_reason": _finish(s)}
                        for i, s in enumerate(seqs)],
            "usage": {"prompt_tokens": len(ids),
                      "completion_tokens": completion_tokens,
                      "total_tokens": len(ids) + completion_tokens},
        }
        return web.json_response(out)

    async def chat_completions(request: web.Request) -> web.Response:
        _not_follower()
        data = await _json_body(request)
        n, _ = _reject_unsupported(data)
        lp = 0
        if data.get("logprobs"):
            lp = int(data.get("top_logprobs", 1) or 1)
        sampling = _sampling(data, lp, chat=True)
        ids = _chat_ids(data.get("messages"))

        if data.get("stream"):
            base = {"id": f"chatcmpl-{id(data)}",
                    "object": "chat.completion.chunk",
                    "created": _created(), "model": model_id}
            first = dict(base, choices=[{
                "index": 0, "delta": {"role": "assistant", "content": ""},
                "finish_reason": None}])

            def chunk(text, finished, lp_entry, seq):
                return dict(base, choices=[{
                    "index": 0, "delta": {"content": text},
                    "finish_reason": (_finish(seq) if finished
                                      and seq is not None else None)}])
            return await _stream(request, ids, sampling, chunk,
                                 first_chunk=first)

        seqs = await _run(ids, sampling, n)
        completion_tokens = sum(len(s.output_token_ids) for s in seqs)
        out = {
            "id": f"chatcmpl-{seqs[0].seq_id}", "object": "chat.completion",
            "created": _created(), "model": model_id,
            "choices": [{"index": i,
                         "message": {
                             "role": "assistant",
                             "content": (engine.decode_text(s)
                                         if engine.tokenizer is not None
                                         else "")},
                         "logprobs": _chat_logprobs(s),
                         "finish_reason": _finish(s)}
                        for i, s in enumerate(seqs)],
            "usage": {"prompt_tokens": len(ids),
                      "completion_tokens": completion_tokens,
                      "total_tokens": len(ids) + completion_tokens},
        }
        return web.json_response(out)

    app.router.add_get("/v1/models", models)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/chat/completions", chat_completions)
