"""HTTP serving front end.

The capability twin of the reference's FastAPI server (`api_server.py:96-184`:
``/generate``, ``/batch_generate``, ``/generate_stream`` SSE, ``/health``),
built on aiohttp.web. Single-controller design: one engine thread steps the
scheduler continuously (the reference's rank-0 asyncio loop,
`api_server.py:61-76`); there is no per-step cross-rank object broadcast —
SPMD JAX makes the reference's `BatchInferenceContext` control plane
(`core/inference_context.py`) unnecessary.

Token streaming: the engine's per-token callback bridges into each request's
asyncio queue via ``loop.call_soon_threadsafe`` (the reference uses a
blocking `queue.Queue` bridge, `api_server.py:137-161`).
"""

from __future__ import annotations

import asyncio
import json
import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Optional

from aiohttp import web

from ..config import EngineConfig
from ..runtime.engine import InferenceEngine
from ..runtime.sequence import SamplingParams, Sequence

logger = logging.getLogger("microvllm_tpu.server")


@dataclass
class _PendingRequest:
    prompt: Optional[str]
    prompt_token_ids: Optional[list[int]]
    sampling: SamplingParams
    priority: int = 0
    adapter_id: int = 0
    stream_queue: Optional[asyncio.Queue] = None   # set for streaming
    loop: Optional[asyncio.AbstractEventLoop] = None
    done: Optional[asyncio.Future] = None
    seq_id: Optional[int] = None
    seq_obj: Optional[Sequence] = None   # set at admission (engine thread)
    cancelled: bool = False    # client went away before admission


class EngineServer:
    """Engine thread + request plumbing shared by all endpoints.

    Multi-host serving (reference anchor: the rank-0 serving loop,
    `api_server.py:61-90`): host 0 runs with ``fanout_port`` set and
    publishes every admission-order event (adapter installs, aborts,
    requests) plus one ``step`` marker per engine step over a TCP stream
    (`parallel/distributed.py::RequestFanout`). Followers run with
    ``leader`` set: they apply the records of each marker group and then
    step once — so every host's scheduler makes identical decisions and
    the only per-step cross-host traffic besides the jit'd collectives is
    a ~20-byte marker (vs the reference's pickled per-step object
    broadcast, which SURVEY §5 said not to port).

    Determinism requirements enforced here: ``prefill_wait_s`` must be 0
    (wall-clock batch forming would diverge across hosts), and followers
    register a no-op stream callback for replicated streaming requests so
    the adaptive-span choice matches the leader's.
    """

    def __init__(self, engine: InferenceEngine,
                 fanout_port: Optional[int] = None,
                 leader: Optional[str] = None):
        self.engine = engine
        self._pending: list[_PendingRequest] = []
        self._aborts: list[int] = []
        self._adapter_loads: list[tuple[dict, Optional[int], Any, Optional[str]]] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._inflight: dict[int, _PendingRequest] = {}
        self.is_follower = leader is not None
        self._fanout = None
        self._follower = None
        self._records: list[dict] = []      # follower: received, un-applied
        self._markers = 0                   # follower: step markers pending
        self.replicated_finished: list[dict] = []   # follower: audit trail
        if fanout_port is not None and leader is None:
            from ..parallel.distributed import RequestFanout
            self._fanout = RequestFanout(fanout_port)
        if (fanout_port is not None or leader is not None) and \
                engine.config.scheduler.prefill_wait_s != 0.0:
            raise ValueError("multi-host serving requires prefill_wait_s=0 "
                             "(wall-clock batch forming diverges across hosts)")
        if self.is_follower:
            from ..parallel.distributed import RequestFollower
            host, _, port = leader.rpartition(":")
            self._follower = RequestFollower(host or "127.0.0.1", int(port),
                                             self._on_replicated)
        target = self._follower_loop if self.is_follower else self._engine_loop
        self._thread = threading.Thread(target=target,
                                        name="engine-loop", daemon=True)
        self.start_time = time.monotonic()

    def wait_for_followers(self, n: int, timeout: float = 60.0) -> None:
        """Leader: block until `n` followers have connected (they must be
        attached before the first admission or they miss records)."""
        assert self._fanout is not None
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if self._fanout.num_followers >= n:
                return
            time.sleep(0.02)
        raise TimeoutError(f"only {self._fanout.num_followers}/{n} followers")

    def start(self) -> None:
        self._thread.start()

    def shutdown(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=10)

    # -- request intake (called from asyncio handlers) --------------------

    def submit(self, req: _PendingRequest) -> None:
        with self._lock:
            self._pending.append(req)
        self._wake.set()

    def abort(self, seq_id: int) -> None:
        """Queue an abort; it is applied on the engine thread between steps.

        Calling engine.abort_request() here (the asyncio thread) would mutate
        the scheduler queues and page allocator concurrently with step() —
        with the C++ allocator that is an unsynchronized std::unordered_map
        mutation. The abort list drains at the top of `_engine_loop` (same
        pattern as `_pending`).
        """
        with self._lock:
            self._aborts.append(seq_id)
        self._wake.set()

    def load_adapter(self, adapter: dict, slot: Optional[int] = None,
                     path: Optional[str] = None):
        """Queue a LoRA adapter install; applied on the engine thread.

        engine.load_adapter rebuilds `engine.params` — doing that from the
        asyncio thread races a concurrent step() holding the old tree (the
        same class of race the abort queue exists for). Returns a
        concurrent.futures.Future resolving to the slot id (await it from
        asyncio with `asyncio.wrap_future`). ``path`` (the checkpoint file
        the arrays came from) is required in leader mode: it is what gets
        replicated to followers, which read the same shared filesystem.
        """
        import concurrent.futures
        fut: "concurrent.futures.Future[int]" = concurrent.futures.Future()
        if self._fanout is not None and path is None:
            fut.set_exception(ValueError(
                "multi-host leader needs a file path to replicate"))
            return fut
        with self._lock:
            self._adapter_loads.append((adapter, slot, fut, path))
        self._wake.set()
        return fut

    # -- engine thread -----------------------------------------------------

    def _admit_pending(self) -> None:
        with self._lock:
            pending, self._pending = self._pending, []
            aborts, self._aborts = self._aborts, []
            loads, self._adapter_loads = self._adapter_loads, []
        for adapter, slot, fut, path in loads:
            try:
                slot_id = self.engine.load_adapter(adapter, slot)
                if self._fanout is not None:
                    self._fanout.publish({"type": "adapter", "path": path,
                                          "slot": slot_id})
                fut.set_result(slot_id)
            except Exception as e:
                fut.set_exception(e)
        for seq_id in aborts:
            if self._fanout is not None:
                self._fanout.publish({"type": "abort", "seq_id": seq_id})
            self.engine.abort_request(seq_id)
            self.engine.unregister_stream_callback(seq_id)
            self._inflight.pop(seq_id, None)
        for req in pending:
            if req.cancelled:
                continue
            try:
                if req.prompt_token_ids is None and self._fanout is not None:
                    # tokenize before publish: followers must admit the
                    # exact same token ids
                    req.prompt_token_ids = list(
                        self.engine.tokenizer.encode(req.prompt))
                if self._fanout is not None:
                    import dataclasses
                    self._fanout.publish({
                        "type": "request",
                        "prompt_token_ids": req.prompt_token_ids,
                        "sampling": dataclasses.asdict(req.sampling),
                        "priority": req.priority,
                        "adapter": req.adapter_id,
                        "stream": req.stream_queue is not None})
                seq_id = self.engine.add_request(
                    prompt=req.prompt,
                    prompt_token_ids=req.prompt_token_ids,
                    sampling=req.sampling,
                    priority=req.priority,
                    adapter_id=req.adapter_id)
            except Exception as e:
                if req.loop is not None:
                    if req.stream_queue is not None:
                        req.loop.call_soon_threadsafe(
                            req.stream_queue.put_nowait, ("error", str(e)))
                    elif req.done is not None:
                        req.loop.call_soon_threadsafe(req.done.set_exception, e)
                continue
            req.seq_id = seq_id
            req.seq_obj = next(
                (s for s in self.engine.scheduler.waiting
                 if s.seq_id == seq_id), None)   # engine thread: no race
            self._inflight[seq_id] = req
            self.engine.register_stream_callback(seq_id, self._on_token)

    def _on_token(self, seq_id: int, token_id: int, finished: bool) -> None:
        req = self._inflight.get(seq_id)
        if req is None:
            return
        if req.stream_queue is not None and req.loop is not None:
            lp = None
            seq = req.seq_obj
            if seq is not None and seq.logprobs:
                # callback fires right after _apply_token appended both the
                # token and (when requested) its logprob entry
                i = len(seq.output_token_ids) - 1
                if i < len(seq.logprobs):
                    lp = seq.logprobs[i]
            req.loop.call_soon_threadsafe(
                req.stream_queue.put_nowait, (token_id, finished, lp))
        if finished:
            self._inflight.pop(seq_id, None)
            seq = self._find_finished(seq_id)
            if req.done is not None and req.loop is not None and seq is not None:
                req.loop.call_soon_threadsafe(self._resolve, req.done, seq)

    @staticmethod
    def _resolve(fut: asyncio.Future, seq: Sequence) -> None:
        if not fut.done():
            fut.set_result(seq)

    def _find_finished(self, seq_id: int) -> Optional[Sequence]:
        seq = self.engine.scheduler.finished.pop(seq_id, None)
        return seq

    def _engine_loop(self) -> None:
        logger.info("engine loop started")
        while not self._stop:
            self._admit_pending()
            if self.engine.scheduler.num_pending == 0:
                # Idle: block until a request arrives (the reference busy-
                # waits with sleep(0), `api_server.py:68-76` — we don't).
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue
            if self._fanout is not None:
                # one marker per engine step keeps follower schedulers in
                # lock-step; followers step exactly once per marker
                self._fanout.publish({"type": "step"})
            try:
                self.engine.step()
            except Exception:
                logger.exception("engine step failed")
                time.sleep(0.01)
        logger.info("engine loop stopped")

    # -- follower mode -------------------------------------------------------

    def _on_replicated(self, rec: dict) -> None:
        with self._lock:
            if rec.get("type") == "step":
                self._markers += 1
            else:
                self._records.append((self._markers, rec))
        self._wake.set()

    def _apply_record(self, rec: dict) -> None:
        kind = rec.get("type")
        if kind == "request":
            sp = dict(rec["sampling"])
            sp["stop_token_ids"] = tuple(sp.get("stop_token_ids", ()))
            sp["stop"] = tuple(sp.get("stop", ()))
            try:
                seq_id = self.engine.add_request(
                    prompt_token_ids=rec["prompt_token_ids"],
                    sampling=SamplingParams(**sp),
                    priority=rec.get("priority", 0),
                    adapter_id=rec.get("adapter", 0))
            except Exception:
                return  # leader rejected it identically (same validation)
            if rec.get("stream"):
                # leader's SSE consumers change the adaptive-span choice;
                # mirror that by registering a no-op stream callback
                self.engine.register_stream_callback(seq_id, lambda *a: None)
        elif kind == "abort":
            self.engine.abort_request(rec["seq_id"])
            self.engine.unregister_stream_callback(rec["seq_id"])
        elif kind == "adapter":
            try:
                self.engine.load_adapter(_read_adapter_file(rec["path"]),
                                         rec.get("slot"))
            except Exception:
                logger.exception("replicated adapter load failed (path %s)",
                                 rec.get("path"))
        else:
            logger.warning("unknown replicated record type: %r", kind)

    def _follower_loop(self) -> None:
        logger.info("follower loop started")
        applied_markers = 0
        while not self._stop:
            with self._lock:
                ready = self._markers > applied_markers
                if ready:
                    group = [r for m, r in self._records
                             if m <= applied_markers]
                    self._records = [(m, r) for m, r in self._records
                                     if m > applied_markers]
            if not ready:
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            for rec in group:
                self._apply_record(rec)
            applied_markers += 1
            try:
                self.engine.step()
            except Exception:
                logger.exception("follower engine step failed")
                time.sleep(0.01)
            for seq in self.engine.scheduler.pop_finished():
                self.replicated_finished.append(
                    {"seq_id": seq.seq_id,
                     "token_ids": list(seq.output_token_ids)})
        logger.info("follower loop stopped")

    # -- helpers -----------------------------------------------------------

    def text_or_ids(self, seq: Sequence) -> dict[str, Any]:
        out: dict[str, Any] = {"token_ids": seq.output_token_ids,
                               "seq_id": seq.seq_id,
                               "num_tokens": len(seq.output_token_ids),
                               "finish_reason": (seq.finish_reason.value
                                                 if seq.finish_reason else None)}
        if seq.logprobs:
            out["logprobs"] = seq.logprobs
        if self.engine.tokenizer is not None:
            out["text"] = self.engine.decode_text(seq)
        return out


class _IncrementalDetokenizer:
    """Streaming detokenization that survives multi-byte BPE boundaries.

    `tokenizer.decode([token_id])` per token garbles CJK/emoji whose UTF-8
    bytes are split across tokens (each piece decodes to U+FFFD). Keep a
    sliding window: re-decode from `prefix_offset` and only emit once the
    tail no longer ends in a replacement character.
    """

    def __init__(self, tokenizer):
        self._tok = tokenizer
        self._ids: list[int] = []
        self._prefix = 0     # start of the re-decode window
        self._read = 0       # ids already surfaced as text

    def push(self, token_id: int) -> str:
        self._ids.append(token_id)
        prev = self._tok.decode(self._ids[self._prefix:self._read],
                                skip_special_tokens=True)
        full = self._tok.decode(self._ids[self._prefix:],
                                skip_special_tokens=True)
        if len(full) > len(prev) and not full.endswith("�"):
            delta = full[len(prev):]
            self._prefix = self._read
            self._read = len(self._ids)
            return delta
        return ""

    def flush(self) -> str:
        """Emit whatever is still buffered (generation ended while the tail
        decoded to U+FFFD — a truncated multi-byte sequence). Without this
        the final tokens' text would be silently dropped (ADVICE r2)."""
        if self._read >= len(self._ids):
            return ""
        prev = self._tok.decode(self._ids[self._prefix:self._read],
                                skip_special_tokens=True)
        full = self._tok.decode(self._ids[self._prefix:],
                                skip_special_tokens=True)
        self._read = len(self._ids)
        return full[len(prev):]


def _read_adapter_file(path: str) -> dict:
    """Read stacked LoRA arrays from a local .npz or .safetensors file."""
    import numpy as np
    names = ("qkv_a", "qkv_b", "o_a", "o_b")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        data = load_file(path)
    else:
        data = np.load(path)
    missing = [n for n in names if n not in data]
    if missing:
        raise ValueError(f"missing arrays: {missing}")
    return {n: data[n] for n in names}


def _bad_request(msg: str) -> web.HTTPBadRequest:
    return web.HTTPBadRequest(text=json.dumps({"error": msg}),
                              content_type="application/json")


# Static candidate-pool size of the fused sampler (`ops/sampling.py`);
# per-request top_k is a rank mask within this pool.
_SAMPLER_POOL = 64


def _parse_priority(data: dict[str, Any]) -> int:
    try:
        return max(-10, min(10, int(data.get("priority", 0))))
    except (TypeError, ValueError):
        raise _bad_request("priority must be an integer")


def _parse_adapter(data: dict[str, Any]) -> int:
    """LoRA adapter slot ("adapter": int, 0 = base). Unknown slots are
    rejected by engine.add_request and surfaced as an error."""
    try:
        a = int(data.get("adapter", 0))
    except (TypeError, ValueError):
        raise _bad_request("adapter must be an integer")
    if a < 0:
        raise _bad_request("adapter must be >= 0")
    return a


def _parse_sampling(data: dict[str, Any], default_max: int,
                    max_logprobs: int = 0,
                    penalties_enabled: bool = False) -> SamplingParams:
    """Validate client sampling params (the reference passes them through
    unvalidated; see ADVICE r1 — top_p<=0 and top_k<=0 silently misbehaved).
    """
    try:
        temperature = float(data.get("temperature", 0.7))
        top_p = float(data.get("top_p", 0.9))
        top_k = int(data.get("top_k", _SAMPLER_POOL))
        max_tokens = int(data.get("max_tokens", default_max))
    except (TypeError, ValueError):
        raise _bad_request("sampling params must be numeric")
    if not (temperature == temperature and 0.0 <= temperature <= 100.0):
        raise _bad_request("temperature must be in [0, 100]")
    if not (0.0 < top_p <= 1.0):
        raise _bad_request("top_p must be in (0, 1]")
    if top_k <= 0:
        top_k = _SAMPLER_POOL    # common "disabled" convention
    top_k = min(top_k, _SAMPLER_POOL)
    if max_tokens < 1:
        raise _bad_request("max_tokens must be >= 1")
    stop_ids = data.get("stop_token_ids", ())
    if not (isinstance(stop_ids, (list, tuple))
            and all(isinstance(t, int) for t in stop_ids)):
        raise _bad_request("stop_token_ids must be a list of ints")
    stop = data.get("stop", ())
    if isinstance(stop, str):
        stop = (stop,)
    if not (isinstance(stop, (list, tuple))
            and all(isinstance(s, str) and s for s in stop)):
        raise _bad_request("stop must be a non-empty string or a list of them")
    logprobs = data.get("logprobs", 0)
    if logprobs is True:     # OpenAI-style boolean
        logprobs = 1
    if not isinstance(logprobs, int) or logprobs < 0:
        raise _bad_request("logprobs must be a non-negative integer")
    if logprobs > max_logprobs:
        raise _bad_request(
            f"logprobs={logprobs} not available (server started with "
            f"--logprobs-k {max_logprobs})")
    try:
        presence = float(data.get("presence_penalty", 0.0))
        frequency = float(data.get("frequency_penalty", 0.0))
        repetition = float(data.get("repetition_penalty", 1.0))
    except (TypeError, ValueError):
        raise _bad_request("penalties must be numeric")
    if not (-2.0 <= presence <= 2.0 and -2.0 <= frequency <= 2.0):
        raise _bad_request(
            "presence_penalty / frequency_penalty must be in [-2, 2]")
    if not (0.0 < repetition <= 100.0):
        raise _bad_request("repetition_penalty must be in (0, 100]")
    lb = data.get("logit_bias") or {}
    if not isinstance(lb, dict):
        raise _bad_request("logit_bias must be an object of id -> bias")
    if len(lb) > 32:
        raise _bad_request("logit_bias supports at most 32 entries")
    bias = []
    for k, v in lb.items():
        try:
            tid, bv = int(k), float(v)
        except (TypeError, ValueError):
            raise _bad_request("logit_bias entries must be id -> number")
        if not -100.0 <= bv <= 100.0:
            raise _bad_request("logit_bias values must be in [-100, 100]")
        bias.append((tid, bv))
    has_pen = (presence != 0.0 or frequency != 0.0 or repetition != 1.0
               or bool(bias))
    if has_pen and not penalties_enabled:
        raise _bad_request(
            "sampling penalties / logit_bias not available (start the "
            "server with --enable-penalties)")
    seed = data.get("seed")
    if seed is not None and not isinstance(seed, int):
        raise _bad_request("seed must be an integer")
    return SamplingParams(
        seed=seed,
        presence_penalty=presence,
        frequency_penalty=frequency,
        repetition_penalty=repetition,
        logit_bias=tuple(bias),
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        max_new_tokens=max_tokens,
        stop_token_ids=tuple(stop_ids),
        stop=tuple(stop),
        ignore_eos=bool(data.get("ignore_eos", False)),
        logprobs=logprobs,
    )


async def _json_body(request: web.Request) -> dict:
    try:
        data = await request.json()
    except Exception:
        raise web.HTTPBadRequest(
            text=json.dumps({"error": "invalid JSON body"}),
            content_type="application/json")
    if not isinstance(data, dict):
        raise web.HTTPBadRequest(
            text=json.dumps({"error": "body must be a JSON object"}),
            content_type="application/json")
    return data


def build_app(server: EngineServer) -> web.Application:
    engine = server.engine
    default_max = engine.config.default_max_new_tokens

    def _not_follower() -> None:
        if server.is_follower:
            raise web.HTTPServiceUnavailable(
                text=json.dumps({"error": "this host is a follower; "
                                          "send requests to the leader"}),
                content_type="application/json")

    def _request_fields(data: dict[str, Any]) -> tuple[Optional[str], Optional[list[int]]]:
        prompt = data.get("prompt")
        ids = data.get("prompt_token_ids")
        if prompt is None and ids is None:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "need prompt or prompt_token_ids"}),
                content_type="application/json")
        if prompt is not None and engine.tokenizer is None:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "server has no tokenizer; "
                                          "send prompt_token_ids"}),
                content_type="application/json")
        return prompt, ids

    async def generate(request: web.Request) -> web.Response:
        _not_follower()
        data = await _json_body(request)
        prompt, ids = _request_fields(data)
        loop = asyncio.get_running_loop()
        req = _PendingRequest(prompt=prompt, prompt_token_ids=ids,
                              sampling=_parse_sampling(
                                  data, default_max,
                                  engine.config.logprobs_k,
                                  engine.config.enable_penalties),
                              priority=_parse_priority(data),
                              adapter_id=_parse_adapter(data),
                              loop=loop, done=loop.create_future())
        t0 = time.monotonic()
        server.submit(req)
        try:
            seq = await req.done
        except ValueError as e:      # e.g. prompt longer than max_model_len
            raise _bad_request(str(e))
        out = server.text_or_ids(seq)
        out["latency_s"] = round(time.monotonic() - t0, 4)
        return web.json_response(out)

    async def batch_generate(request: web.Request) -> web.Response:
        _not_follower()
        data = await _json_body(request)
        prompts = data.get("prompts")
        ids_list = data.get("prompt_token_ids")
        items = prompts if prompts is not None else ids_list
        if not isinstance(items, list):
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "need prompts or prompt_token_ids "
                                          "as a list"}),
                content_type="application/json")
        loop = asyncio.get_running_loop()
        sampling = _parse_sampling(data, default_max,
                                   engine.config.logprobs_k,
                                   engine.config.enable_penalties)
        prio = _parse_priority(data)
        adapter = _parse_adapter(data)
        reqs = []
        for item in items:
            if prompts is not None:
                req = _PendingRequest(prompt=item, prompt_token_ids=None,
                                      sampling=sampling, priority=prio,
                                      adapter_id=adapter,
                                      loop=loop, done=loop.create_future())
            else:
                req = _PendingRequest(prompt=None, prompt_token_ids=item,
                                      sampling=sampling, priority=prio,
                                      adapter_id=adapter,
                                      loop=loop, done=loop.create_future())
            server.submit(req)
            reqs.append(req)
        try:
            seqs = await asyncio.gather(*[r.done for r in reqs])
        except ValueError as e:
            raise _bad_request(str(e))
        return web.json_response({"results": [server.text_or_ids(s)
                                              for s in seqs]})

    async def generate_stream(request: web.Request) -> web.StreamResponse:
        _not_follower()
        data = await _json_body(request)
        prompt, ids = _request_fields(data)
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        req = _PendingRequest(prompt=prompt, prompt_token_ids=ids,
                              sampling=_parse_sampling(
                                  data, default_max,
                                  engine.config.logprobs_k,
                                  engine.config.enable_penalties),
                              priority=_parse_priority(data),
                              adapter_id=_parse_adapter(data),
                              stream_queue=q, loop=loop,
                              done=loop.create_future())
        server.submit(req)

        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        })
        await resp.prepare(request)
        tokenizer = engine.tokenizer
        detok = (_IncrementalDetokenizer(tokenizer)
                 if tokenizer is not None else None)
        n = 0
        t0 = time.monotonic()
        try:
            while True:
                item = await q.get()
                if item[0] == "error":   # admission failed (e.g. 400-class)
                    await resp.write(
                        f"data: {json.dumps({'error': item[1], 'finished': True})}\n\n".encode())
                    break
                token_id, finished, lp = item
                n += 1
                payload: dict[str, Any] = {"token_id": token_id,
                                           "finished": finished}
                if lp is not None:
                    payload["logprobs"] = lp
                if detok is not None:
                    payload["token"] = detok.push(token_id)
                    if finished:
                        payload["token"] += detok.flush()
                await resp.write(
                    f"data: {json.dumps(payload)}\n\n".encode())
                if finished:
                    dt = time.monotonic() - t0
                    await resp.write(
                        f"data: {json.dumps({'done': True, 'num_tokens': n, 'tok_per_s': round(n / max(dt, 1e-9), 2)})}\n\n".encode())
                    break
        except (asyncio.CancelledError, ConnectionResetError):
            # client went away: abort the sequence to free pages (or, if it
            # was never admitted, drop it before admission)
            req.cancelled = True
            if req.seq_id is not None:
                server.abort(req.seq_id)
            raise
        await resp.write_eof()
        return resp

    async def tokenize(request: web.Request) -> web.Response:
        """vLLM-parity helper: {"text": ...} -> {"token_ids": [...]}."""
        data = await _json_body(request)
        text = data.get("text")
        if not isinstance(text, str):
            raise _bad_request("need \"text\"")
        if engine.tokenizer is None:
            raise _bad_request("server has no tokenizer")
        ids = list(engine.tokenizer.encode(text))
        return web.json_response({"token_ids": ids, "count": len(ids)})

    async def detokenize(request: web.Request) -> web.Response:
        """{"token_ids": [...]} -> {"text": ...}."""
        data = await _json_body(request)
        ids = data.get("token_ids")
        if not (isinstance(ids, list) and all(isinstance(t, int)
                                              for t in ids)):
            raise _bad_request("need \"token_ids\" as a list of ints")
        if engine.tokenizer is None:
            raise _bad_request("server has no tokenizer")
        return web.json_response({"text": engine.tokenizer.decode(ids)})

    async def health(request: web.Request) -> web.Response:
        import jax
        stats = engine.cache_stats
        return web.json_response({
            "status": "ok",
            "role": "follower" if server.is_follower
                    else ("leader" if server._fanout is not None else "single"),
            "device": str(jax.devices()[0]),
            "uptime_s": round(time.monotonic() - server.start_time, 1),
            "waiting": len(engine.scheduler.waiting),
            "prefilling": len(engine.scheduler.prefilling),
            "running": len(engine.scheduler.running),
            "kv_pages_free": stats.free_pages,
            "kv_pages_used": stats.used_pages,
            "kv_fragmentation": round(stats.fragmentation, 4),
        })

    async def metrics(request: web.Request) -> web.Response:
        m = engine.metrics
        extra = ({"replicated_finished": server.replicated_finished}
                 if server.is_follower else {})
        alloc = engine.allocator
        if hasattr(alloc, "hits"):      # prefix caching on
            total = alloc.hits + alloc.misses
            extra["prefix_cache"] = {
                "page_hits": alloc.hits,
                "page_misses": alloc.misses,
                "evictions": alloc.evictions,
                "hit_rate": round(alloc.hits / total, 4) if total else 0.0,
            }
        return web.json_response({
            **extra,
            "steps": m.steps,
            "prefill_steps": m.prefill_steps,
            "decode_steps": m.decode_steps,
            "tokens_generated": m.tokens_generated,
            "tokens_prefilled": m.tokens_prefilled,
            "preemptions": m.preemptions,
            "spec_rounds": m.spec_rounds,
            "spec_drafts_accepted": m.spec_drafts_accepted,
            "spec_fallbacks": m.spec_fallbacks,
            "decode_slots_served": m.decode_slots_served,
            "decode_slots_skipped": m.decode_slots_skipped,
            "decode_fairness": round(
                m.decode_slots_served
                / max(1, m.decode_slots_served + m.decode_slots_skipped), 4),
            "last_step": {
                "kind": m.last_step.kind,
                "batch_size": m.last_step.batch_size,
                "real_seqs": m.last_step.real_seqs,
                "span": m.last_step.span,
                "total_ms": round(m.last_step.total_ms, 2),
            },
        })

    async def load_adapter(request: web.Request) -> web.Response:
        """Install a LoRA adapter at runtime from a local checkpoint.

        Body: ``{"path": "<file.npz|file.safetensors>", "slot": int?}`` with
        stacked arrays ``qkv_a/qkv_b/o_a/o_b`` (see engine.load_adapter).
        The install is queued onto the engine thread (no race with step())
        and the response returns the assigned slot id.
        """
        _not_follower()
        data = await _json_body(request)
        path = data.get("path")
        if not isinstance(path, str):
            raise _bad_request("need \"path\" to a local .npz/.safetensors")
        slot = data.get("slot")
        if slot is not None and not isinstance(slot, int):
            raise _bad_request("slot must be an integer")
        try:
            adapter = _read_adapter_file(path)
        except Exception as e:
            raise _bad_request(f"cannot read adapter: {e}")
        try:
            slot_id = await asyncio.wrap_future(
                server.load_adapter(adapter, slot))
        except Exception as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response({"slot": slot_id})

    async def profile_start(request: web.Request) -> web.Response:
        try:
            d = engine.start_profile()
        except Exception as e:
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response({"tracing": True, "dir": d})

    async def profile_stop(request: web.Request) -> web.Response:
        d = engine.stop_profile()
        return web.json_response({"tracing": False, "dir": d})

    app = web.Application()
    app.router.add_post("/generate", generate)
    app.router.add_post("/batch_generate", batch_generate)
    app.router.add_post("/generate_stream", generate_stream)
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/tokenize", tokenize)
    app.router.add_post("/detokenize", detokenize)
    app.router.add_post("/load_adapter", load_adapter)
    app.router.add_post("/profile/start", profile_start)
    app.router.add_post("/profile/stop", profile_stop)

    # OpenAI-compatible dialect over the same engine/request plumbing
    from .openai_api import add_openai_routes
    add_openai_routes(app, server, default_max)

    async def _cleanup(app):
        server.shutdown()

    app.on_cleanup.append(_cleanup)
    return app


def serve(config: EngineConfig, host: str = "0.0.0.0", port: int = 8000,
          tokenizer=None, params=None, warmup: bool = False,
          fanout_port: Optional[int] = None, leader: Optional[str] = None,
          fanout_followers: int = 0) -> None:
    engine = InferenceEngine(config, params=params, tokenizer=tokenizer)
    if warmup:
        engine.warmup()
    server = EngineServer(engine, fanout_port=fanout_port, leader=leader)
    if fanout_followers > 0:
        logger.info("waiting for %d follower(s) on port %s ...",
                    fanout_followers, fanout_port)
        server.wait_for_followers(fanout_followers)
    server.start()
    app = build_app(server)
    logger.info("serving on %s:%d (%s)", host, port,
                "follower" if leader else
                ("leader" if fanout_port else "single"))
    web.run_app(app, host=host, port=port)


def main() -> None:
    import argparse

    from ..config import (CacheConfig, EngineConfig, PRESETS, QuantConfig,
                          SchedulerConfig)

    try:  # reuse compiled programs across server restarts
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    ap = argparse.ArgumentParser(description="microvllm_tpu API server")
    ap.add_argument("--model", default="qwen2.5-0.5b",
                    help="preset name or local HF snapshot path")
    ap.add_argument("--bits", type=int, default=16)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--kv-pages", type=int, default=512)
    ap.add_argument("--page-size", type=int, default=None,
                    help="KV page size (default: auto — 128 when "
                         "max_model_len >= 2048, else 64)")
    ap.add_argument("--max-pages-per-seq", type=int, default=32)
    ap.add_argument("--max-model-len", type=int, default=2048)
    ap.add_argument("--kv-bits", type=int, default=16)
    ap.add_argument("--decode-buckets", default=None,
                    help="comma list, e.g. 8,32 (fewer = fewer TPU compiles)")
    ap.add_argument("--decode-spans", default=None, help="comma list")
    ap.add_argument("--prefill-buckets", default=None, help="comma list")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile all buckets before serving")
    ap.add_argument("--stream-span-cap", type=int, default=None,
                    help="cap decode span for SSE streams under light load "
                         "(smaller token bursts; see SchedulerConfig)")
    ap.add_argument("--spec-k", type=int, default=0,
                    help="speculative draft tokens per verify (0 = off; "
                         "greedy requests only)")
    ap.add_argument("--spec-steps", type=int, default=4)
    ap.add_argument("--fanout-port", type=int, default=None,
                    help="multi-host leader: replicate admissions to "
                         "followers on this TCP port")
    ap.add_argument("--leader", default=None, metavar="HOST:PORT",
                    help="multi-host follower: consume the leader's "
                         "replicated request stream")
    ap.add_argument("--fanout-followers", type=int, default=0,
                    help="leader: block until this many followers connect "
                         "before serving")
    ap.add_argument("--logprobs-k", type=int, default=0,
                    help="enable per-token logprobs: compile the logprob-"
                         "emitting step variant with this top-k (0 = off); "
                         "requests opt in with \"logprobs\": N")
    ap.add_argument("--enable-penalties", action="store_true",
                    help="compile the penalty-carrying step variant so "
                         "requests may set presence_penalty / "
                         "frequency_penalty / repetition_penalty")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="automatic prefix caching: requests sharing a "
                         "prompt prefix reuse its KV pages and skip "
                         "prefilling them (hit stats in /metrics)")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    params = None
    tokenizer = None
    if args.model in PRESETS:
        mcfg = PRESETS[args.model]
    else:
        from ..config import ModelConfig
        from ..models.loader import load_params
        mcfg, params = load_params(args.model)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            logger.warning("no tokenizer loaded; token-id API only")

    def _csv(v, default):
        return tuple(int(x) for x in v.split(",")) if v else default

    sched = SchedulerConfig(
        max_batch_size=args.max_batch,
        decode_buckets=_csv(args.decode_buckets,
                            SchedulerConfig().decode_buckets),
        decode_spans=_csv(args.decode_spans, SchedulerConfig().decode_spans),
        prefill_len_buckets=_csv(args.prefill_buckets,
                                 SchedulerConfig().prefill_len_buckets),
        stream_span_cap=args.stream_span_cap,
    )
    if args.page_size is None:
        from ..config import auto_page_size
        args.page_size = auto_page_size(args.max_model_len)
        if args.page_size != 64:
            # keep per-seq token capacity constant as page size scales up
            args.max_pages_per_seq = max(
                1, args.max_pages_per_seq * 64 // args.page_size)
        logger.info("auto page_size=%d (max_pages_per_seq=%d)",
                    args.page_size, args.max_pages_per_seq)
    cfg = EngineConfig(
        model=mcfg,
        cache=CacheConfig(num_pages=args.kv_pages, page_size=args.page_size,
                          max_pages_per_seq=args.max_pages_per_seq,
                          prefix_cache=args.prefix_cache),
        scheduler=sched,
        quant=QuantConfig(weight_bits=args.bits, kv_bits=args.kv_bits),
        max_model_len=args.max_model_len,
        spec_k=args.spec_k,
        spec_steps=args.spec_steps,
        logprobs_k=args.logprobs_k,
        enable_penalties=args.enable_penalties,
    )
    if args.fanout_port or args.leader:
        # multi-host SPMD serving: jax.distributed from MVT_* env vars, and
        # wall-clock batch forming off (determinism across hosts)
        import dataclasses

        from ..parallel.distributed import init_distributed
        init_distributed()
        cfg = cfg.replace(
            scheduler=dataclasses.replace(cfg.scheduler, prefill_wait_s=0.0))
    serve(cfg, host=args.host, port=args.port, tokenizer=tokenizer,
          params=params, warmup=args.warmup,
          fanout_port=args.fanout_port, leader=args.leader,
          fanout_followers=args.fanout_followers)


if __name__ == "__main__":
    main()
