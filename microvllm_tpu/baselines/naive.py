"""Naive JAX baseline engine + server for on-rig A/B comparison.

Plays the role of the reference's vLLM A/B server (`vllm_server.py:54-291`):
one HTTP API, two engines, same chip, same client — so the README's speedup
multiples are *measured here*, not inherited from the reference's A100
numbers. This engine is what a straightforward JAX port of a torch inference
loop looks like, deliberately keeping none of microvllm_tpu's optimizations:

* bf16 weights, separate q/k/v/gate/up matmuls — no quantization, no fusion,
  no Pallas kernels;
* a dense per-request KV cache ``[L, max_len, kv_heads, head_dim]`` — no
  paging, no continuous batching (requests are served strictly one at a
  time, batch size 1);
* full-length masked attention every decode step (the standard static-shape
  naive implementation under jit);
* one host round-trip per generated token.

HTTP surface: the same ``/generate`` / ``/generate_stream`` / ``/health``
JSON schema as `server/api.py`, so `benchmark_serving.py` drives both.
"""

from __future__ import annotations

import argparse
import asyncio
import functools
import json
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PRESETS, ModelConfig
from ..models.transformer import init_params
from ..ops.normalization import rmsnorm
from ..ops.rope import apply_rope, rope_cos_sin


def _attn(q, k, v, mask, scale):
    """Dense masked attention. q [T, nh, d]; k/v [S, kvh, d]; mask [T, S]."""
    nh, kvh = q.shape[1], k.shape[1]
    k = jnp.repeat(k, nh // kvh, axis=1)            # GQA by materializing
    v = jnp.repeat(v, nh // kvh, axis=1)            # (naive on purpose)
    scores = jnp.einsum("tnd,snd->nts", q, k).astype(jnp.float32) * scale
    scores = jnp.where(mask[None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("nts,snd->tnd", probs, v)


def _layer(cfg: ModelConfig, h, lp, k_l, v_l, positions, mask):
    """One transformer layer over tokens h [T, H]; k_l/v_l [S, kvh, d]."""
    nh, kvh, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    T = h.shape[0]
    normed = rmsnorm(h, lp["attn_norm"], cfg.rms_norm_eps)
    q = (normed @ lp["wq"]).reshape(T, nh, d)
    k = (normed @ lp["wk"]).reshape(T, kvh, d)
    v = (normed @ lp["wv"]).reshape(T, kvh, d)
    if cfg.qkv_bias:
        q = q + lp["bq"].reshape(nh, d)
        k = k + lp["bk"].reshape(kvh, d)
        v = v + lp["bv"].reshape(kvh, d)
    cos, sin = rope_cos_sin(positions, d, cfg.rope_theta)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    start = positions[0]
    k_l = jax.lax.dynamic_update_slice(k_l, k.astype(k_l.dtype), (start, 0, 0))
    v_l = jax.lax.dynamic_update_slice(v_l, v.astype(v_l.dtype), (start, 0, 0))
    attn = _attn(q, k_l, v_l, mask, 1.0 / d ** 0.5).reshape(T, nh * d)
    h = h + attn @ lp["wo"]
    normed = rmsnorm(h, lp["mlp_norm"], cfg.rms_norm_eps)
    gate = normed @ lp["w_gate"]
    up = normed @ lp["w_up"]
    h = h + (jax.nn.silu(gate) * up) @ lp["w_down"]
    return h, k_l, v_l


def _forward(cfg: ModelConfig, params, k_cache, v_cache, tokens, start):
    """tokens [T] at absolute positions start..start+T-1. Returns
    (last-token logits [V], k_cache, v_cache)."""
    T, S = tokens.shape[0], k_cache.shape[1]
    positions = start + jnp.arange(T, dtype=jnp.int32)
    # causal over written history: key s visible to query t iff s <= start+t
    mask = jnp.arange(S, dtype=jnp.int32)[None, :] <= positions[:, None]
    h = params["embed"][tokens]

    def body(h, xs):
        lp, k_l, v_l = xs
        h, k_l, v_l = _layer(cfg, h, lp, k_l, v_l, positions, mask)
        return h, (k_l, v_l)

    h, (k_cache, v_cache) = jax.lax.scan(
        body, h, (params["layers"], k_cache, v_cache))
    h = rmsnorm(h[-1], params["final_norm"], cfg.rms_norm_eps)
    head = (params["embed"].T if params["lm_head"] is None
            else params["lm_head"])
    return (h @ head).astype(jnp.float32), k_cache, v_cache


class NaiveEngine:
    """Single-request, dense-cache, bf16, per-token-dispatch engine."""

    def __init__(self, mcfg: ModelConfig, max_model_len: int = 2048,
                 seed: int = 0):
        self.cfg = mcfg
        self.max_len = max_model_len
        self.params = init_params(mcfg, jax.random.PRNGKey(seed))
        L, kvh, d = mcfg.num_layers, mcfg.num_kv_heads, mcfg.head_dim
        self.k = jnp.zeros((L, max_model_len, kvh, d), mcfg.jax_dtype)
        self.v = jnp.zeros_like(self.k)
        self._fwd = jax.jit(functools.partial(_forward, mcfg),
                            donate_argnums=(1, 2))

    def warmup(self, prompt_len: int = 32) -> None:
        self.generate(list(range(2, 2 + prompt_len)), max_tokens=2)

    def generate(self, prompt_ids: list[int], max_tokens: int,
                 temperature: float = 0.0, seed: int = 0,
                 callback: Optional[Callable[[int, bool], None]] = None,
                 ) -> list[int]:
        if len(prompt_ids) + max_tokens > self.max_len:
            raise ValueError(f"prompt+max_tokens exceeds max_model_len "
                             f"{self.max_len}")
        key = jax.random.PRNGKey(seed)
        # Stale cache entries beyond the current position are masked out,
        # so no reset between requests is needed.
        tokens = jnp.asarray(prompt_ids, jnp.int32)
        logits, self.k, self.v = self._fwd(self.params, self.k, self.v,
                                           tokens, jnp.int32(0))
        out: list[int] = []
        pos = len(prompt_ids)
        for i in range(max_tokens):
            if temperature == 0.0:
                nxt = jnp.argmax(logits).astype(jnp.int32)
            else:
                key, sub = jax.random.split(key)
                nxt = jax.random.categorical(sub, logits / temperature)
            tok = int(np.asarray(nxt))            # host RTT per token
            out.append(tok)
            if callback is not None:
                callback(tok, i == max_tokens - 1)
            if i == max_tokens - 1:
                break
            logits, self.k, self.v = self._fwd(
                self.params, self.k, self.v,
                jnp.asarray([tok], jnp.int32), jnp.int32(pos))
            pos += 1
        return out


# ---------------------------------------------------------------------------
# HTTP server (same JSON schema as server/api.py; requests serialized)
# ---------------------------------------------------------------------------

def build_app(engine: NaiveEngine):
    from aiohttp import web
    lock = asyncio.Lock()
    start_time = time.monotonic()

    def _params(data):
        ids = data.get("prompt_token_ids")
        if not isinstance(ids, list):
            raise web.HTTPBadRequest(
                text=json.dumps({"error": "need prompt_token_ids"}),
                content_type="application/json")
        mx = int(data.get("max_tokens", 128))
        temp = float(data.get("temperature", 0.0))
        return ids, mx, temp

    async def generate(request):
        data = await request.json()
        ids, mx, temp = _params(data)
        async with lock:                       # naive: one request at a time
            toks = await asyncio.get_running_loop().run_in_executor(
                None, lambda: engine.generate(ids, mx, temp))
        return web.json_response({"token_ids": toks, "num_tokens": len(toks),
                                  "finish_reason": "length"})

    async def generate_stream(request):
        data = await request.json()
        ids, mx, temp = _params(data)
        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        cb = lambda tok, fin: loop.call_soon_threadsafe(
            q.put_nowait, (tok, fin))
        async with lock:
            task = loop.run_in_executor(
                None, lambda: engine.generate(ids, mx, temp, callback=cb))
            while True:
                tok, fin = await q.get()
                payload = {"token_id": tok, "finished": fin}
                await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
                if fin:
                    break
            await task
        await resp.write_eof()
        return resp

    async def health(request):
        return web.json_response({
            "status": "ok", "engine": "naive-baseline",
            "device": str(jax.devices()[0]),
            "uptime_s": round(time.monotonic() - start_time, 1)})

    app = web.Application()
    app.router.add_post("/generate", generate)
    app.router.add_post("/generate_stream", generate_stream)
    app.router.add_get("/health", health)
    return app


def main() -> None:
    ap = argparse.ArgumentParser(description="naive A/B baseline")
    ap.add_argument("--model", default="qwen2.5-0.5b")
    ap.add_argument("--max-model-len", type=int, default=1024)
    ap.add_argument("--port", type=int, default=8001)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--bench", action="store_true",
                    help="skip HTTP: print single-stream tok/s and exit")
    ap.add_argument("--context", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    mcfg = (ModelConfig.tiny() if args.model == "tiny"
            else PRESETS[args.model])
    eng = NaiveEngine(mcfg, max_model_len=args.max_model_len)
    eng.warmup(args.context)
    if args.bench:
        prompt = list(range(2, 2 + args.context))
        t0 = time.monotonic()
        eng.generate(prompt, max_tokens=args.steps)
        dt = time.monotonic() - t0
        print(json.dumps({"engine": "naive", "model": args.model,
                          "decode_toks_per_s": round(args.steps / dt, 2),
                          "context": args.context}))
        return
    from aiohttp import web
    web.run_app(build_app(eng), port=args.port)


if __name__ == "__main__":
    main()
