"""Inference engine: orchestrates scheduler, paged cache, and jitted steps.

TPU re-design of the reference's `InferenceEngine` (`core/engine.py:35-309`).
CUDA-graph capture/replay (`model_graph.py:225-260`) becomes ahead-of-time
jit compilation of fixed-shape step functions, one per (batch-bucket,
chunk-bucket); the XLA compilation cache plays the role of the graph pool.
Sampling runs inside the jitted step so only ``[B]`` int32 tokens return to
host. The KV cache buffers are donated through every step for in-place
updates (the `store_kvcache` path of the reference).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional, Sequence as Seq

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..models import transformer as model_lib
from ..ops.quant import quantize_params
from ..ops.sampling import sample_tokens
from .kv_cache import OutOfPagesError, PageAllocator
from .scheduler import ScheduledBatch, Scheduler
from .sequence import FinishReason, SamplingParams, SeqState, Sequence

logger = logging.getLogger("microvllm_tpu.engine")

StreamCallback = Callable[[int, int, bool], None]  # (seq_id, token_id, finished)


# Module-level jitted steps with the (hashable, frozen) ModelConfig as a
# static argument: the XLA compilation cache is then shared across engine
# instances and shape buckets within a process.
@partial(jax.jit, static_argnums=(0, 11),
         static_argnames=("lora_scaling", "logprobs_k"),
         donate_argnums=(2, 3))
def _decode_span_jit(cfg, params, k_cache, v_cache, tokens, block_tables,
                     context_lens, temperature, top_p, top_ks, rng,
                     num_steps, adapter_ids=None, lora_scaling=1.0,
                     logprobs_k=0, penalties=None, seed_state=None):
    return model_lib.decode_span(
        cfg, params, k_cache, v_cache, tokens, block_tables, context_lens,
        temperature, top_p, rng, num_steps, top_ks=top_ks,
        adapter_ids=adapter_ids, lora_scaling=lora_scaling,
        logprobs_k=logprobs_k, penalties=penalties, seed_state=seed_state)


def _penalized_prefill_sample(cfg, logits, rng, temperature, top_p, top_ks,
                              logprobs_k, penalties, seed_state=None):
    """Shared prefill-token sampling: penalties shape the sampling
    distribution; logprobs report the raw one; per-request seeds make the
    first token reproducible too."""
    raw = logits
    if penalties is not None:
        from ..ops.sampling import apply_penalties, penalty_state
        hist, hist_lens, out_start, pp, pf, pr, bi, bv = penalties
        counts, seen = penalty_state(hist, hist_lens, out_start,
                                     cfg.vocab_size)
        logits = apply_penalties(logits, counts, seen, pp, pf, pr, bi, bv)
    rk = None
    if seed_state is not None:
        from ..ops.sampling import per_row_keys
        rk = per_row_keys(rng, *seed_state)
    next_tokens = sample_tokens(logits, rng, temperature, top_p,
                                top_k_per_seq=top_ks, row_keys=rk)
    lp = ()
    if logprobs_k:
        from ..ops.sampling import token_logprobs
        lp = token_logprobs(raw, next_tokens, logprobs_k)
    return next_tokens, lp


@partial(jax.jit, static_argnums=(0, 12),
         static_argnames=("lora_scaling", "logprobs_k"),
         donate_argnums=(2, 3))
def _prefill_jit(cfg, params, k_cache, v_cache, tokens, block_tables,
                 chunk_lens, history_lens, temperature, top_p, top_ks, rng,
                 has_history, adapter_ids=None, lora_scaling=1.0,
                 logprobs_k=0, penalties=None, seed_state=None):
    logits, k_cache, v_cache = model_lib.prefill_step(
        cfg, params, k_cache, v_cache, tokens, block_tables,
        chunk_lens, history_lens, has_history,
        adapter_ids=adapter_ids, lora_scaling=lora_scaling)
    next_tokens, lp = _penalized_prefill_sample(
        cfg, logits, rng, temperature, top_p, top_ks, logprobs_k, penalties,
        seed_state)
    return next_tokens, lp, k_cache, v_cache


@partial(jax.jit, static_argnums=(0, 9, 10, 11),
         static_argnames=("lora_scaling", "logprobs_k", "sampled"),
         donate_argnums=(2, 3))
def _spec_span_jit(cfg, params, k_cache, v_cache, last, hist, hist_lens,
                   tables, ctx, num_steps, k, ngram,
                   adapter_ids=None, lora_scaling=1.0, logprobs_k=0,
                   sampled=False, temperature=None, top_p=None,
                   top_ks=None, rng=None):
    from ..models.speculative import spec_decode_span
    return spec_decode_span(cfg, params, k_cache, v_cache, last, hist,
                            hist_lens, tables, ctx, num_steps, k, ngram,
                            adapter_ids=adapter_ids,
                            lora_scaling=lora_scaling,
                            logprobs_k=logprobs_k, sampled=sampled,
                            temperature=temperature, top_p=top_p,
                            top_ks=top_ks, rng=rng)


# INT8-KV spec variant: scale pages ride along and are donated too.
@partial(jax.jit, static_argnums=(0, 11, 12, 13),
         static_argnames=("lora_scaling", "logprobs_k", "sampled"),
         donate_argnums=(2, 3, 4, 5))
def _spec_span_q_jit(cfg, params, k_cache, v_cache, k_scales, v_scales,
                     last, hist, hist_lens, tables, ctx, num_steps, k,
                     ngram, adapter_ids=None, lora_scaling=1.0,
                     logprobs_k=0, sampled=False, temperature=None,
                     top_p=None, top_ks=None, rng=None):
    from ..models.speculative import spec_decode_span
    return spec_decode_span(cfg, params, k_cache, v_cache, last, hist,
                            hist_lens, tables, ctx, num_steps, k, ngram,
                            k_scales=k_scales, v_scales=v_scales,
                            adapter_ids=adapter_ids,
                            lora_scaling=lora_scaling,
                            logprobs_k=logprobs_k, sampled=sampled,
                            temperature=temperature, top_p=top_p,
                            top_ks=top_ks, rng=rng)


# INT8-KV-cache variants: scale pages ride along and are donated too.
@partial(jax.jit, static_argnums=(0, 13),
         static_argnames=("lora_scaling", "logprobs_k"),
         donate_argnums=(2, 3, 4, 5))
def _decode_span_q_jit(cfg, params, k_cache, v_cache, k_scales, v_scales,
                       tokens, block_tables, context_lens, temperature,
                       top_p, top_ks, rng, num_steps, adapter_ids=None,
                       lora_scaling=1.0, logprobs_k=0, penalties=None,
                       seed_state=None):
    return model_lib.decode_span(
        cfg, params, k_cache, v_cache, tokens, block_tables, context_lens,
        temperature, top_p, rng, num_steps,
        k_scales=k_scales, v_scales=v_scales, top_ks=top_ks,
        adapter_ids=adapter_ids, lora_scaling=lora_scaling,
        logprobs_k=logprobs_k, penalties=penalties, seed_state=seed_state)


@partial(jax.jit, static_argnums=(0, 14),
         static_argnames=("lora_scaling", "logprobs_k"),
         donate_argnums=(2, 3, 4, 5))
def _prefill_q_jit(cfg, params, k_cache, v_cache, k_scales, v_scales, tokens,
                   block_tables, chunk_lens, history_lens, temperature,
                   top_p, top_ks, rng, has_history, adapter_ids=None,
                   lora_scaling=1.0, logprobs_k=0, penalties=None,
                   seed_state=None):
    logits, k_cache, v_cache, k_scales, v_scales = model_lib.prefill_step(
        cfg, params, k_cache, v_cache, tokens, block_tables,
        chunk_lens, history_lens, has_history,
        k_scales=k_scales, v_scales=v_scales,
        adapter_ids=adapter_ids, lora_scaling=lora_scaling)
    next_tokens, lp = _penalized_prefill_sample(
        cfg, logits, rng, temperature, top_p, top_ks, logprobs_k, penalties,
        seed_state)
    return next_tokens, lp, k_cache, v_cache, k_scales, v_scales


@dataclass
class StepStats:
    """Per-step timing, the reference's `InferenceStats` (`engine.py:28-33`)."""
    kind: str = ""
    batch_size: int = 0
    real_seqs: int = 0
    span: int = 1
    prep_ms: float = 0.0
    device_ms: float = 0.0
    total_ms: float = 0.0


@dataclass
class EngineMetrics:
    steps: int = 0
    prefill_steps: int = 0
    decode_steps: int = 0
    tokens_generated: int = 0
    tokens_prefilled: int = 0
    preemptions: int = 0
    # speculative decoding acceptance telemetry
    spec_rounds: int = 0          # propose/verify rounds executed
    spec_drafts_accepted: int = 0  # accepted draft tokens (excl. bonus)
    # why a decode batch fell back to plain decode despite spec_k > 0
    # (r2 gated silently; reasons: "tp_lora", "sampled", "context",
    # "acceptance" = adaptive disengagement below spec_accept_floor)
    spec_fallbacks: dict = field(default_factory=dict)
    spec_disengagements: int = 0   # adaptive-spec cooldowns triggered
    # decode fairness: slots served vs running sequences left out of a
    # decode batch (tail beyond the bucket cap); with rotation the skip
    # burden spreads evenly instead of starving the tail
    decode_slots_served: int = 0
    decode_slots_skipped: int = 0
    # sliding-window KV eviction (uniformly-windowed models): pages freed
    # because they fell wholly behind the attention window
    window_pages_evicted: int = 0
    last_step: StepStats = field(default_factory=StepStats)


class InferenceEngine:
    """Single-controller continuous-batching engine."""

    def __init__(self, config: EngineConfig, params=None, tokenizer=None,
                 mesh=None):
        sp = config.parallel.sp_size
        if sp > 1 and config.cache.reserved_pages != sp:
            # sequence-parallel KV: global pages 0..sp-1 are the per-rank
            # trash slots (validate() enforces the invariant; set it here
            # so callers only choose sp_size)
            config = config.replace(
                cache=dataclasses.replace(config.cache, reserved_pages=sp))
        config.validate()
        self.config = config
        self.mcfg = config.model
        self.tokenizer = tokenizer
        self.eos_token_id: Optional[int] = None
        if tokenizer is not None:
            self.eos_token_id = getattr(tokenizer, "eos_token_id", None)

        self._rng = jax.random.PRNGKey(config.seed)
        # all-greedy steps never consume randomness (the sampler's greedy
        # fast path skips the rng branch), so they reuse one device-resident
        # key instead of paying a jax.random.split dispatch per span — on
        # the axon tunnel every tiny dispatch is a host round-trip
        self._greedy_rng = jax.random.PRNGKey(0)
        # device-buffer cache for slow-changing per-batch sampling arrays
        # (temperature/top_p/top_k/adapters are constant across the spans of
        # a steady batch; re-uploading them per span costs tunnel puts)
        self._sampling_buf_cache: dict = {}
        # adaptive speculation: trailing draft-acceptance window. When the
        # window's acceptance drops below config.spec_accept_floor the
        # engine disengages speculation for spec_reprobe_spans plain spans,
        # then re-probes (see _spec_eligible / _spec_decode).
        self._spec_cooldown = 0
        self._spec_accept_num = 0     # accepted drafts in current window
        self._spec_accept_den = 0     # proposed drafts in current window
        self._lp_k = config.logprobs_k
        if params is None:
            logger.info("initializing random params (no checkpoint given)")
            params = model_lib.init_params(
                self.mcfg, jax.random.PRNGKey(1),
                quant_bits=(config.quant.weight_bits
                            if config.quant.quantize_weights else None),
                quant_group_size=config.quant.weight_group_size,
                quant_tp=config.parallel.tp_size)
        elif config.quant.quantize_weights:
            params = quantize_params(params, config.quant.weight_bits,
                                     config.quant.weight_group_size,
                                     tp=config.parallel.tp_size)
        self.params = params

        # Multi-LoRA serving: adapter stacks live in params["layers"] as
        # plain [L, N, K, r] arrays (scanned per layer like norms/biases);
        # slot 0 stays all-zero = the base model. New capability vs the
        # reference (one fixed set of weights, `core/model_loader.py`).
        self._lora_slots_used = 1 if config.lora else 0
        if config.lora is not None:
            lc = config.lora
            m = self.mcfg
            L, H, r, N = m.num_layers, m.hidden_size, lc.rank, lc.max_adapters
            qkv_out = m.q_dim + 2 * m.kv_dim
            dt = m.jax_dtype
            layers = dict(self.params["layers"])
            layers["lora_qkv_a"] = jnp.zeros((L, N, H, r), dt)
            layers["lora_qkv_b"] = jnp.zeros((L, N, r, qkv_out), dt)
            layers["lora_o_a"] = jnp.zeros((L, N, m.q_dim, r), dt)
            layers["lora_o_b"] = jnp.zeros((L, N, r, H), dt)
            self.params = dict(self.params)
            self.params["layers"] = layers

        self.kv_quantized = config.quant.quantize_kv
        kv_dtype = jnp.int8 if self.kv_quantized else self.mcfg.jax_dtype
        self.k_cache, self.v_cache = model_lib.init_kv_cache(
            self.mcfg, config.cache, dtype=kv_dtype)
        self.k_scales = self.v_scales = None
        if self.kv_quantized:
            self.k_scales, self.v_scales = model_lib.init_kv_scales(
                self.mcfg, config.cache)

        # Effective length cap: a sequence must always FINISH (emitting its
        # last token) while it can still reserve the smallest decode span —
        # otherwise a seq at exact cache capacity with only large span
        # buckets compiled enters an infinite preempt/recompute loop (the
        # allocator can never grant the span; found by the r2 spec bench).
        min_span = min(config.scheduler.decode_spans)
        self._len_cap = min(config.max_model_len,
                            config.cache.max_context - min_span + 1)

        from .native_alloc import make_allocator
        self.allocator = make_allocator(config.cache)  # C++ when buildable
        self._prefix_caching = hasattr(self.allocator, "register_seq")
        # Sliding-window KV eviction: only when EVERY layer is windowed
        # (mistral) — gemma2's global layers read the full history. A
        # window >= cache capacity never frees anything; skip the walk.
        #
        # Alternating-SWA models (gemma2: half the layers windowed) keep
        # O(context) KV for their windowed layers too. Freeing those would
        # need per-layer-group page POOLS: the cache is [L, pages, ...],
        # so a page index costs memory for ALL layers — evicting it for
        # the windowed group alone saves nothing. Splitting the tensor
        # into [L_w, pages_w] + [L_g, pages_g] with two allocators/tables
        # threaded through every step variant would cap the win at
        # L_w/L x (ctx-w)/ctx of KV bytes (gemma2 at 8k ctx / 4k window:
        # 25%; asymptotically 50%) — deliberate non-goal, trade-off
        # documented in README's long-context bullet (vs. the shared-table
        # design the prefix cache, spec reserve, and preemption lean on).
        m = config.model
        self._window_evict = (
            m.sliding_window is not None and not m.sliding_pattern
            and m.sliding_window < config.cache.max_context)
        self.scheduler = Scheduler(config.scheduler, config.max_model_len,
                                   allocator=self.allocator)
        self.metrics = EngineMetrics()
        self._stream_callbacks: dict[int, StreamCallback] = {}
        self._mesh = mesh
        self._sharded = config.parallel.world_size > 1

        if config.parallel.world_size > 1:
            from ..parallel.mesh import make_mesh
            from ..parallel.sharding import shard_engine_arrays
            from ..parallel.steps import ShardedStepFns
            if self._mesh is None:
                self._mesh = make_mesh(config.parallel)
            if self.kv_quantized:
                (self.params, self.k_cache, self.v_cache, self.k_scales,
                 self.v_scales) = shard_engine_arrays(
                    self._mesh, self.mcfg, self.params, self.k_cache,
                    self.v_cache, config.parallel.tp_size,
                    self.k_scales, self.v_scales,
                    sp_size=config.parallel.sp_size)
            else:
                self.params, self.k_cache, self.v_cache = shard_engine_arrays(
                    self._mesh, self.mcfg, self.params, self.k_cache,
                    self.v_cache, config.parallel.tp_size,
                    sp_size=config.parallel.sp_size)
            fns = ShardedStepFns(self._mesh, config, self.params)
            self._decode_fn = fns.decode_fn
            self._prefill_fn = fns.prefill_fn
            self._decode_q_fn = fns.decode_fn_q
            self._prefill_q_fn = fns.prefill_fn_q
            self._spec_fn = fns.spec_fn
        else:
            self._decode_fn = self._build_decode_fn()
            self._prefill_fn = self._build_prefill_fn()
            self._decode_q_fn = partial(_decode_span_q_jit, self.mcfg)
            self._prefill_q_fn = partial(_prefill_q_jit, self.mcfg)
            self._spec_fn = None   # single-rank: _spec_span_jit directly

    def _call_spec(self, last, hist, hist_lens, tables, ctx0,
                   adapter_ids=None, sampling=None):
        """Run one speculative span through the right compiled fn (sharded
        or single-rank, bf16 or int8-KV), updating caches in place.
        Returns (emitted [steps, B, S], counts [steps, B], lp) as numpy —
        lp is () when the engine has logprobs off, else (chosen
        [steps, B, S], top [steps, B, S, K], ids [steps, B, S, K]).
        ``sampling``: optional (temperature, top_p, top_ks) [B] arrays —
        present = rejection-sampling verification for temp>0 rows."""
        cfg = self.config
        steps, k, ngram = cfg.spec_steps, cfg.spec_k, cfg.spec_ngram
        sampled = sampling is not None
        samp_kw = {}
        if sampled:
            temp, top_p, top_ks = sampling
            samp_kw = {"sampled": True,
                       "temperature": self._put_cached("temp", temp),
                       "top_p": self._put_cached("top_p", top_p),
                       "top_ks": self._put_cached("top_k", top_ks),
                       "rng": self._step_rng()}
        if self._spec_fn is not None:     # sharded (TP/DP) path
            out = self._spec_fn(
                self.params, self.k_cache, self.v_cache, last, hist,
                hist_lens, tables, ctx0, steps, k, ngram,
                ks=self.k_scales, vs=self.v_scales,
                adapter_ids=adapter_ids,
                sampling=sampling, rng=(samp_kw.get("rng")
                                        if sampled else None))
            if self.kv_quantized:
                (emitted, counts, lp, self.k_cache, self.v_cache,
                 self.k_scales, self.v_scales) = out
            else:
                emitted, counts, lp, self.k_cache, self.v_cache = out
        else:
            lora_kw = (self._lora_kw(adapter_ids)
                       if adapter_ids is not None else {})
            if self.kv_quantized:
                (emitted, counts, lp, self.k_cache, self.v_cache,
                 self.k_scales, self.v_scales) = _spec_span_q_jit(
                    self.mcfg, self.params, self.k_cache, self.v_cache,
                    self.k_scales, self.v_scales, jnp.asarray(last),
                    jnp.asarray(hist), jnp.asarray(hist_lens),
                    jnp.asarray(tables), jnp.asarray(ctx0),
                    steps, k, ngram, logprobs_k=self._lp_k,
                    **samp_kw, **lora_kw)
            else:
                (emitted, counts, lp, self.k_cache,
                 self.v_cache) = _spec_span_jit(
                    self.mcfg, self.params, self.k_cache, self.v_cache,
                    jnp.asarray(last), jnp.asarray(hist),
                    jnp.asarray(hist_lens), jnp.asarray(tables),
                    jnp.asarray(ctx0), steps, k, ngram,
                    logprobs_k=self._lp_k, **samp_kw, **lora_kw)
        return (np.asarray(emitted), np.asarray(counts),
                tuple(np.asarray(x) for x in lp))

    # ------------------------------------------------------------------
    # Compiled step functions
    # ------------------------------------------------------------------

    def _build_decode_fn(self):
        return partial(_decode_span_jit, self.mcfg)

    def _build_prefill_fn(self):
        return partial(_prefill_jit, self.mcfg)

    # Unified call helpers: hide the (optional) scale-page plumbing.

    def _lora_kw(self, adapter_ids) -> dict:
        """kwargs threading LoRA state into the jitted steps (single-rank
        and sharded alike; the sharded fns capture the static scaling from
        config and shard adapter_ids with the batch)."""
        if self.config.lora is None:
            return {}
        return {"adapter_ids": self._put_cached(
                    "adapters", np.asarray(adapter_ids, np.int32)),
                "lora_scaling": float(self.config.lora.scaling)}

    def _put_cached(self, name: str, arr: np.ndarray):
        """Device-put with a value-keyed cache: the sampling arrays of a
        steady decode batch are identical span after span, so reuse the
        buffer instead of paying a tunnel put each time."""
        key = (name, arr.shape, arr.dtype.str, arr.tobytes())
        buf = self._sampling_buf_cache.get(key)
        if buf is None:
            if len(self._sampling_buf_cache) >= 128:
                self._sampling_buf_cache.clear()
            buf = jnp.asarray(arr)
            self._sampling_buf_cache[key] = buf
        return buf

    def _span_rng(self, temperature: np.ndarray) -> jax.Array:
        """Greedy spans never consume randomness — skip the per-span
        jax.random.split dispatch (one fewer tunnel round-trip)."""
        if not temperature.any():
            return self._greedy_rng
        return self._step_rng()

    def _seed_kw(self, seqs: list, B: int) -> dict:
        """Per-request seed inputs (single-rank only; the sharded step fns
        do not thread them — seeded requests are rejected under TP).
        Always passed on single-rank (zeros = unseeded) so there is ONE
        compiled variant and warmup covers it. User seed s maps to s + 1
        (0 is the unseeded sentinel)."""
        if self._sharded:
            return {}
        seeds = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        # positions only matter for seeded rows — leave all-zero when the
        # batch has none so the value-keyed put cache hits every span
        if any(s.sampling.seed is not None for s in seqs):
            for i, seq in enumerate(seqs):
                if seq.sampling.seed is not None:
                    seeds[i] = (int(seq.sampling.seed) & 0x3FFFFFFF) + 1
                    pos[i] = len(seq.output_token_ids)
        return {"seed_state": (self._put_cached("seeds", seeds),
                               self._put_cached("seed_pos", pos))}

    def _penalty_kw(self, seqs: list, B: int) -> dict:
        """Penalty-state inputs for the jitted steps: each row's token
        history (prompt + generated so far), where generation starts, and
        the three penalty knobs. Rows beyond len(seqs) (trash padding) get
        rep=1 / zeros — inert. Only built on engines with
        ``enable_penalties`` (one extra [B, Lcap] upload per span; the
        compiled variant is warmed like the rest). ``penalty_window > 0``
        bounds Lcap (and the counted history) to the last N tokens so the
        upload stays O(window) at long context."""
        if not self.config.enable_penalties:
            return {}
        Lcap = self.config.max_model_len
        win = self.config.penalty_window
        if win > 0:
            Lcap = min(Lcap, win)
        hist = np.zeros((B, Lcap), np.int32)
        hist_lens = np.zeros(B, np.int32)
        out_start = np.zeros(B, np.int32)
        pres = np.zeros(B, np.float32)
        freq = np.zeros(B, np.float32)
        rep = np.ones(B, np.float32)
        KB = 32   # logit_bias slots per request (validated at parse)
        bias_ids = np.full((B, KB), self.mcfg.vocab_size, np.int32)
        bias_vals = np.zeros((B, KB), np.float32)
        for i, seq in enumerate(seqs):
            ids = seq.prompt_token_ids + seq.output_token_ids
            drop = max(0, len(ids) - Lcap)   # keep the most recent Lcap
            ids = ids[drop:]
            hist[i, :len(ids)] = ids
            hist_lens[i] = len(ids)
            out_start[i] = min(max(0, len(seq.prompt_token_ids) - drop),
                               Lcap)
            s = seq.sampling
            pres[i] = s.presence_penalty
            freq[i] = s.frequency_penalty
            rep[i] = s.repetition_penalty
            for j, (tid, bias) in enumerate(s.logit_bias[:KB]):
                bias_ids[i, j] = tid
                bias_vals[i, j] = bias
        return {"penalties": (
            jnp.asarray(hist), jnp.asarray(hist_lens),
            jnp.asarray(out_start), self._put_cached("pen_p", pres),
            self._put_cached("pen_f", freq), self._put_cached("pen_r", rep),
            self._put_cached("pen_bi", bias_ids),
            self._put_cached("pen_bv", bias_vals))}

    def _call_decode(self, tokens, tables, context, temperature, top_p,
                     top_ks, span: int, adapter_ids=None, extra_kw=None):
        """Returns (tokens [B, span] np, lp) where lp is () or the
        (chosen, top, top_ids) logprob arrays (engine-wide logprobs_k)."""
        kw = self._lora_kw(adapter_ids) if adapter_ids is not None else {}
        if extra_kw:
            kw.update(extra_kw)
        if self._lp_k:
            kw["logprobs_k"] = self._lp_k
        rng = self._span_rng(temperature)
        samp = (self._put_cached("temp", temperature),
                self._put_cached("top_p", top_p),
                self._put_cached("top_k", top_ks))
        if self.kv_quantized:
            (toks, lp, self.k_cache, self.v_cache, self.k_scales,
             self.v_scales) = self._decode_q_fn(
                self.params, self.k_cache, self.v_cache,
                self.k_scales, self.v_scales, jnp.asarray(tokens),
                jnp.asarray(tables), jnp.asarray(context),
                *samp, rng, span, **kw)
        else:
            toks, lp, self.k_cache, self.v_cache = self._decode_fn(
                self.params, self.k_cache, self.v_cache, jnp.asarray(tokens),
                jnp.asarray(tables), jnp.asarray(context),
                *samp, rng, span, **kw)
        return np.asarray(toks), tuple(np.asarray(x) for x in lp)

    def _call_prefill(self, tokens, tables, chunk_lens, history, temperature,
                      top_p, top_ks, has_history: bool, adapter_ids=None,
                      extra_kw=None):
        kw = self._lora_kw(adapter_ids) if adapter_ids is not None else {}
        if extra_kw:
            kw.update(extra_kw)
        if self._lp_k:
            kw["logprobs_k"] = self._lp_k
        rng = self._span_rng(temperature)
        samp = (self._put_cached("temp", temperature),
                self._put_cached("top_p", top_p),
                self._put_cached("top_k", top_ks))
        if self.kv_quantized:
            (toks, lp, self.k_cache, self.v_cache, self.k_scales,
             self.v_scales) = self._prefill_q_fn(
                self.params, self.k_cache, self.v_cache,
                self.k_scales, self.v_scales, jnp.asarray(tokens),
                jnp.asarray(tables), jnp.asarray(chunk_lens),
                jnp.asarray(history), *samp, rng, has_history, **kw)
        else:
            toks, lp, self.k_cache, self.v_cache = self._prefill_fn(
                self.params, self.k_cache, self.v_cache, jnp.asarray(tokens),
                jnp.asarray(tables), jnp.asarray(chunk_lens),
                jnp.asarray(history), *samp, rng, has_history, **kw)
        return np.asarray(toks), tuple(np.asarray(x) for x in lp)

    def warmup(self, decode_buckets: Optional[Seq[int]] = None,
               prefill_shapes: Optional[Seq[tuple[int, int]]] = None) -> None:
        """Pre-compile the step functions for the shape buckets.

        Replaces the reference's CUDA-graph `capture()` warm-up
        (`core/engine.py:80-83`, `model_graph.py:225-253`).
        """
        scfg = self.config.scheduler
        t0 = time.monotonic()
        # Warm the FULL (bucket, span) / (batch, chunk-len) cross products:
        # the scheduler can select any combination at runtime, and a cold
        # shape is a 30s+ remote-compile stall mid-serving (ADVICE r1).
        n_decode = 0
        for bs in (decode_buckets or scfg.decode_buckets):
            for span in sorted(set(scfg.decode_spans)):
                self._run_decode_shapes(bs, span)
                n_decode += 1
            if self.config.spec_k > 0:
                self._run_spec_shapes(bs)
                n_decode += 1
        shapes = prefill_shapes
        if shapes is None:
            shapes = [(bs, cl) for bs in scfg.prefill_batch_buckets
                      for cl in scfg.prefill_len_buckets]
        for bs, cl in shapes:
            self._run_prefill_shapes(bs, cl)
            # chunked-prefill continuation compiles a second program
            # (has_history=True is a static arg)
            self._run_prefill_shapes(bs, cl, has_history=True)
        logger.info("warmup compiled %d decode + %d prefill shapes in %.1fs",
                    n_decode, 2 * len(shapes), time.monotonic() - t0)

    def _run_decode_shapes(self, bs: int, span: Optional[int] = None) -> None:
        span = span or max(self.config.scheduler.decode_spans)
        z = np.zeros(bs, dtype=np.int32)
        tables = np.zeros((bs, self.config.cache.max_pages_per_seq), np.int32)
        f = np.ones(bs, dtype=np.float32)
        k64 = np.full(bs, 64, dtype=np.int32)
        self._call_decode(z, tables, z, f, f, k64, span,
                          adapter_ids=z if self.config.lora else None,
                          extra_kw=self._penalty_kw([], bs)
                          | self._seed_kw([], bs))

    def _run_spec_shapes(self, bs: int) -> None:
        cfg = self.config
        reserve = cfg.spec_steps * (cfg.spec_k + 1)
        z = np.zeros(bs, dtype=np.int32)
        hist = np.zeros((bs, cfg.max_model_len + reserve), np.int32)
        tables = np.zeros((bs, cfg.cache.max_pages_per_seq), np.int32)
        self._call_spec(z, hist, z, tables, z,
                        adapter_ids=z if cfg.lora else None)
        if cfg.spec_sampled:
            # warm the rejection-sampling variant too (temp>0 traffic)
            self._call_spec(z, hist, z, tables, z,
                            adapter_ids=z if cfg.lora else None,
                            sampling=(np.ones(bs, np.float32),
                                      np.ones(bs, np.float32),
                                      np.full(bs, 64, np.int32)))

    def _run_prefill_shapes(self, bs: int, chunk: int,
                            has_history: bool = False) -> None:
        tokens = np.zeros((bs, chunk), dtype=np.int32)
        tables = np.zeros((bs, self.config.cache.max_pages_per_seq), np.int32)
        z = np.zeros(bs, dtype=np.int32)
        f = np.ones(bs, dtype=np.float32)
        k64 = np.full(bs, 64, dtype=np.int32)
        self._call_prefill(tokens, tables, z, z, f, f, k64, has_history,
                           adapter_ids=z if self.config.lora else None,
                           extra_kw=self._penalty_kw([], bs)
                           | self._seed_kw([], bs))

    def _step_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # ------------------------------------------------------------------
    # Request API (reference: `engine.py:139-152`)
    # ------------------------------------------------------------------

    def add_request(self, prompt: Optional[str] = None,
                    prompt_token_ids: Optional[list[int]] = None,
                    sampling: Optional[SamplingParams] = None,
                    priority: int = 0, adapter_id: int = 0) -> int:
        if prompt_token_ids is None:
            if prompt is None:
                raise ValueError("need prompt or prompt_token_ids")
            if self.tokenizer is None:
                raise ValueError("no tokenizer configured; pass prompt_token_ids")
            prompt_token_ids = list(self.tokenizer.encode(prompt))
        if adapter_id != 0 and not (
                self.config.lora is not None
                and 0 < adapter_id < self._lora_slots_used):
            raise ValueError(f"adapter {adapter_id} not loaded")
        if sampling is not None and sampling.logprobs > 0 and not self._lp_k:
            raise ValueError(
                "logprobs requested but the engine was built with "
                "logprobs_k=0 (the logprob step variant is not compiled)")
        if sampling is not None and sampling.seed is not None \
                and self._sharded:
            raise ValueError(
                "per-request seeds are single-rank only (the sharded step "
                "fns do not thread the per-row keys)")
        if (sampling is not None and sampling.has_penalties
                and not self.config.enable_penalties):
            raise ValueError(
                "sampling penalties require an engine built with "
                "enable_penalties=True (the penalized step variant is "
                "compiled and warmed only then)")
        seq = Sequence(prompt_token_ids=prompt_token_ids,
                       sampling=sampling or SamplingParams(
                           max_new_tokens=self.config.default_max_new_tokens),
                       priority=priority,
                       adapter_id=adapter_id,
                       prompt_text=prompt)
        self.scheduler.add_request(seq)
        return seq.seq_id

    def load_adapter(self, adapter, slot: Optional[int] = None) -> int:
        """Install a LoRA adapter and return its slot id.

        ``adapter``: dict with per-layer stacks ``qkv_a [L, H, r]``,
        ``qkv_b [L, r, q_dim+2*kv_dim]``, ``o_a [L, q_dim, r]``,
        ``o_b [L, r, H]`` (torch-style per-matrix checkpoints should be
        stacked by the caller). Slot 0 is reserved for the base model.

        Threading: rebuilds ``self.params`` — call only from the thread
        that runs ``step()``. Servers must queue installs onto the engine
        thread (``EngineServer.load_adapter`` does; same pattern as aborts).
        """
        if self.config.lora is None:
            raise ValueError("engine built without LoRAConfig")
        if slot is None:
            slot = self._lora_slots_used
        if not 1 <= slot < self.config.lora.max_adapters:
            raise ValueError(f"adapter slot {slot} out of range "
                             f"[1, {self.config.lora.max_adapters})")
        tp = self.config.parallel.tp_size
        layers = dict(self.params["layers"])
        for name in ("qkv_a", "qkv_b", "o_a", "o_b"):
            key = f"lora_{name}"
            stack = layers[key]
            new = jnp.asarray(adapter[name], stack.dtype)
            if new.shape != (stack.shape[0],) + stack.shape[2:]:
                raise ValueError(
                    f"{name}: expected {(stack.shape[0],) + stack.shape[2:]},"
                    f" got {new.shape}")
            if name == "qkv_b" and tp > 1:
                # store rank-interleaved so each TP rank's contiguous column
                # shard is its own (q_r|k_r|v_r) block, matching the fused
                # wqkv layout (`ops/quant.py::interleave_columns`)
                from ..ops.quant import interleave_columns
                qd, kvd = self.mcfg.q_dim, self.mcfg.kv_dim
                new = interleave_columns(
                    [new[..., :qd], new[..., qd:qd + kvd],
                     new[..., qd + kvd:]], tp)
            layers[key] = stack.at[:, slot].set(new)
        self.params = dict(self.params)
        self.params["layers"] = layers
        self._lora_slots_used = max(self._lora_slots_used, slot + 1)
        return slot

    def abort_request(self, seq_id: int) -> bool:
        ok = self.scheduler.abort(seq_id)
        if ok and self.allocator.has_seq(seq_id):
            self.allocator.free(seq_id)
        return ok

    def register_stream_callback(self, seq_id: int, cb: StreamCallback) -> None:
        self._stream_callbacks[seq_id] = cb

    def unregister_stream_callback(self, seq_id: int) -> None:
        self._stream_callbacks.pop(seq_id, None)

    # ------------------------------------------------------------------
    # Step loop (reference: `engine.py:154-176`)
    # ------------------------------------------------------------------

    def step(self) -> int:
        """Run one engine step. Returns number of tokens produced."""
        batch = self.scheduler.get_next_batch()
        if batch is None:
            # Nothing schedulable. If requests are waiting but the cache is
            # idle (nothing running to eventually free pages), they can never
            # fit: fail them instead of spinning forever.
            if (self.scheduler.waiting and not self.scheduler.running
                    and not self.scheduler.prefilling):
                seq = self.scheduler.waiting.popleft()
                logger.error("request %d cannot fit in KV cache; aborting",
                             seq.seq_id)
                seq.finish(FinishReason.ABORTED)
                self.scheduler.finished[seq.seq_id] = seq
            return 0
        t0 = time.monotonic()
        if batch.kind == "prefill":
            produced = self._prefill(batch)
            self.metrics.prefill_steps += 1
        else:
            produced = self._decode(batch)
            self.metrics.decode_steps += 1
        self.metrics.steps += 1
        self.metrics.last_step.total_ms = (time.monotonic() - t0) * 1e3
        self.metrics.last_step.kind = batch.kind
        self.metrics.last_step.batch_size = batch.batch_size
        self.metrics.last_step.real_seqs = batch.num_real
        return produced

    # -- prefill -----------------------------------------------------------

    def _prefill(self, batch: ScheduledBatch) -> int:
        B, S = batch.batch_size, batch.chunk_len
        seqs = batch.seqs

        # Commit pages for this chunk (allocate on first chunk, extend after).
        # Sequences that cannot get pages (even after preempting decoders) go
        # back to the waiting queue instead of erroring the engine (the
        # reference raises RuntimeError("OOM"), `engine.py:220`).
        admitted: list[Sequence] = []
        for seq in seqs:
            target = self.scheduler._prefill_target(seq)
            if (self.allocator.pages_needed(target)
                    > self.config.cache.num_usable_pages):
                # Can never fit even with an empty cache: fail fast instead
                # of oscillating between admission and self-preemption.
                logger.error("seq %d needs more pages than exist; aborting",
                             seq.seq_id)
                if self.allocator.has_seq(seq.seq_id):
                    self.allocator.free(seq.seq_id)
                seq.finish(FinishReason.ABORTED)
                self.scheduler.mark_finished(seq)
                continue
            chunk = min(S, target - seq.num_prefilled)

            def _commit() -> None:
                if not self.allocator.has_seq(seq.seq_id):
                    self.allocator.allocate(seq.seq_id, chunk)
                else:
                    self.allocator.extend(seq.seq_id, chunk)

            try:
                _commit()
            except OutOfPagesError:
                if self._preempt_for(chunk, seq):
                    _commit()
                else:
                    self._do_preempt(seq)
                    continue
            admitted.append(seq)
        if not admitted:
            return 0
        if len(admitted) != len(seqs):
            batch.sample_mask = [m for s, m in zip(seqs, batch.sample_mask)
                                 if s in admitted]
            batch.seqs = admitted
            seqs = admitted

        tokens = np.zeros((B, S), dtype=np.int32)
        chunk_lens = np.zeros(B, dtype=np.int32)
        history = np.zeros(B, dtype=np.int32)
        temperature = np.ones(B, dtype=np.float32)
        top_p = np.ones(B, dtype=np.float32)
        top_ks = np.full(B, 64, dtype=np.int32)
        tables = np.zeros((B, self.config.cache.max_pages_per_seq), np.int32)
        adapters = np.zeros(B, dtype=np.int32)

        for i, seq in enumerate(seqs):
            target = self.scheduler._prefill_target(seq)
            chunk = min(S, target - seq.num_prefilled)
            ids = (seq.prompt_token_ids + seq.output_token_ids)[
                seq.num_prefilled: seq.num_prefilled + chunk]
            tokens[i, : len(ids)] = ids
            chunk_lens[i] = chunk
            history[i] = seq.num_prefilled
            temperature[i] = seq.sampling.temperature
            top_p[i] = seq.sampling.top_p
            top_ks[i] = seq.sampling.top_k
            tables[i] = self.allocator.block_table_row(seq.seq_id)
            adapters[i] = seq.adapter_id

        next_tokens, lp = self._call_prefill(
            tokens, tables, chunk_lens, history, temperature, top_p, top_ks,
            bool(history.any()),
            adapter_ids=adapters if self.config.lora else None,
            extra_kw=self._penalty_kw(seqs, B) | self._seed_kw(seqs, B))

        self.scheduler.on_prefill_done(batch)
        if self._prefix_caching:
            # index this chunk's full pages (their KV is computed — the
            # readback above synchronized) so later requests can reuse them
            for seq in seqs:
                self.allocator.register_seq(
                    seq.seq_id, seq.prompt_token_ids + seq.output_token_ids,
                    seq.num_prefilled)
        produced = 0
        for i, seq in enumerate(seqs):
            self.metrics.tokens_prefilled += int(chunk_lens[i])
            if i < len(batch.sample_mask) and batch.sample_mask[i]:
                self._apply_token(seq, int(next_tokens[i]),
                                  lp_entry=self._lp_entry(lp, seq, i))
                produced += 1
        self._evict_window(seqs)
        return produced

    def _lp_entry(self, lp: tuple, seq: Sequence, i: int, j=None):
        """Build one token's logprob record from the step's lp arrays
        (None when logprobs are off or the request didn't ask)."""
        want = seq.sampling.logprobs
        if not lp or not want:
            return None
        chosen, top, ids = lp
        if j is None:
            c, t, d = chosen[i], top[i], ids[i]
        else:
            c, t, d = chosen[i, j], top[i, j], ids[i, j]
        k = min(int(want), len(t))
        return {"logprob": float(c),
                "top": [[int(d[n]), float(t[n])] for n in range(k)]}

    # -- decode ------------------------------------------------------------

    def _span_cap(self, seqs: list[Sequence]) -> int:
        """Adaptive upper bound on the decode span (both are optional;
        default = largest configured span):

        * never overshoot the soonest ``max_new_tokens`` finish — EOS-at-cap
          discards the span tail, so pick the smallest bucket covering the
          minimum remaining budget in the batch;
        * ``stream_span_cap``: interactive SSE consumers get tokens in small
          bursts while load is light (running <= stream_span_uncap_at);
          under heavier load the cap lifts and throughput wins.
        """
        scfg = self.config.scheduler
        spans = sorted(scfg.decode_spans)
        cap = spans[-1]
        remaining = min(s.sampling.max_new_tokens - len(s.output_token_ids)
                        for s in seqs)
        if remaining < cap:
            cap = next(sp for sp in spans if sp >= remaining)
        if (scfg.stream_span_cap is not None
                and len(self.scheduler.running) <= scfg.stream_span_uncap_at
                and any(s.seq_id in self._stream_callbacks for s in seqs)):
            eligible = [sp for sp in spans if sp <= scfg.stream_span_cap]
            if eligible:
                cap = min(cap, eligible[-1])
        return cap

    def _pick_span(self, seqs: list[Sequence]) -> int:
        """Largest decode-span bucket every batch member has page capacity
        for (the pooled free-page count must cover everyone's growth),
        bounded by the adaptive cap (`_span_cap`)."""
        spans = sorted(self.config.scheduler.decode_spans)
        cap = self._span_cap(seqs)
        spans = [sp for sp in spans if sp <= cap] or spans[:1]
        max_ctx = self.config.cache.max_context
        for span in reversed(spans):
            extra_pages = 0
            ok = True
            for seq in seqs:
                cached = self.allocator.seq_len(seq.seq_id)
                if cached + span > max_ctx:
                    ok = False
                    break
                extra_pages += (self.allocator.pages_needed(cached + span)
                                - self.allocator.pages_needed(cached))
            if ok and extra_pages <= self.allocator.num_free:
                return span
        return spans[0]

    def _spec_eligible(self, seqs: list[Sequence]) -> bool:
        """Whether this decode batch runs the speculative span. int8 KV and
        LoRA rows are fine (verification routes through prefill_step, which
        handles both — the r2 gates were over-conservative). Fallbacks are
        counted by reason in metrics.spec_fallbacks so a user can see WHY
        speculation isn't engaging (r2 VERDICT weak #6). The spec span runs
        under TP/DP too (ShardedStepFns.spec_fn), including LoRA rows
        (adapter ids are threaded through every sharded step fn)."""
        cfg = self.config

        def fallback(reason: str) -> bool:
            self.metrics.spec_fallbacks[reason] = \
                self.metrics.spec_fallbacks.get(reason, 0) + 1
            return False

        if cfg.spec_k <= 0:
            return False   # speculation off — not a fallback
        if cfg.spec_adaptive and self._spec_cooldown > 0:
            # trailing acceptance collapsed below spec_accept_floor: run
            # plain spans, re-probing with one spec span per
            # spec_reprobe_spans so traffic shifts re-engage speculation
            self._spec_cooldown -= 1
            return fallback("acceptance")
        if any(s.sampling.temperature > 0.0 for s in seqs):
            if not cfg.spec_sampled:
                return fallback("sampled")  # opt-out: greedy-only spec
            if any(s.sampling.seed is not None for s in seqs):
                # seeded rows need the (seed, pos)-keyed stream the plain
                # path consumes; the spec path draws differently
                return fallback("seeded")
        if any(s.sampling.logprobs > 0 for s in seqs) and not self._lp_k:
            # only reachable via direct SamplingParams misuse: generate()
            # already rejects logprobs requests on a logprobs_k=0 engine.
            # With logprobs_k > 0 the spec span emits logprobs from its
            # verify logits, so such requests keep speculating.
            return fallback("logprobs")
        if any(s.sampling.has_penalties for s in seqs):
            return fallback("penalties")  # penalties alter greedy argmax
        reserve = cfg.spec_steps * (cfg.spec_k + 1)
        max_ctx = cfg.cache.max_context
        if not all(self.allocator.seq_len(s.seq_id) + reserve <= max_ctx
                   for s in seqs):
            return fallback("context")  # no room for the worst-case window
        return True

    def _spec_decode(self, batch: ScheduledBatch,
                     seqs: list[Sequence]) -> int:
        """n-gram speculative decode span (models/speculative.py): reserve
        worst-case pages, run propose/verify rounds on device, apply the
        emitted tokens, truncate the allocator to the accepted length."""
        cfg = self.config
        B = batch.batch_size
        k, steps, ngram = cfg.spec_k, cfg.spec_steps, cfg.spec_ngram
        S = k + 1
        reserve = steps * S

        ready: list[Sequence] = []
        for seq in seqs:
            if not self.allocator.has_seq(seq.seq_id):
                continue
            while True:
                try:
                    self.allocator.extend(seq.seq_id, reserve)
                    ready.append(seq)
                    break
                except OutOfPagesError:
                    victim = self._pick_preemption_victim()
                    if victim is None or victim is seq:
                        self._do_preempt(seq)
                        break
                    self._do_preempt(victim)
                    if victim in ready:
                        ready.remove(victim)
        seqs = [s for s in ready if not s.is_finished]
        if not seqs:
            return 0

        Lmax = cfg.max_model_len + reserve
        last = np.zeros(B, dtype=np.int32)
        hist = np.zeros((B, Lmax), dtype=np.int32)
        hist_lens = np.zeros(B, dtype=np.int32)
        ctx0 = np.zeros(B, dtype=np.int32)
        tables = np.zeros((B, cfg.cache.max_pages_per_seq), np.int32)
        for i, seq in enumerate(seqs):
            ids = seq.prompt_token_ids + seq.output_token_ids
            hist[i, :len(ids)] = ids
            hist_lens[i] = len(ids)
            last[i] = seq.last_token_id
            ctx0[i] = self.allocator.seq_len(seq.seq_id) - reserve
            tables[i] = self.allocator.block_table_row(seq.seq_id)

        adapter_ids = None
        if self.config.lora is not None:
            adapter_ids = np.zeros(B, dtype=np.int32)
            for i, seq in enumerate(seqs):
                adapter_ids[i] = seq.adapter_id
        sampling = None
        if any(s.sampling.temperature > 0.0 for s in seqs):
            # rejection-sampling verification (padding rows: temp 0 =
            # greedy argmax match, inert)
            temp = np.zeros(B, np.float32)
            top_p = np.ones(B, np.float32)
            top_ks = np.full(B, 64, np.int32)
            for i, seq in enumerate(seqs):
                temp[i] = seq.sampling.temperature
                top_p[i] = seq.sampling.top_p
                top_ks[i] = seq.sampling.top_k
            sampling = (temp, top_p, top_ks)
        emitted, counts, lp = self._call_spec(last, hist, hist_lens, tables,
                                              ctx0, adapter_ids, sampling)

        produced = 0
        for i, seq in enumerate(seqs):
            applied = 0
            for t in range(steps):
                cnt = int(counts[t, i])
                for j in range(cnt):
                    entry = None
                    if lp and seq.sampling.logprobs:
                        chosen, top, ids = lp
                        kk = min(int(seq.sampling.logprobs), top.shape[-1])
                        entry = {"logprob": float(chosen[t, i, j]),
                                 "top": [[int(ids[t, i, j, n]),
                                          float(top[t, i, j, n])]
                                         for n in range(kk)]}
                    self._apply_token(seq, int(emitted[t, i, j]),
                                      lp_entry=entry)
                    produced += 1
                    applied += 1
                    if seq.is_finished:
                        break
                if seq.is_finished:
                    break
            rounds = t + 1
            accepted = max(0, applied - rounds)
            self.metrics.spec_rounds += rounds
            self.metrics.spec_drafts_accepted += accepted
            self._spec_accept_num += accepted
            self._spec_accept_den += rounds * k
            if not seq.is_finished:
                # drop the unused reservation + any rejected-slot tail
                self.allocator.truncate(seq.seq_id,
                                        int(ctx0[i]) + applied)
        # adaptive disengagement: once the trailing window holds enough
        # rounds to judge, compare acceptance to the floor and either
        # disengage (cooldown of plain spans, then re-probe) or keep
        # speculating; the window restarts either way so the estimate
        # tracks current traffic, not the whole session.
        if (cfg.spec_adaptive
                and self._spec_accept_den >= cfg.spec_min_rounds * k):
            if (self._spec_accept_num
                    < cfg.spec_accept_floor * self._spec_accept_den):
                self._spec_cooldown = cfg.spec_reprobe_spans
                self.metrics.spec_disengagements += 1
            self._spec_accept_num = 0
            self._spec_accept_den = 0
        self._evict_window(seqs)
        self.metrics.last_step.span = steps * S
        return produced

    def _decode(self, batch: ScheduledBatch) -> int:
        B = batch.batch_size
        seqs = [s for s in batch.seqs if self.allocator.has_seq(s.seq_id)]
        if not seqs:
            return 0
        if self._spec_eligible(seqs):
            self.metrics.decode_slots_served += len(seqs)
            self.metrics.decode_slots_skipped += max(
                0, len(self.scheduler.running) - len(seqs))
            return self._spec_decode(batch, seqs)
        span = self._pick_span(seqs)

        # Reserve `span` token slots per sequence; preempt the globally
        # youngest running sequence on page exhaustion (reference: hard
        # RuntimeError, `engine.py:220`; real vLLM preempts, we do too).
        # Strict age priority guarantees the oldest request always completes.
        ready: list[Sequence] = []
        for seq in seqs:
            if not self.allocator.has_seq(seq.seq_id):
                continue  # preempted as a victim earlier in this loop
            while True:
                try:
                    self.allocator.extend(seq.seq_id, span)
                    ready.append(seq)
                    break
                except OutOfPagesError:
                    victim = self._pick_preemption_victim()
                    if victim is None or victim is seq:
                        self._do_preempt(seq)
                        break
                    self._do_preempt(victim)
                    if victim in ready:
                        ready.remove(victim)
        seqs = [s for s in ready if not s.is_finished]
        if not seqs:
            return 0

        tokens = np.zeros(B, dtype=np.int32)
        context = np.zeros(B, dtype=np.int32)
        temperature = np.ones(B, dtype=np.float32)
        top_p = np.ones(B, dtype=np.float32)
        top_ks = np.full(B, 64, dtype=np.int32)
        tables = np.zeros((B, self.config.cache.max_pages_per_seq), np.int32)
        adapters = np.zeros(B, dtype=np.int32)

        for i, seq in enumerate(seqs):
            tokens[i] = seq.last_token_id
            # allocator.seq_len was bumped by `span` for the incoming tokens,
            # so the first write position is `span` less.
            context[i] = self.allocator.seq_len(seq.seq_id) - span
            temperature[i] = seq.sampling.temperature
            top_p[i] = seq.sampling.top_p
            top_ks[i] = seq.sampling.top_k
            tables[i] = self.allocator.block_table_row(seq.seq_id)
            adapters[i] = seq.adapter_id

        self.metrics.decode_slots_served += len(seqs)
        self.metrics.decode_slots_skipped += max(
            0, len(self.scheduler.running) - len(seqs))

        span_tokens, lp = self._call_decode(
            tokens, tables, context, temperature, top_p, top_ks, span,
            adapter_ids=adapters if self.config.lora else None,
            extra_kw=self._penalty_kw(seqs, B)
            | self._seed_kw(seqs, B))  # [B, span]

        produced = 0
        for i, seq in enumerate(seqs):
            for j in range(span):
                self._apply_token(seq, int(span_tokens[i, j]),
                                  lp_entry=self._lp_entry(lp, seq, i, j))
                produced += 1
                if seq.is_finished:
                    break                               # discard span tail
        self._evict_window(seqs)
        self.metrics.last_step.span = span
        return produced

    # -- helpers -----------------------------------------------------------

    def _evict_window(self, seqs: list[Sequence]) -> None:
        """Free KV pages wholly behind the sliding window (windowed-model
        capacity win: live KV stays O(window) pages per stream, so N
        long-running windowed streams fit where O(context) paging would
        preempt). The kernels never read below the window (chunk skipping)
        and the jnp oracles mask it, so the freed slots' trash content is
        inert; the position-indexed block table keeps its width."""
        if not self._window_evict:
            return
        w = self.config.model.sliding_window
        for seq in seqs:
            if not self.allocator.has_seq(seq.seq_id):
                continue
            ctx = self.allocator.seq_len(seq.seq_id)
            if ctx <= w:
                continue
            self.metrics.window_pages_evicted += self.allocator.release_below(
                seq.seq_id, ctx - w + 1)

    def _hits_stop_string(self, seq: Sequence) -> bool:
        """Whether the decoded output tail now contains a stop string.
        Decodes only a bounded token window (longest stop string + slack),
        so the per-token cost stays O(1) in output length."""
        stops = seq.sampling.stop
        window = 8 + max(len(s) for s in stops)   # 1 token >= 1 char
        tail = self.tokenizer.decode(seq.output_token_ids[-window:])
        return any(s in tail for s in stops)

    def _apply_token(self, seq: Sequence, token_id: int,
                     lp_entry: Optional[dict] = None) -> None:
        if lp_entry is not None:
            seq.logprobs.append(lp_entry)   # before the callback: the SSE
                                            # emitter reads it by index
        finished = seq.append_output(token_id, self.eos_token_id)
        if seq.num_tokens >= self._len_cap and not finished:
            seq.finish(FinishReason.LENGTH)
            finished = True
        if (not finished and seq.sampling.stop and self.tokenizer is not None
                and self._hits_stop_string(seq)):
            seq.finish(FinishReason.STOP)
            finished = True
        # Bookkeeping precedes the callback so a consumer seeing
        # finished=True can already fetch the sequence from
        # scheduler.finished (the server relies on this ordering).
        if finished:
            self.allocator.free(seq.seq_id)
            self.scheduler.mark_finished(seq)
        cb = self._stream_callbacks.get(seq.seq_id)
        if cb is not None:
            try:
                cb(seq.seq_id, token_id, finished)
            except Exception:   # callbacks must not kill the engine
                logger.exception("stream callback failed for seq %d", seq.seq_id)
        self.metrics.tokens_generated += 1
        if finished:
            self.unregister_stream_callback(seq.seq_id)

    def _pick_preemption_victim(self) -> Optional[Sequence]:
        """Lowest priority first, then youngest within a priority class."""
        candidates = [s for s in self.scheduler.running
                      if self.allocator.has_seq(s.seq_id)]
        if not candidates:
            return None
        return max(candidates, key=lambda s: (-s.priority, s.arrival_time))

    def _do_preempt(self, seq: Sequence) -> None:
        logger.warning("preempting seq %d (recompute)", seq.seq_id)
        self.allocator.free(seq.seq_id)
        self.scheduler.preempt(seq)
        self.metrics.preemptions += 1

    @staticmethod
    def _outranks(requester: Sequence, victim: Sequence) -> bool:
        """Preemption order: priority beats age; equal priority -> elder wins."""
        if requester.priority != victim.priority:
            return requester.priority > victim.priority
        return requester.arrival_time < victim.arrival_time

    def _preempt_for(self, num_tokens: int, requester: Sequence) -> bool:
        """Free pages for a mid-prefill extension by preempting running
        sequences the requester outranks (priority, then age — never steal
        from a higher-priority or elder sequence)."""
        need = self.allocator.pages_needed(num_tokens)
        while self.allocator.num_free < need:
            victim = self._pick_preemption_victim()
            if victim is None or not self._outranks(requester, victim):
                return False
            self._do_preempt(victim)
        return True

    # ------------------------------------------------------------------
    # Offline batch API (reference: `engine.py:178-199`)
    # ------------------------------------------------------------------

    def generate(self, prompts: list[str] | list[list[int]],
                 sampling: Optional[SamplingParams | list] = None,
                 ) -> list[Sequence]:
        """``sampling`` is one SamplingParams for every prompt or a list
        with one entry per prompt (vLLM's convention)."""
        if isinstance(sampling, (list, tuple)):
            if len(sampling) != len(prompts):
                raise ValueError("need one SamplingParams per prompt")
            per_prompt = list(sampling)
        else:
            per_prompt = [sampling] * len(prompts)
        ids = []
        for p, sp in zip(prompts, per_prompt):
            if isinstance(p, str):
                ids.append(self.add_request(prompt=p, sampling=sp))
            else:
                ids.append(self.add_request(prompt_token_ids=list(p),
                                            sampling=sp))
        while not self.scheduler.is_finished():
            self.step()
        done = {s.seq_id: s for s in self.scheduler.pop_finished()}
        return [done[i] for i in ids]

    def decode_text(self, seq: Sequence) -> str:
        if self.tokenizer is None:
            raise ValueError("no tokenizer configured")
        return self.tokenizer.decode(seq.output_token_ids,
                                     skip_special_tokens=True)

    @property
    def cache_stats(self):
        return self.allocator.stats

    # ------------------------------------------------------------------
    # Profiling (reference: torch.profiler import + chrome-trace export,
    # `core/engine.py:17,166-174`; here: jax.profiler trace capture)
    # ------------------------------------------------------------------

    def start_profile(self, trace_dir: str = "/tmp/mvt_trace") -> str:
        jax.profiler.start_trace(trace_dir)
        self._trace_dir = trace_dir
        return trace_dir

    def stop_profile(self) -> Optional[str]:
        try:
            jax.profiler.stop_trace()
        except RuntimeError:
            return None
        return getattr(self, "_trace_dir", None)
