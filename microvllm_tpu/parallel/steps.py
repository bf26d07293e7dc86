"""shard_map-wrapped engine step functions for TP×DP meshes.

GSPMD auto-partitioning cannot split a Pallas kernel, so the sharded engine
runs the WHOLE step inside `jax.shard_map`: every rank executes the same
program on its (head-sharded) weight/cache shards and (batch-sharded) batch
slice, with `lax.psum` after the row-parallel projections and an all-gather
of vocab-sharded logits before sampling (see
`microvllm_tpu/models/transformer.py` tp_axis plumbing). This replaces the
reference's per-rank weight chunking + NCCL all_reduce + rank-0 sampling +
pickled broadcast control plane (`core/parallel_config.py`,
`core/inference_context.py`) with a single SPMD program.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..models import transformer as model_lib
from ..ops.sampling import sample_tokens
from .mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS
from .sharding import cache_spec, param_specs, scale_spec


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


class ShardedStepFns:
    """Builds jitted shard_map step functions matching the engine's calling
    convention (`InferenceEngine._decode_fn` / `_prefill_fn`)."""

    def __init__(self, mesh: Mesh, config: EngineConfig, params: Any):
        self.mesh = mesh
        self.config = config
        self.mcfg = config.model
        self.tp = config.parallel.tp_size
        # dp>1: KV writes must be replicated across data replicas (the
        # cache is replicated but each replica only computes its local
        # rows — see transformer._dp_store_remote_decode)
        self.dp_axis = DATA_AXIS if config.parallel.dp_size > 1 else None
        # sp>1: the KV caches' page axis is sharded over 'seq'; the model
        # steps scatter-store owned pages and psum-combine flash partials
        # (transformer.py sp_axis plumbing)
        self.sp = config.parallel.sp_size
        self.sp_axis = SEQ_AXIS if self.sp > 1 else None
        self.has_lora = config.lora is not None
        self._lora_scaling = (float(config.lora.scaling)
                              if self.has_lora else 1.0)
        self._lp_k = config.logprobs_k   # static: engine-wide logprob mode
        from ..config import moe_uses_ep
        self._pspecs = param_specs(params,
                                   moe_ep=moe_uses_ep(self.mcfg, self.tp))
        self._cspec = cache_spec(self.mcfg, self.tp, self.sp)
        self._sspec = scale_spec(self.mcfg, self.tp, self.sp)
        self._decode_cache: dict[int, Any] = {}
        self._prefill_cache: dict[bool, Any] = {}
        self._decode_q_cache: dict[int, Any] = {}
        self._prefill_q_cache: dict[bool, Any] = {}
        self._spec_cache: dict[tuple, Any] = {}

    # -- input conversion --------------------------------------------------

    def _put(self, x, spec: P):
        """Host value -> global array on the mesh (multi-process safe)."""
        import numpy as np

        from .distributed import put_global
        return put_global(np.asarray(x), self.mesh, spec)

    # -- decode ------------------------------------------------------------

    def _lora_args(self, adapter_ids):
        """Trailing (adapter_ids,) device args when LoRA is on (always
        present in the compiled signature so the shape set stays fixed)."""
        if not self.has_lora:
            return ()
        assert adapter_ids is not None
        return (self._put(adapter_ids, P(DATA_AXIS)),)

    @staticmethod
    def _gather_lp(lp):
        """Replicate per-rank logprob shards so every host reads them."""
        return tuple(jax.lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)
                     for x in lp)

    @property
    def _lp_out_specs(self):
        return (P(), P(), P()) if self._lp_k else ()

    def decode_fn(self, params, k, v, tokens, tables, ctx, temp, top_p,
                  top_ks, rng, span: int, adapter_ids=None,
                  lora_scaling=None, logprobs_k=None):
        b = P(DATA_AXIS)
        if adapter_ids is None and self.has_lora:
            import numpy as np
            adapter_ids = np.zeros(len(tokens), np.int32)
        return self._decode_for(span)(
            params, k, v, self._put(tokens, b),
            self._put(tables, P(DATA_AXIS, None)), self._put(ctx, b),
            self._put(temp, b), self._put(top_p, b), self._put(top_ks, b),
            rng, *self._lora_args(adapter_ids))

    def _decode_for(self, span: int):
        if span in self._decode_cache:
            return self._decode_cache[span]
        cfg, tp = self.mcfg, self.tp
        dp_axis = self.dp_axis
        sp_axis, sp = self.sp_axis, self.sp
        scaling, has_lora = self._lora_scaling, self.has_lora
        lp_k = self._lp_k

        def local_step(params, k, v, tokens, tables, ctx, temp, top_p,
                       top_ks, rng, *lora):
            toks, lp, k, v = model_lib.decode_span(
                cfg, params, k, v, tokens, tables, ctx, temp, top_p, rng,
                span, tp_axis=MODEL_AXIS if tp > 1 else None, tp_size=tp,
                top_ks=top_ks,
                adapter_ids=lora[0] if has_lora else None,
                lora_scaling=scaling, logprobs_k=lp_k, dp_axis=dp_axis,
                sp_axis=sp_axis, sp_size=sp)
            # replicate sampled tokens so every host reads them locally
            toks = jax.lax.all_gather(toks, DATA_AXIS, axis=0, tiled=True)
            return toks, self._gather_lp(lp), k, v

        b = P(DATA_AXIS)
        lora_spec = (b,) if has_lora else ()
        sm = _shard_map(
            local_step, self.mesh,
            in_specs=(self._pspecs, self._cspec, self._cspec, b,
                      P(DATA_AXIS, None), b, b, b, b, P()) + lora_spec,
            out_specs=(P(), self._lp_out_specs, self._cspec, self._cspec))
        fn = jax.jit(sm, donate_argnums=(1, 2))
        self._decode_cache[span] = fn
        return fn

    # -- decode, int8 KV cache ---------------------------------------------

    def decode_fn_q(self, params, k, v, ks, vs, tokens, tables, ctx, temp,
                    top_p, top_ks, rng, span: int, adapter_ids=None,
                    lora_scaling=None, logprobs_k=None):
        b = P(DATA_AXIS)
        if adapter_ids is None and self.has_lora:
            import numpy as np
            adapter_ids = np.zeros(len(tokens), np.int32)
        return self._decode_q_for(span)(
            params, k, v, ks, vs, self._put(tokens, b),
            self._put(tables, P(DATA_AXIS, None)), self._put(ctx, b),
            self._put(temp, b), self._put(top_p, b), self._put(top_ks, b),
            rng, *self._lora_args(adapter_ids))

    def _decode_q_for(self, span: int):
        if span in self._decode_q_cache:
            return self._decode_q_cache[span]
        cfg, tp = self.mcfg, self.tp
        dp_axis = self.dp_axis
        sp_axis, sp = self.sp_axis, self.sp
        scaling, has_lora = self._lora_scaling, self.has_lora
        lp_k = self._lp_k

        def local_step(params, k, v, ks, vs, tokens, tables, ctx, temp,
                       top_p, top_ks, rng, *lora):
            toks, lp, k, v, ks, vs = model_lib.decode_span(
                cfg, params, k, v, tokens, tables, ctx, temp, top_p, rng,
                span, tp_axis=MODEL_AXIS if tp > 1 else None, tp_size=tp,
                k_scales=ks, v_scales=vs, top_ks=top_ks,
                adapter_ids=lora[0] if has_lora else None,
                lora_scaling=scaling, logprobs_k=lp_k, dp_axis=dp_axis,
                sp_axis=sp_axis, sp_size=sp)
            toks = jax.lax.all_gather(toks, DATA_AXIS, axis=0, tiled=True)
            return toks, self._gather_lp(lp), k, v, ks, vs

        b = P(DATA_AXIS)
        lora_spec = (b,) if has_lora else ()
        sm = _shard_map(
            local_step, self.mesh,
            in_specs=(self._pspecs, self._cspec, self._cspec, self._sspec,
                      self._sspec, b, P(DATA_AXIS, None), b, b, b, b, P())
                     + lora_spec,
            out_specs=(P(), self._lp_out_specs, self._cspec, self._cspec,
                       self._sspec, self._sspec))
        fn = jax.jit(sm, donate_argnums=(1, 2, 3, 4))
        self._decode_q_cache[span] = fn
        return fn

    # -- speculative span ----------------------------------------------------

    def spec_fn(self, params, k, v, last, hist, hist_lens, tables, ctx,
                num_steps: int, k_draft: int, ngram: int,
                ks=None, vs=None, adapter_ids=None, sampling=None,
                rng=None):
        b = P(DATA_AXIS)
        b2 = P(DATA_AXIS, None)
        quantized = ks is not None
        sampled = sampling is not None
        if adapter_ids is None and self.has_lora:
            import numpy as np
            adapter_ids = np.zeros(len(last), np.int32)
        fn = self._spec_for(num_steps, k_draft, ngram, hist.shape[1],
                            quantized, sampled)
        samp_args = ()
        if sampled:
            temp, top_p, top_ks = sampling
            samp_args = (self._put(temp, b), self._put(top_p, b),
                         self._put(top_ks, b), rng)
        args = (params, k, v) + ((ks, vs) if quantized else ()) + (
            self._put(last, b), self._put(hist, b2),
            self._put(hist_lens, b), self._put(tables, b2),
            self._put(ctx, b)) + samp_args + self._lora_args(adapter_ids)
        return fn(*args)

    def _spec_for(self, num_steps: int, k_draft: int, ngram: int,
                  lmax: int, quantized: bool, sampled: bool = False):
        key = (num_steps, k_draft, ngram, lmax, quantized, sampled)
        if key in self._spec_cache:
            return self._spec_cache[key]
        cfg, tp = self.mcfg, self.tp
        dp_axis = self.dp_axis
        sp_axis, sp = self.sp_axis, self.sp
        scaling, has_lora = self._lora_scaling, self.has_lora
        lp_k = self._lp_k
        from ..models.speculative import spec_decode_span

        def local_step(params, k, v, *rest):
            adapter_ids = rest[-1] if has_lora else None
            if has_lora:
                rest = rest[:-1]
            temp = top_p = top_ks = rng = None
            if sampled:
                temp, top_p, top_ks, rng = rest[-4:]
                rest = rest[:-4]
            if quantized:
                ks, vs, last, hist, hist_lens, tables, ctx = rest
            else:
                ks = vs = None
                last, hist, hist_lens, tables, ctx = rest
            out = spec_decode_span(
                cfg, params, k, v, last, hist, hist_lens, tables, ctx,
                num_steps, k_draft, ngram, k_scales=ks, v_scales=vs,
                adapter_ids=adapter_ids, lora_scaling=scaling,
                tp_axis=MODEL_AXIS if tp > 1 else None, tp_size=tp,
                logprobs_k=lp_k, sampled=sampled, temperature=temp,
                top_p=top_p, top_ks=top_ks, rng=rng, dp_axis=dp_axis)
            emitted, counts, lp = out[0], out[1], out[2]
            # replicate results so every host reads them locally
            emitted = jax.lax.all_gather(emitted, DATA_AXIS, axis=1,
                                         tiled=True)
            counts = jax.lax.all_gather(counts, DATA_AXIS, axis=1,
                                        tiled=True)
            lp = tuple(jax.lax.all_gather(x, DATA_AXIS, axis=1, tiled=True)
                       for x in lp)
            return (emitted, counts, lp) + tuple(out[3:])

        b = P(DATA_AXIS)
        b2 = P(DATA_AXIS, None)
        scale = (self._sspec, self._sspec) if quantized else ()
        lora_spec = (b,) if has_lora else ()
        samp_spec = (b, b, b, P()) if sampled else ()
        lp_spec = (P(), P(), P()) if lp_k else ()
        sm = _shard_map(
            local_step, self.mesh,
            in_specs=(self._pspecs, self._cspec, self._cspec) + scale
                     + (b, b2, b, b2, b) + samp_spec + lora_spec,
            out_specs=(P(), P(), lp_spec, self._cspec, self._cspec)
                      + scale)
        fn = jax.jit(sm, donate_argnums=(1, 2, 3, 4) if quantized
                     else (1, 2))
        self._spec_cache[key] = fn
        return fn

    # -- prefill -----------------------------------------------------------

    def prefill_fn(self, params, k, v, tokens, tables, chunk_lens, history,
                   temp, top_p, top_ks, rng, has_history: bool,
                   adapter_ids=None, lora_scaling=None, logprobs_k=None):
        b = P(DATA_AXIS)
        b2 = P(DATA_AXIS, None)
        if adapter_ids is None and self.has_lora:
            import numpy as np
            adapter_ids = np.zeros(len(chunk_lens), np.int32)
        return self._prefill_for(bool(has_history))(
            params, k, v, self._put(tokens, b2), self._put(tables, b2),
            self._put(chunk_lens, b), self._put(history, b),
            self._put(temp, b), self._put(top_p, b), self._put(top_ks, b),
            rng, *self._lora_args(adapter_ids))

    def _prefill_for(self, has_history: bool):
        if has_history in self._prefill_cache:
            return self._prefill_cache[has_history]
        cfg, tp = self.mcfg, self.tp
        dp_axis = self.dp_axis
        sp_axis, sp = self.sp_axis, self.sp
        scaling, has_lora = self._lora_scaling, self.has_lora

        lp_k = self._lp_k

        def local_step(params, k, v, tokens, tables, chunk_lens, history,
                       temp, top_p, top_ks, rng, *lora):
            logits, k, v = model_lib.prefill_step(
                cfg, params, k, v, tokens, tables, chunk_lens, history,
                has_history, tp_axis=MODEL_AXIS if tp > 1 else None,
                tp_size=tp, dp_axis=dp_axis, sp_axis=sp_axis, sp_size=sp,
                adapter_ids=lora[0] if has_lora else None,
                lora_scaling=scaling)
            toks = sample_tokens(logits, rng, temp, top_p,
                                 top_k_per_seq=top_ks)
            lp = ()
            if lp_k:
                from ..ops.sampling import token_logprobs
                lp = self._gather_lp(token_logprobs(logits, toks, lp_k))
            toks = jax.lax.all_gather(toks, DATA_AXIS, axis=0, tiled=True)
            return toks, lp, k, v

        b = P(DATA_AXIS)
        lora_spec = (b,) if has_lora else ()
        sm = _shard_map(
            local_step, self.mesh,
            in_specs=(self._pspecs, self._cspec, self._cspec,
                      P(DATA_AXIS, None), P(DATA_AXIS, None), b, b, b, b, b,
                      P()) + lora_spec,
            out_specs=(P(), self._lp_out_specs, self._cspec, self._cspec))
        fn = jax.jit(sm, donate_argnums=(1, 2))
        self._prefill_cache[has_history] = fn
        return fn

    # -- prefill, int8 KV cache --------------------------------------------

    def prefill_fn_q(self, params, k, v, ks, vs, tokens, tables, chunk_lens,
                     history, temp, top_p, top_ks, rng, has_history: bool,
                     adapter_ids=None, lora_scaling=None, logprobs_k=None):
        b = P(DATA_AXIS)
        b2 = P(DATA_AXIS, None)
        if adapter_ids is None and self.has_lora:
            import numpy as np
            adapter_ids = np.zeros(len(chunk_lens), np.int32)
        return self._prefill_q_for(bool(has_history))(
            params, k, v, ks, vs, self._put(tokens, b2),
            self._put(tables, b2), self._put(chunk_lens, b),
            self._put(history, b), self._put(temp, b), self._put(top_p, b),
            self._put(top_ks, b), rng, *self._lora_args(adapter_ids))

    def _prefill_q_for(self, has_history: bool):
        if has_history in self._prefill_q_cache:
            return self._prefill_q_cache[has_history]
        cfg, tp = self.mcfg, self.tp
        dp_axis = self.dp_axis
        sp_axis, sp = self.sp_axis, self.sp
        scaling, has_lora = self._lora_scaling, self.has_lora

        lp_k = self._lp_k

        def local_step(params, k, v, ks, vs, tokens, tables, chunk_lens,
                       history, temp, top_p, top_ks, rng, *lora):
            logits, k, v, ks, vs = model_lib.prefill_step(
                cfg, params, k, v, tokens, tables, chunk_lens, history,
                has_history, tp_axis=MODEL_AXIS if tp > 1 else None,
                tp_size=tp, k_scales=ks, v_scales=vs, dp_axis=dp_axis,
                sp_axis=sp_axis, sp_size=sp,
                adapter_ids=lora[0] if has_lora else None,
                lora_scaling=scaling)
            toks = sample_tokens(logits, rng, temp, top_p,
                                 top_k_per_seq=top_ks)
            lp = ()
            if lp_k:
                from ..ops.sampling import token_logprobs
                lp = self._gather_lp(token_logprobs(logits, toks, lp_k))
            toks = jax.lax.all_gather(toks, DATA_AXIS, axis=0, tiled=True)
            return toks, lp, k, v, ks, vs

        b = P(DATA_AXIS)
        lora_spec = (b,) if has_lora else ()
        sm = _shard_map(
            local_step, self.mesh,
            in_specs=(self._pspecs, self._cspec, self._cspec, self._sspec,
                      self._sspec, P(DATA_AXIS, None), P(DATA_AXIS, None),
                      b, b, b, b, b, P()) + lora_spec,
            out_specs=(P(), self._lp_out_specs, self._cspec, self._cspec,
                       self._sspec, self._sspec))
        fn = jax.jit(sm, donate_argnums=(1, 2, 3, 4))
        self._prefill_q_cache[has_history] = fn
        return fn
