"""Paged attention ops — jnp reference implementations + dispatch.

These are the TPU-native equivalents of the reference's external
`flash_attn_with_kvcache` CUDA kernel (call sites
`core/layer/model_graph.py:161`, `core/layer/model_prefill.py:49`) and its
Triton `store_kvcache_kernel` (`core/cache_manager.py:74-140`).

KV cache device layout (per layer): ``[num_pages, kv_heads, page_size,
head_dim]`` — trailing two dims (page_size, head_dim) are TPU-tile aligned
regardless of how few KV heads the model has (GQA models often have 2-8).

The jnp forms here are correct on any backend and serve as the numerics
oracle for the Pallas kernels in `microvllm_tpu/ops/pallas/`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

NEG_INF = -2.0e38  # finite, avoids NaNs from all-masked softmax rows

# TPU lane width: the KV cache's head_dim axis is padded to a multiple of
# this so Pallas DMA slices are tile-aligned (models like Qwen2.5-0.5B /
# Llama-3.2-1B have head_dim 64). Zero padding is inert in q·k and p·v.
KV_LANE = 128


def padded_head_dim(head_dim: int) -> int:
    return -(-head_dim // KV_LANE) * KV_LANE


def softcap_scores(scores: jnp.ndarray, cap: float | None) -> jnp.ndarray:
    """Attention-logit soft-capping (gemma2): ``cap * tanh(s / cap)``.

    Applied after the scale, before masking/softmax. ``None`` = identity.
    """
    if cap is None:
        return scores
    return cap * jnp.tanh(scores / cap)


def pad_head(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """Zero-pad the last axis to ``target`` (no-op if already there)."""
    d = x.shape[-1]
    if d == target:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - d)]
    return jnp.pad(x, pad)


@functools.cache
def use_pallas() -> bool:
    """Kernel dispatch: Pallas on TPU, jnp reference elsewhere.

    Override with MVT_ATTENTION=ref|pallas (useful for A/B benchmarking and
    for interpret-mode debugging).
    """
    forced = os.environ.get("MVT_ATTENTION")
    if forced == "ref":
        return False
    if forced == "pallas":
        return True
    return jax.default_backend() not in ("cpu",)


def paged_decode_attention_auto(q, k_pages, v_pages, block_tables,
                                context_lens, scale):
    """Dispatching wrapper used by the model's decode path."""
    if use_pallas():
        from .pallas.decode_attention import paged_decode_attention
        return paged_decode_attention(q, k_pages, v_pages, block_tables,
                                      context_lens, scale=scale)
    return paged_decode_attention_ref(q, k_pages, v_pages, block_tables,
                                      context_lens, scale)


def paged_decode_append_auto(q, k_new, v_new, k_cache, v_cache,
                             block_tables, context_lens, layer, scale,
                             k_scales=None, v_scales=None, window=None,
                             softcap=None):
    """Fused KV-append + decode attention on the layer-stacked cache.

    On TPU this is one Pallas kernel with the cache aliased in/out (no
    copy); the jnp path scatters then attends (XLA copies the cache — only
    acceptable on CPU tests).

    q/k_new/v_new have the cache's padded head_dim. context_lens is the
    number of tokens in cache BEFORE this token. k_scales/v_scales are the
    per-token scale pages ``[L, P, KV, 128]`` when the cache is int8 (see
    `quantize_kv`), else None. ``window`` enables sliding-window attention
    (mistral); it is statically dropped when the cache cannot hold more
    than ``window`` tokens (the mask never bites), and otherwise handled
    IN the Pallas kernels — chunks wholly below the window are never even
    DMA'd, so windowed decode reads O(window) KV bytes. Returns
    (attn_out, k_cache, v_cache, k_scales, v_scales).
    """
    quantized = k_scales is not None
    page_size = k_cache.shape[3]
    if window is not None and block_tables.shape[1] * page_size <= window:
        window = None    # static: the window never bites at this capacity
    if use_pallas():
        if quantized:
            from .pallas.decode_attention import (
                paged_decode_attention_append_q)
            return paged_decode_attention_append_q(
                q, k_new, v_new, k_cache, v_cache, k_scales, v_scales,
                block_tables, context_lens, layer, scale=scale,
                window=window, softcap=softcap)
        from .pallas.decode_attention import paged_decode_attention_append
        attn, k_cache, v_cache = paged_decode_attention_append(
            q, k_new, v_new, k_cache, v_cache, block_tables, context_lens,
            layer, scale=scale, window=window, softcap=softcap)
        return attn, k_cache, v_cache, None, None

    page_ids, offsets = slot_coords(block_tables, context_lens, page_size)
    if quantized:
        k_q, k_s = quantize_kv(k_new)              # [B, KV, D], [B, KV]
        v_q, v_s = quantize_kv(v_new)
        k_cache = k_cache.at[layer, page_ids, :, offsets].set(k_q)
        v_cache = v_cache.at[layer, page_ids, :, offsets].set(v_q)
        k_scales = k_scales.at[layer, page_ids, :, offsets].set(k_s)
        v_scales = v_scales.at[layer, page_ids, :, offsets].set(v_s)
        attn = paged_decode_attention_ref(
            q, k_cache[layer], v_cache[layer], block_tables,
            context_lens + 1, scale, k_scales[layer], v_scales[layer],
            window=window, softcap=softcap)
        return attn, k_cache, v_cache, k_scales, v_scales
    k_cache = k_cache.at[layer, page_ids, :, offsets].set(
        k_new.astype(k_cache.dtype))
    v_cache = v_cache.at[layer, page_ids, :, offsets].set(
        v_new.astype(v_cache.dtype))
    attn = paged_decode_attention_ref(
        q, k_cache[layer], v_cache[layer], block_tables, context_lens + 1,
        scale, window=window, softcap=softcap)
    return attn, k_cache, v_cache, None, None


# ---------------------------------------------------------------------------
# KV append (the store_kvcache equivalent)
# ---------------------------------------------------------------------------


def append_kv(k_pages: jnp.ndarray, v_pages: jnp.ndarray,
              k_new: jnp.ndarray, v_new: jnp.ndarray,
              page_ids: jnp.ndarray, offsets: jnp.ndarray
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter new KV rows into the paged cache.

    k_pages/v_pages: ``[num_pages, kv_heads, page_size, head_dim]``
    k_new/v_new:     ``[T, kv_heads, head_dim]`` (T flattened tokens)
    page_ids/offsets: ``[T]`` int32 — destination (page, slot) per token.
    Padding tokens must point at the reserved trash page (page 0).
    """
    k_pages = k_pages.at[page_ids, :, offsets].set(k_new.astype(k_pages.dtype))
    v_pages = v_pages.at[page_ids, :, offsets].set(v_new.astype(v_pages.dtype))
    return k_pages, v_pages


def slot_coords(block_tables: jnp.ndarray, token_positions: jnp.ndarray,
                page_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map per-sequence token positions to (page_id, offset).

    block_tables: ``[B, max_pages_per_seq]`` int32
    token_positions: ``[B]`` or ``[B, S]`` int32 (absolute position in seq)
    Returns (page_ids, offsets) with token_positions' shape.
    """
    page_idx = token_positions // page_size
    offsets = token_positions % page_size
    if token_positions.ndim == 1:
        page_ids = jnp.take_along_axis(block_tables, page_idx[:, None], axis=1)[:, 0]
    else:
        page_ids = jnp.take_along_axis(block_tables, page_idx, axis=1)
    return page_ids, offsets


# ---------------------------------------------------------------------------
# INT8 KV-cache quantization helpers
# ---------------------------------------------------------------------------
# Scale layout: ``[L, num_pages, kv_heads, 128]`` f32 — lane s holds the
# per-token symmetric scale of slot s (page_size <= 128). Sublane dim is the
# kv head, so the array shards over TP exactly like the cache itself.


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) symmetric int8 quantization over head_dim.

    x: ``[..., head_dim]`` -> (q int8 same shape, scale f32 ``[...]``).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -128, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)


def gather_kv_pages(pages: jnp.ndarray, scales: jnp.ndarray | None,
                    block_tables: jnp.ndarray) -> jnp.ndarray:
    """Gather + (if int8) dequantize a batch's KV from pages.

    pages: ``[P, KV, ps, D]``; scales: ``[P, KV, 128]`` or None.
    Returns ``[B, KV, max_pages * ps, D]`` f32/bf16.
    """
    B = block_tables.shape[0]
    max_pages = block_tables.shape[1]
    _, kv_heads, page_size, head_dim = pages.shape
    g = pages[block_tables]                            # [B, P, KV, ps, D]
    if scales is not None:
        s = scales[block_tables][..., :page_size]      # [B, P, KV, ps]
        g = g.astype(jnp.float32) * s[..., None]
    return g.transpose(0, 2, 1, 3, 4).reshape(
        B, kv_heads, max_pages * page_size, head_dim)


# ---------------------------------------------------------------------------
# Decode: paged attention over block tables (jnp reference)
# ---------------------------------------------------------------------------


def paged_decode_attention_ref(q: jnp.ndarray, k_pages: jnp.ndarray,
                               v_pages: jnp.ndarray,
                               block_tables: jnp.ndarray,
                               seq_lens: jnp.ndarray,
                               scale: float,
                               k_scales: jnp.ndarray | None = None,
                               v_scales: jnp.ndarray | None = None,
                               window: int | None = None,
                               softcap: float | None = None,
                               ) -> jnp.ndarray:
    """Single-token decode attention reading the paged KV cache.

    q:            ``[B, num_heads, head_dim]``
    k/v_pages:    ``[num_pages, kv_heads, page_size, head_dim]``
    block_tables: ``[B, max_pages_per_seq]``
    seq_lens:     ``[B]`` — number of valid tokens (AFTER the current token's
                  KV was appended).
    k/v_scales:   ``[num_pages, kv_heads, 128]`` f32 when the cache is int8.
    window:       sliding-window attention — only the last ``window``
                  positions are visible (mistral semantics).
    Returns ``[B, num_heads, head_dim]`` in q.dtype.
    """
    B, num_heads, head_dim = q.shape
    _, kv_heads, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    group = num_heads // kv_heads

    k = gather_kv_pages(k_pages, k_scales, block_tables)
    v = gather_kv_pages(v_pages, v_scales, block_tables)

    qg = q.reshape(B, kv_heads, group, head_dim).astype(jnp.float32)
    scores = softcap_scores(
        jnp.einsum("bkgd,bksd->bkgs", qg, k.astype(jnp.float32)) * scale,
        softcap)

    positions = jnp.arange(max_pages * page_size, dtype=jnp.int32)
    valid = positions[None, :] < seq_lens[:, None]          # [B, S_max]
    if window is not None:
        valid &= positions[None, :] >= seq_lens[:, None] - window
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bksd->bkgd", probs, v.astype(jnp.float32))
    return out.reshape(B, num_heads, head_dim).astype(q.dtype)


# ---------------------------------------------------------------------------
# Sequence-parallel KV (page sharding over a mesh axis)
# ---------------------------------------------------------------------------
# The paged cache shards its PAGE axis over the ``seq`` mesh axis
# (interleaved ownership: global page g lives on rank g % sp at local slot
# g // sp; global pages 0..sp-1 are reserved trash so every rank's local
# slot 0 absorbs redirected writes). Every sp rank computes identical
# new-token K/V (weights are replicated over ``seq``), writes only its
# owned pages, attends only its local shard (flash partials), and the
# ranks combine with one tiny psum — the flash-decode split the chunked
# kernel already performs locally, lifted across the mesh. KV capacity
# then scales sp-fold: n chips hold n x the single-chip ~35k-token bound
# (SURVEY.md §5 long-context mandate; no reference counterpart — vLLM's
# CUDA paged cache is single-GPU per TP shard).


def sp_local_tables(block_tables: jnp.ndarray, lens: jnp.ndarray,
                    page_size: int, sp: int, rank: jnp.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Global block tables -> this rank's compacted LOCAL tables + lens.

    block_tables: ``[B, P]`` GLOBAL page ids; lens: ``[B]`` tokens to
    attend (including any just-appended token). Returns
    ``(local_tables [B, P] local page ids — owned pages first, original
    order, trash-padded; local_lens [B] tokens held by this rank)``.

    Order preservation keeps the one partial page (the global last) as
    the final owned entry, so the kernel's slot-order position mask
    (pos < local_len) is exact. Softmax is permutation-invariant, so
    compaction never changes the combined result.
    """
    B, P = block_tables.shape
    pidx = jnp.arange(P, dtype=jnp.int32)[None, :]
    n_used = -(-lens // page_size)                       # ceil
    in_use = pidx < n_used[:, None]
    owned = in_use & ((block_tables % sp) == rank)
    tok = jnp.clip(lens[:, None] - pidx * page_size, 0, page_size)
    local_lens = jnp.sum(jnp.where(owned, tok, 0), axis=1).astype(lens.dtype)
    # stable compaction: owned first, original order preserved
    order = jnp.argsort(jnp.where(owned, 0, 1), axis=1, stable=True)
    owned_sorted = jnp.take_along_axis(owned, order, axis=1)
    local_ids = jnp.take_along_axis(block_tables // sp, order, axis=1)
    local_tables = jnp.where(owned_sorted, local_ids, 0)
    return local_tables.astype(block_tables.dtype), local_lens


def sp_owner_coords(page_ids: jnp.ndarray, sp: int, rank: jnp.ndarray
                    ) -> jnp.ndarray:
    """Global destination page ids -> local ids, with pages owned by other
    ranks redirected to the local trash slot 0."""
    mine = (page_ids % sp) == rank
    return jnp.where(mine, page_ids // sp, 0).astype(page_ids.dtype)


def sp_combine_partials(acc: jnp.ndarray, m: jnp.ndarray, l: jnp.ndarray,
                        axis: str):
    """Combine per-rank flash partials over mesh axis ``axis``.

    acc: ``[..., D]`` unnormalized; m/l: ``[..., 1]``. Exact: a rank with
    no local tokens contributes (0, MASK_VALUE~-inf, 0). Rows with no
    tokens on ANY rank (padding) return 0 (guarded divide), matching the
    single-device kernels' zero output for context_len == 0.
    """
    m_max = jax.lax.pmax(m, axis)
    alpha = jnp.exp(m - m_max)
    l_tot = jax.lax.psum(l * alpha, axis)
    o = jax.lax.psum(acc * alpha, axis)
    return o / jnp.maximum(l_tot, 1e-30)


def paged_decode_partials_ref(q: jnp.ndarray, k_pages: jnp.ndarray,
                              v_pages: jnp.ndarray,
                              block_tables: jnp.ndarray,
                              seq_lens: jnp.ndarray,
                              scale: float,
                              k_scales: jnp.ndarray | None = None,
                              v_scales: jnp.ndarray | None = None,
                              softcap: float | None = None):
    """jnp oracle for the Pallas ``partials=True`` decode kernel: returns
    ``(acc [B,H,D] f32 unnormalized, m [B,H,1], l [B,H,1])``."""
    B, num_heads, head_dim = q.shape
    _, kv_heads, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    group = num_heads // kv_heads

    k = gather_kv_pages(k_pages, k_scales, block_tables)
    v = gather_kv_pages(v_pages, v_scales, block_tables)
    qg = q.reshape(B, kv_heads, group, head_dim).astype(jnp.float32)
    scores = softcap_scores(
        jnp.einsum("bkgd,bksd->bkgs", qg, k.astype(jnp.float32)) * scale,
        softcap)
    positions = jnp.arange(max_pages * page_size, dtype=jnp.int32)
    valid = positions[None, :] < seq_lens[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)            # [B,kv,G,1]
    p = jnp.where(valid[:, None, None, :], jnp.exp(scores - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bkgs,bksd->bkgd", p, v.astype(jnp.float32))
    return (acc.reshape(B, num_heads, head_dim),
            m.reshape(B, num_heads, 1), l.reshape(B, num_heads, 1))


def sp_decode_attention(q, k_pages, v_pages, local_tables, local_lens,
                        scale, k_scales=None, v_scales=None,
                        softcap=None, *, sp_axis: str):
    """Decode attention over this rank's page shard + cross-rank combine.

    The caller localizes tables/lens with `sp_local_tables` (lens must
    INCLUDE the just-appended token) and stores the new K/V first via
    `sp_owner_coords`-redirected scatters. Sliding window is unsupported
    here (window masking needs global slot order); the engine gates sp
    off for windowed models.
    """
    if use_pallas() and k_scales is None:
        from .pallas.decode_attention import paged_decode_attention
        acc, m, l = paged_decode_attention(
            q, k_pages, v_pages, local_tables, local_lens, scale=scale,
            softcap=softcap, partials=True)
    else:
        # int8-KV under sp rides the jnp partials for now (a quantized
        # partials Pallas twin mirrors the append_q chunk-dequant; the
        # virtual-device CPU meshes this mode runs on use jnp anyway)
        acc, m, l = paged_decode_partials_ref(
            q, k_pages, v_pages, local_tables, local_lens, scale,
            k_scales, v_scales, softcap)
    return sp_combine_partials(acc, m, l, sp_axis).astype(q.dtype)


def chunked_prefill_attention_sp(q, k, v, k_pages, v_pages, local_tables,
                                 local_hist_lens, scale,
                                 k_scales=None, v_scales=None,
                                 softcap=None, *, sp_axis: str):
    """Chunked-prefill attention under KV page sharding.

    Each rank computes flash partials over its LOCAL history shard; the
    current chunk's causal self-attention is included by rank 0 only
    (every rank holds identical chunk K/V — including it once keeps the
    combined softmax exact). jnp path (the sp prefill Pallas twin is a
    documented follow-up — on virtual-device CPU meshes this is the
    executing path anyway).
    """
    B, S, num_heads, head_dim = q.shape
    _, kv_heads, page_size, _ = k_pages.shape
    max_pages = local_tables.shape[1]
    group = num_heads // kv_heads

    hk = gather_kv_pages(k_pages, k_scales, local_tables)
    hv = gather_kv_pages(v_pages, v_scales, local_tables)
    qg = q.reshape(B, S, kv_heads, group, head_dim).astype(jnp.float32)

    h_scores = softcap_scores(jnp.einsum(
        "bqkgd,bksd->bkgqs", qg, hk.astype(jnp.float32)) * scale, softcap)
    hpos = jnp.arange(max_pages * page_size, dtype=jnp.int32)
    h_valid = (hpos[None, :] < local_hist_lens[:, None])[:, None, :]
    h_valid = jnp.broadcast_to(h_valid, (B, S, hpos.shape[0]))
    h_scores = jnp.where(h_valid[:, None, None, :, :], h_scores, NEG_INF)

    c_scores = softcap_scores(jnp.einsum(
        "bqkgd,bskd->bkgqs", qg, k.astype(jnp.float32)) * scale, softcap)
    causal = jnp.tril(jnp.ones((S, S), dtype=bool))[None]
    is_rank0 = jax.lax.axis_index(sp_axis) == 0
    c_valid = jnp.broadcast_to(causal & is_rank0, (B, S, S))
    c_scores = jnp.where(c_valid[:, None, None, :, :], c_scores, NEG_INF)

    scores = jnp.concatenate([h_scores, c_scores], axis=-1)
    valid = jnp.concatenate([h_valid, c_valid], axis=-1)
    m = jnp.max(scores, axis=-1, keepdims=True)        # [B,kv,G,S,1]
    p = jnp.where(valid[:, None, None, :, :], jnp.exp(scores - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    hs = max_pages * page_size
    acc = (jnp.einsum("bkgqs,bksd->bkgqd", p[..., :hs],
                      hv.astype(jnp.float32))
           + jnp.einsum("bkgqs,bskd->bkgqd", p[..., hs:],
                        v.astype(jnp.float32)))
    out = sp_combine_partials(acc, m, l, sp_axis)      # [B,kv,G,S,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(
        B, S, num_heads, head_dim).astype(q.dtype)


# ---------------------------------------------------------------------------
# Prefill: rectangular causal attention (jnp reference)
# ---------------------------------------------------------------------------


def prefill_attention_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: float,
                          window: int | None = None,
                          softcap: float | None = None) -> jnp.ndarray:
    """Causal self-attention over a rectangular ``[B, S]`` batch with GQA.

    q: ``[B, S, num_heads, head_dim]``; k/v: ``[B, S, kv_heads, head_dim]``.
    Padding beyond each row's true prompt length needs no key mask here:
    logits are only read at positions < prompt_len, and causal masking keeps
    later (padded) keys out of those positions. ``window``: sliding-window
    attention (position q sees keys in ``(q - window, q]``).
    """
    B, S, num_heads, head_dim = q.shape
    kv_heads = k.shape[2]
    group = num_heads // kv_heads

    qg = q.reshape(B, S, kv_heads, group, head_dim).astype(jnp.float32)
    scores = softcap_scores(
        jnp.einsum("bqkgd,bskd->bkgqs", qg, k.astype(jnp.float32)) * scale,
        softcap)

    causal = jnp.tril(jnp.ones((S, S), dtype=bool))
    if window is not None:
        idx = jnp.arange(S)
        causal &= idx[:, None] - idx[None, :] < window
    scores = jnp.where(causal[None, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v.astype(jnp.float32))
    return out.reshape(B, S, num_heads, head_dim).astype(q.dtype)


# ---------------------------------------------------------------------------
# Chunked prefill: causal attention against cache history + current chunk
# ---------------------------------------------------------------------------


def chunked_prefill_attention_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                                  k_pages: jnp.ndarray, v_pages: jnp.ndarray,
                                  block_tables: jnp.ndarray,
                                  history_lens: jnp.ndarray,
                                  scale: float,
                                  k_scales: jnp.ndarray | None = None,
                                  v_scales: jnp.ndarray | None = None,
                                  window: int | None = None,
                                  softcap: float | None = None,
                                  ) -> jnp.ndarray:
    """Attention for a prefill chunk: queries attend to all cached history
    tokens plus causally to the current chunk.

    q/k/v: ``[B, S, heads, d]`` (current chunk, post-RoPE).
    history_lens: ``[B]`` — tokens already in cache before this chunk.
    window: sliding-window attention over ABSOLUTE positions (query at
    absolute position p sees keys in ``(p - window, p]``).
    """
    B, S, num_heads, head_dim = q.shape
    _, kv_heads, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    group = num_heads // kv_heads

    # History from pages (dequantized when the cache is int8).
    hk = gather_kv_pages(k_pages, k_scales, block_tables)
    hv = gather_kv_pages(v_pages, v_scales, block_tables)

    qg = q.reshape(B, S, kv_heads, group, head_dim).astype(jnp.float32)
    q_abs = history_lens[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]

    # Scores vs history.
    h_scores = softcap_scores(jnp.einsum(
        "bqkgd,bksd->bkgqs", qg, hk.astype(jnp.float32)) * scale, softcap)
    hpos = jnp.arange(max_pages * page_size, dtype=jnp.int32)
    h_valid = (hpos[None, None, :] < history_lens[:, None, None]
               ) & jnp.ones((1, S, 1), bool)                  # [B, S, H]
    if window is not None:
        h_valid &= hpos[None, None, :] > q_abs[:, :, None] - window
    h_scores = jnp.where(h_valid[:, None, None, :, :], h_scores, NEG_INF)

    # Scores vs current chunk (causal).
    c_scores = softcap_scores(jnp.einsum(
        "bqkgd,bskd->bkgqs", qg, k.astype(jnp.float32)) * scale, softcap)
    causal = jnp.tril(jnp.ones((S, S), dtype=bool))[None]    # [1, S, S]
    if window is not None:
        idx = jnp.arange(S)
        causal = causal & (idx[None, :, None] - idx[None, None, :] < window)
    c_scores = jnp.where(causal[:, None, None, :, :], c_scores, NEG_INF)

    scores = jnp.concatenate([h_scores, c_scores], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    h_probs = probs[..., : max_pages * page_size]
    c_probs = probs[..., max_pages * page_size:]
    out = (jnp.einsum("bkgqs,bksd->bqkgd", h_probs, hv.astype(jnp.float32)) +
           jnp.einsum("bkgqs,bskd->bqkgd", c_probs, v.astype(jnp.float32)))
    return out.reshape(B, S, num_heads, head_dim).astype(q.dtype)
