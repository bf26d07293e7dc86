"""Pallas TPU flash-attention prefill kernel with paged-history support.

Covers the reference's prefill use of `flash_attn_with_kvcache`
(`core/layer/model_prefill.py:49-52`) plus chunked prefill (which the
reference lacks): queries of the current ``[B, S]`` chunk attend to

  1. the sequence's cached history (block-table pages streamed HBM->VMEM,
     like the decode kernel), then
  2. the current chunk's keys/values causally (flash-style online softmax
     over key blocks — no [S, S] score materialization).

Grid: (batch, kv_head, q_block). Layouts chosen so DMA slices are
tile-aligned: q/k/v arrive as ``[B, KV, S, D]`` (heads leading), the KV
cache as ``[L, P, KV, page_size, D]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -2.0e38


def _softcap(s, cap):
    """Attention-logit soft-capping (gemma2): cap*tanh(s/cap); None=id."""
    if cap is None:
        return s
    return cap * jnp.tanh(s * (1.0 / cap))


def _prefill_kernel(
    # scalar prefetch
    layer_ref,            # [1]
    block_tables_ref,     # [B * max_pages]
    history_ref,          # [B]
    chunk_lens_ref,       # [B]
    # inputs
    q_ref,                # [1, 1, G, BQ, D]
    k_ref,                # [1, 1, S, D] current chunk keys (this kv head)
    v_ref,
    k_hbm,                # [L, P, KV, ps, D] (ANY) or None-like when no hist
    v_hbm,
    # outputs
    o_ref,                # [1, 1, G, BQ, D]
    # scratch
    k_buf,                # [2, ppc, ps, D] history staging
    v_buf,
    k_sems, v_sems,
    *,
    page_size: int,
    max_pages: int,
    pages_per_chunk: int,
    block_q: int,
    block_k: int,
    scale: float,
    softcap: float | None = None,
    with_history: bool,
    window: int | None = None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)
    hist = history_ref[b]
    chunk_len = chunk_lens_ref[b]

    G, BQ, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    q = q_ref[0, 0].reshape(G * BQ, D).astype(jnp.float32) * scale

    # local q positions within the chunk, replicated per head-group row
    # (row r of the [G*BQ] layout is query i = r % BQ of group r // BQ;
    # built directly in sublane orientation — a (G, BQ) iota reshaped to
    # (G*BQ, 1) is a lanes->sublanes cast Mosaic can't lower)
    row = jax.lax.broadcasted_iota(jnp.int32, (G * BQ, 1), 0)
    q_pos = jax.lax.rem(row, BQ) + qb * block_q

    m = jnp.full((G * BQ, 1), MASK_VALUE, jnp.float32)
    l = jnp.zeros((G * BQ, 1), jnp.float32)
    acc = jnp.zeros((G * BQ, D), jnp.float32)

    # ---- phase 1: attend to cached history pages -------------------------
    if with_history:
        chunk_tokens = page_size * pages_per_chunk
        num_hchunks = pl.cdiv(hist, chunk_tokens)
        # sliding window: history chunks wholly below the q-block's window
        # are never DMA'd (absolute q positions are hist + local)
        if window is None:
            start_hchunk = 0
        else:
            start_hchunk = (jnp.maximum(hist + qb * block_q + 1 - window, 0)
                            // chunk_tokens)

        def hist_copies(slot, c):
            copies = []
            for i in range(pages_per_chunk):
                pg = block_tables_ref[b * max_pages + c * pages_per_chunk + i]
                copies.append(pltpu.make_async_copy(
                    k_hbm.at[layer_ref[0], pg, h], k_buf.at[slot, i],
                    k_sems.at[slot]))
                copies.append(pltpu.make_async_copy(
                    v_hbm.at[layer_ref[0], pg, h], v_buf.at[slot, i],
                    v_sems.at[slot]))
            return copies

        @pl.when(num_hchunks > start_hchunk)
        def _():
            for cp in hist_copies(jax.lax.rem(start_hchunk, 2),
                                  start_hchunk):
                cp.start()

        def hist_body(c, carry):
            m, l, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_hchunks)
            def _():
                for cp in hist_copies(jax.lax.rem(c + 1, 2), c + 1):
                    cp.start()

            for cp in hist_copies(slot, c):
                cp.wait()

            kh = k_buf[slot].reshape(chunk_tokens, D)
            vh = v_buf[slot].reshape(chunk_tokens, D)
            s = _softcap(jax.lax.dot_general(
                q, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32), softcap)
            kpos = c * chunk_tokens + jax.lax.broadcasted_iota(
                jnp.int32, (G * BQ, chunk_tokens), 1)
            valid = kpos < hist
            if window is not None:
                valid &= kpos > hist + q_pos - window
            s = jnp.where(valid, s, MASK_VALUE)
            m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m2)
            alpha = jnp.exp(m - m2)
            l2 = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return m2, l2, acc * alpha + pv

        m, l, acc = jax.lax.fori_loop(start_hchunk, num_hchunks, hist_body,
                                      (m, l, acc))

    # ---- phase 2: causal attention over the current chunk ----------------
    m, l, acc = _attend_current_chunk(
        q, q_pos, k_ref, v_ref, chunk_len, qb, m, l, acc,
        block_q=block_q, block_k=block_k, window=window,
        softcap=softcap)

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(G, BQ, D).astype(o_ref.dtype)


def _attend_current_chunk(q, q_pos, k_ref, v_ref, chunk_len, qb, m, l, acc,
                          *, block_q: int, block_k: int,
                          window: int | None = None,
                          softcap: float | None = None):
    """Causal flash pass over the current chunk's (bf16) keys/values.
    Window distances are local-position differences (query and key share
    the same history offset)."""
    R, D = q.shape
    num_kblocks = pl.cdiv(
        jnp.minimum((qb + 1) * block_q, chunk_len), block_k)
    if window is None:
        start_kblock = 0
    else:
        # earliest key any query of this q-block can see
        start_kblock = jnp.maximum(qb * block_q + 1 - window, 0) // block_k

    S_chunk = k_ref.shape[2]

    def cur_body(j, carry):
        m, l, acc = carry
        if S_chunk == block_k:
            # single k-block: STATIC sublane indexing — dynamic sub-8-row
            # vector loads at j*block_k offsets are unprovably aligned for
            # Mosaic (spec-verify windows have S = k+1, e.g. 5 rows)
            kh = k_ref[0, 0].astype(jnp.float32)
            vh = v_ref[0, 0]
        else:
            kh = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(
                jnp.float32)
            vh = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = _softcap(jax.lax.dot_general(
            q, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), softcap)
        kpos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (R, block_k), 1)
        valid = (kpos <= q_pos) & (kpos < chunk_len)
        if window is not None:
            valid &= kpos > q_pos - window
        s = jnp.where(valid, s, MASK_VALUE)
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m2)
        alpha = jnp.exp(m - m2)
        l2 = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return m2, l2, acc * alpha + pv

    if S_chunk == block_k:
        # one block total: run it statically (fori bounds would be dynamic)
        def run_one(carry):
            return cur_body(0, carry)
        return jax.lax.cond(num_kblocks > start_kblock, run_one,
                            lambda c: c, (m, l, acc))
    return jax.lax.fori_loop(start_kblock, num_kblocks, cur_body,
                             (m, l, acc))


def _prefill_kernel_q(
    # scalar prefetch
    layer_ref, block_tables_ref, history_ref, chunk_lens_ref,
    # inputs
    q_ref,                # [1, 1, G, BQ, D]
    k_ref,                # [1, 1, S, D] current chunk keys (bf16, this head)
    v_ref,
    k_hbm, v_hbm,         # [L, P, KV, ps, D] int8 (ANY)
    ks_hbm, vs_hbm,       # [L, P, KV, 128] f32 (ANY)
    # outputs
    o_ref,
    # scratch
    k_buf, v_buf,         # [2, ppc, ps, D] int8
    ks_buf, vs_buf,       # [2, ppc, 128] f32
    k_sems, v_sems, ks_sems, vs_sems,
    *,
    page_size: int,
    max_pages: int,
    pages_per_chunk: int,
    block_q: int,
    block_k: int,
    scale: float,
    softcap: float | None = None,
    window: int | None = None,
):
    """INT8-KV history variant: streams quantized pages + per-token scale
    lanes; K dequant rides the score rows (lane-wise multiply), V dequant
    rides the probabilities — int8 tiles feed the MXU after one convert
    (same trick as `decode_attention._decode_append_kernel_q`)."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)
    hist = history_ref[b]
    chunk_len = chunk_lens_ref[b]

    G, BQ, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    q = q_ref[0, 0].reshape(G * BQ, D).astype(jnp.float32) * scale

    row = jax.lax.broadcasted_iota(jnp.int32, (G * BQ, 1), 0)
    q_pos = jax.lax.rem(row, BQ) + qb * block_q

    m = jnp.full((G * BQ, 1), MASK_VALUE, jnp.float32)
    l = jnp.zeros((G * BQ, 1), jnp.float32)
    acc = jnp.zeros((G * BQ, D), jnp.float32)

    # ---- phase 1: attend to quantized history pages ----------------------
    num_hpages = pl.cdiv(hist, page_size)
    num_hchunks = pl.cdiv(num_hpages, pages_per_chunk)
    chunk_tokens = page_size * pages_per_chunk
    if window is None:
        start_hchunk = 0
    else:
        start_hchunk = (jnp.maximum(hist + qb * block_q + 1 - window, 0)
                        // chunk_tokens)

    def hist_copies(slot, c):
        copies = []
        for i in range(pages_per_chunk):
            pg = block_tables_ref[b * max_pages + c * pages_per_chunk + i]
            copies.append(pltpu.make_async_copy(
                k_hbm.at[layer_ref[0], pg, h], k_buf.at[slot, i],
                k_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[layer_ref[0], pg, h], v_buf.at[slot, i],
                v_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                ks_hbm.at[layer_ref[0], pg, h], ks_buf.at[slot, i],
                ks_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                vs_hbm.at[layer_ref[0], pg, h], vs_buf.at[slot, i],
                vs_sems.at[slot]))
        return copies

    @pl.when(num_hchunks > start_hchunk)
    def _():
        for cp in hist_copies(jax.lax.rem(start_hchunk, 2), start_hchunk):
            cp.start()

    def hist_body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_hchunks)
        def _():
            for cp in hist_copies(jax.lax.rem(c + 1, 2), c + 1):
                cp.start()

        for cp in hist_copies(slot, c):
            cp.wait()

        # per-page blocks: scale vectors stay in lanes (no relayout)
        for i in range(pages_per_chunk):
            kh = k_buf[slot, i].astype(jnp.bfloat16)        # [ps, D]
            vh = v_buf[slot, i].astype(jnp.bfloat16)
            ks = ks_buf[slot, i, :page_size].reshape(1, page_size)
            vs = vs_buf[slot, i, :page_size].reshape(1, page_size)
            s = jax.lax.dot_general(q, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = _softcap(s * ks, softcap)                   # dequant K
            kpos = ((c * pages_per_chunk + i) * page_size
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (G * BQ, page_size), 1))
            valid = kpos < hist
            if window is not None:
                valid &= kpos > hist + q_pos - window
            s = jnp.where(valid, s, MASK_VALUE)
            m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m2)
            alpha = jnp.exp(m - m2)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                (p * vs).astype(jnp.bfloat16), vh,          # dequant V
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc * alpha + pv
            m = m2
        return m, l, acc

    m, l, acc = jax.lax.fori_loop(start_hchunk, num_hchunks, hist_body,
                                  (m, l, acc))

    # ---- phase 2: causal attention over the current chunk (bf16) ---------
    m, l, acc = _attend_current_chunk(
        q, q_pos, k_ref, v_ref, chunk_len, qb, m, l, acc,
        block_q=block_q, block_k=block_k, window=window,
        softcap=softcap)

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(G, BQ, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "pages_per_chunk",
                     "with_history", "interpret", "window", "softcap"))
def flash_prefill_attention(
    q: jnp.ndarray,             # [B, KV, G, S, D]
    k: jnp.ndarray,             # [B, KV, S, D] current chunk (post-RoPE)
    v: jnp.ndarray,
    k_cache: jnp.ndarray,       # [L, P, KV, ps, D]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages]
    history_lens: jnp.ndarray,  # [B]
    chunk_lens: jnp.ndarray,    # [B]
    layer: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 128,
    block_k: int = 256,
    pages_per_chunk: int = 4,
    with_history: bool = True,
    k_scales: jnp.ndarray | None = None,   # [L, P, KV, 128] when int8 cache
    v_scales: jnp.ndarray | None = None,
    interpret: bool = False,
    window: int | None = None,
    softcap: float | None = None,
) -> jnp.ndarray:
    """Returns attention output ``[B, KV, G, S, D]`` in q.dtype."""
    B, KV, G, S, D = q.shape
    _, _, _, page_size, _ = k_cache.shape
    max_pages = block_tables.shape[1]
    block_q = min(block_q, S)
    block_k = min(block_k, S)
    # The q/out tiles ([G, block_q, D] bf16, double-buffered) and the f32
    # accumulator all scale with G*D. Standard GQA heads (D=128, G<=8)
    # fit the default block_q=128 easily, but MLA's absorbed-latent heads
    # are WIDE (deepseek_v2: G=16 query heads over a 640-lane padded
    # latent) — at block_q 128 that's ~21 MB of scoped VMEM vs the 16 MB
    # limit. Shrink block_q until the dominant tiles fit a ~6 MB budget
    # (leaves room for the k/v chunk blocks + history-page scratch).
    while block_q > 32 and G * block_q * D * 12 > 6 * 1024 * 1024:
        block_q //= 2
    assert S % block_q == 0 and S % block_k == 0, (S, block_q, block_k)

    pages_per_chunk = min(pages_per_chunk, max_pages)
    if max_pages % pages_per_chunk:
        pad = pages_per_chunk - max_pages % pages_per_chunk
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad

    quantized = k_scales is not None and with_history
    cache_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, pages_per_chunk, page_size, D), k_cache.dtype),
        pltpu.VMEM((2, pages_per_chunk, page_size, D), v_cache.dtype),
    ]
    if quantized:
        cache_specs += [pl.BlockSpec(memory_space=pltpu.ANY),
                        pl.BlockSpec(memory_space=pltpu.ANY)]
        scratch += [pltpu.VMEM((2, pages_per_chunk, 128), jnp.float32),
                    pltpu.VMEM((2, pages_per_chunk, 128), jnp.float32)]
        scratch += [pltpu.SemaphoreType.DMA((2,)) for _ in range(4)]
    else:
        scratch += [pltpu.SemaphoreType.DMA((2,)) for _ in range(2)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, KV, S // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, G, block_q, D),
                         lambda b, h, qb, *_: (b, h, 0, qb, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, qb, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, qb, *_: (b, h, 0, 0)),
            *cache_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, G, block_q, D),
                               lambda b, h, qb, *_: (b, h, 0, qb, 0)),
        scratch_shapes=scratch,
    )

    if quantized:
        kernel = functools.partial(
            _prefill_kernel_q, page_size=page_size, max_pages=max_pages,
            pages_per_chunk=pages_per_chunk, block_q=block_q,
            block_k=block_k, scale=scale, window=window,
            softcap=softcap)
        operands = (q, k, v, k_cache, v_cache, k_scales, v_scales)
    else:
        kernel = functools.partial(
            _prefill_kernel, page_size=page_size, max_pages=max_pages,
            pages_per_chunk=pages_per_chunk, block_q=block_q,
            block_k=block_k, scale=scale, with_history=with_history,
            window=window, softcap=softcap)
        if not with_history:
            # The kernel never reads the cache without history — but
            # passing the real tensors makes them operands of this
            # custom call, and XLA then COPY-PROTECTS the whole cache
            # against the in-place store_kv_pages in the same layer
            # loop (measured: 2x ~1.25 ms full-cache copies per
            # 256-token 7B prefill, ~11% of device time). Tiny dummies
            # keep the ref arity without the dependency.
            dummy = jnp.zeros((1, 1, 1, 1, 1), k_cache.dtype)
            operands = (q, k, v, dummy, dummy)
        else:
            operands = (q, k, v, k_cache, v_cache)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), block_tables.reshape(-1),
      history_lens, chunk_lens, *operands)
