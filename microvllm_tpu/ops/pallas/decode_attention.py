"""Pallas TPU paged-attention decode kernel.

The TPU-native replacement for the reference's external CUDA
`flash_attn_with_kvcache` decode call (`core/layer/model_graph.py:161-168`):
single-query attention over a paged KV cache addressed by block tables.

Design (one program per (sequence, kv_head) grid cell):
  * the query group ([group_size, head_dim], the GQA heads sharing this KV
    head) sits in VMEM via the q BlockSpec;
  * K/V pages stream HBM -> VMEM with double-buffered async DMA, a chunk of
    ``pages_per_chunk`` pages per step, so DMA of chunk c+1 overlaps compute
    on chunk c (the HBM roofline is the bound: each cached byte is read
    exactly once);
  * online softmax (flash-attention style m/l rescaling) accumulates in
    fp32 across chunks — no [B, max_context] score materialization, unlike
    the jnp reference path (`ops/attention.py:paged_decode_attention_ref`).

Padding rows (context_len == 0) produce zeros. Block-table padding entries
point at the trash page and are masked by position >= context_len.
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


def _decode_kernel(
    # scalar-prefetch refs
    block_tables_ref,   # [B * max_pages] int32 (SMEM)
    context_lens_ref,   # [B] int32 (SMEM)
    # inputs
    q_ref,              # [1, 1, G, D] VMEM block
    k_hbm,              # [num_pages, kv_heads, page_size, D] in HBM/ANY
    v_hbm,
    # outputs
    o_ref,              # [1, 1, G, D] VMEM block
    # scratch
    k_buf,              # [2, ppc, page_size, D] VMEM
    v_buf,
    k_sems,             # [2] DMA semaphores
    v_sems,
    *,
    page_size: int,
    max_pages: int,
    pages_per_chunk: int,
    scale: float,
    window: int | None = None,
    softcap: float | None = None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ctx = context_lens_ref[b]
    _decode_attention_body(
        block_tables_ref, ctx, q_ref, k_hbm, v_hbm, o_ref,
        k_buf, v_buf, k_sems, v_sems,
        page_size=page_size, max_pages=max_pages,
        pages_per_chunk=pages_per_chunk, scale=scale, window=window,
        softcap=softcap)


def _decode_kernel_partials(
    block_tables_ref, context_lens_ref, q_ref, k_hbm, v_hbm,
    o_ref, m_ref, l_ref, k_buf, v_buf, k_sems, v_sems,
    *, page_size: int, max_pages: int, pages_per_chunk: int, scale: float,
    window: int | None = None, softcap: float | None = None,
):
    """Flash-decode partials: o_ref gets the UNNORMALIZED accumulator and
    m/l land in extra [1, 1, G, 128] outputs (lane-broadcast) — for
    KV-page-sharded (sequence-parallel) decode, where each rank attends
    its local page shard and the caller combines
    ``psum(exp(m - pmax m) * (acc, l))`` across the mesh axis
    (`ops/attention.py::sp_combine_partials`)."""
    b = pl.program_id(0)
    ctx = context_lens_ref[b]

    def emit(m, l, acc):
        o_ref[0, 0] = acc.astype(o_ref.dtype)
        m_ref[0, 0] = jnp.broadcast_to(m, m_ref.shape[2:]).astype(
            m_ref.dtype)
        l_ref[0, 0] = jnp.broadcast_to(l, l_ref.shape[2:]).astype(
            l_ref.dtype)

    _decode_attention_body(
        block_tables_ref, ctx, q_ref, k_hbm, v_hbm, None,
        k_buf, v_buf, k_sems, v_sems,
        page_size=page_size, max_pages=max_pages,
        pages_per_chunk=pages_per_chunk, scale=scale, window=window,
        softcap=softcap, emit=emit)


def _decode_attention_body(
    block_tables_ref, ctx, q_ref, k_hbm, v_hbm, o_ref,
    k_buf, v_buf, k_sems, v_sems,
    *, page_size, max_pages, pages_per_chunk, scale, window=None,
    softcap=None, emit=None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    chunk_tokens = page_size * pages_per_chunk
    num_chunks = pl.cdiv(ctx, chunk_tokens)
    # Sliding window: chunks wholly below the window start are never read
    # (fewer DMAs AND fewer softmax updates — windowed long-context decode
    # costs O(window), not O(context)).
    if window is None:
        start_chunk = 0
    else:
        start_chunk = jnp.maximum(ctx - window, 0) // chunk_tokens

    G, D = q_ref.shape[2], q_ref.shape[3]

    def chunk_copies(slot, c):
        copies = []
        for i in range(pages_per_chunk):
            page = block_tables_ref[b * max_pages + c * pages_per_chunk + i]
            copies.append(pltpu.make_async_copy(
                k_hbm.at[page, h], k_buf.at[slot, i], k_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                v_hbm.at[page, h], v_buf.at[slot, i], v_sems.at[slot]))
        return copies

    @pl.when(num_chunks > start_chunk)
    def _start_first():
        for cp in chunk_copies(jax.lax.rem(start_chunk, 2), start_chunk):
            cp.start()

    q = q_ref[0, 0].astype(jnp.float32)  # [G, D]

    def body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _start_next():
            for cp in chunk_copies(jax.lax.rem(c + 1, 2), c + 1):
                cp.start()

        for cp in chunk_copies(slot, c):
            cp.wait()

        k = k_buf[slot].reshape(chunk_tokens, D)
        v = v_buf[slot].reshape(chunk_tokens, D)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # [G, T]
        s = _softcap(s, softcap)

        pos = c * chunk_tokens + jax.lax.broadcasted_iota(
            jnp.int32, (G, chunk_tokens), 1)
        valid = pos < ctx
        if window is not None:
            valid &= pos >= ctx - window
        s = jnp.where(valid, s, MASK_VALUE)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                                  # [G, T]
        alpha = jnp.exp(m - m_new)                              # [G, 1]
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [G, D]
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    init = (
        jnp.full((G, 1), MASK_VALUE, jnp.float32),
        jnp.zeros((G, 1), jnp.float32),
        jnp.zeros((G, D), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(start_chunk, num_chunks, body, init)

    if emit is not None:
        emit(m, l, acc)
    else:
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "pages_per_chunk", "interpret", "window",
                     "softcap", "partials"))
def paged_decode_attention(
    q: jnp.ndarray,             # [B, num_heads, head_dim]
    k_pages: jnp.ndarray,       # [num_pages, kv_heads, page_size, head_dim]
    v_pages: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages_per_seq] int32
    context_lens: jnp.ndarray,  # [B] int32
    *,
    scale: float,
    pages_per_chunk: int | None = None,
    interpret: bool = False,
    window: int | None = None,
    softcap: float | None = None,
    partials: bool = False,
):
    """Paged decode attention. With ``partials=True`` returns the
    flash-decode partial triple ``(acc [B,H,D] unnormalized f32,
    m [B,H,1] f32 running max, l [B,H,1] f32 running denominator)`` for
    cross-rank combination under KV page sharding (sequence parallelism);
    a rank whose local shard holds none of a sequence's tokens emits
    (0, MASK_VALUE, 0) — the exact identity of the combine."""
    B, num_heads, head_dim = q.shape
    num_pages, kv_heads, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    group = num_heads // kv_heads

    if pages_per_chunk is None:
        # sweepable: larger chunks mean fewer sequential DMA waits per row
        # at batched decode (b8 attention measured 73 us/layer vs a ~35 us
        # KV-DMA roofline, r5 OLMoE xplane)
        import os
        pages_per_chunk = int(os.environ.get("MVT_DECODE_PPC", "4"))
    pages_per_chunk = min(pages_per_chunk, max_pages)
    # block table width must divide into whole chunks; pad with trash pages
    if max_pages % pages_per_chunk:
        pad = pages_per_chunk - max_pages % pages_per_chunk
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad

    qg = q.reshape(B, kv_heads, group, head_dim)

    blk = pl.BlockSpec((1, 1, group, head_dim), lambda b, h, *_: (b, h, 0, 0))
    ml_blk = pl.BlockSpec((1, 1, group, 128), lambda b, h, *_: (b, h, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, kv_heads),
        in_specs=[
            blk,
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(blk, ml_blk, ml_blk) if partials else blk,
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_chunk, page_size, head_dim), k_pages.dtype),
            pltpu.VMEM((2, pages_per_chunk, page_size, head_dim), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _decode_kernel_partials if partials else _decode_kernel,
        page_size=page_size,
        max_pages=max_pages,
        pages_per_chunk=pages_per_chunk,
        scale=scale,
        window=window,
        softcap=softcap,
    )

    f32 = jnp.float32
    out_shape = (
        (jax.ShapeDtypeStruct((B, kv_heads, group, head_dim), f32),
         jax.ShapeDtypeStruct((B, kv_heads, group, 128), f32),
         jax.ShapeDtypeStruct((B, kv_heads, group, 128), f32))
        if partials else
        jax.ShapeDtypeStruct((B, kv_heads, group, head_dim), q.dtype))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables.reshape(-1), context_lens, qg, k_pages, v_pages)

    if partials:
        acc, m, l = out
        return (acc.reshape(B, num_heads, head_dim),
                m[..., :1].reshape(B, num_heads, 1),
                l[..., :1].reshape(B, num_heads, 1))
    return out.reshape(B, num_heads, head_dim)


# ---------------------------------------------------------------------------
# Fused KV-append + paged attention (the flash_attn_with_kvcache equivalent)
# ---------------------------------------------------------------------------


def _decode_append_kernel(
    # scalar-prefetch refs
    layer_ref,          # [1] int32
    block_tables_ref,   # [B * max_pages] int32
    context_lens_ref,   # [B] int32
    # inputs
    q_ref,              # [1, KV, G, D] VMEM block (this seq's heads)
    kv_new_ref,         # [1, 2, KV, D] VMEM block (k row + v row)
    k_hbm,              # [L, num_pages, KV, page_size, D] ANY (aliased out)
    v_hbm,
    # outputs
    o_ref,              # [1, KV, G, D] VMEM block
    k_out,              # aliased with k_hbm
    v_out,
    # scratch
    k_buf,              # [2, ppc, KV, page_size, D] VMEM
    v_buf,
    page_buf,           # [2, KV, page_size, D] VMEM (append staging)
    k_sems, v_sems,     # [2] DMA sems
    w_sems,             # [2] DMA sems for the appends
    *,
    page_size: int,
    max_pages: int,
    pages_per_chunk: int,
    scale: float,
    window: int | None = None,
    softcap: float | None = None,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    ctx = context_lens_ref[b]          # position of the incoming token
    KV, G, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    chunk_tokens = page_size * pages_per_chunk
    num_chunks = pl.cdiv(ctx + 1, chunk_tokens)
    # Sliding window: skip chunks wholly below position ctx+1-window — the
    # windowed decode reads O(window) KV bytes regardless of context.
    if window is None:
        start_chunk = 0
    else:
        start_chunk = jnp.maximum(ctx + 1 - window, 0) // chunk_tokens

    # ---- append the new token's K/V rows into their page -----------------
    # DMA slices must be sublane-aligned, so a single-row write is illegal;
    # instead: read the whole target page, insert the row with a masked
    # select in VMEM, write the whole page back. The round trip is OVERLAPPED
    # with the attention's chunk streaming: chunk-0 DMAs start first, and
    # only the chunk that actually contains the append page waits on the
    # write semaphores (serializing the RMW up front cost ~8 us x B grid
    # programs per call — the dominant attention cost at batch 8).
    page_idx = ctx // page_size
    offset = ctx % page_size
    page = block_tables_ref[b * max_pages + page_idx]
    append_chunk = page_idx // pages_per_chunk

    # Read through the (aliased) OUTPUT refs so the just-appended row is
    # visible in interpret mode too (compiled mode: same buffer either way).
    def chunk_copies(slot, c):
        copies = []
        for i in range(pages_per_chunk):
            pg = block_tables_ref[b * max_pages + c * pages_per_chunk + i]
            copies.append(pltpu.make_async_copy(
                k_out.at[layer, pg], k_buf.at[slot, i], k_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                v_out.at[layer, pg], v_buf.at[slot, i], v_sems.at[slot]))
        return copies

    def wait_append_writes():
        pltpu.make_async_copy(page_buf.at[0], k_out.at[layer, page],
                              w_sems.at[0]).wait()
        pltpu.make_async_copy(page_buf.at[1], v_out.at[layer, page],
                              w_sems.at[1]).wait()

    @pl.when((num_chunks > start_chunk) & (append_chunk != start_chunk))
    def _start_first_early():
        for cp in chunk_copies(jax.lax.rem(start_chunk, 2), start_chunk):
            cp.start()

    k_page_in = pltpu.make_async_copy(
        k_out.at[layer, page], page_buf.at[0], w_sems.at[0])
    v_page_in = pltpu.make_async_copy(
        v_out.at[layer, page], page_buf.at[1], w_sems.at[1])
    k_page_in.start()
    v_page_in.start()
    k_page_in.wait()
    v_page_in.wait()

    slot_mask = (jax.lax.broadcasted_iota(jnp.int32, (page_size, D), 0)
                 == offset)                                   # [ps, D]
    for h in range(KV):
        page_buf[0, h] = jnp.where(
            slot_mask, kv_new_ref[0, 0, h][None, :].astype(page_buf.dtype),
            page_buf[0, h])
        page_buf[1, h] = jnp.where(
            slot_mask, kv_new_ref[0, 1, h][None, :].astype(page_buf.dtype),
            page_buf[1, h])

    pltpu.make_async_copy(page_buf.at[0], k_out.at[layer, page],
                          w_sems.at[0]).start()
    pltpu.make_async_copy(page_buf.at[1], v_out.at[layer, page],
                          w_sems.at[1]).start()

    @pl.when((num_chunks > start_chunk) & (append_chunk == start_chunk))
    def _start_first_after_append():
        wait_append_writes()
        for cp in chunk_copies(jax.lax.rem(start_chunk, 2), start_chunk):
            cp.start()

    q = q_ref[0].astype(jnp.float32)                  # [KV, G, D]

    def body(c, carry):
        m, l, acc = carry                             # [KV*G,1],[KV*G,1],[KV*G,D]
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _start_next():
            @pl.when(append_chunk == c + 1)
            def _():
                wait_append_writes()

            for cp in chunk_copies(jax.lax.rem(c + 1, 2), c + 1):
                cp.start()

        for cp in chunk_copies(slot, c):
            cp.wait()

        pos = c * chunk_tokens + jax.lax.broadcasted_iota(
            jnp.int32, (Gp, chunk_tokens), 1)
        valid = pos <= ctx                            # includes the new token
        if window is not None:
            valid &= pos > ctx - window

        # Per-head K dots (each KV head has its own K matrix), then ONE
        # head-stacked [KV*Gp, T] online-softmax update per chunk — the
        # VPU op-issue count (mask/max/exp/sum) drops KV-fold, which is
        # the kernel's bound once DMA streams are double-buffered. G is
        # padded to a sublane multiple (8) so the per-head slices are
        # aligned (Mosaic rejects 7-offset sublane slices).
        s = jnp.concatenate([
            jax.lax.dot_general(
                qp[h], k_buf[slot, :, h].reshape(chunk_tokens, D),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(KV)], axis=0) * scale       # [KV*Gp, T]
        s = _softcap(s, softcap)
        s = jnp.where(jnp.tile(valid, (KV, 1)), s, MASK_VALUE)
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m2)                            # [KV*Gp, T]
        alpha = jnp.exp(m - m2)
        l2 = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pb = p.astype(v_buf.dtype)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                pb[h * Gp:(h + 1) * Gp],
                v_buf[slot, :, h].reshape(chunk_tokens, D),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(KV)], axis=0)               # [KV*Gp, D]
        return m2, l2, acc * alpha + pv

    Gp = -(-G // 8) * 8
    qp = jnp.pad(q, ((0, 0), (0, Gp - G), (0, 0))) if Gp != G else q
    init = (
        jnp.full((KV * Gp, 1), MASK_VALUE, jnp.float32),
        jnp.zeros((KV * Gp, 1), jnp.float32),
        jnp.zeros((KV * Gp, D), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(start_chunk, num_chunks, body, init)
    out = acc / jnp.maximum(l, 1e-30)                  # [KV*Gp, D]
    for h in range(KV):
        o_ref[0, h] = out[h * Gp:(h + 1) * Gp][:G].astype(o_ref.dtype)


def _decode_append_kernel_q(
    # scalar-prefetch refs
    layer_ref, block_tables_ref, context_lens_ref,
    # inputs
    q_ref,              # [1, KV, G, D]
    kv_new_ref,         # [1, 2, KV, D] (bf16; quantized in-kernel)
    k_hbm, v_hbm,       # [L, P, KV, ps, D] int8 (aliased out)
    ks_hbm, vs_hbm,     # [L, P, KV, 128] f32 (aliased out)
    # outputs
    o_ref, k_out, v_out, ks_out, vs_out,
    # scratch
    k_buf, v_buf,       # [2, ppc, KV, ps, D] int8
    ks_buf, vs_buf,     # [2, ppc, KV, 128] f32
    page_buf,           # [2, KV, ps, D] int8 (append staging)
    spage_buf,          # [2, KV, 128] f32 (scale staging)
    k_sems, v_sems, ks_sems, vs_sems, w_sems,
    *,
    page_size: int,
    max_pages: int,
    pages_per_chunk: int,
    scale: float,
    window: int | None = None,
    softcap: float | None = None,
):
    """INT8 KV-cache variant: new rows are quantized per (token, head) in
    kernel; dequantization happens as lane-wise scaling of scores (K) and
    probabilities (V), so int8 tiles feed the MXU after one convert."""
    b = pl.program_id(0)
    layer = layer_ref[0]
    ctx = context_lens_ref[b]
    KV, G, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    num_pages_seq = (ctx + 1 + page_size - 1) // page_size
    num_chunks = pl.cdiv(num_pages_seq, pages_per_chunk)
    chunk_tokens = page_size * pages_per_chunk
    if window is None:
        start_chunk = 0
    else:
        start_chunk = jnp.maximum(ctx + 1 - window, 0) // chunk_tokens

    page_idx = ctx // page_size
    offset = ctx % page_size
    page = block_tables_ref[b * max_pages + page_idx]
    append_chunk = page_idx // pages_per_chunk

    def chunk_copies(slot, c):
        copies = []
        for i in range(pages_per_chunk):
            pg = block_tables_ref[b * max_pages + c * pages_per_chunk + i]
            copies.append(pltpu.make_async_copy(
                k_out.at[layer, pg], k_buf.at[slot, i], k_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                v_out.at[layer, pg], v_buf.at[slot, i], v_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                ks_out.at[layer, pg], ks_buf.at[slot, i], ks_sems.at[slot]))
            copies.append(pltpu.make_async_copy(
                vs_out.at[layer, pg], vs_buf.at[slot, i], vs_sems.at[slot]))
        return copies

    def wait_append_writes():
        pltpu.make_async_copy(page_buf.at[0], k_out.at[layer, page],
                              w_sems.at[0]).wait()
        pltpu.make_async_copy(page_buf.at[1], v_out.at[layer, page],
                              w_sems.at[1]).wait()
        pltpu.make_async_copy(spage_buf.at[0], ks_out.at[layer, page],
                              w_sems.at[2]).wait()
        pltpu.make_async_copy(spage_buf.at[1], vs_out.at[layer, page],
                              w_sems.at[3]).wait()

    # ---- read-modify-write the target page (values + scales), overlapped
    # with the chunk streaming (see the bf16 kernel) ----------------------
    @pl.when((num_chunks > start_chunk) & (append_chunk != start_chunk))
    def _start_first_early():
        for cp in chunk_copies(jax.lax.rem(start_chunk, 2), start_chunk):
            cp.start()

    kp_in = pltpu.make_async_copy(k_out.at[layer, page], page_buf.at[0],
                                  w_sems.at[0])
    vp_in = pltpu.make_async_copy(v_out.at[layer, page], page_buf.at[1],
                                  w_sems.at[1])
    ksp_in = pltpu.make_async_copy(ks_out.at[layer, page], spage_buf.at[0],
                                   w_sems.at[2])
    vsp_in = pltpu.make_async_copy(vs_out.at[layer, page], spage_buf.at[1],
                                   w_sems.at[3])
    for cp in (kp_in, vp_in, ksp_in, vsp_in):
        cp.start()
    for cp in (kp_in, vp_in, ksp_in, vsp_in):
        cp.wait()

    slot_mask = (jax.lax.broadcasted_iota(jnp.int32, (page_size, D), 0)
                 == offset)
    lane_mask = (jax.lax.broadcasted_iota(jnp.int32, (KV, 128), 1) == offset)

    new_k = kv_new_ref[0, 0].astype(jnp.float32)          # [KV, D]
    new_v = kv_new_ref[0, 1].astype(jnp.float32)
    k_absmax = jnp.max(jnp.abs(new_k), axis=-1, keepdims=True)   # [KV, 1]
    v_absmax = jnp.max(jnp.abs(new_v), axis=-1, keepdims=True)
    k_s = jnp.maximum(k_absmax / 127.0, 1e-10)
    v_s = jnp.maximum(v_absmax / 127.0, 1e-10)
    k_q = jnp.clip(jnp.round(new_k / k_s), -128, 127).astype(jnp.int8)
    v_q = jnp.clip(jnp.round(new_v / v_s), -128, 127).astype(jnp.int8)

    for h in range(KV):
        page_buf[0, h] = jnp.where(slot_mask, k_q[h][None, :],
                                   page_buf[0, h])
        page_buf[1, h] = jnp.where(slot_mask, v_q[h][None, :],
                                   page_buf[1, h])
    spage_buf[0] = jnp.where(lane_mask, jnp.broadcast_to(k_s, (KV, 128)),
                             spage_buf[0])
    spage_buf[1] = jnp.where(lane_mask, jnp.broadcast_to(v_s, (KV, 128)),
                             spage_buf[1])

    kp_out = pltpu.make_async_copy(page_buf.at[0], k_out.at[layer, page],
                                   w_sems.at[0])
    vp_out = pltpu.make_async_copy(page_buf.at[1], v_out.at[layer, page],
                                   w_sems.at[1])
    ksp_out = pltpu.make_async_copy(spage_buf.at[0], ks_out.at[layer, page],
                                    w_sems.at[2])
    vsp_out = pltpu.make_async_copy(spage_buf.at[1], vs_out.at[layer, page],
                                    w_sems.at[3])
    for cp in (kp_out, vp_out, ksp_out, vsp_out):
        cp.start()

    # ---- stream pages + online softmax with lane-scaled dequant ----------
    @pl.when((num_chunks > start_chunk) & (append_chunk == start_chunk))
    def _start_first_after_append():
        wait_append_writes()
        for cp in chunk_copies(jax.lax.rem(start_chunk, 2), start_chunk):
            cp.start()

    q = q_ref[0].astype(jnp.float32)                  # [KV, G, D]

    def body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < num_chunks)
        def _start_next():
            @pl.when(append_chunk == c + 1)
            def _():
                wait_append_writes()

            for cp in chunk_copies(jax.lax.rem(c + 1, 2), c + 1):
                cp.start()

        for cp in chunk_copies(slot, c):
            cp.wait()

        T = pages_per_chunk * page_size

        def chunk_scales(buf, h):
            # Per-token dequant scales live in 128-lane page rows; lane-
            # CONCAT of per-page [1, ps] slices builds the chunk vector
            # without any sublane<->lane relayout.
            return jnp.concatenate(
                [buf[slot, i, h, :page_size].reshape(1, page_size)
                 for i in range(pages_per_chunk)], axis=1)    # [1, T]

        # Per-head K dots with lane-wise K dequant, then ONE head-stacked
        # [KV*Gp, T] online-softmax update per chunk (see the bf16 kernel;
        # the r1 per-page loop issued ~15 small VPU ops per page).
        s = jnp.concatenate([
            jax.lax.dot_general(
                qp[h],
                k_buf[slot, :, h].reshape(T, D).astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            * chunk_scales(ks_buf, h)
            for h in range(KV)], axis=0) * scale              # [KV*Gp, T]
        s = _softcap(s, softcap)
        pos = c * T + jax.lax.broadcasted_iota(jnp.int32, (KV * Gp, T), 1)
        valid = pos <= ctx
        if window is not None:
            valid &= pos > ctx - window
        s = jnp.where(valid, s, MASK_VALUE)
        m2 = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m2)
        alpha = jnp.exp(m - m2)
        l2 = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                (p[h * Gp:(h + 1) * Gp]
                 * chunk_scales(vs_buf, h)).astype(jnp.bfloat16),
                v_buf[slot, :, h].reshape(T, D).astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for h in range(KV)], axis=0)                      # [KV*Gp, D]
        return m2, l2, acc * alpha + pv

    Gp = -(-G // 8) * 8
    qp = jnp.pad(q, ((0, 0), (0, Gp - G), (0, 0))) if Gp != G else q
    init = (
        jnp.full((KV * Gp, 1), MASK_VALUE, jnp.float32),
        jnp.zeros((KV * Gp, 1), jnp.float32),
        jnp.zeros((KV * Gp, D), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(start_chunk, num_chunks, body, init)
    out = acc / jnp.maximum(l, 1e-30)                  # [KV*Gp, D]
    for h in range(KV):
        o_ref[0, h] = out[h * Gp:(h + 1) * Gp][:G].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "pages_per_chunk", "interpret", "window",
                     "softcap"))
def paged_decode_attention_append_q(
    q: jnp.ndarray,             # [B, num_heads, D]
    k_new: jnp.ndarray,         # [B, kv_heads, D]
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,       # [L, P, KV, ps, D] int8
    v_cache: jnp.ndarray,
    k_scales: jnp.ndarray,      # [L, P, KV, 128] f32
    v_scales: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    scale: float,
    pages_per_chunk: int | None = None,
    interpret: bool = False,
    window: int | None = None,
    softcap: float | None = None,
):
    """INT8-KV fused append + decode attention. Returns
    (attn_out, k_cache, v_cache, k_scales, v_scales)."""
    B, num_heads, head_dim = q.shape
    L, num_pages, kv_heads, page_size, _ = k_cache.shape
    max_pages = block_tables.shape[1]
    group = num_heads // kv_heads
    assert page_size <= 128, "int8 KV requires page_size <= 128"

    if pages_per_chunk is None:
        # sweepable: larger chunks mean fewer sequential DMA waits per row
        # at batched decode (b8 attention measured 73 us/layer vs a ~35 us
        # KV-DMA roofline, r5 OLMoE xplane)
        import os
        pages_per_chunk = int(os.environ.get("MVT_DECODE_PPC", "4"))
    pages_per_chunk = min(pages_per_chunk, max_pages)
    if max_pages % pages_per_chunk:
        pad = pages_per_chunk - max_pages % pages_per_chunk
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad

    qg = q.reshape(B, kv_heads, group, head_dim)
    kv_new = jnp.stack([k_new, v_new], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, kv_heads, group, head_dim),
                         lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, 2, kv_heads, head_dim),
                         lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, kv_heads, group, head_dim),
                         lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_chunk, kv_heads, page_size, head_dim),
                       k_cache.dtype),
            pltpu.VMEM((2, pages_per_chunk, kv_heads, page_size, head_dim),
                       v_cache.dtype),
            pltpu.VMEM((2, pages_per_chunk, kv_heads, 128), jnp.float32),
            pltpu.VMEM((2, pages_per_chunk, kv_heads, 128), jnp.float32),
            pltpu.VMEM((2, kv_heads, page_size, head_dim), k_cache.dtype),
            pltpu.VMEM((2, kv_heads, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(
        _decode_append_kernel_q,
        page_size=page_size,
        max_pages=max_pages,
        pages_per_chunk=pages_per_chunk,
        scale=scale,
        window=window,
        softcap=softcap,
    )

    out, k_cache, v_cache, k_scales, v_scales = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, kv_heads, group, head_dim), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
            jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype),
        ],
        # flattened inputs: 0-2 scalars, 3=q, 4=kv_new, 5=k, 6=v, 7=ks, 8=vs
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), block_tables.reshape(-1),
      context_lens, qg, kv_new, k_cache, v_cache, k_scales, v_scales)

    return (out.reshape(B, num_heads, head_dim), k_cache, v_cache,
            k_scales, v_scales)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "pages_per_chunk", "interpret", "window",
                     "softcap"))
def paged_decode_attention_append(
    q: jnp.ndarray,             # [B, num_heads, head_dim(padded)]
    k_new: jnp.ndarray,         # [B, kv_heads, head_dim(padded)]
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,       # [L, num_pages, kv_heads, page_size, D]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages_per_seq] int32
    context_lens: jnp.ndarray,  # [B] int32 — tokens in cache BEFORE this one
    layer: jnp.ndarray,         # [] or [1] int32
    *,
    scale: float,
    pages_per_chunk: int | None = None,
    interpret: bool = False,
    window: int | None = None,
    softcap: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused in-kernel KV append + paged decode attention.

    Writes k_new/v_new into layer ``layer``'s pages at slot(context_lens),
    then computes attention over context_lens+1 tokens. The cache buffers
    are aliased input->output (zero copy). Returns (attn_out, k_cache,
    v_cache).
    """
    B, num_heads, head_dim = q.shape
    L, num_pages, kv_heads, page_size, _ = k_cache.shape
    max_pages = block_tables.shape[1]
    group = num_heads // kv_heads

    if pages_per_chunk is None:
        # sweepable: larger chunks mean fewer sequential DMA waits per row
        # at batched decode (b8 attention measured 73 us/layer vs a ~35 us
        # KV-DMA roofline, r5 OLMoE xplane)
        import os
        pages_per_chunk = int(os.environ.get("MVT_DECODE_PPC", "4"))
    pages_per_chunk = min(pages_per_chunk, max_pages)
    if max_pages % pages_per_chunk:
        pad = pages_per_chunk - max_pages % pages_per_chunk
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad

    qg = q.reshape(B, kv_heads, group, head_dim)
    kv_new = jnp.stack([k_new, v_new], axis=1)        # [B, 2, KV, D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, kv_heads, group, head_dim),
                         lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, 2, kv_heads, head_dim),
                         lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, kv_heads, group, head_dim),
                         lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_chunk, kv_heads, page_size, head_dim),
                       k_cache.dtype),
            pltpu.VMEM((2, pages_per_chunk, kv_heads, page_size, head_dim),
                       v_cache.dtype),
            pltpu.VMEM((2, kv_heads, page_size, head_dim), k_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _decode_append_kernel,
        page_size=page_size,
        max_pages=max_pages,
        pages_per_chunk=pages_per_chunk,
        scale=scale,
        window=window,
        softcap=softcap,
    )

    out, k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, kv_heads, group, head_dim), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # inputs (after 3 scalar-prefetch args): 3=q, 4=kv_new, 5=k, 6=v
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), block_tables.reshape(-1),
      context_lens, qg, kv_new, k_cache, v_cache)

    return out.reshape(B, num_heads, head_dim), k_cache, v_cache
