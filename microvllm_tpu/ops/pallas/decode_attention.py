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
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ctx = context_lens_ref[b]
    chunk_tokens = page_size * pages_per_chunk
    num_chunks = pl.cdiv(ctx, chunk_tokens)

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

    @pl.when(num_chunks > 0)
    def _start_first():
        for cp in chunk_copies(0, 0):
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

        pos = c * chunk_tokens + jax.lax.broadcasted_iota(
            jnp.int32, (G, chunk_tokens), 1)
        s = jnp.where(pos < ctx, s, MASK_VALUE)

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
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, init)

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "pages_per_chunk", "interpret"))
def paged_decode_attention(
    q: jnp.ndarray,             # [B, num_heads, head_dim]
    k_pages: jnp.ndarray,       # [num_pages, kv_heads, page_size, head_dim]
    v_pages: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages_per_seq] int32
    context_lens: jnp.ndarray,  # [B] int32
    *,
    scale: float,
    pages_per_chunk: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    B, num_heads, head_dim = q.shape
    num_pages, kv_heads, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    group = num_heads // kv_heads

    pages_per_chunk = min(pages_per_chunk, max_pages)
    # block table width must divide into whole chunks; pad with trash pages
    if max_pages % pages_per_chunk:
        pad = pages_per_chunk - max_pages % pages_per_chunk
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad

    qg = q.reshape(B, kv_heads, group, head_dim)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, kv_heads),
        in_specs=[
            pl.BlockSpec((1, 1, group, head_dim),
                         lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, group, head_dim),
                               lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_chunk, page_size, head_dim), k_pages.dtype),
            pltpu.VMEM((2, pages_per_chunk, page_size, head_dim), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _decode_kernel,
        page_size=page_size,
        max_pages=max_pages,
        pages_per_chunk=pages_per_chunk,
        scale=scale,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, kv_heads, group, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables.reshape(-1), context_lens, qg, k_pages, v_pages)

    return out.reshape(B, num_heads, head_dim)
