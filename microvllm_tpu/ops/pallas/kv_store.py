"""Pallas kernel: bulk-store a prefill chunk's K/V into cache pages.

TPU-native equivalent of the reference's Triton `store_kvcache_kernel`
(`core/cache_manager.py:74-140`) for the prefill path: page-granular DMA
writes from VMEM into the paged HBM cache, with the cache aliased
input->output — no XLA scatter, no cache copy.

Requirements (enforced by the caller): chunk start (history_len) is
page-aligned — guaranteed because prefill chunk buckets are multiples of
page_size. Slots past chunk_len inside a page receive garbage; they are
always masked by context length and later overwritten slot-exact by the
decode append RMW, so this is safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _store_kernel(
    # scalar prefetch
    layer_ref,          # [1] int32
    block_tables_ref,   # [B * max_pages] int32
    history_ref,        # [B] int32 (page-aligned)
    chunk_lens_ref,     # [B] int32
    # inputs
    k_new_ref,          # [1, KV, ps, D] VMEM block for (b, j)
    v_new_ref,
    k_hbm,              # [L, P, KV, ps, D] ANY (aliased)
    v_hbm,
    # outputs (aliased)
    k_out,
    v_out,
    # scratch
    sems,               # [2] DMA
    *,
    page_size: int,
    max_pages: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    layer = layer_ref[0]
    chunk_len = chunk_lens_ref[b]

    @pl.when(j * page_size < chunk_len)
    def _():
        start_page = history_ref[b] // page_size
        page = block_tables_ref[b * max_pages + start_page + j]
        k_cp = pltpu.make_async_copy(
            k_new_ref.at[0], k_out.at[layer, page], sems.at[0])
        v_cp = pltpu.make_async_copy(
            v_new_ref.at[0], v_out.at[layer, page], sems.at[1])
        k_cp.start()
        v_cp.start()
        k_cp.wait()
        v_cp.wait()


def _store_kernel_q(
    # scalar prefetch
    layer_ref, block_tables_ref, history_ref, chunk_lens_ref,
    # inputs
    k_new_ref,          # [1, KV, ps, D] int8 block for (b, j)
    v_new_ref,
    ks_new_ref,         # [1, KV, 128] f32 scale block for (b, j)
    vs_new_ref,
    k_hbm, v_hbm, ks_hbm, vs_hbm,
    # outputs (aliased)
    k_out, v_out, ks_out, vs_out,
    # scratch
    sems,               # [4] DMA
    *,
    page_size: int,
    max_pages: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    layer = layer_ref[0]
    chunk_len = chunk_lens_ref[b]

    @pl.when(j * page_size < chunk_len)
    def _():
        start_page = history_ref[b] // page_size
        page = block_tables_ref[b * max_pages + start_page + j]
        copies = [
            pltpu.make_async_copy(k_new_ref.at[0], k_out.at[layer, page],
                                  sems.at[0]),
            pltpu.make_async_copy(v_new_ref.at[0], v_out.at[layer, page],
                                  sems.at[1]),
            pltpu.make_async_copy(ks_new_ref.at[0, 0], ks_out.at[layer, page],
                                  sems.at[2]),
            pltpu.make_async_copy(vs_new_ref.at[0, 0], vs_out.at[layer, page],
                                  sems.at[3]),
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def store_kv_pages_q(
    k_new: jnp.ndarray,         # [B, KV, S, D] int8 (quantized chunk)
    v_new: jnp.ndarray,
    k_scales_new: jnp.ndarray,  # [B, S // ps, KV, 128] f32 page blocks
    v_scales_new: jnp.ndarray,
    k_cache: jnp.ndarray,       # [L, P, KV, ps, D] int8
    v_cache: jnp.ndarray,
    k_scales: jnp.ndarray,      # [L, P, KV, 128] f32
    v_scales: jnp.ndarray,
    block_tables: jnp.ndarray,
    history_lens: jnp.ndarray,
    chunk_lens: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    interpret: bool = False,
):
    """INT8 variant of :func:`store_kv_pages`: stores value pages and their
    per-token scale pages, all aliased in->out."""
    B, KV, S, D = k_new.shape
    L, P, _, page_size, _ = k_cache.shape
    max_pages = block_tables.shape[1]
    assert S % page_size == 0, (S, page_size)
    pages_per_chunk = S // page_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, pages_per_chunk),
        in_specs=[
            pl.BlockSpec((1, KV, page_size, D),
                         lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, KV, page_size, D),
                         lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, 1, KV, 128), lambda b, j, *_: (b, j, 0, 0)),
            pl.BlockSpec((1, 1, KV, 128), lambda b, j, *_: (b, j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
    )

    kernel = functools.partial(_store_kernel_q, page_size=page_size,
                               max_pages=max_pages)
    k_cache, v_cache, k_scales, v_scales = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scales.shape, k_scales.dtype),
            jax.ShapeDtypeStruct(v_scales.shape, v_scales.dtype),
        ],
        # flat inputs: 0-3 scalars, 4-7 chunk data, 8=k, 9=v, 10=ks, 11=vs
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), block_tables.reshape(-1),
      history_lens, chunk_lens,
      k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
      k_scales_new, v_scales_new, k_cache, v_cache, k_scales, v_scales)
    return k_cache, v_cache, k_scales, v_scales


def _append_rows_kernel(
    # scalar prefetch
    layer_ref,          # [1] int32
    block_tables_ref,   # [B * max_pages] int32
    start_ref,          # [B] int32 — first row's position (arbitrary offset)
    # inputs
    k_new_ref,          # [1, KV, S, D] VMEM block for b
    v_new_ref,
    k_hbm, v_hbm,       # [L, P, KV, ps, D] ANY (aliased)
    # outputs (aliased)
    k_out, v_out,
    # scratch
    page_buf,           # [2, KV, ps, D]
    sems,               # [2] DMA
    *,
    page_size: int,
    max_pages: int,
    S: int,
):
    """RMW-append S rows starting at an ARBITRARY (non-page-aligned) slot:
    for each touched page, read it, mask-insert the rows that land in it,
    write it back — the multi-row generalization of the decode append's
    single-row RMW (speculative verification windows start mid-page)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    layer = layer_ref[0]
    start = start_ref[b]
    KV, D = k_new_ref.shape[1], k_new_ref.shape[3]

    page_idx = start // page_size + j
    page_lo = page_idx * page_size          # first position in this page
    t_lo = page_lo - start                  # first row index landing here

    # run only when this page overlaps [start, start+S) and is addressable
    @pl.when((t_lo < S) & (page_idx < max_pages))
    def _():
        page = block_tables_ref[b * max_pages + page_idx]
        k_in = pltpu.make_async_copy(
            k_out.at[layer, page], page_buf.at[0], sems.at[0])
        v_in = pltpu.make_async_copy(
            v_out.at[layer, page], page_buf.at[1], sems.at[1])
        k_in.start()
        v_in.start()
        k_in.wait()
        v_in.wait()

        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (page_size, D), 0)
        for t in range(S):
            offset = start + t - page_lo
            mask = slot_iota == offset           # empty when out of page
            for h in range(KV):
                page_buf[0, h] = jnp.where(
                    mask, k_new_ref[0, h, t][None, :].astype(page_buf.dtype),
                    page_buf[0, h])
                page_buf[1, h] = jnp.where(
                    mask, v_new_ref[0, h, t][None, :].astype(page_buf.dtype),
                    page_buf[1, h])

        k_back = pltpu.make_async_copy(
            page_buf.at[0], k_out.at[layer, page], sems.at[0])
        v_back = pltpu.make_async_copy(
            page_buf.at[1], v_out.at[layer, page], sems.at[1])
        k_back.start()
        v_back.start()
        k_back.wait()
        v_back.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_append_rows(
    k_new: jnp.ndarray,         # [B, KV, S, D] (post-RoPE, padded D)
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,       # [L, P, KV, ps, D]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages] int32
    start_lens: jnp.ndarray,    # [B] int32 — position of row 0 (any offset)
    layer: jnp.ndarray,
    *,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Slot-exact append of S consecutive rows per sequence at arbitrary
    offsets, caches aliased in->out (no copy)."""
    B, KV, S, D = k_new.shape
    L, P, _, page_size, _ = k_cache.shape
    max_pages = block_tables.shape[1]
    pages_touched = (S + page_size - 1) // page_size + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, pages_touched),
        in_specs=[
            pl.BlockSpec((1, KV, S, D), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, KV, S, D), lambda b, j, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KV, page_size, D), k_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_append_rows_kernel, page_size=page_size,
                               max_pages=max_pages, S=S)
    k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # flat inputs: 0-2 scalars, 3=k_new, 4=v_new, 5=k_cache, 6=v_cache
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), block_tables.reshape(-1),
      start_lens, k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
      k_cache, v_cache)
    return k_cache, v_cache


@functools.partial(jax.jit, static_argnames=("interpret",))
def store_kv_pages(
    k_new: jnp.ndarray,         # [B, KV, S, D] (transposed chunk, padded D)
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,       # [L, P, KV, page_size, D]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages] int32
    history_lens: jnp.ndarray,  # [B] int32, page-aligned
    chunk_lens: jnp.ndarray,    # [B] int32
    layer: jnp.ndarray,
    *,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    B, KV, S, D = k_new.shape
    L, P, _, page_size, _ = k_cache.shape
    max_pages = block_tables.shape[1]
    assert S % page_size == 0, (S, page_size)
    pages_per_chunk = S // page_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, pages_per_chunk),
        in_specs=[
            pl.BlockSpec((1, KV, page_size, D),
                         lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, KV, page_size, D),
                         lambda b, j, *_: (b, 0, j, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )

    kernel = functools.partial(_store_kernel, page_size=page_size,
                               max_pages=max_pages)

    k_cache, v_cache = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # flattened inputs: 0-3 scalars, 4=k_new, 5=v_new, 6=k_cache, 7=v_cache
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), block_tables.reshape(-1),
      history_lens, chunk_lens,
      k_new.astype(k_cache.dtype), v_new.astype(v_cache.dtype),
      k_cache, v_cache)
    return k_cache, v_cache
