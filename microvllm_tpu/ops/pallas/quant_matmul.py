"""Pallas fused dequant-matmul: ``x @ dequant(q, scales)`` at int8/int4 HBM
bandwidth.

The quantized-weights equivalent of the reference's fused Triton
`swiglu_gemm` path (`kernel/swiglu.py`), and the speed-of-light piece of the
INT8/INT4 weight-only story: the quantized weight tile is DMA'd once,
converted + scaled in VMEM, and fed straight to the MXU — no bf16 weight
materialization in HBM (XLA's dequant path writes and re-reads the full
bf16 weight, ~3x the traffic).

Weight layout ``[in_dim, out_dim]``, scales ``[in_dim // group, out_dim]``
(group-wise symmetric, matching `microvllm_tpu/ops/quant.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microvllm_tpu.ops.pallas.unpack import unpack4


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                group_size: int, groups_per_tile: int, n_k: int, bits: int):
    i = pl.program_id(2)                      # contraction tile index

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if bits == 4:
        # unpack nibble-packed rows: [TK/2, TN] int8 -> [TK, TN]
        # (group-local split: low nibbles are each group's first gs/2 rows)
        w = unpack4(q_ref[...], group_size).astype(jnp.bfloat16)
    else:
        w = q_ref[...].astype(jnp.bfloat16)   # [TK, TN]
    # s_ref block is this k-tile's row-padded scales [8m, TN]; expand the
    # used rows to per-weight-row: [gpt, TN] -> [TK, TN]
    s = s_ref[0, :groups_per_tile, :].astype(jnp.bfloat16)
    tn = s.shape[-1]
    s = jnp.broadcast_to(s[:, None, :], (groups_per_tile, group_size, tn))
    s = s.reshape(groups_per_tile * group_size, tn)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w * s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _qmm_stacked_kernel(layer_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                        group_size: int, groups_per_tile: int, n_k: int,
                        bits: int):
    """Layer-stacked variant: q_ref/s_ref blocks carry a leading layer dim
    selected by the prefetched layer index — the scan never slices (and so
    never copies) the stacked weights."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if bits == 4:
        w = unpack4(q_ref[0], group_size).astype(jnp.bfloat16)
    else:
        w = q_ref[0].astype(jnp.bfloat16)
    s = s_ref[0, 0, :groups_per_tile, :].astype(jnp.bfloat16)
    tn = s.shape[-1]
    s = jnp.broadcast_to(s[:, None, :], (groups_per_tile, group_size, tn))
    s = s.reshape(groups_per_tile * group_size, tn)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w * s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "block_k", "block_m", "block_n",
                     "interpret"))
def quant_matmul_stacked(
    x: jnp.ndarray,            # [M, K]
    q: jnp.ndarray,            # [L, K(/2), N] int8 (layer-stacked)
    scales_tiled: jnp.ndarray, # [L, n_k, srows, N] f32 (kernel layout)
    layer: jnp.ndarray,        # [] or [1] int32
    *,
    group_size: int,
    bits: int,
    block_k: int,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x @ dequant(q[layer])`` reading only layer ``layer``'s tiles from
    the stacked weight (BlockSpec indexing via scalar prefetch)."""
    M, K = x.shape
    L, _, N = q.shape
    pack = 2 if bits == 4 else 1
    block_m = min(block_m, max(8, M))
    block_n = min(block_n, N)
    assert K % block_k == 0 and block_k % group_size == 0, (K, block_k)
    n_k = K // block_k
    gpt = block_k // group_size
    srows = scales_tiled.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(M, block_m), pl.cdiv(N, block_n), n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, block_k // pack, block_n),
                         lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, 1, srows, block_n),
                         lambda m, n, k, lr: (lr[0], k, 0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda m, n, k, lr: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )

    kernel = functools.partial(_qmm_stacked_kernel, group_size=group_size,
                               groups_per_tile=gpt, n_k=n_k, bits=bits)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=int(M * K * 2 + K * N / pack + M * N * 2),
            transcendentals=0),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), x, q, scales_tiled)


# ---------------------------------------------------------------------------
# W4A8 / W8A8: int8 activations, per-group int8 x int8 MXU dots
# ---------------------------------------------------------------------------
# The bf16 kernels above dequantize the whole weight tile on the VPU
# (int->bf16 convert + [TK, TN] scale multiply) before a bf16 MXU dot; at
# decode batch sizes that VPU work IS the kernel floor (int4 measured at
# int8 speed, RESULTS r1). Here the weight tile is only unpacked to int8;
# each scale group contributes one int8xint8 MXU dot accumulated in int32,
# and the (row_scale x group_scale) dequant is applied to the tiny [M, TN]
# group result instead of the whole weight tile.


def _qmm_stacked_a8_kernel(layer_ref, x_ref, xs_ref, q_ref, s_ref, o_ref,
                           acc_ref, *, group_size: int, groups_per_tile: int,
                           n_k: int, bits: int):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    tn = q_ref.shape[-1]
    if bits == 4:
        w = unpack4(q_ref[0], group_size).reshape(
            groups_per_tile, group_size, tn)
    else:
        w = q_ref[0].reshape(groups_per_tile, group_size, tn)
    ws = s_ref[0, 0, :groups_per_tile, :]          # [gpt, TN] f32

    acc = acc_ref[...]
    for g in range(groups_per_tile):
        xg = x_ref[:, g * group_size:(g + 1) * group_size]     # [M, gs] int8
        r = jax.lax.dot_general(
            xg, w[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                  # [M, TN]
        scale = xs_ref[0, :, g][:, None] * ws[g][None, :]      # [M, TN]
        acc = acc + r.astype(jnp.float32) * scale
    acc_ref[...] = acc

    @pl.when(i == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _qmm_a8_fused_kernel(layer_ref, x_ref, nw_ref, q_ref, s_ref, o_ref,
                         acc_ref, xq_scr, xs_scr, *, group_size: int,
                         groups_per_tile: int, n_k: int, bits: int,
                         has_norm: bool, eps: float):
    """a8 matmul with the rmsnorm + activation-quantization PROLOGUE fused
    in: the first grid step normalizes and int8-quantizes the raw bf16
    activations into scratch (tiled per k-block so later steps index the
    leading scratch dim dynamically — no dynamic lane offsets), replacing
    two XLA dispatches per projection."""
    m = pl.program_id(0)
    n = pl.program_id(1)
    k = pl.program_id(2)
    gs = group_size

    @pl.when((m == 0) & (n == 0) & (k == 0))
    def _():
        x = x_ref[...].astype(jnp.float32)          # [Mp, K]
        if has_norm:
            var = jnp.mean(x * x, axis=-1, keepdims=True)
            x = x * jax.lax.rsqrt(var + eps) * nw_ref[0][None, :]
        for kb in range(n_k):
            for g2 in range(groups_per_tile):
                lo = (kb * groups_per_tile + g2) * gs
                seg = x[:, lo:lo + gs]
                s = jnp.maximum(
                    jnp.max(jnp.abs(seg), axis=-1, keepdims=True) / 127.0,
                    1e-10)
                xq_scr[kb, :, g2 * gs:(g2 + 1) * gs] = jnp.clip(
                    jnp.round(seg / s), -127, 127).astype(jnp.int8)
                xs_scr[kb, :, g2] = s[:, 0]

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    tn = q_ref.shape[-1]
    if bits == 4:
        w = unpack4(q_ref[0], gs).reshape(groups_per_tile, gs, tn)
    else:
        w = q_ref[0].reshape(groups_per_tile, gs, tn)
    ws = s_ref[0, 0, :groups_per_tile, :]

    acc = acc_ref[...]
    for g in range(groups_per_tile):
        xg = xq_scr[k, :, g * gs:(g + 1) * gs]
        r = jax.lax.dot_general(
            xg, w[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        scale = xs_scr[k, :, g][:, None] * ws[g][None, :]
        acc = acc + r.astype(jnp.float32) * scale
    acc_ref[...] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "block_k", "block_m", "block_n",
                     "has_norm", "eps", "out_dtype", "interpret"))
def quant_matmul_stacked_a8_fused(
    x: jnp.ndarray,            # [M, K] bf16/f32 RAW activations
    norm_w: jnp.ndarray,       # [K] f32 rmsnorm weight (ignored w/o has_norm)
    q: jnp.ndarray,            # [L, K(/2), N] int8 (layer-stacked)
    scales_tiled: jnp.ndarray, # [L, n_k, srows, N] f32
    layer: jnp.ndarray,
    *,
    group_size: int,
    bits: int,
    block_k: int,
    block_m: int = 256,
    block_n: int = 512,
    has_norm: bool = True,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``rmsnorm(x) @ dequant(q[layer])`` (or plain quantized matmul when
    ``has_norm`` is False) with in-kernel int8 activation quantization."""
    M, K = x.shape
    L, _, N = q.shape
    pack = 2 if bits == 4 else 1
    Mp = max(8, M)
    assert M <= 256, "prologue fusion assumes a single m-block"
    block_m = Mp
    block_n = min(block_n, N)
    assert K % block_k == 0 and block_k % group_size == 0, (K, block_k)
    n_k = K // block_k
    gpt = block_k // group_size
    srows = scales_tiled.shape[2]

    x_pad = x if M == Mp else jnp.zeros((Mp, K), x.dtype).at[:M].set(x)
    nw = jnp.asarray(norm_w, jnp.float32).reshape(1, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, pl.cdiv(N, block_n), n_k),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda m, n, k, lr: (0, 0)),
            pl.BlockSpec((1, K), lambda m, n, k, lr: (0, 0)),
            pl.BlockSpec((1, block_k // pack, block_n),
                         lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, 1, srows, block_n),
                         lambda m, n, k, lr: (lr[0], k, 0, n)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda m, n, k, lr: (0, n)),
        scratch_shapes=[
            pltpu.VMEM((Mp, block_n), jnp.float32),
            pltpu.VMEM((n_k, Mp, block_k), jnp.int8),
            pltpu.VMEM((n_k, Mp, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _qmm_a8_fused_kernel, group_size=group_size, groups_per_tile=gpt,
        n_k=n_k, bits=bits, has_norm=has_norm, eps=eps)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=int(M * K + K * N / pack + M * N * 2),
            transcendentals=0),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), x_pad, nw, q, scales_tiled)
    return out[:M]


def quantize_activations(x: jnp.ndarray, group_size: int
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(row, contraction-group) symmetric int8 activation quantization.

    x: ``[M, K]`` -> (q int8 ``[M, K]``, scales f32 ``[M, K // group_size]``).
    Runs as plain XLA ops right before the kernel call (tiny at decode
    batch sizes; XLA fuses the absmax/scale/round chain).
    """
    M, K = x.shape
    G = K // group_size
    g = x.astype(jnp.float32).reshape(M, G, group_size)
    absmax = jnp.max(jnp.abs(g), axis=-1)
    scales = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(g / scales[..., None]), -127, 127)
    return q.reshape(M, K).astype(jnp.int8), scales


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "block_k", "block_m", "block_n",
                     "out_dtype", "interpret"))
def quant_matmul_stacked_a8(
    x_q: jnp.ndarray,          # [M, K] int8 (pre-quantized activations)
    x_scales: jnp.ndarray,     # [M, K // group_size] f32
    q: jnp.ndarray,            # [L, K(/2), N] int8 (layer-stacked)
    scales_tiled: jnp.ndarray, # [L, n_k, srows, N] f32 (kernel layout)
    layer: jnp.ndarray,
    *,
    group_size: int,
    bits: int,
    block_k: int,
    block_m: int = 256,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``(x_q * x_scales) @ dequant(q[layer])`` with int8 MXU dots.

    Mathematically identical to dequantizing both operands first (the
    per-group factorization is exact); only f32 accumulation order differs.
    """
    M, K = x_q.shape
    L, _, N = q.shape
    pack = 2 if bits == 4 else 1
    block_m = min(block_m, max(8, M))
    block_n = min(block_n, N)
    assert K % block_k == 0 and block_k % group_size == 0, (K, block_k)
    n_k = K // block_k
    gpt = block_k // group_size
    srows = scales_tiled.shape[2]

    # Retile activation scales to [n_k, M, 128] so each k-tile's block is
    # lane-aligned (gpt <= 16 used lanes; DMA lane slices must be 128-wide).
    xs_tiled = jnp.zeros((n_k, M, 128), jnp.float32)
    xs_tiled = xs_tiled.at[:, :, :gpt].set(
        x_scales.reshape(M, n_k, gpt).transpose(1, 0, 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(M, block_m), pl.cdiv(N, block_n), n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, block_m, 128), lambda m, n, k, lr: (k, m, 0)),
            pl.BlockSpec((1, block_k // pack, block_n),
                         lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, 1, srows, block_n),
                         lambda m, n, k, lr: (lr[0], k, 0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda m, n, k, lr: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )

    kernel = functools.partial(_qmm_stacked_a8_kernel, group_size=group_size,
                               groups_per_tile=gpt, n_k=n_k, bits=bits)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=int(M * K + K * N / pack + M * N * 2),
            transcendentals=0),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), x_q, xs_tiled, q,
      scales_tiled)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "block_m", "block_n", "block_k",
                     "interpret"))
def quant_matmul(
    x: jnp.ndarray,          # [M, K] bf16/f32
    q: jnp.ndarray,          # [K, N] int8, or [K/2, N] nibble-packed int4
    scales: jnp.ndarray,     # [K // group_size, N] f32
    *,
    group_size: int,
    bits: int = 8,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    N = q.shape[1]
    pack = 2 if bits == 4 else 1
    block_m = min(block_m, max(8, M))
    block_k = min(block_k, K)
    block_n = min(block_n, N)
    assert K % block_k == 0 and block_k % group_size == 0, (K, block_k)
    n_k = K // block_k

    grid = (pl.cdiv(M, block_m), pl.cdiv(N, block_n), n_k)

    # Retile scales to [n_k, srows(=8 multiple), N] so each k-tile's block
    # is sublane-legal (scales are tiny; this copy is noise).
    gpt = block_k // group_size
    srows = -(-gpt // 8) * 8
    s_tiled = jnp.zeros((n_k, srows, N), scales.dtype)
    s_tiled = s_tiled.at[:, :gpt].set(scales.reshape(n_k, gpt, N))

    kernel = functools.partial(_qmm_kernel, group_size=group_size,
                               groups_per_tile=gpt, n_k=n_k, bits=bits)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda m, n, k: (m, k)),
            pl.BlockSpec((block_k // pack, block_n), lambda m, n, k: (k, n)),
            pl.BlockSpec((1, srows, block_n), lambda m, n, k: (k, 0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * 2 + K * N + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, q, s_tiled)
    return out
