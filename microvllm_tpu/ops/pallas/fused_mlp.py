"""Fused W4A8 MLP: gate/up matmul + SwiGLU + down matmul in ONE kernel.

The decode step is launch-overhead-bound after W4A8 (RESULTS.md r2): at
M<=8 rows each projection kernel costs more in fixed dispatch than in
HBM reads. This kernel streams one intermediate tile `TI` per grid step:

    g = x @ Wg[:, t]        (int8 MXU dots per 128-group, output-scaled)
    u = x @ Wu[:, t]
    a = silu(g) * u         (f32, VPU)
    a_q, a_s = quantize(a)  (per-row per-TI-tile int8)
    acc += a_q @ Wd[t, :]   (int8 MXU dots per 128-group, output-scaled)

so the [M, I] intermediate never touches HBM, SwiGLU is free, and three
kernel launches + two XLA glue ops collapse into one launch. Weight traffic
is identical to the separate kernels (each tile read exactly once).

Covers the reference's Triton `swiglu_gemm` chain
(`kernel/swiglu.py`, `core/layer/model_graph.py:174-186`) in fused form.

Activation re-quantization uses ONE scale per (row, TI-tile): the
contraction supergroup factorization out_scale = a_s(row) * w_s(group)
stays exact because every 128-weight-group lies inside one TI tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microvllm_tpu.ops.pallas.unpack import unpack4


def _unpack4(p, group_size: int, rows: int, cols: int):
    """Nibble-packed [rows/2, cols] int8 -> [rows, cols] int8 (group-local
    split, see `ops/quant.py::pack_int4_rows`; impl in pallas/unpack.py)."""
    return unpack4(p, group_size)


def _group_dots(x_q, w, row_scale_fn, w_scale_fn, group_size: int):
    """sum_g (x_q[:, g] @ w[g]) * (row_scale_fn(g) * w_scale_fn(g)).

    x_q: [M, K] int8; w: [K, N] int8; row_scale_fn(g) -> [M, 1] f32;
    w_scale_fn(g) -> [1, N] f32. Returns [M, N] f32.
    """
    K = x_q.shape[1]
    G = K // group_size
    acc = None
    for g in range(G):
        xg = x_q[:, g * group_size:(g + 1) * group_size]
        wg = w[g * group_size:(g + 1) * group_size, :]
        r = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        term = r.astype(jnp.float32) * (row_scale_fn(g) * w_scale_fn(g))
        acc = term if acc is None else acc + term
    return acc


def _fused_mlp_kernel(layer_ref, x_ref, xs_ref, qg_ref, qu_ref, sg_ref,
                      su_ref, qd_ref, sd_ref, o_ref, acc_ref, *,
                      group_size: int, bits: int, K: int, TI: int, H: int,
                      n_tiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    G_k = K // group_size
    gpt = G_k // sg_ref.shape[1]         # groups per k-tile of the scales

    if bits == 4:
        wg = _unpack4(qg_ref[0], group_size, K, TI)
        wu = _unpack4(qu_ref[0], group_size, K, TI)
    else:
        wg = qg_ref[0]
        wu = qu_ref[0]

    x_q = x_ref[...]                     # [Mp, K] int8
    xs = xs_ref[...]                     # [Mp, 128] f32 (first G_k lanes)

    def xrow(g):
        return xs[:, g][:, None]

    def wrow(ref):
        # scales live as [n_kg, srows, TI]; group g sits at [g//gpt, g%gpt]
        return lambda g: ref[0, g // gpt, g % gpt][None, :]

    g_acc = _group_dots(x_q, wg, xrow, wrow(sg_ref), group_size)
    u_acc = _group_dots(x_q, wu, xrow, wrow(su_ref), group_size)

    a = g_acc * jax.nn.sigmoid(g_acc) * u_acc        # silu(g) * u, [Mp, TI]

    # re-quantize per (row, TI tile)
    a_absmax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)   # [Mp, 1]
    a_s = jnp.maximum(a_absmax / 127.0, 1e-10)
    a_q = jnp.clip(jnp.round(a / a_s), -127, 127).astype(jnp.int8)

    if bits == 4:
        wd = _unpack4(qd_ref[0], group_size, TI, H)
    else:
        wd = qd_ref[0]
    acc_ref[...] += _group_dots(
        a_q, wd, lambda g: a_s, lambda g: sd_ref[0, 0, g][None, :],
        group_size)

    @pl.when(i == n_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _fused_mlp_resid_kernel(layer_ref, attn_ref, hid_ref, nw_ref, qg_ref,
                            qu_ref, sg_ref, su_ref, qd_ref, sd_ref, o_ref,
                            acc_ref, xq_scr, xs_scr, *, group_size: int,
                            bits: int, K: int, TI: int, H: int,
                            n_tiles: int, eps: float,
                            add_residual: bool = True):
    """Full MLP block in one kernel: the first grid step computes
    ``resid = attn_out + hid``, rmsnorms it, and int8-quantizes into
    scratch; the last step emits ``resid + mlp`` — the whole
    post-attention half of a decoder layer is one launch.

    ``add_residual=False`` emits just the down-projection output (still
    normed over the replicated resid): under tensor parallelism the down
    matmul is row-parallel, so the caller must psum the partial across
    ranks BEFORE adding the residual (`ops/linear.py::fused_mlp_block`).
    """
    i = pl.program_id(0)
    gs = group_size
    G_k = K // gs

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        r = (attn_ref[...].astype(jnp.float32)
             + hid_ref[...].astype(jnp.float32))
        var = jnp.mean(r * r, axis=-1, keepdims=True)
        x = r * jax.lax.rsqrt(var + eps) * nw_ref[0][None, :]
        for g in range(G_k):
            seg = x[:, g * gs:(g + 1) * gs]
            s = jnp.maximum(
                jnp.max(jnp.abs(seg), axis=-1, keepdims=True) / 127.0,
                1e-10)
            xq_scr[:, g * gs:(g + 1) * gs] = jnp.clip(
                jnp.round(seg / s), -127, 127).astype(jnp.int8)
            xs_scr[:, g] = s[:, 0]

    gpt = G_k // sg_ref.shape[1]

    if bits == 4:
        wg = _unpack4(qg_ref[0], gs, K, TI)
        wu = _unpack4(qu_ref[0], gs, K, TI)
    else:
        wg = qg_ref[0]
        wu = qu_ref[0]

    x_q = xq_scr[...]
    xs = xs_scr[...]

    def xrow(g):
        return xs[:, g][:, None]

    def wrow(ref):
        return lambda g: ref[0, g // gpt, g % gpt][None, :]

    g_acc = _group_dots(x_q, wg, xrow, wrow(sg_ref), gs)
    u_acc = _group_dots(x_q, wu, xrow, wrow(su_ref), gs)
    a = g_acc * jax.nn.sigmoid(g_acc) * u_acc

    a_absmax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
    a_s = jnp.maximum(a_absmax / 127.0, 1e-10)
    a_q = jnp.clip(jnp.round(a / a_s), -127, 127).astype(jnp.int8)

    if bits == 4:
        wd = _unpack4(qd_ref[0], gs, TI, H)
    else:
        wd = qd_ref[0]
    acc_ref[...] += _group_dots(
        a_q, wd, lambda g: a_s, lambda g: sd_ref[0, 0, g][None, :], gs)

    @pl.when(i == n_tiles - 1)
    def _():
        if add_residual:
            resid = (attn_ref[...].astype(jnp.float32)
                     + hid_ref[...].astype(jnp.float32))
            o_ref[...] = (resid + acc_ref[...]).astype(o_ref.dtype)
        else:
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "tile_i", "eps", "out_dtype",
                     "add_residual", "interpret"))
def fused_mlp_block(
    attn_out: jnp.ndarray,       # [M, H] bf16 (o-proj output)
    hid: jnp.ndarray,            # [M, H] bf16 (layer input / residual)
    norm_w: jnp.ndarray,         # [H] mlp rmsnorm weight
    q_gu: jnp.ndarray,           # [L, K(/2), 2*I] int8 (stacked gate|up)
    s_gu_tiled: jnp.ndarray,
    q_dn: jnp.ndarray,           # [L, I(/2), H] int8 (stacked down)
    s_dn_tiled: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    group_size: int,
    bits: int,
    tile_i: int = 512,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    add_residual: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """``resid + swiglu_mlp(rmsnorm(resid))`` where ``resid = attn_out +
    hid`` — one launch for the entire post-attention half of the layer.
    With ``add_residual=False`` returns only the down-matmul output (a
    per-rank partial under row-parallel TP; psum then add resid outside)."""
    M, K = attn_out.shape
    L, _, two_i = q_gu.shape
    I = two_i // 2
    H = q_dn.shape[2]
    assert H == K
    pack = 2 if bits == 4 else 1
    TI = min(tile_i, I)
    assert I % TI == 0 and TI % group_size == 0 and K % group_size == 0
    n_tiles = I // TI
    n_kg, srows = s_gu_tiled.shape[1], s_gu_tiled.shape[2]
    n_kd, srows_d = s_dn_tiled.shape[1], s_dn_tiled.shape[2]
    assert I // n_kd == TI, "down block_k must equal tile_i"
    assert K // group_size <= 128

    Mp = max(8, M)

    def pad(z):
        return z if M == Mp else jnp.zeros((Mp, K), z.dtype).at[:M].set(z)

    nw = jnp.asarray(norm_w, jnp.float32).reshape(1, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i, lr: (0, 0)),
            pl.BlockSpec((Mp, K), lambda i, lr: (0, 0)),
            pl.BlockSpec((1, K), lambda i, lr: (0, 0)),
            pl.BlockSpec((1, K // pack, TI), lambda i, lr: (lr[0], 0, i)),
            pl.BlockSpec((1, K // pack, TI),
                         lambda i, lr, _n=n_tiles: (lr[0], 0, _n + i)),
            pl.BlockSpec((1, n_kg, srows, TI), lambda i, lr: (lr[0], 0, 0, i)),
            pl.BlockSpec((1, n_kg, srows, TI),
                         lambda i, lr, _n=n_tiles: (lr[0], 0, 0, _n + i)),
            pl.BlockSpec((1, TI // pack, H), lambda i, lr: (lr[0], i, 0)),
            pl.BlockSpec((1, 1, srows_d, H), lambda i, lr: (lr[0], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, H), lambda i, lr: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Mp, H), jnp.float32),
            pltpu.VMEM((Mp, K), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _fused_mlp_resid_kernel, group_size=group_size, bits=bits, K=K,
        TI=TI, H=H, n_tiles=n_tiles, eps=eps, add_residual=add_residual)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, H), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (K * 2 * I + I * H),
            bytes_accessed=int((K * 2 * I + I * H) / pack + 4 * M * K),
            transcendentals=M * (I + K),
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), pad(attn_out), pad(hid), nw,
      q_gu, q_gu, s_gu_tiled, s_gu_tiled, q_dn, s_dn_tiled)
    return out[:M]


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "tile_i", "out_dtype",
                     "interpret"))
def fused_mlp_a8(
    x_q: jnp.ndarray,            # [M, K] int8 (pre-quantized, post-norm)
    x_scales: jnp.ndarray,       # [M, K // group_size] f32
    q_gu: jnp.ndarray,           # [L, K(/2), 2*I] int8 (stacked gate|up)
    s_gu_tiled: jnp.ndarray,     # [L, n_kg, srows, 2*I] f32
    q_dn: jnp.ndarray,           # [L, I(/2), H] int8 (stacked down)
    s_dn_tiled: jnp.ndarray,     # [L, n_kd, srows_d, H] f32
    layer: jnp.ndarray,
    *,
    group_size: int,
    bits: int,
    tile_i: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``swiglu((x@Wg), (x@Wu)) @ Wd`` for layer ``layer`` of the stacks."""
    M, K = x_q.shape
    L, _, two_i = q_gu.shape
    I = two_i // 2
    H = q_dn.shape[2]
    pack = 2 if bits == 4 else 1
    TI = min(tile_i, I)
    assert I % TI == 0 and TI % group_size == 0, (I, TI, group_size)
    assert K % group_size == 0
    n_tiles = I // TI
    n_kg, srows = s_gu_tiled.shape[1], s_gu_tiled.shape[2]
    n_kd, srows_d = s_dn_tiled.shape[1], s_dn_tiled.shape[2]
    bk_d = I // n_kd                 # down's contraction tile (block_k)
    assert bk_d % TI == 0 or TI % bk_d == 0
    G_d = TI // group_size
    assert srows_d >= G_d or bk_d >= TI, (srows_d, G_d)
    # down scale block: grab the k-tile(s) covering this TI tile. Simplest
    # when bk_d == TI; for bk_d > TI we'd need an offset — enforce equality.
    assert bk_d == TI, (
        f"down block_k {bk_d} must equal tile_i {TI}; requantize with "
        f"block_k={TI} or pass tile_i={bk_d}")

    Mp = max(8, M)
    xs_pad = jnp.zeros((Mp, 128), jnp.float32)
    xs_pad = xs_pad.at[:M, :K // group_size].set(x_scales)
    x_pad = jnp.zeros((Mp, K), jnp.int8).at[:M].set(x_q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i, lr: (0, 0)),
            pl.BlockSpec((Mp, 128), lambda i, lr: (0, 0)),
            # gate columns [i*TI, (i+1)*TI)
            pl.BlockSpec((1, K // pack, TI), lambda i, lr: (lr[0], 0, i)),
            # up columns [I + i*TI, ...): block index I//TI + i
            pl.BlockSpec((1, K // pack, TI),
                         lambda i, lr, _n=n_tiles: (lr[0], 0, _n + i)),
            pl.BlockSpec((1, n_kg, srows, TI), lambda i, lr: (lr[0], 0, 0, i)),
            pl.BlockSpec((1, n_kg, srows, TI),
                         lambda i, lr, _n=n_tiles: (lr[0], 0, 0, _n + i)),
            pl.BlockSpec((1, TI // pack, H), lambda i, lr: (lr[0], i, 0)),
            pl.BlockSpec((1, 1, srows_d, H), lambda i, lr: (lr[0], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, H), lambda i, lr: (0, 0)),
        scratch_shapes=[pltpu.VMEM((Mp, H), jnp.float32)],
    )

    kernel = functools.partial(
        _fused_mlp_kernel, group_size=group_size, bits=bits, K=K, TI=TI,
        H=H, n_tiles=n_tiles)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, H), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (K * 2 * I + I * H),
            bytes_accessed=int((K * 2 * I + I * H) / pack + M * K + M * H * 2),
            transcendentals=M * I,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32), x_pad, xs_pad, q_gu, q_gu,
      s_gu_tiled, s_gu_tiled, q_dn, s_dn_tiled)
    return out[:M]
