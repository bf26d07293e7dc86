"""Fused W4A8 Mixture-of-Experts block: the whole routed post-attention
half of a decoder layer in ONE kernel launch.

The naive quantized MoE decode (models/moe.py::moe_mlp_quant) costs
2 kernel launches per selected expert — 16 launches/layer for OLMoE's
top-8, and decode at M<=8 is launch-overhead-bound (RESULTS.md r2). This
kernel runs a (I_tile, slot_group) grid over the SAME expert weight
stacks, with the expert ids delivered as a scalar-prefetch vector
(``idx[j] = layer*E + expert_j``) so each slot's BlockSpec DMAs that
expert's weight tiles directly from the ``[L*E, ...]`` stack:

    step (0, 0):  resid = attn_out + hid; rmsnorm; int8-quantize -> scratch
    step (i, j):  for s in range(S):           # S slots per grid step
                      a    = silu(x @ Wg[idx_{jS+s}, :, t])
                             * (x @ Wu[idx_{jS+s}, :, t])
                      acc += wts[:, jS+s] * (quant(a) @ Wd[idx_{jS+s}, t, :])
    last step:    out = resid + acc

MEASUREMENT CAVEAT THAT REFRAMED THIS KERNEL (r5,
tools/probe_moe_step_overhead.py): a STANDALONE jitted pallas_call on the
axon rig costs ~1.45 ms per dispatch regardless of grid length — an empty
1-step kernel and an empty 192-step kernel time identically. Every
"us/slot" number from standalone-call probes (r4's elision probe, the r5
multi-slot sweep) was that dispatch floor divided by slot count; only
IN-JIT timings (tools/probe_moe_injit.py, scan-chained launches, slope
over chain length) and end-to-end benches are trusted here.

Two exact levers landed in r5 (e2e: deepseek-v2-lite b8 275.3 -> 300.7,
OLMoE b8 1052 -> 1100.8, deepseek TTFT 132.6 -> 98.4 ms):

* COMPUTE DEDUP: sorted-assignment puts duplicate expert ids in adjacent
  slots; the kernel computes the expert part into a scratch once per RUN
  of equal ids and only re-applies per-slot routing weights (b8 x top-6
  over 64 experts routes ~34 unique experts; trailing pad slots repeat
  the last id and skip compute entirely).
* MERGED GATE|UP DOT (n_tiles == 1, the deepseek/OLMoE shapes): gate and
  up arrive as ONE [K/pack, 2*I] block and ride one double-width dot
  chain — half the dot issues of separate chains.

MULTI-SLOT (``slots_per_step`` = S > 1) showed no standalone win and is
kept only for probing (``MVT_MOE_SLOTS``); the caller defaults to S=1.
The DMA roofline (expert-union bytes at ~695 GB/s: deepseek b8 ~211
us/layer, OLMoE ~184) is the target the in-jit probe tracks.

Weighting modes (all exact):
* GATHER (decode, one row): ``idx`` = the top-k selected experts,
  ``wts[0, j]`` = routing weight of slot j — only k/E of the expert
  bytes are ever read from HBM;
* SORTED-ASSIGNMENT (batched decode, rows*k <= 128 slots): ``idx`` = the
  flattened (row, choice) expert ids SORTED ascending, ``wts[m, j]`` =
  row m's weight if slot j is row m's assignment else 0. Sorting keeps
  duplicate experts adjacent so their weight blocks coalesce (same-
  block-index pipeline reuse at S=1; within a multi-slot step the DMAs
  are simply issued together);
* SWEEP (batched rows, rows*k > 128 lanes): ``idx`` = all E experts,
  ``wts[m, j]`` = row m's routing weight for expert j (zero if
  unselected) — each expert's weights are read exactly once per layer.

Routing (router matmul + top_k) runs outside in jnp on a recomputed
norm of the residual — the kernel re-derives the identical norm
internally, so the launch-count win costs one [M, H] VPU norm.

The reference has no MoE at all (dense qwen2 only); HF semantics
anchored via tests/test_hf_differential.py (mixtral, olmoe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microvllm_tpu.ops.pallas.fused_mlp import _group_dots
from microvllm_tpu.ops.pallas.unpack import unpack4


def _slot_part(x_q, xs, qg_ref, qu_ref, sg_ref, su_ref, qd_ref, sd_ref, *,
               gs: int, bits: int, gpt: int, merged: bool):
    """One expert slot's SwiGLU MLP on the shared quantized activations:
    ``quant(silu(x@Wg) * (x@Wu)) @ Wd`` with per-128-group output
    rescaling; returns the [Mp, H] f32 partial (pre routing weight).

    ``merged`` (n_tiles == 1): qg_ref IS the whole [K/pack, 2*I] gate|up
    row and qu_ref is None — gate and up ride ONE dot chain of double
    width (half the short-M dot issues, the measured per-slot floor at
    decode batch sizes)."""
    def xrow(g):
        return xs[:, g][:, None]

    def wrow(ref):
        return lambda g: ref[0, g // gpt, g % gpt][None, :]

    if merged:
        w = unpack4(qg_ref[0], gs) if bits == 4 else qg_ref[0]
        out = _group_dots(x_q, w, xrow, wrow(sg_ref), gs)   # [Mp, 2*TI]
        ti = out.shape[-1] // 2
        g_acc, u_acc = out[:, :ti], out[:, ti:]
    else:
        if bits == 4:
            wg = unpack4(qg_ref[0], gs)
            wu = unpack4(qu_ref[0], gs)
        else:
            wg = qg_ref[0]
            wu = qu_ref[0]
        g_acc = _group_dots(x_q, wg, xrow, wrow(sg_ref), gs)
        u_acc = _group_dots(x_q, wu, xrow, wrow(su_ref), gs)
    a = g_acc * jax.nn.sigmoid(g_acc) * u_acc        # silu(g)*u, [Mp, TI]

    a_absmax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
    a_s = jnp.maximum(a_absmax / 127.0, 1e-10)
    a_q = jnp.clip(jnp.round(a / a_s), -127, 127).astype(jnp.int8)

    if bits == 4:
        wd = unpack4(qd_ref[0], gs)
    else:
        wd = qd_ref[0]
    return _group_dots(
        a_q, wd, lambda g: a_s, lambda g: sd_ref[0, 0, g][None, :], gs)


def _fused_moe_kernel(idx_ref, attn_ref, hid_ref, nw_ref, wts_ref, *refs,
                      group_size: int, bits: int, K: int, TI: int, H: int,
                      n_tiles: int, n_groups: int, S: int, eps: float,
                      add_resid: bool, merged: bool):
    # refs = S x (qgu, sgu, qd, sd) [merged] or S x (qg, qu, sg, su, qd,
    # sd), then o_ref, acc_ref, xq_scr, xs_scr, part_scr
    per_slot = 4 if merged else 6
    o_ref, acc_ref, xq_scr, xs_scr, part_scr = refs[per_slot * S:]
    i = pl.program_id(0)          # intermediate tile
    j = pl.program_id(1)          # slot GROUP (S slots each)
    gs = group_size
    G_k = K // gs

    @pl.when((j == 0) & (i == 0))
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

    s_ref0 = refs[1] if merged else refs[2]
    gpt = G_k // s_ref0.shape[1]
    x_q = xq_scr[...]
    xs = xs_scr[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, wts_ref.shape, 1)
    wts = wts_ref[...]

    for s in range(S):
        t = j * S + s
        # COMPUTE DEDUP: sorted-assignment batches put duplicate expert
        # ids in adjacent slots; the expert part (unpack + all dots) is
        # identical across them — only the per-slot routing weights
        # differ. Recompute into part_scr only when this slot's expert
        # differs from the previous slot's (the r5 dup-vs-unique probe
        # proved per-slot COMPUTE, not DMA, is the batched-MoE floor:
        # all-dup 22.0 us/slot vs all-unique 24.2 — eliding DMA alone
        # saves 9%; skipping the compute makes dup slots ~free).
        fresh = (idx_ref[jnp.maximum(t - 1, 0)] != idx_ref[t])
        if s == 0:
            fresh = fresh | (j == 0)   # first slot of the i-tile sweep

        def _compute(_s=s):
            r = refs[per_slot * _s:per_slot * (_s + 1)]
            if merged:
                r = (r[0], None, r[1], None, r[2], r[3])
            part_scr[...] = _slot_part(x_q, xs, *r, gs=gs, bits=bits,
                                       gpt=gpt, merged=merged)
        pl.when(fresh)(_compute)
        # slot t's routing weight: dynamic LANE indexing is not
        # lowerable (Mosaic requires static 128-multiples), so select via
        # a lane mask
        w_s = jnp.sum(jnp.where(lane == t, wts, 0.0), axis=1,
                      keepdims=True)                          # [Mp, 1]
        acc_ref[...] += w_s * part_scr[...]

    @pl.when((i == n_tiles - 1) & (j == n_groups - 1))
    def _():
        if add_resid:
            resid = (attn_ref[...].astype(jnp.float32)
                     + hid_ref[...].astype(jnp.float32))
            o_ref[...] = (resid + acc_ref[...]).astype(o_ref.dtype)
        else:
            # pre-psum mode (expert parallelism): emit only this rank's
            # expert contributions; the caller adds resid AFTER the psum
            # so the residual isn't multiplied by the rank count
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bits", "tile_i", "eps", "out_dtype",
                     "interpret", "add_resid", "slots_per_step"))
def fused_moe_block(
    attn_out: jnp.ndarray,       # [M, H] (o-proj output)
    hid: jnp.ndarray,            # [M, H] (layer input / residual)
    norm_w: jnp.ndarray,         # [H] mlp rmsnorm weight
    idx: jnp.ndarray,            # [n_slots] int32: layer*E + expert ids
    wts: jnp.ndarray,            # [M, n_slots] f32 routing weights
    q_gu: jnp.ndarray,           # [L*E, K(/2), 2*I] int8 (gate|up stacks)
    s_gu_tiled: jnp.ndarray,
    q_dn: jnp.ndarray,           # [L*E, I(/2), H] int8 (down stacks)
    s_dn_tiled: jnp.ndarray,
    *,
    group_size: int,
    bits: int,
    tile_i: int = 512,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    add_resid: bool = True,
    slots_per_step: int = 1,
) -> jnp.ndarray:
    """``resid + sum_j wts[:, j] * expert_{idx[j]}(rmsnorm(resid))`` where
    ``resid = attn_out + hid`` — the routed post-attention half of a
    decoder layer in one launch.

    ``slots_per_step`` (S) packs S slots into each grid step (must divide
    ``n_slots``; pad with repeated ids + zero weights) — the batched-MoE
    per-step-latency amortization (see module docstring).

    ``add_resid=False`` returns only the weighted expert sum (for expert
    parallelism, where the caller psums rank contributions before adding
    the residual once)."""
    M, K = attn_out.shape
    n_slots = idx.shape[0]
    S = slots_per_step
    assert n_slots <= 128, "routing weights ride one 128-lane vector"
    assert n_slots % S == 0, (n_slots, S)
    n_groups = n_slots // S
    LE, _, two_i = q_gu.shape
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
    # routing weights: [Mp, 128] lane-padded (slot j in lane j)
    wp = jnp.zeros((Mp, 128), jnp.float32).at[:M, :n_slots].set(
        wts.astype(jnp.float32))

    # Slot axis INNER so sorted-assignment batches (duplicate adjacent
    # expert ids) reuse the previous slot's weight blocks at S=1 (the
    # pipeline skips a copy whose block index is unchanged from the
    # immediately preceding step) AND skip the expert compute entirely
    # (part_scr dedup in the kernel).
    #
    # merged (n_tiles == 1, the deepseek/OLMoE shapes): gate|up ride ONE
    # [K/pack, 2*TI] block and one double-width dot chain — half the
    # short-M dot issues that floor batched decode.
    merged = n_tiles == 1
    slot_specs, slot_args = [], []
    for s in range(S):
        def ga(i, j, ix, _s=s):
            return (ix[j * S + _s], 0, i)

        def ua(i, j, ix, _s=s, _n=n_tiles):
            return (ix[j * S + _s], 0, _n + i)

        def sa(i, j, ix, _s=s):
            return (ix[j * S + _s], 0, 0, i)

        def sua(i, j, ix, _s=s, _n=n_tiles):
            return (ix[j * S + _s], 0, 0, _n + i)

        def da(i, j, ix, _s=s):
            return (ix[j * S + _s], i, 0)

        def dsa(i, j, ix, _s=s):
            return (ix[j * S + _s], i, 0, 0)

        if merged:
            slot_specs += [
                # whole gate|up row [K/pack, 2*I] of expert idx[j*S+s]
                pl.BlockSpec((1, K // pack, 2 * TI), ga),
                pl.BlockSpec((1, n_kg, srows, 2 * TI), sa),
                pl.BlockSpec((1, TI // pack, H), da),
                pl.BlockSpec((1, 1, srows_d, H), dsa),
            ]
            slot_args += [q_gu, s_gu_tiled, q_dn, s_dn_tiled]
        else:
            slot_specs += [
                # gate columns [i*TI, (i+1)*TI) of expert idx[j*S+s]
                pl.BlockSpec((1, K // pack, TI), ga),
                # up columns [I + i*TI, ...): block index n_tiles + i
                pl.BlockSpec((1, K // pack, TI), ua),
                pl.BlockSpec((1, n_kg, srows, TI), sa),
                pl.BlockSpec((1, n_kg, srows, TI), sua),
                pl.BlockSpec((1, TI // pack, H), da),
                pl.BlockSpec((1, 1, srows_d, H), dsa),
            ]
            slot_args += [q_gu, q_gu, s_gu_tiled, s_gu_tiled, q_dn,
                          s_dn_tiled]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_groups),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i, j, ix: (0, 0)),
            pl.BlockSpec((Mp, K), lambda i, j, ix: (0, 0)),
            pl.BlockSpec((1, K), lambda i, j, ix: (0, 0)),
            pl.BlockSpec((Mp, 128), lambda i, j, ix: (0, 0)),
        ] + slot_specs,
        out_specs=pl.BlockSpec((Mp, H), lambda i, j, ix: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Mp, H), jnp.float32),
            pltpu.VMEM((Mp, K), jnp.int8),
            pltpu.VMEM((Mp, 128), jnp.float32),
            pltpu.VMEM((Mp, H), jnp.float32),   # part_scr (compute dedup)
        ],
    )

    kernel = functools.partial(
        _fused_moe_kernel, group_size=group_size, bits=bits, K=K, TI=TI,
        H=H, n_tiles=n_tiles, n_groups=n_groups, S=S, eps=eps,
        add_resid=add_resid, merged=merged)
    # S weight-block sets are double-buffered and the unpacked int8 copies
    # live on the kernel stack — raise Mosaic's 16 MB default scoped-VMEM
    # cap to fit (int8 stacks and the part_scr pushed the S=1 int4 shape
    # over 16 MB too)
    slot_block_bytes = ((K // pack) * TI * 2 + (TI // pack) * H
                        + 4 * (2 * n_kg * srows * TI + srows_d * H))
    unpacked_bytes = (K * TI * 2 + TI * H) if bits == 4 else 0
    vmem_limit = min(110 << 20,
                     2 * S * slot_block_bytes + unpacked_bytes + (24 << 20))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, H), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n_slots * (K * 2 * I + I * H),
            bytes_accessed=int(n_slots * (K * 2 * I + I * H) / pack
                               + 4 * M * K),
            transcendentals=M * (n_slots * I + K),
        ),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32), pad(attn_out), pad(hid), nw, wp,
      *slot_args)
    return out[:M]
