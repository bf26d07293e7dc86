"""Linear projection with transparent quantized-weight dispatch.

Plain weights go straight to the MXU. Quantized weights dispatch to the
Pallas fused dequant-matmul on TPU (no bf16 weight materialization); the
jnp fallback dequantizes grouped so XLA can fuse the scale multiply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import QuantizedTensor


def _pallas_block_k(K: int, group_size: int) -> int:
    best = group_size
    for mult in range(min(512 // group_size, K // group_size), 0, -1):
        if K % (mult * group_size) == 0:
            best = mult * group_size
            break
    return best


def _wide_block_n(rows: int) -> int:
    """N-tile width for wide-N matmuls (lm_head). Sweepable on TPU via
    MVT_WIDE_BLOCK_N (lm_head measured 75% of roofline at 2048 in r2 —
    bigger tiles amortize per-step overhead, bounded by VMEM). Applies at
    decode-size m only: the wide path also serves the prefill gate_up
    (N=2I >= 32k on 7B), where a [256, block_n] accumulator plus the
    double-buffered weight block blows the 16 MB scoped-VMEM limit above
    block_n 2048."""
    import os

    block_n = int(os.environ.get("MVT_WIDE_BLOCK_N", "2048"))
    if rows > 64:
        # Prefill-size m: clamp (not ignore) the sweep override so VMEM-safe
        # smaller tiles still apply to the prefill gate_up path.
        return min(block_n, 2048)
    return block_n


def _quant_linear(x: jnp.ndarray, w: QuantizedTensor, layer) -> jnp.ndarray:
    import os

    from .attention import use_pallas

    K, N = w.in_dim, w.out_dim
    lead = x.shape[:-1]
    # auto: W4A8 for int4 (e2e 77.5 vs 72.8 tok/s at 7B, RESULTS.md); int8
    # keeps the bf16-dequant kernel (already 93% of its HBM roofline).
    mode = os.environ.get("MVT_QMM", "auto")
    if mode == "auto":
        mode = "a8" if w.bits == 4 else "pallas"
    if use_pallas() and mode != "xla":
        # Tile widths: narrow projections (qkv/o) take the whole N in one
        # tile at decode-size m — per-grid-step overhead dominates their
        # tiny DMA blocks otherwise; wide-N (lm_head) uses big tiles for
        # the same reason. At prefill-size m the [block_m, N] accumulator
        # would blow the 16 MB scoped-VMEM limit, so tile normally.
        rows = 1
        for d in lead:
            rows *= d
        block_n = (N if (N <= 6144 and rows <= 64)
                   else (_wide_block_n(rows) if N >= 32768 else 512))
        if w.stacked or (mode == "a8" and w.scales_tiled is not None):
            if mode == "a8":
                # W4A8/W8A8: int8 activations -> int8 MXU dots per scale
                # group; removes the VPU full-tile dequant floor. Non-stacked
                # weights (lm_head) ride the same kernel as a 1-layer stack
                # (the leading-dim reshape is a free bitcast).
                from .pallas.quant_matmul import (quant_matmul_stacked_a8,
                                                  quantize_activations)
                if w.stacked:
                    assert layer is not None, "stacked weight needs layer"
                    q, st = w.q, w.scales_tiled
                else:
                    q, st = w.q[None], w.scales_tiled[None]
                    layer = jnp.int32(0)
                x2 = x.reshape(-1, K)
                x_q, x_s = quantize_activations(x2, w.group_size)
                y = quant_matmul_stacked_a8(
                    x_q, x_s, q, st, layer,
                    group_size=w.group_size, bits=w.bits, block_k=w.block_k,
                    block_n=block_n, out_dtype=x.dtype)
                return y.reshape(*lead, N)
            assert layer is not None, "stacked quantized weight needs layer"
            from .pallas.quant_matmul import quant_matmul_stacked

            y = quant_matmul_stacked(
                x.reshape(-1, K), w.q, w.scales_tiled, layer,
                group_size=w.group_size, bits=w.bits, block_k=w.block_k,
                block_n=block_n)
            return y.reshape(*lead, N)
        from .pallas.quant_matmul import quant_matmul

        y = quant_matmul(x.reshape(-1, K), w.q, w.scales,
                         group_size=w.group_size, bits=w.bits,
                         block_k=w.block_k or _pallas_block_k(K, w.group_size),
                         block_n=block_n)
        return y.reshape(*lead, N)
    if w.stacked:
        # slice the layer's leaves first (one-layer gather), then dequant
        w = QuantizedTensor(q=w.q[layer], scales=w.scales[layer],
                            bits=w.bits, group_size=w.group_size)
    return jnp.einsum("...i,io->...o", x, w.dequant(x.dtype))


def _a8_fusion_ok(*ws) -> bool:
    import os

    from .attention import use_pallas
    from .quant import QuantizedTensor

    if not use_pallas():
        return False
    mode = os.environ.get("MVT_QMM", "auto")
    if mode not in ("auto", "a8"):
        return False
    if not all(isinstance(w, QuantizedTensor) and w.scales_tiled is not None
               for w in ws):
        return False
    # Match _quant_linear's auto policy: int8 weights stay on the exact
    # bf16-dequant kernel (93% of roofline) unless the user explicitly opts
    # into W8A8 via MVT_QMM=a8 — otherwise int8 models would get mixed
    # numerics (activation-quant error on fused ops only).
    if mode == "auto" and any(w.bits != 4 for w in ws):
        return False
    return True


def fused_mlp_block(attn_out: jnp.ndarray, hid: jnp.ndarray, norm_w, eps,
                    w_gu, w_dn, layer,
                    tp_axis: str | None = None) -> jnp.ndarray | None:
    """One-kernel post-attention half of a decoder layer: residual add +
    rmsnorm + gate_up + SwiGLU + down + residual add
    (`ops/pallas/fused_mlp.py::fused_mlp_block`); returns None when not
    applicable and the caller falls back to separate projections.

    Inside shard_map (``tp_axis`` set) the weights are per-rank shards
    (gate_up column-parallel, down row-parallel — rank-interleaved fusion,
    see `ops/quant.py::interleave_columns`); the kernel emits the down
    partial, which is psummed across ranks before the residual add."""
    import os

    if os.environ.get("MVT_FUSED_MLP", "1") == "0":
        return None
    if not _a8_fusion_ok(w_gu, w_dn):
        return None
    if not (w_gu.stacked and w_dn.stacked):
        return None
    if w_gu.bits != w_dn.bits or w_gu.group_size != w_dn.group_size:
        return None
    gs = w_gu.group_size
    K = w_gu.in_dim
    I = w_gu.out_dim // 2
    tile = w_dn.block_k
    if I % tile or tile % gs or K % gs or w_dn.in_dim != I or K > 128 * gs:
        return None
    lead = attn_out.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    if rows > 64:
        return None   # prefill-sized batches: x would not fit in VMEM

    from .pallas.fused_mlp import fused_mlp_block as _kernel

    y = _kernel(attn_out.reshape(rows, K), hid.reshape(rows, K),
                norm_w, w_gu.q, w_gu.scales_tiled, w_dn.q,
                w_dn.scales_tiled, layer, group_size=gs, bits=w_gu.bits,
                tile_i=tile, eps=float(eps),
                out_dtype=(attn_out.dtype if tp_axis is None
                           else jnp.float32),
                add_residual=tp_axis is None)
    y = y.reshape(*lead, w_dn.out_dim)
    if tp_axis is None:
        return y
    import jax

    # partial stays f32 through the psum (precision + deterministic sum),
    # residual added after the cross-rank reduction
    return (attn_out + hid
            + jax.lax.psum(y, tp_axis).astype(attn_out.dtype))


def _moe_slots_per_step(K: int, tile_i: int, bits: int,
                        n_slots: int) -> int:
    """Slots packed per fused-MoE grid step. Default 1: the r5 on-chip
    sweep measured S=2/4/8 at >= S=1 at both deepseek and OLMoE shapes —
    per-slot cost is unpack+dot COMPUTE, which packing cannot amortize
    (the kernel's compute-dedup + merged gate|up dot are the levers that
    worked). ``MVT_MOE_SLOTS`` overrides for probing."""
    import os

    env = os.environ.get("MVT_MOE_SLOTS")
    if env:
        return max(1, int(env))
    return 1


def fused_moe_mlp_block(attn_out: jnp.ndarray, hid: jnp.ndarray, norm_w,
                        eps, w_router: jnp.ndarray, w_gu, w_dn, layer,
                        num_experts: int, top_k: int, num_layers: int,
                        renorm: bool, ep_axis: str | None = None,
                        ep_size: int = 1, route_kw: dict | None = None,
                        extra_fn=None) -> jnp.ndarray | None:
    """One-launch routed post-attention half of a MoE decoder layer
    (`ops/pallas/fused_moe.py::fused_moe_block`); returns None when not
    applicable and the caller falls back to per-expert launches.

    Routing runs here in jnp on a recomputed norm of the residual (the
    kernel re-derives the identical norm internally). One row -> GATHER
    mode (only the top-k experts' weights are read); small batches ->
    SWEEP mode (all E experts, per-row masked weights, each expert's
    weights read once). Expert stacks are expert-major ``[E*L, ...]``
    (flat index ``e*num_layers + layer``).

    ``route_kw``: deepseek_v2 routing extras (routed_scaling_factor,
    group-limited greedy) passed straight to `moe_route` — the scaling
    rides the routing weights, so the kernel stays exact.
    ``extra_fn(normed) -> [rows, K]``: deepseek shared experts — a dense
    MLP on the same normed input whose output adds to the routed sum
    BEFORE the residual (and inside the EP psum: under TP the shared
    stacks are intermediate-sharded partials that ride the same
    reduction, matching `transformer._mlp_out`).

    Under expert parallelism (``ep_axis`` set, inside shard_map) the
    stacks hold this rank's ``E/ep`` experts; remote slots are clamped
    local with zero weight (gather) or dropped (sweep: local experts
    only), the kernel emits the pre-residual weighted sum, and the psum
    here combines ranks before the residual is added once.
    """
    import os

    if os.environ.get("MVT_FUSED_MOE", "1") == "0":
        return None
    if not _a8_fusion_ok(w_gu, w_dn):
        return None
    if not (w_gu.stacked and w_dn.stacked):
        return None
    if w_gu.bits != w_dn.bits or w_gu.group_size != w_dn.group_size:
        return None
    gs = w_gu.group_size
    K = w_gu.in_dim
    I = w_gu.out_dim // 2
    tile = w_dn.block_k
    if I % tile or tile % gs or K % gs or w_dn.in_dim != I or K > 128 * gs:
        return None
    e_local = num_experts // ep_size
    lead = attn_out.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    if rows > 64:
        return None   # prefill-sized batches: per-expert wide matmuls win
    if rows > 1 and rows * top_k > 128 and e_local > 128:
        return None   # neither sorted-gather nor sweep fits the 128 lanes

    from ..models.moe import moe_route
    from .normalization import rmsnorm
    from .pallas.fused_moe import fused_moe_block as _kernel

    a2 = attn_out.reshape(rows, K)
    h2 = hid.reshape(rows, K)
    normed = rmsnorm((a2.astype(jnp.float32)
                      + h2.astype(jnp.float32)).astype(attn_out.dtype),
                     norm_w, eps)
    sel, top_w, top_i = moe_route(normed, w_router, top_k, renorm,
                                  **(route_kw or {}))
    ep = ep_axis is not None and ep_size > 1
    rank0 = (jax.lax.axis_index(ep_axis) * e_local) if ep else 0
    if rows == 1:
        if ep:
            # local slots: remote experts clamp to local slot 0 with a
            # zeroed weight (their owning rank contributes them)
            e_loc = top_i[0] - rank0
            local = (e_loc >= 0) & (e_loc < e_local)
            idx = jnp.clip(e_loc, 0, e_local - 1) * num_layers + layer
            wts = jnp.where(local[None, :], top_w, 0.0)
        else:
            idx = top_i[0] * num_layers + layer     # [k] selected experts
            wts = top_w                              # [1, k]
    elif rows * top_k <= 128:
        # SORTED-ASSIGNMENT mode: one slot per (row, choice) routed
        # assignment, sorted by expert id so duplicate experts sit in
        # ADJACENT slots — the kernel's inner slot axis then elides their
        # weight DMAs (same-block-index pipeline reuse), so each layer
        # reads only the UNION of routed experts' bytes instead of all E
        # (sweep). b8 x top-6 over 64 experts reads ~35 experts expected.
        if ep:
            e_loc = top_i - rank0                      # [rows, k]
            local = (e_loc >= 0) & (e_loc < e_local)
            eids = jnp.clip(e_loc, 0, e_local - 1).reshape(-1)
            flat_w = jnp.where(local, top_w, 0.0).reshape(-1)
        else:
            eids = top_i.reshape(-1)                   # [rows*k]
            flat_w = top_w.reshape(-1)
        order = jnp.argsort(eids)
        idx = eids[order] * num_layers + layer         # [S] sorted slots
        s = rows * top_k
        wts = jnp.zeros((rows, s), jnp.float32).at[
            order // top_k, jnp.arange(s)].set(flat_w[order])
    else:
        idx = jnp.arange(e_local, dtype=jnp.int32) * num_layers + layer
        if ep:
            wts = jax.lax.dynamic_slice_in_dim(sel, rank0, e_local, axis=1)
        else:
            wts = sel                                # [rows, E_local]
    # Multi-slot packing: S (row, expert) slots per grid step amortizes
    # the fixed per-step cost that floors batched MoE (the r4 elision
    # probe proved the kernel is per-step-latency-bound, not DMA-bound).
    # S is VMEM-sized: 2*S weight blocks (double-buffered) ~< 36 MB.
    S = _moe_slots_per_step(K, tile, w_gu.bits, idx.shape[0])
    pad = (-idx.shape[0]) % S
    if pad:
        # repeated trailing ids with zero weights: exact, and the repeats'
        # DMAs coalesce with the real last slot's blocks
        idx = jnp.concatenate([idx, jnp.broadcast_to(idx[-1:], (pad,))])
        wts = jnp.pad(wts, ((0, 0), (0, pad)))
    extra = extra_fn(normed) if extra_fn is not None else None
    y = _kernel(a2, h2, norm_w, idx, wts, w_gu.q, w_gu.scales_tiled,
                w_dn.q, w_dn.scales_tiled, group_size=gs, bits=w_gu.bits,
                tile_i=tile, eps=float(eps), out_dtype=attn_out.dtype,
                add_resid=not ep and extra is None, slots_per_step=S)
    if ep:
        part = y.astype(jnp.float32)
        if extra is not None:
            part = part + extra.reshape(rows, K).astype(jnp.float32)
        y = ((a2.astype(jnp.float32) + h2.astype(jnp.float32)
              + jax.lax.psum(part, ep_axis)).astype(attn_out.dtype))
    elif extra is not None:
        y = ((a2.astype(jnp.float32) + h2.astype(jnp.float32)
              + y.astype(jnp.float32)
              + extra.reshape(rows, K).astype(jnp.float32))
             .astype(attn_out.dtype))
    return y.reshape(*lead, K)


def quant_linear_normed(x: jnp.ndarray, w, norm_w, eps, layer,
                        bias=None) -> jnp.ndarray | None:
    """``rmsnorm(x) @ w`` (or plain ``x @ w`` when norm_w is None) with the
    norm + int8 activation quantization fused into the a8 kernel; returns
    None when not applicable."""
    import os

    if os.environ.get("MVT_FUSED_NORM_QMM", "1") == "0":
        return None
    if not _a8_fusion_ok(w):
        return None
    gs = w.group_size
    K, N = w.in_dim, w.out_dim
    if K % gs or K > 128 * gs or (K // w.block_k) * (w.block_k // gs) == 0:
        return None
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    if rows > 256:
        return None

    from .pallas.quant_matmul import quant_matmul_stacked_a8_fused

    if w.stacked:
        assert layer is not None, "stacked quantized weight needs layer"
        q, st = w.q, w.scales_tiled
    else:
        # non-stacked (lm_head): ride the same kernel as a 1-layer stack
        q, st = w.q[None], w.scales_tiled[None]
        layer = jnp.int32(0)
    has_norm = norm_w is not None
    nw = norm_w if has_norm else jnp.ones((K,), jnp.float32)
    y = quant_matmul_stacked_a8_fused(
        x.reshape(rows, K), nw, q, st, layer,
        group_size=gs, bits=w.bits, block_k=w.block_k,
        block_n=(N if (N <= 6144 and rows <= 64)
                 else (_wide_block_n(rows) if N >= 32768 else 512)),
        has_norm=has_norm, eps=float(eps), out_dtype=x.dtype)
    y = y.reshape(*lead, N)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def linear(x: jnp.ndarray, w, bias=None, layer=None) -> jnp.ndarray:
    """``x @ w (+ bias)`` where ``w`` is a plain ``[in, out]`` array or a
    :class:`QuantizedTensor` (possibly layer-stacked, selected by ``layer``).
    Contraction over the last axis of ``x``."""
    if isinstance(w, QuantizedTensor):
        y = _quant_linear(x, w, layer)
    else:
        y = jnp.einsum("...i,io->...o", x, w)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
