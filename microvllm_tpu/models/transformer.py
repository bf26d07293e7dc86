"""Functional llama/qwen2-family decoder with paged KV cache.

TPU-native re-design of the reference's `core/layer/model_graph.py` /
`core/layer/model_prefill.py` runners: instead of mutable pre-allocated
buffers + CUDA-graph capture, the model is a pure function of
``(params, kv_cache, inputs)`` whose layer loop is a single `lax.scan` over
layer-stacked weights (one compiled layer body regardless of depth), jitted
per shape bucket with the KV cache donated for in-place updates.

Weight layout: every projection is stored ``[in_dim, out_dim]`` so the
forward is ``x @ W``; layer weights are stacked on a leading ``num_layers``
axis for the scan. KV cache per layer: ``[num_pages, kv_heads, page_size,
head_dim]`` (see `microvllm_tpu/ops/attention.py`).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig
from ..ops.attention import (
    append_kv,
    chunked_prefill_attention_ref,
    pad_head,
    padded_head_dim,
    paged_decode_append_auto,
    prefill_attention_ref,
    slot_coords,
)
from ..ops.linear import linear
from ..ops.normalization import rmsnorm, rmsnorm_residual
from ..ops.rope import apply_rope, rope_cos_sin

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter init / structure
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, key: jax.Array,
                quant_bits: int | None = None,
                quant_group_size: int = 128,
                quant_tp: int = 1) -> Params:
    """Random-init parameters (deterministic; used for tests and benches —
    the zero-egress environment has no weight downloads).

    With ``quant_bits`` set, each projection weight is quantized immediately
    after generation and its fp source freed (synchronously), so peak HBM
    stays near the final footprint — a 7B model in int8 never materializes
    the 14 GB bf16 transient.
    """
    dtype = cfg.jax_dtype
    h, q_dim, kv_dim, inter = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim,
                               cfg.intermediate_size)
    L = cfg.num_layers
    keys = jax.random.split(key, 16)

    def w(key, shape, fan_in):
        # generate directly in the target dtype: no fp32 transient at 7B+
        return jax.random.normal(key, shape, dtype) * jnp.asarray(
            1.0 / fan_in ** 0.5, dtype)

    def wq_(key, shape, fan_in):
        """Projection weight, optionally quantized eagerly."""
        full = w(key, shape, fan_in)
        if quant_bits is None:
            return full
        from ..ops.quant import quantize
        if len(shape) == 3:
            qt = jax.lax.map(
                lambda x: quantize(x, quant_bits, quant_group_size,
                                   quant_tp), full)
        else:
            qt = quantize(full, quant_bits, quant_group_size, quant_tp)
        jax.block_until_ready(qt.q)
        del full
        return qt

    # When quantized, fuse QKV and gate|up column-wise: one Pallas launch
    # instead of three/two per layer (launch overhead is material at decode
    # batch sizes). Group-wise quantization is per-column, so
    # quantize(concat) == concat(quantize): the fused model is bit-identical
    # to the unfused one. Under TP the concat is rank-interleaved
    # (`ops/quant.py::interleave_columns`) so each rank's contiguous column
    # shard is its own fused (q_r|k_r|v_r) / (gate_r|up_r) block and the
    # same fused a8 kernels run inside shard_map as on a single chip.
    if cfg.mla:
        return _init_params_deepseek(cfg, key, quant_bits,
                                     quant_group_size, quant_tp)
    tp_fusable = (q_dim % quant_tp == 0 and kv_dim % quant_tp == 0
                  and inter % quant_tp == 0)
    fuse = quant_bits is not None and tp_fusable
    moe = cfg.num_experts > 0
    layers: Params = {
        "attn_norm": jnp.ones((L, h), dtype),
        "mlp_norm": jnp.ones((L, h), dtype),
        "wo": wq_(keys[3], (L, q_dim, h), q_dim),
    }
    if moe:
        # MoE families: router + expert-stacked SwiGLU weights.
        E = cfg.num_experts
        layers["w_router"] = w(keys[9], (L, h, E), h)
        if quant_bits is not None and (quant_tp == 1 or E % quant_tp == 0):
            # Quantized EXPERT-MAJOR stacks [E*L, ...] (flat index
            # e*L + l) for the gather/sweep kernels
            # (models/moe.py::moe_mlp_quant); under EP (E % tp == 0) the
            # first axis shards whole experts per rank. Generate +
            # quantize per expert inside lax.map so the bf16 transient
            # stays one expert large — the full expert tensor of a
            # 7B-class MoE (e.g. OLMoE: 6.4 of 6.9 B params) never
            # materializes.
            from ..ops.quant import quantize

            def one_expert(kk):
                kg, kd = jax.random.split(kk)
                gu = w(kg, (h, 2 * inter), h)
                dn = w(kd, (inter, h), inter)
                return (quantize(gu, quant_bits, quant_group_size, 1),
                        quantize(dn, quant_bits, quant_group_size, 1))

            ekeys = jax.random.split(keys[4], E * L)
            layers["w_gate_up_e"], layers["w_down_e"] = jax.lax.map(
                one_expert, ekeys)
            jax.block_until_ready(layers["w_down_e"].q)
        else:
            # bf16 experts: intermediate-dim TP fallback (E % tp != 0)
            layers["w_gate_e"] = w(keys[4], (L, E, h, inter), h)
            layers["w_up_e"] = w(keys[5], (L, E, h, inter), h)
            layers["w_down_e"] = w(keys[6], (L, E, inter, h), inter)
    else:
        from ..ops.quant import mlp_pad_cols
        # padding requires the fused gate|up layout (both sides padded)
        pad_i = mlp_pad_cols(inter) if fuse and quant_tp == 1 else 0
        if pad_i:
            # pad the down-projection's contraction rows PER LAYER inside
            # the map — a whole-stack concat would double the bf16
            # transient (7.6 GB at 7B) and OOM the 16 GB HBM at init
            from ..ops.quant import quantize as _q
            dn_f = w(keys[6], (L, inter, h), inter)
            layers["w_down"] = jax.lax.map(
                lambda x: _q(jnp.concatenate(
                    [x, jnp.zeros((pad_i, h), x.dtype)], axis=0),
                    quant_bits, quant_group_size, quant_tp), dn_f)
            jax.block_until_ready(layers["w_down"].q)
            del dn_f
        else:
            layers["w_down"] = wq_(keys[6], (L, inter, h), inter)
    if fuse:
        from ..ops.quant import (interleave_columns, pad_gate_up_stack,
                                 quantize)

        def quant_stack(full):
            # column-parallel: contraction dim (h) is replicated under TP,
            # so keep the full-K-optimal block_k (tp=1)
            qt = jax.lax.map(
                lambda x: quantize(x, quant_bits, quant_group_size, 1),
                full)
            jax.block_until_ready(qt.q)
            return qt

        qkv_f = interleave_columns(
            [w(keys[0], (L, h, q_dim), h), w(keys[1], (L, h, kv_dim), h),
             w(keys[2], (L, h, kv_dim), h)], quant_tp)
        layers["wqkv"] = quant_stack(qkv_f)
        del qkv_f
        if not moe:
            gu_f = interleave_columns(
                [w(keys[4], (L, h, inter), h),
                 w(keys[5], (L, h, inter), h)], quant_tp)
            if pad_i:
                # per-layer padding inside the map (see w_down note)
                layers["w_gate_up"] = jax.lax.map(
                    lambda x: quantize(pad_gate_up_stack(
                        x[None], inter, pad_i)[0],
                        quant_bits, quant_group_size, 1), gu_f)
                jax.block_until_ready(layers["w_gate_up"].q)
            else:
                layers["w_gate_up"] = quant_stack(gu_f)
            del gu_f
    else:
        layers["wq"] = wq_(keys[0], (L, h, q_dim), h)
        layers["wk"] = wq_(keys[1], (L, h, kv_dim), h)
        layers["wv"] = wq_(keys[2], (L, h, kv_dim), h)
        if not moe:
            layers["w_gate"] = wq_(keys[4], (L, h, inter), h)
            layers["w_up"] = wq_(keys[5], (L, h, inter), h)
    if cfg.qk_norm:
        if cfg.qk_norm_kind == "full":
            # olmoe: RMSNorm the whole flat q/k projection pre-RoPE
            layers["q_norm"] = jnp.ones((L, q_dim), dtype)
            layers["k_norm"] = jnp.ones((L, kv_dim), dtype)
        else:
            # qwen3: per-head RMSNorm weights over head_dim, pre-RoPE
            layers["q_norm"] = jnp.ones((L, cfg.head_dim), dtype)
            layers["k_norm"] = jnp.ones((L, cfg.head_dim), dtype)
    if cfg.post_norms:
        # gemma2 sandwich norms: on the attention/MLP output pre-residual
        layers["post_attn_norm"] = jnp.ones((L, h), dtype)
        layers["post_mlp_norm"] = jnp.ones((L, h), dtype)
    if cfg.qkv_bias:
        if fuse:
            layers["bqkv"] = jnp.zeros((L, q_dim + 2 * kv_dim), dtype)
        else:
            layers["bq"] = jnp.zeros((L, q_dim), dtype)
            layers["bk"] = jnp.zeros((L, kv_dim), dtype)
            layers["bv"] = jnp.zeros((L, kv_dim), dtype)

    embed = w(keys[7], (cfg.vocab_size, h), h)
    if cfg.tie_word_embeddings:
        lm_head = None
        if quant_bits is not None:
            # tied: quantize a transposed copy so big-vocab tied models
            # take the a8 wide-N lm_head kernel (see ops/quant.py note)
            from ..ops.quant import quantize
            lm_head = quantize(jnp.swapaxes(embed, 0, 1), quant_bits,
                               quant_group_size)
            jax.block_until_ready(lm_head.q)
    else:
        lm_head = wq_(keys[8], (h, cfg.vocab_size), h)
    params: Params = {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": lm_head,
    }
    return params


def _init_params_deepseek(cfg: ModelConfig, key: jax.Array,
                          quant_bits: int | None,
                          quant_group_size: int,
                          quant_tp: int = 1) -> Params:
    """Random-init deepseek_v2 params: MLA projections (bf16; the W_uk
    absorption consumes w_kv_b as a reshaped tensor), dense-prefix MLP
    stacks (``*_d``, leading first_k_dense_replace), MoE-layer stacks
    (router / experts / shared experts, leading moe_layer_count).
    ``quant_bits`` quantizes the ROUTED EXPERT stacks (the parameter
    mass) into expert-major ``[E*L_moe, ...]`` AND the per-layer
    projection/shared-expert stacks (r5: the bf16 attention+shared mass
    was ~1.75 GB on deepseek-v2-lite = ~2.5 ms/step of pure DMA at b8).
    ``w_kv_b`` stays bf16 — the absorbed-MQA einsums consume it reshaped
    per head, not as a matmul. The dense-prefix MLP stays bf16 too
    (dense_intermediate_size 10944 is not a multiple of the group size;
    one layer, ~90 MB)."""
    dtype = cfg.jax_dtype
    h = cfg.hidden_size
    L = cfg.num_layers
    k0 = cfg.first_k_dense_replace if cfg.num_experts else 0
    L_moe = cfg.moe_layer_count
    E = cfg.num_experts
    dc, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    inter = cfg.intermediate_size
    keys = jax.random.split(key, 20)

    def w(kk, shape, fan_in):
        return jax.random.normal(kk, shape, dtype) * jnp.asarray(
            1.0 / fan_in ** 0.5, dtype)

    layers: Params = {
        "attn_norm": jnp.ones((L, h), dtype),
        "mlp_norm": jnp.ones((L, h), dtype),
        "kv_a_norm": jnp.ones((L, dc), dtype),
        "w_kv_a": w(keys[0], (L, h, dc + dr), h),
        "w_kv_b": w(keys[1], (L, dc, cfg.num_heads
                              * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
                    dc),
        "wo": w(keys[2], (L, cfg.o_in_dim, h), cfg.o_in_dim),
    }
    if cfg.q_lora_rank:
        layers["w_q_a"] = w(keys[3], (L, h, cfg.q_lora_rank), h)
        layers["q_a_norm"] = jnp.ones((L, cfg.q_lora_rank), dtype)
        layers["w_q_b"] = w(keys[4], (L, cfg.q_lora_rank,
                                      cfg.num_heads * cfg.head_dim),
                            cfg.q_lora_rank)
    else:
        layers["wq"] = w(keys[3], (L, h, cfg.num_heads * cfg.head_dim), h)

    if k0:
        i_d = cfg.dense_intermediate_size
        layers["w_gate_d"] = w(keys[5], (k0, h, i_d), h)
        layers["w_up_d"] = w(keys[6], (k0, h, i_d), h)
        layers["w_down_d"] = w(keys[7], (k0, i_d, h), i_d)
    if E:
        layers["w_router"] = w(keys[8], (L_moe, h, E), h)
        if cfg.n_shared_experts:
            i_sh = cfg.n_shared_experts * inter
            layers["w_gate_sh"] = w(keys[9], (L_moe, h, i_sh), h)
            layers["w_up_sh"] = w(keys[10], (L_moe, h, i_sh), h)
            layers["w_down_sh"] = w(keys[11], (L_moe, i_sh, h), i_sh)
        if quant_bits is not None:
            from ..ops.quant import quantize

            def one_expert(kk):
                kg, kd = jax.random.split(kk)
                gu = w(kg, (h, 2 * inter), h)
                dn = w(kd, (inter, h), inter)
                return (quantize(gu, quant_bits, quant_group_size, 1),
                        quantize(dn, quant_bits, quant_group_size, 1))

            ekeys = jax.random.split(keys[12], E * L_moe)
            layers["w_gate_up_e"], layers["w_down_e"] = jax.lax.map(
                one_expert, ekeys)
            jax.block_until_ready(layers["w_down_e"].q)
        else:
            layers["w_gate_e"] = w(keys[12], (L_moe, E, h, inter), h)
            layers["w_up_e"] = w(keys[13], (L_moe, E, h, inter), h)
            layers["w_down_e"] = w(keys[14], (L_moe, E, inter, h), inter)
    else:
        layers["w_gate"] = w(keys[12], (L, h, inter), h)
        layers["w_up"] = w(keys[13], (L, h, inter), h)
        layers["w_down"] = w(keys[14], (L, inter, h), inter)

    if quant_bits is not None:
        from ..ops.quant import quantize

        def qstack(name, row: bool = False, col: bool = False):
            """Quantize a per-layer stack when its TP sharding stays
            divisible (row: the scales' group axis shards; col: the out
            axis) — else the stack stays bf16 (tiny geometries / odd
            intermediate sizes)."""
            v = layers.get(name)
            if v is None or v.shape[-2] % quant_group_size:
                return
            if row and (v.shape[-2] // quant_group_size) % quant_tp:
                return
            if col and v.shape[-1] % quant_tp:
                return
            layers[name] = jax.lax.map(
                lambda x: quantize(x, quant_bits, quant_group_size,
                                   quant_tp if row else 1), v)

        for name in ("wq", "w_q_a", "w_q_b", "w_gate_sh", "w_up_sh"):
            qstack(name, col=name not in ("w_q_a",))
        qstack("w_kv_a")
        qstack("wo", row=True)
        qstack("w_down_sh", row=True)

    embed = w(keys[15], (cfg.vocab_size, h), h)
    lm_head = (None if cfg.tie_word_embeddings
               else w(keys[16], (h, cfg.vocab_size), h))
    if quant_bits is not None and lm_head is not None:
        from ..ops.quant import quantize as _q
        lm_head = _q(lm_head, quant_bits, quant_group_size)
        jax.block_until_ready(lm_head.q)
    return {"embed": embed, "layers": layers,
            "final_norm": jnp.ones((h,), dtype), "lm_head": lm_head}


def init_kv_cache(cfg: ModelConfig, cache: CacheConfig,
                  dtype=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zeroed paged KV cache ``[L, num_pages, kv_heads, page_size, head_dim]``.

    head_dim is padded to the TPU lane width (128) so Pallas page DMAs are
    tile-aligned; the zero padding is inert in attention math.
    """
    dtype = dtype or cfg.jax_dtype
    # MLA (deepseek_v2): one "kv head" whose width is the per-token
    # latent [c | k_pe] — kv_lora_rank + qk_rope_head_dim dims instead
    # of 2*heads*head_dim (config.kv_cache_head_dim)
    shape = (cfg.num_layers, cache.num_pages, cfg.num_kv_heads,
             cache.page_size, padded_head_dim(cfg.kv_cache_head_dim))
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def init_kv_scales(cfg: ModelConfig, cache: CacheConfig
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token KV quantization scale pages ``[L, P, KV, 128]`` (lane s =
    slot s's scale; see `ops/attention.py` INT8 KV section)."""
    assert cache.page_size <= 128, "int8 KV cache requires page_size <= 128"
    shape = (cfg.num_layers, cache.num_pages, cfg.num_kv_heads, 128)
    return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)


def _lm_logits(params: Params, h: jnp.ndarray,
               tp_axis: str | None = None) -> jnp.ndarray:
    """Project final hidden states to vocab logits (handles tied embeddings).

    Under tensor parallelism (inside shard_map), lm_head is vocab-sharded on
    ``tp_axis``; local partial logits are all-gathered so every rank samples
    identically (the reference instead ships logits to rank 0,
    `core/engine.py:231,276`)."""
    if params.get("lm_head") is None:
        # embed is replicated; logits are complete on every rank
        return jnp.einsum("...h,vh->...v", h, params["embed"]).astype(jnp.float32)
    logits = linear(h, params["lm_head"]).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits


def _maybe_psum(x: jnp.ndarray, tp_axis: str | None) -> jnp.ndarray:
    """Row-parallel reduction (the reference's NCCL all_reduce after o-proj
    and down-proj, `model_graph.py:211,219`)."""
    if tp_axis is None:
        return x
    return jax.lax.psum(x, tp_axis)


# deepseek_v2 layer-group key sets: dense-prefix-only leaves (leading
# first_k_dense_replace) and MoE-layer-only leaves (leading
# moe_layer_count) — everything else stacks over the FULL num_layers.
_DENSE_PREFIX_KEYS = ("w_gate_d", "w_up_d", "w_down_d")
_MOE_ONLY_KEYS = ("w_router", "w_gate_e", "w_up_e", "w_down_e",
                  "w_gate_sh", "w_up_sh", "w_down_sh")


def _layer_xs(params: Params, cfg: ModelConfig):
    """Scan inputs for the layer loop.

    Quantized (stacked) weights are EXCLUDED from the scanned xs: slicing
    them per iteration would materialize a copy of each layer's weights
    (Pallas custom-call operands cannot be lazily sliced by XLA — measured
    at ~20% of decode step time on 7B). They stay whole, closed over, and
    the kernels index the layer via scalar-prefetch BlockSpecs.

    Heterogeneous layouts (gemma2's alternating sliding/global attention):
    the scan runs over ``num_layers / period`` GROUPS, with each group's
    ``period`` sub-layers unrolled in the body so every sub-layer keeps a
    STATIC sliding window for the Pallas kernels (xs leaves gain a
    ``[groups, period, ...]`` leading pair).

    deepseek_v2's dense prefix (``first_k_dense_replace``): the scan
    covers only the MoE layers [k0, L); the prefix layers are UNROLLED
    before it (`_prefix_layers`). Full-depth leaves are sliced [k0:];
    MoE-only leaves (router, shared-expert stacks) already have leading
    moe_layer_count; ``*_d`` leaves belong to the prefix alone.
    """
    from ..ops.quant import QuantizedTensor

    k0 = cfg.first_k_dense_replace if cfg.num_experts else 0
    sliced = {k: v for k, v in params["layers"].items()
              if not isinstance(v, QuantizedTensor)
              and k not in _DENSE_PREFIX_KEYS}
    if k0:
        sliced = {k: (v if k in _MOE_ONLY_KEYS else v[k0:])
                  for k, v in sliced.items()}
    ls = jnp.arange(k0, cfg.num_layers, dtype=jnp.int32)
    p = cfg.layer_period
    if p == 1:
        return (ls, sliced)
    sliced = {k: v.reshape(v.shape[0] // p, p, *v.shape[1:])
              for k, v in sliced.items()}
    return (ls.reshape(-1, p), sliced)


def _prefix_layers(params: Params, cfg: ModelConfig):
    """(layer_id, per-layer params) for the dense-prefix layers unrolled
    BEFORE the MoE scan (deepseek_v2 first_k_dense_replace)."""
    from ..ops.quant import QuantizedTensor

    k0 = cfg.first_k_dense_replace if cfg.num_experts else 0
    for i in range(k0):
        lp = {}
        for k, v in params["layers"].items():
            if isinstance(v, QuantizedTensor) or k in _MOE_ONLY_KEYS:
                continue
            lp[k] = v[i]   # *_d leaves have leading k0; the rest full L
        yield i, lp


def _sub_layers(cfg: ModelConfig, ls, lps):
    """Iterate the (layer_id, per-layer params, window) sub-layers of one
    scan group (see `_layer_xs`)."""
    p = cfg.layer_period
    if p == 1:
        yield ls, lps, cfg.layer_window(0)
        return
    for j in range(p):
        yield ls[j], {k: v[j] for k, v in lps.items()}, cfg.layer_window(j)


def _stacked_weights(params: Params):
    from ..ops.quant import QuantizedTensor

    return {k: v for k, v in params["layers"].items()
            if isinstance(v, QuantizedTensor)}


def _weight_getter(lp, stacked):
    def get(name):
        return stacked[name] if name in stacked else lp.get(name)
    return get


def _route_kw(cfg: ModelConfig) -> dict:
    """deepseek_v2 routing extras for `moe.moe_route` (empty elsewhere)."""
    kw = {}
    if cfg.routed_scaling_factor != 1.0:
        kw["scale"] = cfg.routed_scaling_factor
    if cfg.moe_topk_method == "group_limited_greedy":
        kw["n_group"] = cfg.moe_n_group
        kw["topk_group"] = cfg.moe_topk_group
    return kw


def _fused_moe_dispatch(cfg: ModelConfig, w, lp, l, attn_out: jnp.ndarray,
                        hid: jnp.ndarray, tp_axis: str | None,
                        tp_size: int) -> jnp.ndarray | None:
    """One-launch routed MoE block for ANY quantized-expert MoE layer —
    plain (mixtral/OLMoE/qwen3-moe) and deepseek_v2 (shared experts ride
    ``extra_fn`` inside the same psum, routed_scaling/group-limited
    routing ride ``route_kw``). Returns the full new hidden (residual
    included) or None -> caller falls back to per-expert launches.

    Exists because the r5 deepseek b8 xplane showed the per-expert SWEEP
    fallback costing ~730 us/layer (64 a8 launches + loop glue) while the
    fused block measures 322 us in-jit — the MLA branch never reached the
    fused path, which was gated on ``plain_moe``.
    """
    from ..config import moe_uses_ep
    from ..ops.linear import fused_moe_mlp_block
    if not cfg.num_experts or w("w_gate_up_e") is None:
        return None
    ep_q = tp_axis is not None and moe_uses_ep(cfg, tp_size)
    if tp_axis is not None and not ep_q:
        return None
    k0 = cfg.first_k_dense_replace if cfg.first_k_dense_replace else 0
    l_moe = l - k0 if k0 else l
    extra = None
    if cfg.n_shared_experts:
        from ..ops.activations import glu_act
        f = glu_act(cfg.hidden_act)

        def extra(normed):
            a = f(linear(normed, w("w_gate_sh"), layer=l_moe),
                  linear(normed, w("w_up_sh"), layer=l_moe))
            return linear(a, w("w_down_sh"), layer=l_moe)
    return fused_moe_mlp_block(
        attn_out, hid, lp["mlp_norm"], cfg.rms_norm_eps, lp["w_router"],
        w("w_gate_up_e"), w("w_down_e"), l_moe, cfg.num_experts,
        cfg.num_experts_per_tok, cfg.moe_layer_count, cfg.moe_renorm,
        ep_axis=tp_axis if ep_q else None, ep_size=tp_size if ep_q else 1,
        route_kw=_route_kw(cfg), extra_fn=extra)


def _mlp_out(cfg: ModelConfig, w, lp, l, normed2: jnp.ndarray,
             tp_axis: str | None = None, tp_size: int = 1,
             dense_prefix: bool = False) -> jnp.ndarray:
    """Dense or Mixture-of-Experts MLP on the post-attention normed input
    (returns the pre-psum output; the caller reduces under TP).

    ``dense_prefix``: this is one of deepseek_v2's
    ``first_k_dense_replace`` plain-MLP layers (weights under ``*_d``
    keys, unrolled before the MoE layer scan; ``l`` indexes the prefix).
    """
    from ..ops.activations import glu_act
    if dense_prefix:
        f = glu_act(cfg.hidden_act)
        a = f(linear(normed2, w("w_gate_d") if w("w_gate_d") is not None
                     else lp["w_gate_d"], layer=l),
              linear(normed2, w("w_up_d") if w("w_up_d") is not None
                     else lp["w_up_d"], layer=l))
        wd = w("w_down_d") if w("w_down_d") is not None else lp["w_down_d"]
        return linear(a, wd, layer=l)
    if cfg.num_experts:
        from ..config import moe_uses_ep
        from .moe import moe_mlp, moe_mlp_quant
        l_moe = (l - cfg.first_k_dense_replace if cfg.first_k_dense_replace
                 else l)
        rkw = _route_kw(cfg)
        if w("w_gate_up_e") is not None:
            # quantized expert-major stacks [E*L, ...]: top-k gather at
            # B=1, masked local-expert sweep otherwise (moe.py); under
            # EP the stacks are first-axis shards of whole experts
            ep_q = moe_uses_ep(cfg, tp_size)
            out = moe_mlp_quant(normed2, lp["w_router"],
                                w("w_gate_up_e"), w("w_down_e"), l_moe,
                                cfg.num_experts, cfg.num_experts_per_tok,
                                cfg.moe_layer_count,
                                renorm=cfg.moe_renorm, act=cfg.hidden_act,
                                ep_axis=tp_axis if ep_q else None,
                                ep_size=tp_size if ep_q else 1,
                                route_kw=rkw)
        else:
            ep = moe_uses_ep(cfg, tp_size)
            out = moe_mlp(normed2, lp["w_router"], lp["w_gate_e"],
                          lp["w_up_e"], lp["w_down_e"],
                          cfg.num_experts_per_tok,
                          ep_axis=tp_axis if ep else None,
                          renorm=cfg.moe_renorm, route_kw=rkw)
        if cfg.n_shared_experts:
            # deepseek shared experts: a dense SwiGLU MLP on the same
            # normed input, ADDED to the routed output (HF
            # DeepseekV2MoE.forward). Under TP the shared stacks are
            # intermediate-dim sharded (parallel/sharding.py), so this
            # rank-local partial sums with the routed/EP partial in the
            # caller's single psum. w() resolves the quantized [L_moe]
            # stacks when present (indexed by l_moe), else the scanned
            # bf16 per-layer slice (layer ignored for plain 2D weights).
            f = glu_act(cfg.hidden_act)
            a = f(linear(normed2, w("w_gate_sh"), layer=l_moe),
                  linear(normed2, w("w_up_sh"), layer=l_moe))
            out = out + linear(a, w("w_down_sh"), layer=l_moe)
        return out
    return linear(_swiglu_proj(normed2, w, l, cfg.hidden_act),
                  w("w_down"), layer=l)


def _qk_norm(cfg: ModelConfig, lp, q: jnp.ndarray,
             k: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """QK-norm on head-split q/k ``[..., heads, head_dim]`` pre-RoPE.

    kind "head" (qwen3, HF `Qwen3Attention`): RMSNorm each head over
    head_dim. kind "full" (olmoe, HF `OlmoeAttention.q_norm` over
    hidden_size): RMSNorm the flat projection, so the mean square runs
    across ALL heads — flatten, norm, split back.
    """
    from ..ops.normalization import rmsnorm

    if cfg.qk_norm_kind == "full":
        qs, ks_ = q.shape, k.shape
        q = rmsnorm(q.reshape(*qs[:-2], -1), lp["q_norm"],
                    cfg.rms_norm_eps).reshape(qs)
        k = rmsnorm(k.reshape(*ks_[:-2], -1), lp["k_norm"],
                    cfg.rms_norm_eps).reshape(ks_)
        return q, k
    return (rmsnorm(q, lp["q_norm"], cfg.rms_norm_eps),
            rmsnorm(k, lp["k_norm"], cfg.rms_norm_eps))


def _qkv(normed, w, lp, l, q_dim, kv_dim):
    """QKV projections — one fused matmul when the params carry 'wqkv'
    (quantized, single-rank), else three."""
    if w("wqkv") is not None:
        qkv = linear(normed, w("wqkv"), lp.get("bqkv"), layer=l)
        return (qkv[..., :q_dim], qkv[..., q_dim:q_dim + kv_dim],
                qkv[..., q_dim + kv_dim:])
    return (linear(normed, w("wq"), lp.get("bq"), layer=l),
            linear(normed, w("wk"), lp.get("bk"), layer=l),
            linear(normed, w("wv"), lp.get("bv"), layer=l))


def lora_delta(x: jnp.ndarray, A: jnp.ndarray, Bm: jnp.ndarray,
               adapter_ids: jnp.ndarray, scaling: float,
               reduce_axis: str | None = None) -> jnp.ndarray:
    """Batched multi-LoRA delta ``scaling * (x @ A[id]) @ B[id]``.

    x: ``[B, K]`` or ``[B, S, K]``; A: ``[N, K, r]``; Bm: ``[N, r, M]``;
    adapter_ids: ``[B]`` int32 (0 = the all-zero base slot). The per-row
    gather + two skinny einsums stay tiny next to the base matmul
    (r ~ 16), so XLA fuses them into the surrounding step.

    ``reduce_axis``: for row-parallel projections under TP (o-proj), x and
    A are K-sharded per rank, so the rank-local ``x_r @ A_r`` is a partial
    sum; psum the tiny ``[B, r]`` intermediate (much cheaper than psumming
    a ``[B, M]`` delta) before applying the replicated B.
    """
    Asel = A[adapter_ids]                              # [B, K, r]
    Bsel = Bm[adapter_ids]                             # [B, r, M]
    if x.ndim == 2:
        t = jnp.einsum("bk,bkr->br", x, Asel)
        if reduce_axis is not None:
            t = jax.lax.psum(t, reduce_axis)
        return jnp.einsum("br,brm->bm", t, Bsel) * scaling
    t = jnp.einsum("bsk,bkr->bsr", x, Asel)
    if reduce_axis is not None:
        t = jax.lax.psum(t, reduce_axis)
    return jnp.einsum("bsr,brm->bsm", t, Bsel) * scaling


def _mla_qkv(cfg: ModelConfig, lp, w, normed: jnp.ndarray,
             cos: jnp.ndarray, sin: jnp.ndarray, l, tp_size: int = 1):
    """Multi-head Latent Attention projections (deepseek_v2,
    HF `DeepseekV2Attention`, modular_deepseek_v2.py:426-473) in the
    ABSORBED decode form: instead of materializing per-head K/V via
    ``kv_b``, the up-projection ``W_uk`` folds into the query
    (``q_abs = q_nope @ W_uk``) so attention is MQA over the cached
    per-token latent ``[c | k_pe]`` — kv_lora_rank + qk_rope_head_dim
    dims per token per layer instead of 2*heads*head_dim (DeepSeek-V2-
    Lite: 8.9x less KV). Exact: q_abs . c == q_nope . (W_uk c) = the
    HF per-head score; values are the shared latent, up-projected per
    head AFTER attention (`_mla_out`).

    normed: ``[..., H]``. Returns (q_full ``[..., heads, dc+dr]``,
    k_full ``[..., 1, dc+dr]``, v_full ``[..., 1, dc]``, w_uv
    ``[dc, heads, v_head_dim]``).
    """
    from ..ops.linear import linear
    from ..ops.rope import apply_rope_interleaved

    dc, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    nope = cfg.qk_nope_head_dim
    # Under TP the q/kv_b/o projections are head-sharded (column-parallel
    # contiguous head blocks); the latent path (w_kv_a, cache) is
    # replicated — every rank computes and stores identical latents and
    # attends with its own head subset, psumming after o_proj.
    heads = cfg.num_heads // tp_size
    lead = normed.shape[:-1]
    if cfg.q_lora_rank:
        qa = rmsnorm(linear(normed, w("w_q_a"), layer=l), lp["q_a_norm"],
                     cfg.rms_norm_eps)
        q = linear(qa, w("w_q_b"), layer=l)
    else:
        q = linear(normed, w("wq"), layer=l)
    q = q.reshape(*lead, heads, cfg.head_dim)
    q_nope, q_pe = q[..., :nope], q[..., nope:]
    ckv = linear(normed, w("w_kv_a"), layer=l)            # [..., dc + dr]
    c = rmsnorm(ckv[..., :dc], lp["kv_a_norm"], cfg.rms_norm_eps)
    k_pe = ckv[..., None, dc:]                            # [..., 1, dr]
    # deepseek RoPE is the INTERLEAVED-pair convention (HF
    # apply_rotary_emb via view_as_complex), applied to the rope slice
    q_pe = apply_rope_interleaved(q_pe, cos, sin)
    k_pe = apply_rope_interleaved(k_pe, cos, sin)
    w_kv_b = lp["w_kv_b"].reshape(dc, heads, nope + cfg.v_head_dim)
    w_uk, w_uv = w_kv_b[..., :nope], w_kv_b[..., nope:]
    q_abs = jnp.einsum("...hn,chn->...hc", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32)).astype(normed.dtype)
    q_full = jnp.concatenate([q_abs, q_pe.astype(normed.dtype)], axis=-1)
    k_full = jnp.concatenate([c[..., None, :],
                              k_pe.astype(normed.dtype)], axis=-1)
    return q_full, k_full, c[..., None, :], w_uv


def _mla_out(cfg: ModelConfig, attn: jnp.ndarray,
             w_uv: jnp.ndarray) -> jnp.ndarray:
    """Per-head value up-projection after latent attention.

    attn: ``[..., heads(_local), >= kv_lora_rank]`` (tail is head-dim
    padding). Returns ``[..., heads_local * v_head_dim]`` for the
    (row-parallel under TP) o-projection.
    """
    attn_c = attn[..., : cfg.kv_lora_rank]
    out = jnp.einsum("...hc,chv->...hv", attn_c.astype(jnp.float32),
                     w_uv.astype(jnp.float32))
    heads = attn.shape[-2]
    return out.reshape(*attn.shape[:-2],
                       heads * cfg.v_head_dim).astype(attn.dtype)


def _swiglu_proj(normed, w, l, act: str = "silu"):
    """act(gate) * up — one fused gate|up matmul when available."""
    from ..ops.activations import glu_act
    f = glu_act(act)
    if w("w_gate_up") is not None:
        gu = linear(normed, w("w_gate_up"), layer=l)
        inter = gu.shape[-1] // 2
        return f(gu[..., :inter], gu[..., inter:])
    return f(linear(normed, w("w_gate"), layer=l),
             linear(normed, w("w_up"), layer=l))


# ---------------------------------------------------------------------------
# Data-parallel KV-write replication
# ---------------------------------------------------------------------------
#
# Under DP the paged KV cache is REPLICATED per data replica (cache_spec
# never shards it on the data axis) and each replica's store/fused-append
# only writes its local batch rows. The replica copies therefore diverge,
# and correctness would silently depend on every sequence keeping the same
# data-replica row assignment across its whole lifetime — which the
# scheduler does not (and should not have to) guarantee: prefill batch
# layouts differ from decode buckets, and decode round-robin rotation past
# the bucket cap migrates rows. Fix: every replica all-gathers the new
# per-layer K/V over the data axis and scatters the OTHER replicas' rows
# into its local copy (its own rows are redirected to the reserved trash
# page 0 — the local store/fused append writes those), so all replica
# copies stay page-identical. The gathered arrays are tiny ([B, KV, D] per
# layer at decode) and ride ICI; everything here is statically skipped
# when dp_axis is None (the single-replica bench path is untouched).


def _dp_remote_mask(dp_axis: str, b_local: int, b_global: int):
    """[B_global] bool — True for rows owned by OTHER data replicas."""
    rows = jnp.arange(b_global, dtype=jnp.int32)
    mine = jax.lax.axis_index(dp_axis).astype(jnp.int32)
    return (rows // b_local) != mine


def _dp_store_remote_decode(kc, vc, ks, vs, k, v, tables_g, ctx_g,
                            l, dp_axis: str):
    """Scatter other replicas' single-token KV writes into the local cache.

    k/v: LOCAL ``[B_local, KV, D_pad]`` new-token keys/values (pre-store).
    tables_g/ctx_g: data-axis-gathered block tables / context lens.
    Padding rows need no masking: they carry all-trash block tables, so
    their coords already land on page 0.
    """
    from ..ops.attention import quantize_kv, slot_coords
    kg = jax.lax.all_gather(k, dp_axis, axis=0, tiled=True)
    vg = jax.lax.all_gather(v, dp_axis, axis=0, tiled=True)
    page_size = kc.shape[3]
    page_ids, offsets = slot_coords(tables_g, ctx_g, page_size)
    remote = _dp_remote_mask(dp_axis, k.shape[0], kg.shape[0])
    page_ids = jnp.where(remote, page_ids, 0)
    offsets = jnp.where(remote, offsets, 0)
    if ks is not None:
        k_q, k_s = quantize_kv(kg)
        v_q, v_s = quantize_kv(vg)
        kc = kc.at[l, page_ids, :, offsets].set(k_q)
        vc = vc.at[l, page_ids, :, offsets].set(v_q)
        ks = ks.at[l, page_ids, :, offsets].set(k_s)
        vs = vs.at[l, page_ids, :, offsets].set(v_s)
        return kc, vc, ks, vs
    kc = kc.at[l, page_ids, :, offsets].set(kg.astype(kc.dtype))
    vc = vc.at[l, page_ids, :, offsets].set(vg.astype(vc.dtype))
    return kc, vc, ks, vs


def _dp_store_remote_prefill(kc, vc, ks, vs, k, v, tables_g, pos_g,
                             valid_g, l, dp_axis: str):
    """Prefill twin of `_dp_store_remote_decode` for ``[B, S]`` chunks.

    k/v: LOCAL ``[B_local, S, KV, head_dim]`` (unpadded head dim).
    tables_g/pos_g/valid_g: data-axis-gathered block tables, absolute
    positions and chunk-validity mask. Invalid (padding) positions and
    locally-owned rows are redirected to trash page 0 — the local store
    path writes the local rows.
    """
    from ..ops.attention import quantize_kv, slot_coords
    d_pad = kc.shape[-1]
    kg = jax.lax.all_gather(pad_head(k, d_pad), dp_axis, axis=0, tiled=True)
    vg = jax.lax.all_gather(pad_head(v, d_pad), dp_axis, axis=0, tiled=True)
    B, S = kg.shape[:2]
    page_ids, offsets = slot_coords(tables_g, pos_g, kc.shape[3])
    remote = _dp_remote_mask(dp_axis, k.shape[0], B)[:, None] & valid_g
    fp = jnp.where(remote, page_ids, 0).reshape(B * S)
    fo = jnp.where(remote, offsets, 0).reshape(B * S)
    n_kv = kg.shape[2]
    if ks is not None:
        k_q, k_s = quantize_kv(kg)
        v_q, v_s = quantize_kv(vg)
        kc = kc.at[l, fp, :, fo].set(k_q.reshape(B * S, n_kv, d_pad))
        vc = vc.at[l, fp, :, fo].set(v_q.reshape(B * S, n_kv, d_pad))
        ks = ks.at[l, fp, :, fo].set(k_s.reshape(B * S, n_kv))
        vs = vs.at[l, fp, :, fo].set(v_s.reshape(B * S, n_kv))
        return kc, vc, ks, vs
    kc = kc.at[l, fp, :, fo].set(
        kg.reshape(B * S, n_kv, d_pad).astype(kc.dtype))
    vc = vc.at[l, fp, :, fo].set(
        vg.reshape(B * S, n_kv, d_pad).astype(vc.dtype))
    return kc, vc, ks, vs


# ---------------------------------------------------------------------------
# Decode step: one token per sequence, paged attention
# ---------------------------------------------------------------------------


def decode_step(cfg: ModelConfig, params: Params,
                k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                tokens: jnp.ndarray, block_tables: jnp.ndarray,
                context_lens: jnp.ndarray,
                tp_axis: str | None = None, tp_size: int = 1,
                k_scales: jnp.ndarray | None = None,
                v_scales: jnp.ndarray | None = None,
                adapter_ids: jnp.ndarray | None = None,
                lora_scaling: float = 1.0,
                dp_axis: str | None = None,
                sp_axis: str | None = None, sp_size: int = 1,
                scan_inputs=None,
                ):
    """One decode step for a fixed-size batch.

    tokens:        ``[B]`` int32 — current input token per sequence
    block_tables:  ``[B, max_pages_per_seq]`` int32
    context_lens:  ``[B]`` int32 — tokens already in cache (== position of
                   the new token). Padding rows use context_len 0 and an
                   all-trash block table.
    tp_axis/tp_size: set when called inside shard_map — params/caches are
                   then per-rank shards (heads divided by tp_size) and the
                   row-parallel projections psum over ``tp_axis``.
    adapter_ids:   optional ``[B]`` int32 — per-row LoRA adapter slot
                   (params["layers"] then carries lora_{qkv,o}_{a,b}
                   stacks; slot 0 is the all-zero base).
    sp_axis/sp_size: sequence-parallel KV — the caches' PAGE axis is
                   sharded over ``sp_axis`` (global page g on rank g % sp);
                   each rank scatter-stores only its owned pages, attends
                   its local shard, and one flash-partials psum combines
                   (`ops/attention.py::sp_decode_attention`). KV capacity
                   scales sp-fold. Composes with TP (heads) and DP (the
                   all-gathered KV write is ownership-redirected here
                   instead of `_dp_store_remote_decode`).
    Returns (logits ``[B, V]`` fp32, new_k_cache, new_v_cache).
    """
    scale = cfg.attn_scale
    B = tokens.shape[0]
    n_heads = cfg.num_heads // tp_size
    # MLA: the single latent "kv head" is REPLICATED under TP (only the
    # query/o heads shard); standard GQA shards kv heads with the cache
    n_kv = cfg.num_kv_heads if cfg.mla else cfg.num_kv_heads // tp_size
    q_dim = n_heads * cfg.head_dim

    h = jnp.take(params["embed"], tokens, axis=0)          # [B, H]
    if cfg.embed_scale:   # gemma: sqrt(H) normalizer, cast to model dtype
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, h.dtype)
    rope_dim = cfg.qk_rope_head_dim if cfg.mla else cfg.head_dim
    cos, sin = rope_cos_sin(context_lens, rope_dim, cfg.rope_theta,
                            scaling=cfg.rope_scaling)

    stacked = _stacked_weights(params)
    if dp_axis is not None:   # see _dp_store_remote_decode
        tables_g = jax.lax.all_gather(block_tables, dp_axis, axis=0,
                                      tiled=True)
        ctx_g = jax.lax.all_gather(context_lens, dp_axis, axis=0,
                                   tiled=True)

    if sp_axis is not None:
        from ..ops.attention import (quantize_kv, slot_coords,
                                     sp_decode_attention, sp_local_tables,
                                     sp_owner_coords)
        page_size = k_cache.shape[3]
        rank_sp = jax.lax.axis_index(sp_axis)
        # attention reads this rank's shard of each row's pages, new token
        # included (the store below lands it before the attend)
        sp_lt, sp_ll = sp_local_tables(block_tables, context_lens + 1,
                                       page_size, sp_size, rank_sp)
        # store coords: every row this rank must write — ALL replicas'
        # rows under dp (the cache is replicated over data, sharded over
        # seq); non-owned pages redirect to the local trash slot 0
        st_tabs = tables_g if dp_axis is not None else block_tables
        st_ctx = ctx_g if dp_axis is not None else context_lens
        sp_pids, sp_offs = slot_coords(st_tabs, st_ctx, page_size)
        sp_lids = sp_owner_coords(sp_pids, sp_size, rank_sp)

        def sp_store_attend(q, k, v, kc, vc, ks, vs, l):
            """Ownership-redirected KV scatter + page-sharded attention
            (q/k/v already padded to the cache head width)."""
            kw, vw = k, v
            if dp_axis is not None:
                kw = jax.lax.all_gather(k, dp_axis, axis=0, tiled=True)
                vw = jax.lax.all_gather(v, dp_axis, axis=0, tiled=True)
            if ks is not None:
                k_q, k_s = quantize_kv(kw)
                v_q, v_s = quantize_kv(vw)
                kc = kc.at[l, sp_lids, :, sp_offs].set(k_q)
                vc = vc.at[l, sp_lids, :, sp_offs].set(v_q)
                ks = ks.at[l, sp_lids, :, sp_offs].set(k_s)
                vs = vs.at[l, sp_lids, :, sp_offs].set(v_s)
            else:
                kc = kc.at[l, sp_lids, :, sp_offs].set(kw.astype(kc.dtype))
                vc = vc.at[l, sp_lids, :, sp_offs].set(vw.astype(vc.dtype))

            def lay(x):
                return (None if x is None else
                        jax.lax.dynamic_index_in_dim(x, l, 0,
                                                     keepdims=False))
            attn = sp_decode_attention(
                q, lay(kc), lay(vc), sp_lt, sp_ll, scale, lay(ks), lay(vs),
                softcap=cfg.attn_logit_softcap, sp_axis=sp_axis)
            return attn, kc, vc, ks, vs

    def one_layer(carry, l, lp, window, dense=False):
        hid, kc, vc, ks, vs = carry
        w = _weight_getter(lp, stacked)

        if cfg.mla:
            # Multi-head Latent Attention (deepseek_v2): MQA over the
            # cached [c | k_pe] latent via W_uk absorption (_mla_qkv)
            normed = rmsnorm(hid, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v, w_uv = _mla_qkv(cfg, lp, w, normed, cos, sin, l,
                                     tp_size)
            d_pad = kc.shape[-1]
            if sp_axis is not None:
                attn, kc, vc, ks, vs = sp_store_attend(
                    pad_head(q, d_pad), pad_head(k, d_pad),
                    pad_head(v, d_pad), kc, vc, ks, vs, l)
            else:
                if dp_axis is not None:
                    kc, vc, ks, vs = _dp_store_remote_decode(
                        kc, vc, ks, vs, pad_head(k, d_pad),
                        pad_head(v, d_pad), tables_g, ctx_g, l, dp_axis)
                attn, kc, vc, ks, vs = paged_decode_append_auto(
                    pad_head(q, d_pad), pad_head(k, d_pad),
                    pad_head(v, d_pad), kc, vc, block_tables, context_lens,
                    l, scale, ks, vs, window=window,
                    softcap=cfg.attn_logit_softcap)
            attn_flat = _mla_out(cfg, attn, w_uv)
            from ..ops.linear import quant_linear_normed
            attn_out = quant_linear_normed(attn_flat, w("wo"), None,
                                           cfg.rms_norm_eps, l)
            if attn_out is None:
                attn_out = linear(attn_flat, w("wo"), layer=l)
            attn_out = _maybe_psum(attn_out, tp_axis)
            new_hid = None
            if not dense:
                new_hid = _fused_moe_dispatch(cfg, w, lp, l, attn_out,
                                              hid, tp_axis, tp_size)
            if new_hid is None:
                normed2, resid = rmsnorm_residual(attn_out, hid,
                                                  lp["mlp_norm"],
                                                  cfg.rms_norm_eps)
                mlp = _maybe_psum(
                    _mlp_out(cfg, w, lp, l, normed2, tp_axis, tp_size,
                             dense_prefix=dense), tp_axis)
                new_hid = resid + mlp
            return (new_hid, kc, vc, ks, vs)

        # norm + activation-quantization fused into the a8 qkv kernel when
        # available; else the classic chain. Under TP the fused weights are
        # rank-interleaved shards, so the same kernels run per rank (see
        # `ops/quant.py::interleave_columns`).
        from ..ops.linear import fused_mlp_block, quant_linear_normed
        qkv = None
        if w("wqkv") is not None:
            qkv = quant_linear_normed(hid, w("wqkv"), lp["attn_norm"],
                                      cfg.rms_norm_eps, l,
                                      bias=lp.get("bqkv"))
        kv_dim_l = n_kv * cfg.head_dim
        if qkv is not None:
            if adapter_ids is not None and "lora_qkv_a" in lp:
                # LoRA rides the fused base matmul: recompute the (cheap)
                # norm for the delta input only
                normed = rmsnorm(hid, lp["attn_norm"], cfg.rms_norm_eps)
                qkv = qkv + lora_delta(normed, lp["lora_qkv_a"],
                                       lp["lora_qkv_b"], adapter_ids,
                                       lora_scaling)
            q, k, v = (qkv[..., :q_dim], qkv[..., q_dim:q_dim + kv_dim_l],
                       qkv[..., q_dim + kv_dim_l:])
        else:
            normed = rmsnorm(hid, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v = _qkv(normed, w, lp, l, q_dim, kv_dim_l)
            if adapter_ids is not None and "lora_qkv_a" in lp:
                d = lora_delta(normed, lp["lora_qkv_a"], lp["lora_qkv_b"],
                               adapter_ids, lora_scaling)
                q = q + d[..., :q_dim]
                k = k + d[..., q_dim:q_dim + kv_dim_l]
                v = v + d[..., q_dim + kv_dim_l:]
        q = q.reshape(B, n_heads, cfg.head_dim)
        k = k.reshape(B, n_kv, cfg.head_dim)
        v = v.reshape(B, n_kv, cfg.head_dim)
        if cfg.qk_norm:   # per-head (qwen3) / full-width (olmoe) pre-RoPE
            q, k = _qk_norm(cfg, lp, q, k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        d_pad = kc.shape[-1]
        if sp_axis is not None:
            attn, kc, vc, ks, vs = sp_store_attend(
                pad_head(q, d_pad), pad_head(k, d_pad), pad_head(v, d_pad),
                kc, vc, ks, vs, l)
        else:
            if dp_axis is not None:
                kc, vc, ks, vs = _dp_store_remote_decode(
                    kc, vc, ks, vs, pad_head(k, d_pad), pad_head(v, d_pad),
                    tables_g, ctx_g, l, dp_axis)
            attn, kc, vc, ks, vs = paged_decode_append_auto(
                pad_head(q, d_pad), pad_head(k, d_pad), pad_head(v, d_pad),
                kc, vc, block_tables, context_lens, l, scale, ks, vs,
                window=window, softcap=cfg.attn_logit_softcap)
        attn = attn[..., : cfg.head_dim]
        attn_flat = attn.reshape(B, q_dim)
        # o-proj is row-parallel: fused a8 kernel on the per-rank K shard,
        # psum after (the reference's NCCL all_reduce, model_graph.py:211)
        attn_out = quant_linear_normed(attn_flat, w("wo"), None,
                                       cfg.rms_norm_eps, l)
        if attn_out is None:
            attn_out = linear(attn_flat, w("wo"), layer=l)
        attn_out = _maybe_psum(attn_out, tp_axis)
        if adapter_ids is not None and "lora_o_a" in lp:
            attn_out = attn_out + lora_delta(
                attn_flat, lp["lora_o_a"], lp["lora_o_b"], adapter_ids,
                lora_scaling, reduce_axis=tp_axis)
        if cfg.post_norms:   # gemma2: norm the attn OUTPUT pre-residual
            attn_out = rmsnorm(attn_out, lp["post_attn_norm"],
                               cfg.rms_norm_eps)

        # fused_mlp_block implements the llama/qwen norm+SwiGLU structure;
        # sandwich-norm / GeGLU families take the explicit path. MoE with
        # quantized expert stacks gets the one-launch routed block.
        new_hid = None
        if not cfg.post_norms and cfg.hidden_act == "silu":
            if cfg.num_experts:
                new_hid = _fused_moe_dispatch(cfg, w, lp, l, attn_out, hid,
                                              tp_axis, tp_size)
            else:
                new_hid = fused_mlp_block(attn_out, hid, lp["mlp_norm"],
                                          cfg.rms_norm_eps, w("w_gate_up"),
                                          w("w_down"), l, tp_axis=tp_axis)
        if new_hid is None:
            normed2, resid = rmsnorm_residual(attn_out, hid, lp["mlp_norm"],
                                              cfg.rms_norm_eps)
            mlp = _maybe_psum(
                _mlp_out(cfg, w, lp, l, normed2, tp_axis, tp_size), tp_axis)
            if cfg.post_norms:
                mlp = rmsnorm(mlp, lp["post_mlp_norm"], cfg.rms_norm_eps)
            new_hid = resid + mlp
        return (new_hid, kc, vc, ks, vs)

    def body(carry, xs):
        ls, lps = xs
        for l, lp, win in _sub_layers(cfg, ls, lps):
            carry = one_layer(carry, l, lp, win)
        return carry, None

    # deepseek's dense-prefix design slices every full-depth bf16 stack
    # ([k0:] for the scan xs, [i] for the unrolled prefix) — inside a
    # decode-SPAN scan those slices re-materialize EVERY STEP (~1.8
    # ms/step on deepseek-v2-lite b8, xplane r5). decode_span precomputes
    # them once per dispatch and passes ``scan_inputs``.
    if scan_inputs is None:
        scan_inputs = (list(_prefix_layers(params, cfg)),
                       _layer_xs(params, cfg))
    prefix_lps, layer_xs = scan_inputs
    carry = (h, k_cache, v_cache, k_scales, v_scales)
    for i, lp0 in prefix_lps:                    # deepseek dense prefix
        carry = one_layer(carry, jnp.int32(i), lp0, cfg.layer_window(0),
                          dense=True)
    (h, k_cache, v_cache, k_scales, v_scales), _ = jax.lax.scan(
        body, carry, layer_xs)

    logits = None
    if params.get("lm_head") is not None:
        # quantized path: final rmsnorm + activation quant fused into the
        # a8 lm_head kernel (the biggest single non-layer cost). Under TP
        # the lm_head is vocab-sharded; gather local logits so every rank
        # samples identically.
        from ..ops.linear import quant_linear_normed
        logits = quant_linear_normed(h, params["lm_head"],
                                     params["final_norm"], cfg.rms_norm_eps,
                                     None)
        if logits is not None:
            logits = logits.astype(jnp.float32)
            if tp_axis is not None:
                logits = jax.lax.all_gather(logits, tp_axis, axis=-1,
                                            tiled=True)
    if logits is None:
        h = rmsnorm(h, params["final_norm"], cfg.rms_norm_eps)
        logits = _lm_logits(params, h, tp_axis)
    if cfg.final_logit_softcap:   # gemma2
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap)
    if k_scales is None:
        return logits, k_cache, v_cache
    return logits, k_cache, v_cache, k_scales, v_scales


# ---------------------------------------------------------------------------
# Multi-step decode: span of steps with on-device token feedback
# ---------------------------------------------------------------------------


def decode_span(cfg: ModelConfig, params: Params,
                k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                tokens: jnp.ndarray, block_tables: jnp.ndarray,
                context_lens: jnp.ndarray,
                temperature: jnp.ndarray, top_p: jnp.ndarray,
                rng: jax.Array, num_steps: int,
                tp_axis: str | None = None, tp_size: int = 1,
                k_scales: jnp.ndarray | None = None,
                v_scales: jnp.ndarray | None = None,
                top_ks: jnp.ndarray | None = None,
                adapter_ids: jnp.ndarray | None = None,
                lora_scaling: float = 1.0,
                logprobs_k: int = 0,
                penalties: tuple | None = None,
                seed_state: tuple | None = None,
                dp_axis: str | None = None,
                sp_axis: str | None = None, sp_size: int = 1,
                ):
    """Run ``num_steps`` decode steps entirely on device, feeding each
    sampled token into the next step (no host round-trips — the TPU
    equivalent of replaying a captured CUDA graph N times, but with
    sampling fused in).

    ``penalties``: optional ``(hist [B, L], hist_lens [B], out_start [B],
    presence [B], freq [B], rep [B])`` — builds on-device (counts, seen)
    state from the prompt+output history once per span and maintains it
    incrementally inside the scan, applying OpenAI/HF sampling penalties
    to the logits before each sample (`ops/sampling.py::apply_penalties`).

    Returns (tokens ``[B, num_steps]`` int32, lp, new_k, new_v[,
    new_k_scales, new_v_scales]) where ``lp`` is ``()`` when
    ``logprobs_k == 0``, else ``(chosen [B, S] f32, top [B, S, K] f32,
    top_ids [B, S, K] int32)`` — raw-logit log-softmax per emitted token.
    Sequences that hit EOS mid-span keep generating; the host discards
    the tail.
    """
    from ..ops.sampling import (apply_penalties, penalty_state,
                                penalty_update, per_row_keys, sample_tokens,
                                token_logprobs)

    quantized = k_scales is not None
    if penalties is not None:
        (hist, hist_lens, out_start, p_pres, p_freq, p_rep, p_bias_ids,
         p_bias_vals) = penalties
        counts0, seen0 = penalty_state(hist, hist_lens, out_start,
                                       cfg.vocab_size)
    else:
        counts0 = seen0 = jnp.zeros((), jnp.float32)   # inert carry
    if seed_state is not None:
        seeds, pos0 = seed_state        # [B] (0 = unseeded), [B] out pos
    else:
        pos0 = jnp.zeros((), jnp.int32)  # inert carry

    # slice the layer-scan inputs ONCE per span dispatch, not per step
    # (deepseek's [k0:] stack slices cost ~1.8 ms/step otherwise)
    scan_inputs = (list(_prefix_layers(params, cfg)),
                   _layer_xs(params, cfg))

    def body(carry, _):
        toks, ctx, kc, vc, ks, vs, key, counts, seen, pos = carry
        if quantized:
            logits, kc, vc, ks, vs = decode_step(
                cfg, params, kc, vc, toks, block_tables, ctx, tp_axis,
                tp_size, ks, vs, adapter_ids=adapter_ids,
                lora_scaling=lora_scaling, dp_axis=dp_axis,
                sp_axis=sp_axis, sp_size=sp_size, scan_inputs=scan_inputs)
        else:
            logits, kc, vc = decode_step(
                cfg, params, kc, vc, toks, block_tables, ctx, tp_axis,
                tp_size, adapter_ids=adapter_ids,
                lora_scaling=lora_scaling, dp_axis=dp_axis,
                sp_axis=sp_axis, sp_size=sp_size, scan_inputs=scan_inputs)
        key, sub = jax.random.split(key)
        raw = logits
        if penalties is not None:
            logits = apply_penalties(logits, counts, seen, p_pres, p_freq,
                                     p_rep, p_bias_ids, p_bias_vals)
        rk = (per_row_keys(sub, seeds, pos) if seed_state is not None
              else None)
        nxt = sample_tokens(logits, sub, temperature, top_p,
                            top_k_per_seq=top_ks, row_keys=rk)
        if penalties is not None:
            counts, seen = penalty_update(counts, seen, nxt)
        out = (nxt,)
        if logprobs_k:
            # logprobs report the RAW model distribution (what the model
            # believed), not the penalty-shaped sampling distribution
            out += token_logprobs(raw, nxt, logprobs_k)
        return (nxt, ctx + 1, kc, vc, ks, vs, key, counts, seen,
                pos + 1), out

    (_, _, k_cache, v_cache, k_scales, v_scales, _, _, _, _), out = \
        jax.lax.scan(
            body, (tokens, context_lens, k_cache, v_cache, k_scales,
                   v_scales, rng, counts0, seen0, pos0), None,
            length=num_steps)
    toks = out[0].T                                   # [B, num_steps]
    lp = ()
    if logprobs_k:
        lp = (out[1].T, out[2].transpose(1, 0, 2), out[3].transpose(1, 0, 2))
    if not quantized:
        return toks, lp, k_cache, v_cache
    return toks, lp, k_cache, v_cache, k_scales, v_scales


# ---------------------------------------------------------------------------
# Prefill step: rectangular [B, S] chunk, fills the paged cache
# ---------------------------------------------------------------------------


def prefill_step(cfg: ModelConfig, params: Params,
                 k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                 tokens: jnp.ndarray, block_tables: jnp.ndarray,
                 chunk_lens: jnp.ndarray, history_lens: jnp.ndarray,
                 has_history: bool = True,
                 tp_axis: str | None = None, tp_size: int = 1,
                 k_scales: jnp.ndarray | None = None,
                 v_scales: jnp.ndarray | None = None,
                 all_greedy: bool = False,
                 adapter_ids: jnp.ndarray | None = None,
                 lora_scaling: float = 1.0,
                 slot_exact_store: bool = False,
                 with_logits: bool = False,
                 dp_axis: str | None = None,
                 sp_axis: str | None = None, sp_size: int = 1,
                 scan_inputs=None,
                 ):
    """Prefill a ``[B, S]`` chunk, writing all KV into the paged cache.

    chunk_lens:   ``[B]`` — valid tokens in this chunk (rest is padding)
    history_lens: ``[B]`` — tokens already in cache before this chunk
                  (0 for plain prefill; >0 enables chunked prefill, which the
                  reference lacks — SURVEY.md §5 "long-context: absent").
    has_history:  static — False skips the attend-to-cache path entirely
                  (the common single-chunk prefill; saves a [B,H,S,max_ctx]
                  score tensor).
    all_greedy:   static — return per-position argmax tokens ``[B, S]``
                  instead of last-token logits (speculative verification).
    with_logits:  static, only with ``all_greedy`` — also return the full
                  per-position logits ``[B, S, V]`` fp32 (softcap applied),
                  so speculative verification can emit logprobs for the
                  accepted tokens at near-zero extra cost.
    slot_exact_store: static — force the slot-exact scatter store even when
                  the chunk is page-sized (speculative windows start at
                  arbitrary, non-page-aligned history offsets; the bulk
                  page-granular store would clobber neighbor slots).
    Returns (last-token logits ``[B, V]`` fp32 — or greedy ids ``[B, S]``
    when ``all_greedy`` — , new_k, new_v).
    """
    from ..ops.attention import use_pallas

    B, S = tokens.shape
    page_size = k_cache.shape[3]
    scale = cfg.attn_scale
    n_heads = cfg.num_heads // tp_size
    n_kv = (cfg.num_kv_heads if cfg.mla
            else cfg.num_kv_heads // tp_size)
    q_dim = n_heads * cfg.head_dim

    h = jnp.take(params["embed"], tokens, axis=0)          # [B, S, H]
    if cfg.embed_scale:   # gemma: sqrt(H) normalizer, cast to model dtype
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, h.dtype)
    positions = history_lens[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    rope_dim = cfg.qk_rope_head_dim if cfg.mla else cfg.head_dim
    cos, sin = rope_cos_sin(positions, rope_dim, cfg.rope_theta,
                            scaling=cfg.rope_scaling)

    quantized = k_scales is not None

    def eff_window(window):
        # Sliding-window attention (mistral/gemma2): statically dropped
        # when the cache cannot hold more than `window` tokens (the mask
        # never bites); otherwise handled inside the Pallas prefill kernel
        # (history chunks below the q-block's window are never DMA'd).
        if (window is not None
                and block_tables.shape[1] * page_size <= window
                and S <= window):
            return None
        return window
    # sequence-parallel KV: the bulk page-granular Pallas store writes
    # whole pages by GLOBAL id — incompatible with per-rank ownership
    # redirects, so sp always takes the scatter store + jnp sp attention
    pallas_store = (use_pallas() and S % page_size == 0
                    and not slot_exact_store and sp_axis is None)
    pallas_attn = (use_pallas() and S % min(128, S) == 0
                   and S % min(256, S) == 0 and sp_axis is None)
    if not pallas_store:
        valid = jnp.arange(S, dtype=jnp.int32)[None, :] < chunk_lens[:, None]
        page_ids, offsets = slot_coords(block_tables, positions, page_size)
        # Route padding-token writes to the reserved trash page 0, slot 0.
        page_ids = jnp.where(valid, page_ids, 0)
        offsets = jnp.where(valid, offsets, 0)
        flat_pages = page_ids.reshape(B * S)
        flat_offsets = offsets.reshape(B * S)

    if dp_axis is not None:   # see _dp_store_remote_prefill
        tables_g = jax.lax.all_gather(block_tables, dp_axis, axis=0,
                                      tiled=True)
        hist_g = jax.lax.all_gather(history_lens, dp_axis, axis=0,
                                    tiled=True)
        chunk_g = jax.lax.all_gather(chunk_lens, dp_axis, axis=0,
                                     tiled=True)
        pos_g = hist_g[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        valid_g = jnp.arange(S, dtype=jnp.int32)[None, :] < chunk_g[:, None]

    if sp_axis is not None:
        from ..ops.attention import (chunked_prefill_attention_sp,
                                     sp_local_tables, sp_owner_coords)
        rank_sp = jax.lax.axis_index(sp_axis)
        # history-shard tables/lens for the sp attention (the chunk's own
        # K/V are passed separately and included once, by seq-rank 0)
        sp_lt, sp_hl = sp_local_tables(block_tables, history_lens,
                                       page_size, sp_size, rank_sp)
        # store coords: all rows (all replicas' under dp), padding and
        # non-owned positions redirected to the local trash slot 0
        if dp_axis is not None:
            g_pids, g_offs = slot_coords(tables_g, pos_g, page_size)
            g_pids = jnp.where(valid_g, g_pids, 0)
            g_offs = jnp.where(valid_g, g_offs, 0)
        else:
            g_pids, g_offs = page_ids, offsets     # padding-redirected above
        sp_flat_pages = sp_owner_coords(
            g_pids, sp_size, rank_sp).reshape(-1)
        sp_flat_offsets = g_offs.reshape(-1)

    def store_chunk(kc, vc, ks, vs, l, k, v):
        if sp_axis is not None:
            return _store_chunk_sp(kc, vc, ks, vs, l, k, v)
        if dp_axis is not None:
            kc, vc, ks, vs = _dp_store_remote_prefill(
                kc, vc, ks, vs, k, v, tables_g, pos_g, valid_g, l, dp_axis)
        return _store_chunk_local(kc, vc, ks, vs, l, k, v)

    def _store_chunk_sp(kc, vc, ks, vs, l, k, v):
        """Ownership-redirected scatter of the whole chunk's K/V (all data
        replicas' rows under dp — the cache is replicated over data,
        sharded over seq)."""
        d_pad = kc.shape[-1]
        kw, vw = pad_head(k, d_pad), pad_head(v, d_pad)
        if dp_axis is not None:
            kw = jax.lax.all_gather(kw, dp_axis, axis=0, tiled=True)
            vw = jax.lax.all_gather(vw, dp_axis, axis=0, tiled=True)
        Bg, Sg = kw.shape[:2]
        if quantized:
            from ..ops.attention import quantize_kv
            k_q, k_s = quantize_kv(kw)
            v_q, v_s = quantize_kv(vw)
            kc = kc.at[l, sp_flat_pages, :, sp_flat_offsets].set(
                k_q.reshape(Bg * Sg, n_kv, d_pad))
            vc = vc.at[l, sp_flat_pages, :, sp_flat_offsets].set(
                v_q.reshape(Bg * Sg, n_kv, d_pad))
            ks = ks.at[l, sp_flat_pages, :, sp_flat_offsets].set(
                k_s.reshape(Bg * Sg, n_kv))
            vs = vs.at[l, sp_flat_pages, :, sp_flat_offsets].set(
                v_s.reshape(Bg * Sg, n_kv))
            return kc, vc, ks, vs
        kc = kc.at[l, sp_flat_pages, :, sp_flat_offsets].set(
            kw.reshape(Bg * Sg, n_kv, d_pad).astype(kc.dtype))
        vc = vc.at[l, sp_flat_pages, :, sp_flat_offsets].set(
            vw.reshape(Bg * Sg, n_kv, d_pad).astype(vc.dtype))
        return kc, vc, ks, vs

    def _store_chunk_local(kc, vc, ks, vs, l, k, v):
        d_pad = kc.shape[-1]
        if quantized:
            from ..ops.attention import quantize_kv
            k_q, k_s = quantize_kv(pad_head(k, d_pad))  # [B,S,KV,Dp],[B,S,KV]
            v_q, v_s = quantize_kv(pad_head(v, d_pad))
            if pallas_store:
                from ..ops.pallas.kv_store import store_kv_pages_q
                n_pg = S // page_size

                def scale_pages(s):
                    sp = jnp.zeros((B, n_pg, n_kv, 128), jnp.float32)
                    return sp.at[..., :page_size].set(
                        s.reshape(B, n_pg, page_size, n_kv)
                        .transpose(0, 1, 3, 2))

                return store_kv_pages_q(
                    k_q.transpose(0, 2, 1, 3), v_q.transpose(0, 2, 1, 3),
                    scale_pages(k_s), scale_pages(v_s), kc, vc, ks, vs,
                    block_tables, history_lens, chunk_lens, l)
            kc = kc.at[l, flat_pages, :, flat_offsets].set(
                k_q.reshape(B * S, n_kv, d_pad))
            vc = vc.at[l, flat_pages, :, flat_offsets].set(
                v_q.reshape(B * S, n_kv, d_pad))
            ks = ks.at[l, flat_pages, :, flat_offsets].set(
                k_s.reshape(B * S, n_kv))
            vs = vs.at[l, flat_pages, :, flat_offsets].set(
                v_s.reshape(B * S, n_kv))
            return kc, vc, ks, vs
        if pallas_store:
            from ..ops.pallas.kv_store import store_kv_pages
            kt = pad_head(k, d_pad).transpose(0, 2, 1, 3)   # [B, KV, S, D]
            vt = pad_head(v, d_pad).transpose(0, 2, 1, 3)
            kc, vc = store_kv_pages(kt, vt, kc, vc, block_tables,
                                    history_lens, chunk_lens, l)
            return kc, vc, ks, vs
        if slot_exact_store and use_pallas():
            # speculative windows: arbitrary (mid-page) start offsets; RMW
            # the touched pages instead of an XLA cache-copying scatter
            from ..ops.pallas.kv_store import paged_append_rows
            kt = pad_head(k, d_pad).transpose(0, 2, 1, 3)
            vt = pad_head(v, d_pad).transpose(0, 2, 1, 3)
            kc, vc = paged_append_rows(kt, vt, kc, vc, block_tables,
                                       history_lens, l)
            return kc, vc, ks, vs
        kc = kc.at[l, flat_pages, :, flat_offsets].set(
            pad_head(k, d_pad).reshape(
                B * S, n_kv, d_pad).astype(kc.dtype))
        vc = vc.at[l, flat_pages, :, flat_offsets].set(
            pad_head(v, d_pad).reshape(
                B * S, n_kv, d_pad).astype(vc.dtype))
        return kc, vc, ks, vs

    stacked = _stacked_weights(params)

    def one_layer(carry, l, lp, window, dense=False):
        hid, kc, vc, ks, vs = carry
        window = eff_window(window)
        w = _weight_getter(lp, stacked)
        # Same kernel fusions as decode_step; quant_linear_normed /
        # fused_mlp_block gate themselves on row count, so short chunks
        # (speculative verify windows, small prefills) take the fused
        # launches and big chunks keep the MXU-bound wide-matmul path.
        from ..ops.linear import fused_mlp_block, quant_linear_normed
        w_uv = None
        if cfg.mla:
            # Multi-head Latent Attention (deepseek_v2): q/k built by
            # _mla_qkv (rope applied inside, interleaved convention);
            # the value is the shared latent, padded to the key width so
            # the standard GQA attention/store paths apply unchanged
            normed = rmsnorm(hid, lp["attn_norm"], cfg.rms_norm_eps)
            q, k, v, w_uv = _mla_qkv(cfg, lp, w, normed, cos, sin, l,
                                     tp_size)
            v = pad_head(v, q.shape[-1])
        else:
            qkv = None
            if w("wqkv") is not None:
                qkv = quant_linear_normed(hid, w("wqkv"), lp["attn_norm"],
                                          cfg.rms_norm_eps, l,
                                          bias=lp.get("bqkv"))
            kv_dim_l = n_kv * cfg.head_dim
            if qkv is not None:
                if adapter_ids is not None and "lora_qkv_a" in lp:
                    normed = rmsnorm(hid, lp["attn_norm"],
                                     cfg.rms_norm_eps)
                    qkv = qkv + lora_delta(normed, lp["lora_qkv_a"],
                                           lp["lora_qkv_b"], adapter_ids,
                                           lora_scaling)
                q, k, v = (qkv[..., :q_dim],
                           qkv[..., q_dim:q_dim + kv_dim_l],
                           qkv[..., q_dim + kv_dim_l:])
            else:
                normed = rmsnorm(hid, lp["attn_norm"], cfg.rms_norm_eps)
                q, k, v = _qkv(normed, w, lp, l, q_dim, kv_dim_l)
                if adapter_ids is not None and "lora_qkv_a" in lp:
                    d = lora_delta(normed, lp["lora_qkv_a"],
                                   lp["lora_qkv_b"], adapter_ids,
                                   lora_scaling)
                    q = q + d[..., :q_dim]
                    k = k + d[..., q_dim:q_dim + kv_dim_l]
                    v = v + d[..., q_dim + kv_dim_l:]
            q = q.reshape(B, S, n_heads, cfg.head_dim)
            k = k.reshape(B, S, n_kv, cfg.head_dim)
            v = v.reshape(B, S, n_kv, cfg.head_dim)
            if cfg.qk_norm:  # per-head (qwen3) / full-width (olmoe) norm
                q, k = _qk_norm(cfg, lp, q, k)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        d_pad = kc.shape[-1]
        hd_out = d_pad if cfg.mla else cfg.head_dim   # _mla_out slices dc
        nh_l, nkv_l = ((cfg.num_heads // tp_size, 1) if cfg.mla
                       else (n_heads, n_kv))
        # STORE BEFORE ATTEND: the store writes only the chunk's pages and
        # the attention reads only history pages (the chunk's K/V arrive
        # as separate operands), so reading the post-store buffer is safe
        # — and the cache dataflow becomes one linear chain. The previous
        # attend-then-store order gave XLA two users of one buffer (a
        # reading custom call + an in-place-aliasing custom call), which
        # copy-protected the ENTIRE cache around every layer's store
        # (2 x ~45 us/layer on the 7B prefill xplane, RESULTS r4/r5 —
        # ~2.5 ms of a 21.6 ms 256-token chunk).
        kc, vc, ks, vs = store_chunk(kc, vc, ks, vs, l, k, v)
        if sp_axis is not None:
            def lay(x):
                return (None if x is None else
                        jax.lax.dynamic_index_in_dim(x, l, 0,
                                                     keepdims=False))
            attn = chunked_prefill_attention_sp(
                pad_head(q, d_pad), pad_head(k, d_pad), pad_head(v, d_pad),
                lay(kc), lay(vc), sp_lt, sp_hl, scale, lay(ks), lay(vs),
                softcap=cfg.attn_logit_softcap,
                sp_axis=sp_axis)[..., :hd_out]
        elif pallas_attn:
            from ..ops.pallas.prefill_attention import flash_prefill_attention
            qt = pad_head(q, d_pad).reshape(
                B, S, nkv_l, nh_l // nkv_l, d_pad).transpose(0, 2, 3, 1, 4)
            attn = flash_prefill_attention(
                qt, pad_head(k, d_pad).transpose(0, 2, 1, 3),
                pad_head(v, d_pad).transpose(0, 2, 1, 3),
                kc, vc, block_tables, history_lens, chunk_lens, l,
                scale=scale, with_history=has_history,
                k_scales=ks, v_scales=vs, window=window,
                softcap=cfg.attn_logit_softcap)
            attn = attn.transpose(0, 3, 1, 2, 4).reshape(
                B, S, nh_l, d_pad)[..., :hd_out]
        elif has_history:
            attn = chunked_prefill_attention_ref(
                pad_head(q, d_pad), pad_head(k, d_pad), pad_head(v, d_pad),
                kc[l], vc[l], block_tables, history_lens, scale,
                ks[l] if quantized else None,
                vs[l] if quantized else None,
                window=window,
                softcap=cfg.attn_logit_softcap)[..., :hd_out]
        else:
            attn = prefill_attention_ref(q, k, v, scale, window=window,
                                         softcap=cfg.attn_logit_softcap)

        if cfg.mla:
            attn_flat = _mla_out(cfg, attn, w_uv)
        else:
            attn_flat = attn.reshape(B, S, q_dim)
        attn_out = quant_linear_normed(attn_flat, w("wo"), None,
                                       cfg.rms_norm_eps, l)
        if attn_out is None:
            attn_out = linear(attn_flat, w("wo"), layer=l)
        attn_out = _maybe_psum(attn_out, tp_axis)
        if adapter_ids is not None and "lora_o_a" in lp:
            attn_out = attn_out + lora_delta(
                attn_flat, lp["lora_o_a"], lp["lora_o_b"], adapter_ids,
                lora_scaling, reduce_axis=tp_axis)
        if cfg.post_norms:   # gemma2: norm the attn OUTPUT pre-residual
            attn_out = rmsnorm(attn_out, lp["post_attn_norm"],
                               cfg.rms_norm_eps)
        new_hid = None
        if not cfg.post_norms and cfg.hidden_act == "silu":
            if cfg.num_experts:
                # spec-verify windows / short chunks ride the one-launch
                # MoE block (gates itself on row count); covers plain AND
                # deepseek (shared experts + routing extras) MoE layers
                if not dense:
                    new_hid = _fused_moe_dispatch(cfg, w, lp, l, attn_out,
                                                  hid, tp_axis, tp_size)
            else:
                new_hid = fused_mlp_block(attn_out, hid, lp["mlp_norm"],
                                          cfg.rms_norm_eps, w("w_gate_up"),
                                          w("w_down"), l, tp_axis=tp_axis)
        if new_hid is None:
            normed2, resid = rmsnorm_residual(attn_out, hid, lp["mlp_norm"],
                                              cfg.rms_norm_eps)
            mlp = _maybe_psum(
                _mlp_out(cfg, w, lp, l, normed2, tp_axis, tp_size,
                         dense_prefix=dense), tp_axis)
            if cfg.post_norms:
                mlp = rmsnorm(mlp, lp["post_mlp_norm"], cfg.rms_norm_eps)
            new_hid = resid + mlp
        return (new_hid, kc, vc, ks, vs)

    def body(carry, xs):
        ls, lps = xs
        for l, lp, win in _sub_layers(cfg, ls, lps):
            carry = one_layer(carry, l, lp, win)
        return carry, None

    carry = (h, k_cache, v_cache, k_scales, v_scales)
    if scan_inputs is None:   # see decode_step: hoisted by looping callers
        scan_inputs = (list(_prefix_layers(params, cfg)),
                       _layer_xs(params, cfg))
    prefix_lps, layer_xs_v = scan_inputs
    for i, lp0 in prefix_lps:                    # deepseek dense prefix
        carry = one_layer(carry, jnp.int32(i), lp0, cfg.layer_window(0),
                          dense=True)
    (h, k_cache, v_cache, k_scales, v_scales), _ = jax.lax.scan(
        body, carry, layer_xs_v)

    from ..ops.linear import quant_linear_normed as _qln

    def _fused_logits(hh):
        """Final rmsnorm + a8 lm_head in one launch (None -> fall back).
        Under TP the lm_head is vocab-sharded; local logits are gathered."""
        if params.get("lm_head") is None:
            return None
        y = _qln(hh, params["lm_head"], params["final_norm"],
                 cfg.rms_norm_eps, None)
        if y is None:
            return None
        y = y.astype(jnp.float32)
        if tp_axis is not None:
            y = jax.lax.all_gather(y, tp_axis, axis=-1, tiled=True)
        return y

    if all_greedy:
        # Per-position argmax (speculative verification): the [B, S, V]
        # logits reduce to [B, S] on device; only ids leave the step.
        logits = _fused_logits(h)
        if logits is None:
            logits = _lm_logits(
                params, rmsnorm(h, params["final_norm"], cfg.rms_norm_eps),
                tp_axis)
        out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if with_logits:
            # logprob consumers see the same (softcapped) distribution the
            # plain decode path reports; argmax above skips the softcap
            # because tanh is monotonic
            logits = logits.astype(jnp.float32)
            if cfg.final_logit_softcap:
                logits = cfg.final_logit_softcap * jnp.tanh(
                    logits / cfg.final_logit_softcap)
            out = (out, logits)
    else:
        # Only the last valid token's logits are needed (next-token
        # prediction); rmsnorm is per-position so select-then-norm is
        # equivalent to norm-then-select.
        last_idx = jnp.clip(chunk_lens - 1, 0, S - 1)
        h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
        out = _fused_logits(h_last)
        if out is None:
            out = _lm_logits(
                params,
                rmsnorm(h_last, params["final_norm"], cfg.rms_norm_eps),
                tp_axis)
        if cfg.final_logit_softcap:   # gemma2 (argmax-invariant, so the
            # all_greedy branch above skips it: tanh is monotonic)
            out = cfg.final_logit_softcap * jnp.tanh(
                out / cfg.final_logit_softcap)
    if not quantized:
        return out, k_cache, v_cache
    return out, k_cache, v_cache, k_scales, v_scales


# ---------------------------------------------------------------------------
# Plain full-sequence forward (no cache) — used by the perplexity harness
# ---------------------------------------------------------------------------


def forward_logits(cfg: ModelConfig, params: Params,
                   tokens: jnp.ndarray) -> jnp.ndarray:
    """All-position logits ``[B, S, V]`` for evaluation (no KV cache)."""
    B, S = tokens.shape
    scale = cfg.attn_scale
    h = jnp.take(params["embed"], tokens, axis=0)
    if cfg.embed_scale:
        h = h * jnp.asarray(cfg.hidden_size ** 0.5, h.dtype)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
    rope_dim = cfg.qk_rope_head_dim if cfg.mla else cfg.head_dim
    cos, sin = rope_cos_sin(positions, rope_dim, cfg.rope_theta,
                            scaling=cfg.rope_scaling)

    stacked = _stacked_weights(params)

    def one_layer(hid, l, lp, window, dense=False):
        w = _weight_getter(lp, stacked)
        normed = rmsnorm(hid, lp["attn_norm"], cfg.rms_norm_eps)
        if cfg.mla:
            q, k, v, w_uv = _mla_qkv(cfg, lp, w, normed, cos, sin, l)
            v = pad_head(v, q.shape[-1])
            attn = prefill_attention_ref(q, k, v, scale, window=window,
                                         softcap=cfg.attn_logit_softcap)
            attn_flat = _mla_out(cfg, attn, w_uv)
        else:
            q, k, v = _qkv(normed, w, lp, l, cfg.q_dim, cfg.kv_dim)
            q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
            k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            if cfg.qk_norm:  # per-head (qwen3) / full-width (olmoe)
                q, k = _qk_norm(cfg, lp, q, k)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = prefill_attention_ref(q, k, v, scale, window=window,
                                         softcap=cfg.attn_logit_softcap)
            attn_flat = attn.reshape(B, S, cfg.q_dim)
        attn_out = linear(attn_flat, w("wo"), layer=l)
        if cfg.post_norms:
            attn_out = rmsnorm(attn_out, lp["post_attn_norm"],
                               cfg.rms_norm_eps)
        normed2, resid = rmsnorm_residual(attn_out, hid, lp["mlp_norm"],
                                          cfg.rms_norm_eps)
        mlp = _mlp_out(cfg, w, lp, l, normed2, dense_prefix=dense)
        if cfg.post_norms:
            mlp = rmsnorm(mlp, lp["post_mlp_norm"], cfg.rms_norm_eps)
        return resid + mlp

    def body(hid, xs):
        ls, lps = xs
        for l, lp, win in _sub_layers(cfg, ls, lps):
            hid = one_layer(hid, l, lp, win)
        return hid, None

    for i, lp0 in _prefix_layers(params, cfg):   # deepseek dense prefix
        h = one_layer(h, jnp.int32(i), lp0, cfg.layer_window(0),
                      dense=True)
    h, _ = jax.lax.scan(body, h, _layer_xs(params, cfg))
    h = rmsnorm(h, params["final_norm"], cfg.rms_norm_eps)
    logits = _lm_logits(params, h)
    if cfg.final_logit_softcap:
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap)
    return logits
