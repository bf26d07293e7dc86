"""Sharding specs for params, KV cache, and batch arrays.

Megatron-style TP expressed as GSPMD annotations (the TPU-native equivalent
of the reference's explicit per-rank weight chunking + NCCL all_reduce,
`core/layer/model_graph.py:97-116,211,219`):

* column-parallel (out-dim sharded on ``model``): wq/wk/wv, w_gate/w_up —
  activations after them are head/intermediate-sharded, no comm;
* row-parallel (in-dim sharded on ``model``): wo, w_down — XLA inserts the
  psum (the reference's two all_reduce calls per layer) automatically from
  the sharding constraints;
* KV cache sharded over kv_heads on ``model`` (each TP rank attends its own
  heads, like the reference's per-rank head split, `engine.py:108-114`);
* batch dimension sharded on ``data``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from .mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

# Per-leaf PartitionSpec for the layer-stacked param tree ([L, ...] leaves).
_LAYER_SPECS: dict[str, P] = {
    "attn_norm": P(),
    "mlp_norm": P(),
    "wq": P(None, None, MODEL_AXIS),       # column parallel
    "wk": P(None, None, MODEL_AXIS),
    "wv": P(None, None, MODEL_AXIS),
    "bq": P(None, MODEL_AXIS),
    "bk": P(None, MODEL_AXIS),
    "bv": P(None, MODEL_AXIS),
    "bqkv": P(None, MODEL_AXIS),
    "wo": P(None, MODEL_AXIS, None),       # row parallel
    "w_gate": P(None, None, MODEL_AXIS),
    "w_up": P(None, None, MODEL_AXIS),
    "w_down": P(None, MODEL_AXIS, None),
    # Multi-LoRA stacks [L, N, K, r] / [L, N, r, M]: the A of the
    # column-parallel qkv reads the replicated hidden (replicate); its B is
    # column-sharded with RANK-INTERLEAVED storage (engine.load_adapter
    # interleaves on install) so each rank's contiguous column shard is its
    # own (q_r|k_r|v_r) delta. o-proj is row-parallel: A shards its K dim
    # with the attn output; B replicated (the tiny [B, r] intermediate is
    # psummed inside lora_delta).
    "lora_qkv_a": P(),
    "lora_qkv_b": P(None, None, None, MODEL_AXIS),
    "lora_o_a": P(None, None, MODEL_AXIS, None),
    "lora_o_b": P(),
    # Mixture-of-Experts stacks [L, E, in, out]: default = every expert FFN
    # shards like the dense MLP (gate/up column-parallel on the
    # intermediate dim, down row-parallel, psummed by the caller); the
    # router is always replicated (every rank routes identically). When
    # num_experts divides tp, `param_specs(moe_ep=True)` switches to
    # EXPERT PARALLELISM (below) — whole experts per rank.
    "w_router": P(),
    "w_gate_e": P(None, None, None, MODEL_AXIS),
    "w_up_e": P(None, None, None, MODEL_AXIS),
    "w_down_e": P(None, None, MODEL_AXIS, None),
    # deepseek_v2 MLA: the latent path (kv_a, its norm, the cache) is
    # replicated — every rank computes identical per-token latents — and
    # the head-indexed projections shard on heads: q/q_b and kv_b are
    # column-parallel (contiguous head blocks), o row-parallel (above).
    "w_kv_a": P(),
    "kv_a_norm": P(),
    "w_kv_b": P(None, None, MODEL_AXIS),
    "w_q_a": P(),
    "q_a_norm": P(),
    "w_q_b": P(None, None, MODEL_AXIS),
    # deepseek dense-prefix + shared-expert MLPs: intermediate-dim TP
    # like the dense MLP (their row-parallel down partials ride the same
    # caller psum that reduces the routed/EP expert contributions)
    "w_gate_d": P(None, None, MODEL_AXIS),
    "w_up_d": P(None, None, MODEL_AXIS),
    "w_down_d": P(None, MODEL_AXIS, None),
    "w_gate_sh": P(None, None, MODEL_AXIS),
    "w_up_sh": P(None, None, MODEL_AXIS),
    "w_down_sh": P(None, MODEL_AXIS, None),
}

# Expert parallelism: shard the E axis — each rank holds E/tp whole
# experts; tokens routed to remote experts contribute zero locally and the
# caller's psum sums the expert contributions (models/moe.py).
_EP_SPECS: dict[str, P] = {
    "w_gate_e": P(None, MODEL_AXIS, None, None),
    "w_up_e": P(None, MODEL_AXIS, None, None),
    "w_down_e": P(None, MODEL_AXIS, None, None),
}


_ROW_PARALLEL = {"wo", "w_down", "w_down_sh"}  # contraction (in) dim sharded
# fused wqkv/w_gate_up are quantized with rank-INTERLEAVED columns
# (`ops/quant.py::interleave_columns`): the contiguous column shard this
# spec produces is, per rank, exactly its own fused (q_r|k_r|v_r) /
# (gate_r|up_r) block — the fused a8 kernels run unchanged inside shard_map
_COLUMN_PARALLEL = {"wq", "wk", "wv", "w_gate", "w_up", "wqkv", "w_gate_up",
                    "w_q_b", "w_gate_sh", "w_up_sh"}
# deepseek latent-path quantized stacks replicate under TP (every rank
# computes identical per-token latents), like their bf16 twins above
_REPLICATED_QUANT = {"w_kv_a", "w_q_a"}


def _quant_specs(leaf, column: bool, stacked: bool):
    """Per-leaf specs for a QuantizedTensor.

    column-parallel: every child shards its LAST axis (the out dim).
    row-parallel: q shards its packed-in axis, scales their group axis,
    scales_tiled its k-tile axis (block_k divides the per-rank K shard by
    construction, see `ops/quant.py::default_block_k`).
    """
    from ..ops.quant import QuantizedTensor

    lead = (None,) if stacked else ()
    if column:
        q_spec = P(*lead, None, MODEL_AXIS)
        s_spec = P(*lead, None, MODEL_AXIS)
        st_spec = P(*lead, None, None, MODEL_AXIS)
    else:
        q_spec = P(*lead, MODEL_AXIS, None)
        s_spec = P(*lead, MODEL_AXIS, None)
        st_spec = P(*lead, MODEL_AXIS, None, None)
    return QuantizedTensor(
        q=q_spec, scales=s_spec, scales_tiled=st_spec,
        bits=leaf.bits, group_size=leaf.group_size, block_k=leaf.block_k)


# Quantized expert stacks: EXPERT-MAJOR [E*L, ...] (ops/quant.py), so EP
# is a first-axis shard of every leaf (whole experts per rank; contraction
# dims are unsharded, block_k unchanged).
_QUANT_EXPERT_STACKS = {"w_gate_up_e", "w_down_e"}


def _quant_ep_specs(leaf, ep: bool):
    from ..ops.quant import QuantizedTensor

    ax = MODEL_AXIS if ep else None
    return QuantizedTensor(
        q=P(ax, None, None), scales=P(ax, None, None),
        scales_tiled=P(ax, None, None, None),
        bits=leaf.bits, group_size=leaf.group_size, block_k=leaf.block_k)


def param_specs(params: Any, moe_ep: bool = False) -> Any:
    """PartitionSpec pytree matching a model param tree. ``moe_ep``
    switches MoE expert stacks to expert parallelism (keep it in sync via
    `config.moe_uses_ep`)."""
    from ..ops.quant import QuantizedTensor

    def layer_spec(name, leaf):
        if isinstance(leaf, QuantizedTensor):
            if name in _QUANT_EXPERT_STACKS:
                return _quant_ep_specs(leaf, moe_ep)
            if name in _REPLICATED_QUANT:
                return QuantizedTensor(
                    q=P(), scales=P(), scales_tiled=P(), bits=leaf.bits,
                    group_size=leaf.group_size, block_k=leaf.block_k)
            return _quant_specs(leaf, column=name in _COLUMN_PARALLEL,
                                stacked=leaf.stacked)
        if moe_ep and name in _EP_SPECS:
            return _EP_SPECS[name]
        return _LAYER_SPECS.get(name, P())

    lm = params.get("lm_head")
    if lm is None:
        lm_spec = None
    elif isinstance(lm, QuantizedTensor):
        lm_spec = _quant_specs(lm, column=True, stacked=False)
    else:
        lm_spec = P(None, MODEL_AXIS)

    specs = {
        "embed": P(),                       # replicated (tied lm_head reads it)
        "final_norm": P(),
        "lm_head": lm_spec,
        "layers": {k: layer_spec(k, v) for k, v in params["layers"].items()},
    }
    return specs


def cache_spec(cfg: ModelConfig, tp_size: int, sp_size: int = 1) -> P:
    """KV cache [L, pages, kv_heads, page_size, head_dim]: shard kv heads on
    ``model`` when they divide evenly, otherwise replicate (GQA models with
    fewer kv heads than TP ranks). Under sequence parallelism the PAGE axis
    additionally shards over ``seq`` (global page g lives on seq-rank
    ``g % sp`` at local slot ``g // sp`` — a naming convention the store
    redirects and table localization implement consistently, see
    `ops/attention.py::sp_owner_coords` / `sp_local_tables`; the physical
    contiguous jax shard never leaves the device, so the convention never
    meets jax's global layout)."""
    seq = SEQ_AXIS if sp_size > 1 else None
    model = (MODEL_AXIS if tp_size > 1 and cfg.num_kv_heads % tp_size == 0
             else None)
    if seq is None and model is None:
        return P()
    return P(None, seq, model, None, None)


def scale_spec(cfg: ModelConfig, tp_size: int, sp_size: int = 1) -> P:
    """INT8-KV scale pages [L, pages, kv_heads, 128]: the kv-head and page
    axes shard exactly like the cache itself (`cache_spec`)."""
    seq = SEQ_AXIS if sp_size > 1 else None
    model = (MODEL_AXIS if tp_size > 1 and cfg.num_kv_heads % tp_size == 0
             else None)
    if seq is None and model is None:
        return P()
    return P(None, seq, model, None)


def batch_specs() -> dict[str, P]:
    return {
        "tokens": P(DATA_AXIS),
        "tokens_2d": P(DATA_AXIS, None),
        "block_tables": P(DATA_AXIS, None),
        "lens": P(DATA_AXIS),
        "sampling": P(DATA_AXIS),
    }


def shard_engine_arrays(mesh: Mesh, cfg: ModelConfig, params, k_cache, v_cache,
                        tp_size: int, k_scales=None, v_scales=None,
                        sp_size: int = 1):
    """Place params and KV cache (+ int8-KV scale pages, when present) on
    the mesh with their shardings (multi-process safe: every host holds the
    same full values)."""
    import numpy as np

    from .distributed import put_global

    multiproc = jax.process_count() > 1

    def place(x, s):
        if x is None:
            return None
        if multiproc:
            return put_global(np.asarray(x), mesh, s)
        return jax.device_put(x, NamedSharding(mesh, s))

    from ..config import moe_uses_ep
    pspecs = param_specs(params, moe_ep=moe_uses_ep(cfg, tp_size))
    params = jax.tree_util.tree_map(place, params, pspecs,
                                    is_leaf=lambda x: x is None)
    cspec = cache_spec(cfg, tp_size, sp_size)
    k_cache = place(k_cache, cspec)
    v_cache = place(v_cache, cspec)
    if k_scales is None:
        return params, k_cache, v_cache
    sspec = scale_spec(cfg, tp_size, sp_size)
    return (params, k_cache, v_cache, place(k_scales, sspec),
            place(v_scales, sspec))
