"""Mixture-of-Experts MLP (mixtral / olmoe families).

A new architecture family beyond the reference (which serves dense qwen2
only). Routing follows HF exactly (`MixtralSparseMoeBlock` /
`OlmoeSparseMoeBlock`): softmax over ALL router logits, top-k selection,
optionally renormalize the selected weights (mixtral: yes; olmoe:
``norm_topk_prob=False``), weighted sum of the selected experts' SwiGLU
outputs.

Compute strategies:

* ``moe_mlp`` — bf16 correctness path: evaluate every expert and mask
  (one XLA-friendly einsum chain, no data-dependent shapes). Used for
  tiny test models, and under TP/EP where expert weights are sharded
  bf16 arrays.
* ``moe_mlp_quant`` — quantized expert stacks ``[L*E, ...]`` riding the
  same layer-stacked Pallas a8 kernels as the dense MLP, with the
  weight index ``l*E + e`` a traced scalar (scalar-prefetch BlockSpecs,
  like the layer index of the dense path):
  - single-row decode (B=1): top-k GATHER — only the k selected
    experts' weights are ever DMA'd from HBM (k/E of the expert bytes;
    the decode-time HBM win that makes large-E MoE fast single-stream);
  - batched rows: masked all-E sweep via ``lax.fori_loop`` — each
    expert's (quantized) weights are read exactly once per layer and
    every row's contribution is masked by its routing weight. For
    ``rows*k >= E`` this is HBM-optimal; a sorted grouped-GEMM kernel
    for the in-between regime is a follow-up.

Under tensor parallelism the bf16 expert FFNs shard exactly like the
dense MLP — gate/up column-parallel on the intermediate dim, down
row-parallel — with the router replicated; the caller psums the output.
Expert parallelism (sharding E itself) composes with the same math.

Quantized expert stacks are EXPERT-MAJOR ``[E*L, ...]`` (flat index
``e * num_layers + l``) so expert parallelism is a plain first-axis
shard: rank r of an EP group holds experts ``[r*E/ep, (r+1)*E/ep)`` ×
all layers contiguously. Routing always runs on the full (replicated)
router; under EP each rank computes only its local experts'
contributions (remote tokens add zero) and the caller's psum combines —
the same reduction that sums the row-parallel dense MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def moe_route(x: jnp.ndarray, w_router: jnp.ndarray, top_k: int,
              renorm: bool = True, scale: float = 1.0,
              n_group: int = 0, topk_group: int = 0):
    """Router math shared by every path (HF-exact, fp32).

    ``scale``: deepseek_v2 ``routed_scaling_factor`` — multiplies the
    selected weights AFTER the optional renorm (HF order:
    `DeepseekV2MoEGate.forward`). ``n_group``/``topk_group``: deepseek's
    group-limited greedy top-k — experts partition into ``n_group``
    groups; only the ``topk_group`` groups with the highest max-score
    stay eligible, then plain top-k within them (both 0 = plain greedy).

    Returns ``(sel, top_w, top_i)``: ``sel`` is the dense ``[..., E]``
    per-expert weight vector (zero for unselected experts), ``top_w`` /
    ``top_i`` the ``[..., k]`` selected weights / indices.
    """
    E = w_router.shape[-1]
    f32 = jnp.float32
    logits = jnp.einsum("...h,he->...e", x.astype(f32),
                        w_router.astype(f32))
    probs = jax.nn.softmax(logits, axis=-1)                 # [..., E]
    cand = probs
    if n_group and topk_group and topk_group < n_group:
        # group-limited greedy (HF DeepseekV2MoEGate group_limited_greedy)
        gsz = E // n_group
        gscores = jnp.max(cand.reshape(*cand.shape[:-1], n_group, gsz),
                          axis=-1)                          # [..., G]
        gtop, _ = jax.lax.top_k(gscores, topk_group)
        keep_g = gscores >= gtop[..., -1:]                  # [..., G]
        keep = jnp.repeat(keep_g, gsz, axis=-1)             # [..., E]
        cand = jnp.where(keep, cand, 0.0)
    top_w, top_i = jax.lax.top_k(cand, top_k)               # [..., k]
    if renorm:   # HF norm_topk_prob (mixtral yes, olmoe no)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    if scale != 1.0:
        top_w = top_w * scale
    sel = jnp.sum(jax.nn.one_hot(top_i, E, dtype=f32)
                  * top_w[..., None], axis=-2)              # [..., E]
    return sel, top_w, top_i


def moe_mlp(x: jnp.ndarray,          # [..., H] (post-norm)
            w_router: jnp.ndarray,   # [H, E] (always the FULL router)
            w_gate: jnp.ndarray,     # [E(_local), H, I(_shard)]
            w_up: jnp.ndarray,       # [E(_local), H, I(_shard)]
            w_down: jnp.ndarray,     # [E(_local), I(_shard), H]
            top_k: int,
            ep_axis: str | None = None,
            renorm: bool = True,
            route_kw: dict | None = None) -> jnp.ndarray:
    """Routed SwiGLU MLP; returns the (pre-psum) expert-weighted output.

    Two sharding regimes compose with the caller's single psum:
    * intermediate-dim TP (``ep_axis=None``): every rank holds all experts'
      I-shards, like the dense MLP;
    * expert parallelism (``ep_axis`` set, inside shard_map): each rank
      holds ``E / ep`` whole experts; routing runs replicated (full router)
      and each rank contributes only its local experts' weighted outputs —
      the psum that reduces the row-parallel dense MLP sums the expert
      contributions instead (tokens routed to remote experts add zero
      locally).
    """
    E = w_router.shape[-1]
    E_local = w_gate.shape[0]
    f32 = jnp.float32
    sel, _, _ = moe_route(x, w_router, top_k, renorm, **(route_kw or {}))
    if ep_axis is not None and E_local != E:
        # slice this rank's expert weights out of the global selection
        rank = jax.lax.axis_index(ep_axis)
        sel = jax.lax.dynamic_slice_in_dim(
            sel, rank * E_local, E_local, axis=-1)          # [..., E_local]

    g = jnp.einsum("...h,ehi->...ei", x, w_gate)
    u = jnp.einsum("...h,ehi->...ei", x, w_up)
    a = (jax.nn.silu(g.astype(f32)) * u.astype(f32)).astype(x.dtype)
    y = jnp.einsum("...ei,eih->...eh", a, w_down)           # [..., E_l, H]
    return jnp.einsum("...eh,...e->...h", y.astype(f32),
                      sel).astype(x.dtype)


def moe_mlp_quant(x: jnp.ndarray,        # [..., H] (post-norm)
                  w_router: jnp.ndarray,  # [H, E] (always the FULL router)
                  w_gu,                   # QuantizedTensor [E(_l)*L, H, 2I]
                  w_dn,                   # QuantizedTensor [E(_l)*L, I, H]
                  layer,                  # traced layer index l
                  num_experts: int,
                  top_k: int,
                  num_layers: int,
                  renorm: bool = True,
                  act: str = "silu",
                  ep_axis: str | None = None,
                  ep_size: int = 1,
                  route_kw: dict | None = None) -> jnp.ndarray:
    """Routed SwiGLU MLP over QUANTIZED expert-major stacks.

    The expert weight index ``e * num_layers + layer`` is a traced scalar
    consumed by the layer-stacked kernels' scalar-prefetch BlockSpecs,
    exactly like the dense path's layer index — so expert selection costs
    a dynamic index, not a weight gather/copy.

    Under expert parallelism (``ep_axis`` set, inside shard_map) the
    stacks are first-axis shards holding ``E/ep`` whole experts; the
    gather path `lax.cond`-skips remote experts (no DMA for weights
    another rank owns) and the sweep path loops only the local experts.
    Returns the pre-psum local contribution; the caller reduces.
    """
    from ..ops.activations import glu_act
    from ..ops.linear import linear

    f = glu_act(act)
    lead = x.shape[:-1]
    H = x.shape[-1]
    x2 = x.reshape(-1, H)
    rows = x2.shape[0]
    sel, top_w, top_i = moe_route(x2, w_router, top_k, renorm,
                                  **(route_kw or {}))
    e_local = num_experts // ep_size
    rank0 = (jax.lax.axis_index(ep_axis) * e_local
             if ep_axis is not None and ep_size > 1 else None)

    def expert_out(e_loc):
        idx = e_loc * num_layers + layer
        gu = linear(x2, w_gu, layer=idx)
        half = gu.shape[-1] // 2
        a = f(gu[..., :half], gu[..., half:]).astype(x.dtype)
        return linear(a, w_dn, layer=idx).astype(jnp.float32)

    if rows == 1:
        # decode gather: only the k selected experts' weights are read
        out = jnp.zeros((1, H), jnp.float32)
        for j in range(top_k):
            e = top_i[0, j]
            wgt = top_w[0, j].astype(jnp.float32)
            if rank0 is None:
                out = out + wgt * expert_out(e)
            else:
                # EP: compute (and DMA) only when expert e lives here
                e_loc = e - rank0
                out = out + jax.lax.cond(
                    (e_loc >= 0) & (e_loc < e_local),
                    lambda el=e_loc, w_=wgt: w_ * expert_out(
                        jnp.clip(el, 0, e_local - 1)),
                    lambda: jnp.zeros((1, H), jnp.float32))
        return out.reshape(*lead, H).astype(x.dtype)

    # batched rows: masked local-expert sweep, each expert's weights read
    # once (per rank, under EP)
    def body(e_loc, acc):
        e = e_loc if rank0 is None else rank0 + e_loc
        return acc + sel[:, e, None] * expert_out(e_loc)

    out = jax.lax.fori_loop(0, e_local, body,
                            jnp.zeros((rows, H), jnp.float32))
    return out.reshape(*lead, H).astype(x.dtype)
