"""Mixture-of-Experts MLP (mixtral family).

A new architecture family beyond the reference (which serves dense qwen2
only). Routing follows HF Mixtral exactly (`MixtralSparseMoeBlock`):
softmax over ALL router logits, top-k selection, renormalize the selected
weights, weighted sum of the selected experts' SwiGLU outputs.

Compute strategy: the correctness path evaluates every expert and masks
(one XLA-friendly einsum chain, no data-dependent shapes — fine for the
small-E tiny models in tests and for prefill where most experts are hit
anyway). A Pallas expert-gather kernel that DMAs only the selected
experts' weight tiles (the decode-time HBM win; same scalar-prefetch
indexing the layer-stacked quantized kernels use) is the perf follow-up.

Under tensor parallelism the expert FFNs shard exactly like the dense
MLP — gate/up column-parallel on the intermediate dim, down row-parallel
— with the router replicated; the caller psums the output. Expert
parallelism (sharding E itself) composes with the same math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def moe_mlp(x: jnp.ndarray,          # [..., H] (post-norm)
            w_router: jnp.ndarray,   # [H, E] (always the FULL router)
            w_gate: jnp.ndarray,     # [E(_local), H, I(_shard)]
            w_up: jnp.ndarray,       # [E(_local), H, I(_shard)]
            w_down: jnp.ndarray,     # [E(_local), I(_shard), H]
            top_k: int,
            ep_axis: str | None = None) -> jnp.ndarray:
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
    logits = jnp.einsum("...h,he->...e", x.astype(f32),
                        w_router.astype(f32))
    probs = jax.nn.softmax(logits, axis=-1)                 # [..., E]
    top_w, top_i = jax.lax.top_k(probs, top_k)              # [..., k]
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)  # HF renormalize
    # mask back to a dense per-expert weight vector
    sel = jnp.sum(jax.nn.one_hot(top_i, E, dtype=f32)
                  * top_w[..., None], axis=-2)              # [..., E]
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
