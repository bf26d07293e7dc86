"""Fused on-device sampling: temperature → top-k → top-p → categorical.

Equivalent of the reference's torch.compile'd `Sampler`
(`core/layer/sampler.py:4-43`), expressed as one jit-able function that runs
inside the decode step so only the sampled ``[B]`` int32 tokens ever leave
the device (the reference ships full logits to its sampler on rank 0,
`core/engine.py:276-281`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -2.0e38


def sample_tokens(logits: jnp.ndarray, rng: jax.Array,
                  temperature: jnp.ndarray, top_p: jnp.ndarray,
                  top_k: int = 64,
                  top_k_per_seq: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample next tokens.

    logits:      ``[B, V]`` float
    temperature: ``[B]`` — ``<= 0`` selects greedy for that row
    top_p:       ``[B]`` — nucleus threshold in (0, 1]
    top_k:       static int — candidate pool size (reference uses 50 for
                 decode, `core/engine.py:281`; larger k only changes the tail)
    top_k_per_seq: optional ``[B]`` int32 — per-request top-k applied as a
                 rank mask within the static pool (effective k is
                 min(top_k_per_seq, top_k)).
    Returns ``[B]`` int32 token ids.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # Guard out-of-range client values: top_p <= 0 would mask every
    # candidate to NEG_INF (uniform sampling over the pool); clamp to an
    # epsilon floor so at least the top candidate survives meaningfully.
    top_p = jnp.clip(top_p, 1e-6, 1.0)

    def _stochastic(_) -> jnp.ndarray:
        vals, idxs = jax.lax.top_k(logits, top_k)          # [B, K], descending
        t = jnp.maximum(temperature, 1e-5)[:, None]
        scaled = vals / t

        if top_k_per_seq is not None:
            rank = jnp.arange(top_k, dtype=jnp.int32)[None, :]
            scaled = jnp.where(rank < jnp.maximum(top_k_per_seq, 1)[:, None],
                               scaled, NEG_INF)

        probs = jax.nn.softmax(scaled, axis=-1)
        cumulative = jnp.cumsum(probs, axis=-1)
        # Keep tokens whose cumulative mass *before* them is < top_p; the
        # first candidate always survives.
        keep = (cumulative - probs) < top_p[:, None]
        masked = jnp.where(keep, scaled, NEG_INF)

        choice = jax.random.categorical(rng, masked, axis=-1)  # [B]
        sampled = jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
        return jnp.where(temperature <= 0.0, greedy,
                         sampled.astype(jnp.int32))

    # All-greedy batches (the common serving + benchmark case) skip the
    # vocab-wide top_k sort entirely: argmax is a linear reduce, top_k over
    # a 152k vocab is not. The predicate is dynamic, so one compiled
    # program serves both cases.
    return jax.lax.cond(jnp.any(temperature > 0.0), _stochastic,
                        lambda _: greedy, operand=None)


def token_logprobs(logits: jnp.ndarray, tokens: jnp.ndarray, k: int):
    """Per-token log-probabilities for a sampled batch.

    logits: ``[B, V]`` float; tokens: ``[B]`` int32 (already sampled).
    Returns (chosen_lp ``[B]`` f32, top_lp ``[B, k]`` f32, top_ids
    ``[B, k]`` int32). Log-softmax of the RAW logits (temperature /
    top-k/p filtering do not change what the model believed), matching
    what API consumers expect from an OpenAI-style ``logprobs`` field.
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)   # [B, 1]
    lp = logits - lse
    chosen = jnp.take_along_axis(lp, tokens[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    top_lp, top_ids = jax.lax.top_k(lp, k)
    return chosen, top_lp, top_ids.astype(jnp.int32)
