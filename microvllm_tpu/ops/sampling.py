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


def per_row_keys(rng: jax.Array, seeds: jnp.ndarray,
                 pos: jnp.ndarray) -> jax.Array:
    """``[B]`` typed PRNG keys for per-request reproducible sampling.

    seeds: ``[B]`` int32 — 0 = unseeded (engine maps a user seed s to
    s + 1). Seeded rows derive their key purely from ``(seed, pos)`` —
    pos being the row's output position — so a request's random stream
    does not depend on batch composition, restarts, or neighbors
    (vLLM's ``SamplingParams.seed`` semantics). Unseeded rows salt from
    the step rng (fresh randomness every step, the prior behavior).
    """
    B = seeds.shape[0]
    salt = jax.random.randint(rng, (B,), 0, jnp.iinfo(jnp.int32).max)
    seeded = seeds != 0
    eff = jnp.where(seeded, seeds, salt)
    eff_pos = jnp.where(seeded, pos, jnp.arange(B, dtype=jnp.int32))
    base = jax.random.key(0)
    return jax.vmap(lambda s, p: jax.random.fold_in(
        jax.random.fold_in(base, s), p))(eff, eff_pos)


def filtered_pool(logits: jnp.ndarray, temperature: jnp.ndarray,
                  top_p: jnp.ndarray, top_k: int = 64,
                  top_k_per_seq: jnp.ndarray | None = None):
    """The engine's sampling distribution, factored so the decode sampler
    and the speculative rejection-sampling verifier share EXACT semantics
    (temperature → static top-k pool → per-seq rank mask → top-p mask).

    logits ``[..., V]``; temperature/top_p/top_k_per_seq ``[...]`` (same
    leading shape). Returns (masked ``[..., top_k]`` scaled logits with
    filtered-out entries at NEG_INF, idxs ``[..., top_k]`` vocab ids) —
    ``softmax(masked)`` IS the sampling distribution over the pool.
    """
    top_p = jnp.clip(top_p, 1e-6, 1.0)
    vals, idxs = jax.lax.top_k(logits, top_k)            # [..., K] descending
    t = jnp.maximum(temperature, 1e-5)[..., None]
    scaled = vals / t
    if top_k_per_seq is not None:
        rank = jnp.arange(top_k, dtype=jnp.int32)
        rank = rank.reshape((1,) * (scaled.ndim - 1) + (top_k,))
        scaled = jnp.where(
            rank < jnp.maximum(top_k_per_seq, 1)[..., None], scaled, NEG_INF)
    probs = jax.nn.softmax(scaled, axis=-1)
    cumulative = jnp.cumsum(probs, axis=-1)
    # Keep tokens whose cumulative mass *before* them is < top_p; the
    # first candidate always survives.
    keep = (cumulative - probs) < top_p[..., None]
    return jnp.where(keep, scaled, NEG_INF), idxs


def sample_tokens(logits: jnp.ndarray, rng: jax.Array,
                  temperature: jnp.ndarray, top_p: jnp.ndarray,
                  top_k: int = 64,
                  top_k_per_seq: jnp.ndarray | None = None,
                  row_keys: jax.Array | None = None) -> jnp.ndarray:
    """Sample next tokens.

    logits:      ``[B, V]`` float
    temperature: ``[B]`` — ``<= 0`` selects greedy for that row
    top_p:       ``[B]`` — nucleus threshold in (0, 1]
    top_k:       static int — candidate pool size (reference uses 50 for
                 decode, `core/engine.py:281`; larger k only changes the tail)
    top_k_per_seq: optional ``[B]`` int32 — per-request top-k applied as a
                 rank mask within the static pool (effective k is
                 min(top_k_per_seq, top_k)).
    row_keys:    optional ``[B]`` typed keys (`per_row_keys`) — when given,
                 each row samples from its own stream (per-request seeds).
    Returns ``[B]`` int32 token ids.
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _stochastic(_) -> jnp.ndarray:
        masked, idxs = filtered_pool(logits, temperature, top_p, top_k,
                                     top_k_per_seq)
        if row_keys is not None:
            choice = jax.vmap(
                lambda k, m: jax.random.categorical(k, m))(row_keys, masked)
        else:
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


def penalty_state(hist: jnp.ndarray, hist_lens: jnp.ndarray,
                  out_start: jnp.ndarray, vocab: int):
    """Build the on-device penalty state from a token-id history.

    hist:      ``[B, L]`` int32 — prompt + generated ids, padded arbitrarily
    hist_lens: ``[B]`` — valid length of each row
    out_start: ``[B]`` — index where GENERATED tokens begin (= prompt len)

    Returns (counts ``[B, V]`` f32 — occurrences among generated tokens,
    seen ``[B, V]`` bool — occurs anywhere in prompt+generated). One
    scatter per span; the decode scan then maintains both incrementally.
    """
    B, L = hist.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < hist_lens[:, None]
    gen = valid & (pos >= out_start[:, None])
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, L))
    ids_all = jnp.where(valid, hist, vocab)      # out-of-range -> dropped
    ids_gen = jnp.where(gen, hist, vocab)
    counts = jnp.zeros((B, vocab), jnp.float32).at[rows, ids_gen].add(
        1.0, mode="drop")
    seen = jnp.zeros((B, vocab), jnp.bool_).at[rows, ids_all].set(
        True, mode="drop")
    return counts, seen


def penalty_update(counts: jnp.ndarray, seen: jnp.ndarray,
                   tokens: jnp.ndarray):
    """Fold one step's sampled ``[B]`` tokens into (counts, seen)."""
    rows = jnp.arange(tokens.shape[0], dtype=jnp.int32)
    return (counts.at[rows, tokens].add(1.0),
            seen.at[rows, tokens].set(True))


def apply_penalties(logits: jnp.ndarray, counts: jnp.ndarray,
                    seen: jnp.ndarray, presence: jnp.ndarray,
                    freq: jnp.ndarray, rep: jnp.ndarray,
                    bias_ids: jnp.ndarray | None = None,
                    bias_vals: jnp.ndarray | None = None) -> jnp.ndarray:
    """OpenAI/vLLM sampling penalties, in vLLM's application order.

    repetition (HF semantics, over prompt + generated): positive logits of
    seen tokens divide by ``rep``, negative multiply (``rep == 1`` = off);
    then ``logits -= freq * count + presence * (count > 0)`` over
    GENERATED-token counts (OpenAI semantics). All ``[B]``-shaped knobs.

    bias_ids/bias_vals: optional ``[B, Kb]`` per-request logit_bias
    entries (OpenAI); padding slots carry an out-of-range id and are
    dropped by the scatter.
    """
    logits = logits.astype(jnp.float32)
    rp = rep[:, None]
    pen = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, pen, logits)
    gen_seen = (counts > 0).astype(jnp.float32)
    logits = logits - (freq[:, None] * counts
                       + presence[:, None] * gen_seen)
    if bias_ids is not None:
        rows = jnp.arange(logits.shape[0], dtype=jnp.int32)[:, None]
        logits = logits.at[rows, bias_ids].add(
            bias_vals.astype(jnp.float32), mode="drop")
    return logits


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
