"""Speculative decoding: on-device n-gram proposals + batched verification.

New capability vs the reference (which decodes strictly one token per
forward). Greedy-only n-gram speculation ("prompt lookup"): propose the k
tokens that followed the most recent occurrence of the current tail n-gram
in the sequence's own history, then verify all k in ONE model forward over a
``[B, k+1]`` window (chunked-prefill-shaped attention against the paged
cache). The accepted prefix plus the model's own next token are emitted —
every emitted token is either verified against or produced by the full
model's argmax, so outputs are bit-identical to greedy decoding through the
same (prefill-path) forward. Note the multi-step decode path may disagree
on near-ties: its kernels reduce in a different order (identical on CPU
where both use the jnp reference paths — tests/test_speculative.py).

The whole propose→verify→accept loop runs ON DEVICE inside a `lax.scan`
(`spec_decode_span`), mirroring `transformer.decode_span`'s multi-step
design: one host round-trip per span regardless of how many tokens are
accepted — essential on hosts where dispatch latency is material.

KV handling: verification writes all k+1 rows into the paged cache
(slot-exact scatter); rejected rows sit beyond the accepted context length,
are masked by every attention variant, and are overwritten when those
positions are reached again. The engine reserves worst-case page growth
up front and truncates the allocator to the accepted length afterwards
(`PageAllocator.truncate`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import transformer as model_lib


def ngram_propose(hist: jnp.ndarray, hist_lens: jnp.ndarray, k: int,
                  n: int = 2) -> jnp.ndarray:
    """Propose ``k`` draft tokens per sequence by n-gram lookup.

    hist:      ``[B, L]`` int32 — prompt + generated tokens so far
    hist_lens: ``[B]`` int32 — valid length of each row
    Finds the LAST position i < hist_len - n with
    ``hist[i:i+n] == hist[hist_len-n:hist_len]`` and proposes the k tokens
    following it. Rows with no match propose the last token repeated (the
    verification pass still yields its one guaranteed-correct token, so a
    miss costs nothing but compute).
    """
    B, L = hist.shape
    # tail n-gram per row
    tail_idx = hist_lens[:, None] - n + jnp.arange(n, dtype=jnp.int32)[None, :]
    tail = jnp.take_along_axis(hist, jnp.clip(tail_idx, 0, L - 1), axis=1)

    pos = jnp.arange(L, dtype=jnp.int32)[None, :]               # [1, L]
    eq = jnp.ones((B, L), bool)
    for j in range(n):
        # hist[:, i+j] aligned at i (zero-pad the tail shift)
        shifted = jnp.pad(hist[:, j:], ((0, 0), (0, j)))
        eq = eq & (shifted == tail[:, j:j + 1])
    valid = pos < (hist_lens[:, None] - n)      # strictly before the tail gram
    m = jnp.max(jnp.where(eq & valid, pos, -1), axis=1)         # [B]
    found = m >= 0

    src = m[:, None] + n + jnp.arange(k, dtype=jnp.int32)[None, :]
    props = jnp.take_along_axis(hist, jnp.clip(src, 0, L - 1), axis=1)
    last = jnp.take_along_axis(
        hist, jnp.clip(hist_lens[:, None] - 1, 0, L - 1), axis=1)
    # entries past the valid history read stale positions — fill with the
    # last token instead (harmless: verification corrects them)
    usable = found[:, None] & (src < hist_lens[:, None])
    return jnp.where(usable, props, last).astype(jnp.int32)


def spec_decode_span(cfg: ModelConfig, params, k_cache, v_cache,
                     last_tokens: jnp.ndarray,    # [B] int32
                     hist: jnp.ndarray,           # [B, Lmax] int32
                     hist_lens: jnp.ndarray,      # [B] int32
                     block_tables: jnp.ndarray,   # [B, max_pages]
                     context_lens: jnp.ndarray,   # [B] tokens in cache
                     num_steps: int, k: int, ngram: int = 2,
                     k_scales: jnp.ndarray | None = None,
                     v_scales: jnp.ndarray | None = None,
                     adapter_ids: jnp.ndarray | None = None,
                     lora_scaling: float = 1.0,
                     tp_axis: str | None = None, tp_size: int = 1,
                     logprobs_k: int = 0,
                     sampled: bool = False,
                     temperature: jnp.ndarray | None = None,  # [B]
                     top_p: jnp.ndarray | None = None,        # [B]
                     top_ks: jnp.ndarray | None = None,       # [B] int32
                     rng: jax.Array | None = None,
                     dp_axis: str | None = None):
    """Run ``num_steps`` propose→verify→accept rounds on device.

    ``sampled=True`` verifies by REJECTION SAMPLING instead of argmax
    matching, opening speculation to temperature>0 traffic: the n-gram
    draft is a point mass, so exact speculative sampling reduces to
    "accept draft x with probability p(x); on rejection sample from p
    with x masked out (the renormalized residual)" — where p is the
    engine's exact sampling distribution (temperature → top-k pool →
    top-p, `ops/sampling.py::filtered_pool`), so emitted tokens are
    distributed identically to plain decode. Greedy rows (temp <= 0) in
    the same batch keep argmax verification. Per-request SEEDED rows
    must fall back (the spec path consumes a different random stream).

    Verification routes through ``prefill_step``, which handles int8 KV
    (``k_scales``/``v_scales``) and per-row LoRA (``adapter_ids``) natively,
    so speculation composes with both (r2 gated them out conservatively).

    ``logprobs_k > 0`` additionally emits per-token logprobs from the
    verify pass's own logits (the row that predicts emitted token j IS
    row j of the verify window): chosen-token logprob plus the top-k
    alternatives — so logprob-requesting traffic keeps speculating
    instead of disabling it for the whole batch.

    Returns (emitted ``[num_steps, B, k+1]`` int32, counts
    ``[num_steps, B]`` int32 — valid tokens per round, in [1, k+1] — ,
    lp — ``()`` or (chosen ``[steps, B, S]``, top ``[steps, B, S, K]``,
    ids ``[steps, B, S, K]``) — , new_k_cache, new_v_cache[, new_k_scales,
    new_v_scales]).
    """
    B = last_tokens.shape[0]
    S = k + 1
    Lmax = hist.shape[1]
    quantized = k_scales is not None
    steps_idx = jnp.arange(S, dtype=jnp.int32)[None, :]          # [1, S]
    if sampled:
        assert rng is not None and temperature is not None

    # slice layer-scan inputs once per span dispatch, not per spec round
    # (transformer.decode_span does the same; deepseek's [k0:] stack
    # slices are per-iteration copies otherwise)
    scan_inputs = (list(model_lib._prefix_layers(params, cfg)),
                   model_lib._layer_xs(params, cfg))

    def body(carry, key):
        last, ctx, hist, hlen, kc, vc, ks, vs = carry
        props = ngram_propose(hist, hlen, k, ngram)              # [B, k]
        window = jnp.concatenate([last[:, None], props], axis=1)  # [B, S]

        out = model_lib.prefill_step(
            cfg, params, kc, vc, window, block_tables,
            jnp.full((B,), S, jnp.int32), ctx,
            has_history=True, all_greedy=True, slot_exact_store=True,
            k_scales=ks, v_scales=vs,
            adapter_ids=adapter_ids, lora_scaling=lora_scaling,
            tp_axis=tp_axis, tp_size=tp_size,
            with_logits=sampled or logprobs_k > 0, dp_axis=dp_axis,
            scan_inputs=scan_inputs)
        if quantized:
            preds, kc, vc, ks, vs = out
        else:
            preds, kc, vc = out
        logits = None
        if sampled or logprobs_k > 0:
            preds, logits = preds

        props_pad = jnp.concatenate(
            [props, jnp.zeros((B, 1), jnp.int32)], axis=1)       # [B, S]
        match = props == preds[:, :-1]                           # [B, k]
        if sampled:
            from ..ops.sampling import NEG_INF, filtered_pool
            # the engine's exact per-row sampling pool at every window
            # position (row j's logits predict emit slot j)
            masked, idxs = filtered_pool(
                logits.astype(jnp.float32),
                jnp.broadcast_to(temperature[:, None], (B, S)),
                jnp.broadcast_to(top_p[:, None], (B, S)),
                top_k_per_seq=jnp.broadcast_to(top_ks[:, None], (B, S)))
            pool_p = jax.nn.softmax(masked, axis=-1)             # [B, S, P]
            key_u, key_r = jax.random.split(key)
            # accept draft j with prob p(draft_j) (point-mass proposal)
            in_pool = idxs[:, :k, :] == props[:, :, None]
            p_draft = jnp.sum(pool_p[:, :k, :] * in_pool, axis=-1)
            u = jax.random.uniform(key_u, (B, k))
            is_greedy = (temperature <= 0.0)[:, None]
            acc = jnp.where(is_greedy, match, u < p_draft).astype(jnp.int32)
            a = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)        # [B] 0..k
            # correction at slot a: residual of a rejected point mass =
            # the pool with the draft masked out, renormalized (a == k:
            # plain bonus sample, nothing to mask)
            row_m = jnp.take_along_axis(
                masked, a[:, None, None], axis=1)[:, 0]          # [B, P]
            row_i = jnp.take_along_axis(
                idxs, a[:, None, None], axis=1)[:, 0]
            rej = jnp.take_along_axis(props_pad, a[:, None], axis=1)
            row_m = jnp.where((row_i == rej) & (a[:, None] < k),
                              NEG_INF, row_m)
            choice = jax.random.categorical(key_r, row_m, axis=-1)
            corr = jnp.take_along_axis(row_i, choice[:, None], axis=1)
            greedy_bonus = jnp.take_along_axis(preds, a[:, None], axis=1)
            bonus = jnp.where(is_greedy, greedy_bonus,
                              corr).astype(jnp.int32)            # [B, 1]
        else:
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                        axis=1)                                  # [B] 0..k
            bonus = jnp.take_along_axis(preds, a[:, None], axis=1)
        emit = jnp.where(steps_idx < a[:, None], props_pad,
                         jnp.where(steps_idx == a[:, None], bonus, -1))
        n_emit = a + 1

        lp_out = ()
        if logprobs_k > 0:
            # row j of the verify logits predicts emitted token j; invalid
            # slots (emit == -1) read index 0 and are never surfaced (the
            # engine walks only `counts` tokens per round)
            lpd = logits - jax.nn.logsumexp(logits, axis=-1,
                                            keepdims=True)      # [B, S, V]
            chosen = jnp.take_along_axis(
                lpd, jnp.clip(emit, 0)[..., None], axis=-1)[..., 0]
            top_lp, top_ids = jax.lax.top_k(lpd, logprobs_k)
            lp_out = (chosen, top_lp, top_ids.astype(jnp.int32))

        # append emitted tokens to the on-device history
        wpos = hlen[:, None] + steps_idx                         # [B, S]
        wposc = jnp.clip(wpos, 0, Lmax - 1)
        old = jnp.take_along_axis(hist, wposc, axis=1)
        vals = jnp.where(steps_idx < n_emit[:, None], emit, old)
        hist = hist.at[jnp.arange(B)[:, None], wposc].set(vals)

        return ((bonus[:, 0], ctx + n_emit, hist, hlen + n_emit, kc, vc,
                 ks, vs), (emit, n_emit, lp_out))

    carry0 = (last_tokens, context_lens, hist, hist_lens, k_cache, v_cache,
              k_scales, v_scales)
    keys = (jax.random.split(rng, num_steps) if sampled
            else jnp.zeros((num_steps,), jnp.int32))   # inert xs when greedy
    (_, _, _, _, k_cache, v_cache, k_scales, v_scales), \
        (emitted, counts, lp) = jax.lax.scan(body, carry0, keys,
                                             length=num_steps)
    if quantized:
        return emitted, counts, lp, k_cache, v_cache, k_scales, v_scales
    return emitted, counts, lp, k_cache, v_cache
