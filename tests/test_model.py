"""Model-core numerics: paged prefill/decode vs the no-cache oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.config import CacheConfig, ModelConfig
from microvllm_tpu.models import transformer as T
from microvllm_tpu.ops.quant import quantize_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    cache = CacheConfig(num_pages=32, page_size=16, max_pages_per_seq=4)
    params = T.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, cache, params


def fresh_cache(cfg, cache):
    return T.init_kv_cache(cfg, cache)


def test_paged_prefill_matches_oracle(setup):
    cfg, cache, params = setup
    k, v = fresh_cache(cfg, cache)
    B, S = 2, 10
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    ref = T.forward_logits(cfg, params, tokens)

    bt = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=jnp.int32)
    lens = jnp.array([S, S], dtype=jnp.int32)
    hist = jnp.zeros(B, jnp.int32)
    logits, k, v = T.prefill_step(cfg, params, k, v, tokens, bt, lens, hist)
    np.testing.assert_allclose(logits, ref[:, -1], rtol=2e-4, atol=2e-4)


def test_paged_decode_matches_oracle(setup):
    cfg, cache, params = setup
    k, v = fresh_cache(cfg, cache)
    B, S = 2, 9
    tokens = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, cfg.vocab_size)
    ref = T.forward_logits(cfg, params, tokens)

    bt = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=jnp.int32)
    hist = jnp.zeros(B, jnp.int32)
    prompt_lens = jnp.full((B,), S - 1, jnp.int32)
    _, k, v = T.prefill_step(cfg, params, k, v, tokens[:, :-1], bt,
                             prompt_lens, hist)
    logits, k, v = T.decode_step(cfg, params, k, v, tokens[:, -1], bt,
                                 prompt_lens)
    np.testing.assert_allclose(logits, ref[:, -1], rtol=2e-4, atol=2e-4)


def test_ragged_prefill_lengths(setup):
    """Rows with different true lengths in one padded rectangle."""
    cfg, cache, params = setup
    k, v = fresh_cache(cfg, cache)
    B, S = 2, 12
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, S), 0, cfg.vocab_size)
    true_lens = [12, 5]
    ref = T.forward_logits(cfg, params, tokens)

    bt = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=jnp.int32)
    lens = jnp.asarray(true_lens, dtype=jnp.int32)
    hist = jnp.zeros(B, jnp.int32)
    logits, k, v = T.prefill_step(cfg, params, k, v, tokens, bt, lens, hist)
    for b, L in enumerate(true_lens):
        np.testing.assert_allclose(logits[b], ref[b, L - 1], rtol=2e-4, atol=2e-4)


def test_chunked_prefill_matches_single_shot(setup):
    cfg, cache, params = setup
    B, S, C = 1, 16, 8
    tokens = jax.random.randint(jax.random.PRNGKey(4), (B, S), 0, cfg.vocab_size)
    bt = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)

    k1, v1 = fresh_cache(cfg, cache)
    full_logits, k1, v1 = T.prefill_step(
        cfg, params, k1, v1, tokens, bt, jnp.array([S], jnp.int32),
        jnp.zeros(B, jnp.int32))

    k2, v2 = fresh_cache(cfg, cache)
    _, k2, v2 = T.prefill_step(
        cfg, params, k2, v2, tokens[:, :C], bt, jnp.array([C], jnp.int32),
        jnp.zeros(B, jnp.int32))
    chunk_logits, k2, v2 = T.prefill_step(
        cfg, params, k2, v2, tokens[:, C:], bt, jnp.array([S - C], jnp.int32),
        jnp.array([C], jnp.int32))

    np.testing.assert_allclose(chunk_logits, full_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), rtol=1e-5, atol=1e-5)


def test_padding_rows_do_not_corrupt_cache(setup):
    """A padded (inert) row writes only to the trash page."""
    cfg, cache, params = setup
    k, v = fresh_cache(cfg, cache)
    B, S = 2, 8
    tokens = jnp.concatenate([
        jax.random.randint(jax.random.PRNGKey(5), (1, S), 0, cfg.vocab_size),
        jnp.zeros((1, S), jnp.int32)])
    bt = jnp.array([[1, 2, 3, 4], [0, 0, 0, 0]], dtype=jnp.int32)  # row1 trash
    lens = jnp.array([S, 0], dtype=jnp.int32)
    hist = jnp.zeros(B, jnp.int32)
    _, k, v = T.prefill_step(cfg, params, k, v, tokens, bt, lens, hist)
    # pages 5.. untouched
    assert float(jnp.abs(k[:, 5:]).sum()) == 0.0
    # trash page may contain garbage; real pages 1-4 contain seq0's kv
    assert float(jnp.abs(k[:, 1]).sum()) > 0.0


def test_quantized_model_close(setup):
    cfg, cache, params = setup
    B, S = 1, 8
    tokens = jax.random.randint(jax.random.PRNGKey(6), (B, S), 0, cfg.vocab_size)
    ref = T.forward_logits(cfg, params, tokens)
    qparams = quantize_params(params, bits=8, group_size=64)
    got = T.forward_logits(cfg, qparams, tokens)
    # int8 logits should track fp32 logits closely
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.05


def test_int8_kv_cache_close_to_bf16(setup):
    """INT8 KV-quantized paged decode tracks the fp cache closely."""
    from microvllm_tpu.models.transformer import init_kv_scales
    cfg, cache, params = setup
    B, S = 2, 10
    tokens = jax.random.randint(jax.random.PRNGKey(9), (B, S), 0, cfg.vocab_size)
    ref = T.forward_logits(cfg, params, tokens)

    k, v = T.init_kv_cache(cfg, cache, dtype=jnp.int8)
    ks, vs = init_kv_scales(cfg, cache)
    bt = jnp.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=jnp.int32)
    lens = jnp.full((B,), S - 1, jnp.int32)
    hist = jnp.zeros(B, jnp.int32)
    _, k, v, ks, vs = T.prefill_step(cfg, params, k, v, tokens[:, :-1], bt,
                                     lens, hist, k_scales=ks, v_scales=vs)
    logits, k, v, ks, vs = T.decode_step(cfg, params, k, v, tokens[:, -1],
                                         bt, lens, k_scales=ks, v_scales=vs)
    # int8 KV: same argmax, close logits
    assert (jnp.argmax(logits, -1) == jnp.argmax(ref[:, -1], -1)).all()
    rel = np.linalg.norm(np.asarray(logits - ref[:, -1])) / np.linalg.norm(
        np.asarray(ref[:, -1]))
    assert rel < 0.05, rel


def test_llama_style_no_bias_model():
    """qkv_bias=False (llama family) exercises the bias-less projection path."""
    cfg = ModelConfig.tiny(qkv_bias=False, tie_word_embeddings=False)
    cache = CacheConfig(num_pages=16, page_size=16, max_pages_per_seq=4)
    params = T.init_params(cfg, jax.random.PRNGKey(0))
    assert "bq" not in params["layers"]
    assert params["lm_head"] is not None
    k, v = T.init_kv_cache(cfg, cache)
    B, S = 1, 6
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    ref = T.forward_logits(cfg, params, tokens)
    bt = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    logits, k, v = T.prefill_step(cfg, params, k, v, tokens, bt,
                                  jnp.array([S], jnp.int32),
                                  jnp.zeros(B, jnp.int32))
    np.testing.assert_allclose(logits, ref[:, -1], rtol=2e-4, atol=2e-4)


def test_qwen3_qk_norm_model():
    """qk_norm=True (qwen3 family): per-head RMSNorm on q/k before RoPE.

    Checks prefill==full-forward consistency and that the norm actually
    bites (non-unit q_norm weights change the logits)."""
    cfg = ModelConfig.tiny(qk_norm=True, qkv_bias=False,
                           tie_word_embeddings=False, model_type="qwen3")
    cache = CacheConfig(num_pages=16, page_size=16, max_pages_per_seq=4)
    params = T.init_params(cfg, jax.random.PRNGKey(0))
    assert params["layers"]["q_norm"].shape == (cfg.num_layers, cfg.head_dim)
    k, v = T.init_kv_cache(cfg, cache)
    B, S = 1, 6
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    ref = T.forward_logits(cfg, params, tokens)
    bt = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    logits, k, v = T.prefill_step(cfg, params, k, v, tokens, bt,
                                  jnp.array([S], jnp.int32),
                                  jnp.zeros(B, jnp.int32))
    np.testing.assert_allclose(logits, ref[:, -1], rtol=2e-4, atol=2e-4)
    # decode step continues consistently
    logits2, k, v = T.decode_step(cfg, params, k, v, tokens[:, -1], bt,
                                  jnp.array([S], jnp.int32))
    ref2 = T.forward_logits(
        cfg, params, jnp.concatenate([tokens, tokens[:, -1:]], axis=1))
    np.testing.assert_allclose(logits2, ref2[:, -1], rtol=2e-4, atol=3e-4)
    # the weights are live: perturbing q_norm changes the output
    import dataclasses as _dc
    p2 = dict(params)
    p2["layers"] = dict(params["layers"])
    p2["layers"]["q_norm"] = params["layers"]["q_norm"] * 2.0
    alt = T.forward_logits(cfg, p2, tokens)
    assert not np.allclose(np.asarray(alt), np.asarray(ref), atol=1e-3)


def test_gemma2_style_model():
    """gemma2 family: sandwich norms, GeGLU, softcaps, sqrt(H) embed
    scaling, query_pre_attn_scalar, and ALTERNATING sliding/global
    attention via the period-2 layer scan."""
    cfg = ModelConfig.tiny(
        qkv_bias=False, tie_word_embeddings=True, model_type="gemma2",
        hidden_act="gelu_tanh", post_norms=True, embed_scale=True,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        query_pre_attn_scalar=32, sliding_window=4,
        sliding_pattern=(True, False))
    cache = CacheConfig(num_pages=16, page_size=16, max_pages_per_seq=4)
    params = T.init_params(cfg, jax.random.PRNGKey(0))
    assert "post_attn_norm" in params["layers"]
    k, v = T.init_kv_cache(cfg, cache)
    B, S = 1, 8
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0,
                                cfg.vocab_size)
    ref = T.forward_logits(cfg, params, tokens)
    bt = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    logits, k, v = T.prefill_step(cfg, params, k, v, tokens, bt,
                                  jnp.array([S], jnp.int32),
                                  jnp.zeros(B, jnp.int32))
    np.testing.assert_allclose(logits, ref[:, -1], rtol=2e-4, atol=2e-4)
    logits2, k, v = T.decode_step(cfg, params, k, v, tokens[:, -1], bt,
                                  jnp.array([S], jnp.int32))
    ref2 = T.forward_logits(
        cfg, params, jnp.concatenate([tokens, tokens[:, -1:]], axis=1))
    np.testing.assert_allclose(logits2, ref2[:, -1], rtol=2e-4, atol=3e-4)
    # the alternating window bites: an all-global variant diverges
    import dataclasses as _dc
    cfg_g = _dc.replace(cfg, sliding_window=None, sliding_pattern=())
    alt = T.forward_logits(cfg_g, params, tokens)
    assert not np.allclose(np.asarray(alt), np.asarray(ref), atol=1e-3)
    # final softcap bounds the logits
    assert float(jnp.abs(logits).max()) <= 30.0
