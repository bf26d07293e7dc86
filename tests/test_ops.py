"""Numerics tests for the core ops (jnp reference paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.ops.activations import swiglu, swiglu_packed
from microvllm_tpu.ops.attention import (
    append_kv,
    paged_decode_attention_ref,
    prefill_attention_ref,
    slot_coords,
)
from microvllm_tpu.ops.normalization import rmsnorm, rmsnorm_residual
from microvllm_tpu.ops.quant import quantize
from microvllm_tpu.ops.linear import linear
from microvllm_tpu.ops.rope import apply_rope, rope_cos_sin
from microvllm_tpu.ops.sampling import sample_tokens


def test_rmsnorm_matches_manual():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
    w = jax.random.normal(jax.random.PRNGKey(1), (64,))
    got = rmsnorm(x, w, eps=1e-6)
    want = x / np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rmsnorm_residual_two_outputs():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
    r = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    w = jnp.ones(64)
    normed, resid = rmsnorm_residual(x, r, w)
    np.testing.assert_allclose(resid, x + r, rtol=1e-6)
    np.testing.assert_allclose(normed, rmsnorm(x + r, w), rtol=1e-6)


def test_swiglu():
    g = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
    u = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    got = swiglu(g, u)
    want = np.asarray(g) / (1 + np.exp(-np.asarray(g))) * np.asarray(u)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # packed layout is [up | gate]
    packed = jnp.concatenate([u, g], axis=-1)
    np.testing.assert_allclose(swiglu_packed(packed), want, rtol=1e-5)


def test_rope_rotation_preserves_norm():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64))
    pos = jnp.array([3, 100])
    cos, sin = rope_cos_sin(pos, 64, 10000.0)
    out = apply_rope(q, cos, sin)
    np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1),
                               jnp.linalg.norm(q, axis=-1), rtol=1e-5)


def test_rope_position_zero_is_identity():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32))
    cos, sin = rope_cos_sin(jnp.array([0]), 32, 10000.0)
    np.testing.assert_allclose(apply_rope(q, cos, sin), q, rtol=1e-6)


def test_rope_relative_property():
    """<rope(q,m), rope(k,n)> depends only on m-n."""
    d = 32
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, d))

    def dot_at(m, n):
        cq, sq = rope_cos_sin(jnp.array([m]), d, 10000.0)
        ck, sk = rope_cos_sin(jnp.array([n]), d, 10000.0)
        return float(jnp.sum(apply_rope(q, cq, sq) * apply_rope(k, ck, sk)))

    assert dot_at(5, 3) == pytest.approx(dot_at(12, 10), rel=1e-4)


def test_append_kv_and_slot_coords():
    kp = jnp.zeros((4, 2, 8, 16))
    vp = jnp.zeros((4, 2, 8, 16))
    bt = jnp.array([[1, 2], [3, 0]], dtype=jnp.int32)
    pos = jnp.array([9, 0], dtype=jnp.int32)  # seq0 slot 9 -> page 2 off 1
    pages, offs = slot_coords(bt, pos, 8)
    assert pages.tolist() == [2, 3]
    assert offs.tolist() == [1, 0]
    k_new = jnp.ones((2, 2, 16))
    kp2, vp2 = append_kv(kp, vp, k_new, k_new * 2, pages, offs)
    assert float(kp2[2, 0, 1, 0]) == 1.0
    assert float(vp2[3, 1, 0, 0]) == 2.0
    assert float(kp2.sum()) == 2 * 2 * 16


def test_paged_decode_attention_vs_dense():
    """Paged attention over scattered pages == dense attention."""
    key = jax.random.PRNGKey(0)
    B, H, KV, D, PS, NP, MP = 2, 4, 2, 16, 8, 8, 3
    lens = np.array([13, 5], dtype=np.int32)
    q = jax.random.normal(key, (B, H, D))
    kp = jnp.zeros((NP, KV, PS, D))
    vp = jnp.zeros((NP, KV, PS, D))
    bt = jnp.array([[1, 4, 2], [6, 0, 0]], dtype=jnp.int32)

    ks, vs = [], []
    for b in range(B):
        kk = jax.random.normal(jax.random.PRNGKey(b + 1), (lens[b], KV, D))
        vv = jax.random.normal(jax.random.PRNGKey(b + 7), (lens[b], KV, D))
        ks.append(kk), vs.append(vv)
        pos = jnp.arange(lens[b], dtype=jnp.int32)
        pages, offs = slot_coords(bt[b][None].repeat(lens[b], 0), pos, PS)
        kp, vp = append_kv(kp, vp, kk, vv, pages, offs)

    got = paged_decode_attention_ref(q, kp, vp, bt, jnp.asarray(lens), D ** -0.5)

    for b in range(B):
        kk, vv = np.asarray(ks[b]), np.asarray(vs[b])
        qb = np.asarray(q[b]).reshape(KV, H // KV, D)
        scores = np.einsum("kgd,skd->kgs", qb, kk) * D ** -0.5
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("kgs,skd->kgd", p, vv).reshape(H, D)
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_prefill_attention_causal():
    B, S, H, KV, D = 1, 6, 4, 2, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, D))
    out = prefill_attention_ref(q, k, v, D ** -0.5)
    # position 0 attends only to itself
    qb = np.asarray(q[0, 0]).reshape(KV, H // KV, D)
    want0 = np.broadcast_to(np.asarray(v[0, 0])[:, None, :], qb.shape).reshape(H, D)
    np.testing.assert_allclose(out[0, 0], want0, rtol=1e-4, atol=1e-5)


def test_quantize_roundtrip_int8():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 64))
    qt = quantize(w, bits=8, group_size=64)
    err = jnp.abs(qt.dequant(jnp.float32) - w).max()
    assert float(err) < 0.05


def test_quantize_roundtrip_int4():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 64))
    qt = quantize(w, bits=4, group_size=64)
    err = jnp.abs(qt.dequant(jnp.float32) - w).max()
    assert float(err) < 0.6


def test_quantized_linear_close_to_fp():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 256)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 64)) * 0.05
    y_fp = linear(x, w)
    y_q8 = linear(x, quantize(w, 8, 128))
    rel = jnp.linalg.norm(y_q8 - y_fp) / jnp.linalg.norm(y_fp)
    assert float(rel) < 0.02


def test_sample_greedy():
    logits = jnp.array([[0.0, 5.0, 1.0], [2.0, 0.0, -1.0]])
    toks = sample_tokens(logits, jax.random.PRNGKey(0),
                         temperature=jnp.zeros(2), top_p=jnp.ones(2), top_k=3)
    assert toks.tolist() == [1, 0]


def test_sample_topp_restricts_support():
    # one dominant token, tiny top_p -> always the argmax even at high temp
    logits = jnp.array([[10.0, 0.0, 0.0, 0.0]] * 8)
    toks = sample_tokens(logits, jax.random.PRNGKey(0),
                         temperature=jnp.full(8, 5.0), top_p=jnp.full(8, 0.1),
                         top_k=4)
    assert toks.tolist() == [0] * 8


def test_sample_distribution():
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]])).repeat(512, 0)
    toks = sample_tokens(logits, jax.random.PRNGKey(0),
                         temperature=jnp.ones(512), top_p=jnp.ones(512), top_k=3)
    freq = np.bincount(np.asarray(toks), minlength=3) / 512
    assert freq[0] == pytest.approx(0.7, abs=0.08)


def test_sample_per_seq_top_k():
    """top_k=1 per-seq forces argmax even at high temperature."""
    logits = jnp.array([[3.0, 2.9, 2.8, 0.0]] * 16)
    toks = sample_tokens(logits, jax.random.PRNGKey(0),
                         temperature=jnp.full(16, 3.0),
                         top_p=jnp.ones(16), top_k=4,
                         top_k_per_seq=jnp.full(16, 1, jnp.int32))
    assert toks.tolist() == [0] * 16
    # and mixed: row 0 restricted, row 1 free (still samples within pool)
    toks2 = sample_tokens(logits[:2], jax.random.PRNGKey(1),
                          temperature=jnp.full(2, 3.0),
                          top_p=jnp.ones(2), top_k=4,
                          top_k_per_seq=jnp.array([1, 4], jnp.int32))
    assert int(toks2[0]) == 0


def test_mlp_pad_i_outputs_unchanged(monkeypatch):
    """MVT_MLP_PAD_I pads the fused gate|up columns and down rows with
    zeros so a 1024-wide k-tile divides I — the padded quantized model's
    logits equal the unpadded quantized model's (zero columns produce
    silu(0)*up = 0 through zero down-rows; real columns quantize
    identically since groups are per-column)."""
    import jax
    import numpy as np

    from microvllm_tpu.config import ModelConfig
    from microvllm_tpu.models import transformer as T
    from microvllm_tpu.ops.quant import quantize_params

    cfg = ModelConfig.tiny(dtype="float32", intermediate_size=384)
    params = T.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, size=(2, 7)), jnp.int32)

    monkeypatch.delenv("MVT_MLP_PAD_I", raising=False)
    q_plain = quantize_params(jax.tree.map(jnp.copy, params), 4, 64)
    ref = np.asarray(T.forward_logits(cfg, q_plain, toks))

    monkeypatch.setenv("MVT_MLP_PAD_I", "1")
    q_pad = quantize_params(jax.tree.map(jnp.copy, params), 4, 64)
    assert q_pad["layers"]["w_gate_up"].out_dim % 2048 == 0  # 2*(I+pad)
    got = np.asarray(T.forward_logits(cfg, q_pad, toks))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
