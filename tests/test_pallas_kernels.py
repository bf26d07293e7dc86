"""Pallas kernels vs jnp reference oracles (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.ops.attention import (append_kv,
                                         paged_decode_attention_ref,
                                         slot_coords)
from microvllm_tpu.ops.pallas.decode_attention import paged_decode_attention


def build_cache(lens, KV=2, D=128, PS=16, NP=16, MP=4, dtype=jnp.float32):
    B = len(lens)
    kp = jnp.zeros((NP, KV, PS, D), dtype)
    vp = jnp.zeros((NP, KV, PS, D), dtype)
    bt = np.zeros((B, MP), np.int32)
    pg = 1
    for b, L in enumerate(lens):
        n = -(-L // PS) if L else 0
        bt[b, :n] = range(pg, pg + n)
        pg += n
    bt = jnp.asarray(bt)
    for b, L in enumerate(lens):
        if L == 0:
            continue
        kk = jax.random.normal(jax.random.PRNGKey(b + 1), (L, KV, D), dtype)
        vv = jax.random.normal(jax.random.PRNGKey(b + 9), (L, KV, D), dtype)
        pos = jnp.arange(L, dtype=jnp.int32)
        pages, offs = slot_coords(bt[b][None].repeat(L, 0), pos, PS)
        kp, vp = append_kv(kp, vp, kk, vv, pages, offs)
    return kp, vp, bt


@pytest.mark.parametrize("lens,ppc", [
    ([50, 20], 2),
    ([64, 1, 33], 1),
    ([16], 4),
])
def test_decode_kernel_matches_ref(lens, ppc):
    B, H, KV, D = len(lens), 4, 2, 128
    kp, vp, bt = build_cache(lens, KV=KV, D=D)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    ref = paged_decode_attention_ref(q, kp, vp, bt, jnp.asarray(lens), D ** -0.5)
    got = paged_decode_attention(q, kp, vp, bt, jnp.asarray(lens),
                                 scale=D ** -0.5, pages_per_chunk=ppc,
                                 interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_decode_kernel_padding_row_inert():
    kp, vp, bt = build_cache([50, 0])
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 128))
    got = paged_decode_attention(q, kp, vp, bt, jnp.array([50, 0], jnp.int32),
                                 scale=128 ** -0.5, pages_per_chunk=2,
                                 interpret=True)
    assert float(jnp.abs(got[1]).max()) == 0.0
    assert bool(jnp.all(jnp.isfinite(got)))


def test_decode_kernel_gqa_group_of_one():
    """num_heads == kv_heads (MHA)."""
    kp, vp, bt = build_cache([40], KV=2)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 128))
    ref = paged_decode_attention_ref(q, kp, vp, bt, jnp.array([40], jnp.int32),
                                     128 ** -0.5)
    got = paged_decode_attention(q, kp, vp, bt, jnp.array([40], jnp.int32),
                                 scale=128 ** -0.5, interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_store_kv_pages_matches_scatter():
    from microvllm_tpu.ops.pallas.kv_store import store_kv_pages

    L, B, KV, D, PS, NP, MP = 2, 2, 2, 128, 16, 16, 4
    S = 32  # chunk of 2 pages
    kc = jnp.zeros((L, NP, KV, PS, D))
    vc = jnp.zeros((L, NP, KV, PS, D))
    bt = jnp.array([[1, 2, 3, 0], [5, 6, 0, 0]], dtype=jnp.int32)
    history = jnp.array([16, 0], jnp.int32)     # row0 page-aligned history
    chunk_lens = jnp.array([32, 20], jnp.int32)  # row1 ragged tail
    k_new = jax.random.normal(jax.random.PRNGKey(0), (B, KV, S, D))
    v_new = jax.random.normal(jax.random.PRNGKey(1), (B, KV, S, D))

    kc2, vc2 = store_kv_pages(k_new, v_new, kc, vc, bt, history, chunk_lens,
                              jnp.int32(1), interpret=True)

    # oracle: scatter valid tokens only
    ko, vo = kc[1], vc[1]
    for b in range(B):
        for t in range(int(chunk_lens[b])):
            pos = int(history[b]) + t
            page = int(bt[b, pos // PS])
            ko = ko.at[page, :, pos % PS].set(k_new[b, :, t])
            vo = vo.at[page, :, pos % PS].set(v_new[b, :, t])

    # all validly-addressed slots match the oracle
    for b in range(B):
        for t in range(int(chunk_lens[b])):
            pos = int(history[b]) + t
            page = int(bt[b, pos // PS])
            np.testing.assert_allclose(kc2[1, page, :, pos % PS],
                                       ko[page, :, pos % PS], rtol=1e-6)
            np.testing.assert_allclose(vc2[1, page, :, pos % PS],
                                       vo[page, :, pos % PS], rtol=1e-6)
    # layer 0 untouched
    assert float(jnp.abs(kc2[0]).max()) == 0.0
    # pages not referenced by any block table remain zero
    assert float(jnp.abs(kc2[1, 8:]).max()) == 0.0


@pytest.mark.parametrize("K,N,M,gs", [(512, 768, 20, 128), (384, 256, 4, 128),
                                      (1024, 512, 64, 64)])
def test_quant_matmul_matches_dequant(K, N, M, gs):
    from microvllm_tpu.ops.pallas.quant_matmul import quant_matmul
    from microvllm_tpu.ops.quant import quantize

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
    qt = quantize(w, 8, gs)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
    ref = x @ qt.dequant(jnp.float32)
    got = quant_matmul(x, qt.q, qt.scales, group_size=qt.group_size,
                       block_m=8, block_n=256, block_k=min(K, 256)
                       if K % 256 == 0 else qt.group_size * 2
                       if K % (qt.group_size * 2) == 0 else qt.group_size,
                       interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2


def test_flash_prefill_matches_ref():
    from microvllm_tpu.ops.pallas.prefill_attention import flash_prefill_attention
    from microvllm_tpu.ops.attention import chunked_prefill_attention_ref

    L, B, KV, G, D, PS, NP, MP = 2, 2, 2, 3, 128, 16, 32, 8
    H, S, layer = KV * G, 64, 1
    kc = jnp.zeros((L, NP, KV, PS, D))
    vc = jnp.zeros((L, NP, KV, PS, D))
    bt = np.zeros((B, MP), np.int32)
    hist = np.array([32, 0], np.int32)
    chunk = np.array([64, 40], np.int32)
    pg = 1
    for b in range(B):
        n = -(-(int(hist[b]) + int(chunk[b])) // PS)
        bt[b, :n] = range(pg, pg + n)
        pg += n
    bt = jnp.asarray(bt)
    for b in range(B):
        hb = int(hist[b])
        if hb == 0:
            continue
        kk = jax.random.normal(jax.random.PRNGKey(b + 1), (hb, KV, D))
        vv = jax.random.normal(jax.random.PRNGKey(b + 9), (hb, KV, D))
        pos = jnp.arange(hb, dtype=jnp.int32)
        pages, offs = slot_coords(bt[b][None].repeat(hb, 0), pos, PS)
        kl, vl = append_kv(kc[layer], vc[layer], kk, vv, pages, offs)
        kc = kc.at[layer].set(kl)
        vc = vc.at[layer].set(vl)

    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, D))
    ref = chunked_prefill_attention_ref(q, k, v, kc[layer], vc[layer], bt,
                                        jnp.asarray(hist), D ** -0.5)
    qk = q.reshape(B, S, KV, G, D).transpose(0, 2, 3, 1, 4)
    got = flash_prefill_attention(
        qk, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), kc, vc, bt,
        jnp.asarray(hist), jnp.asarray(chunk), jnp.int32(layer),
        scale=D ** -0.5, block_q=32, block_k=32, pages_per_chunk=2,
        interpret=True)
    got_std = got.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)
    for b in range(B):
        cl = int(chunk[b])
        np.testing.assert_allclose(got_std[b, :cl], ref[b, :cl],
                                   rtol=2e-5, atol=2e-5)


def test_flash_prefill_no_history():
    from microvllm_tpu.ops.pallas.prefill_attention import flash_prefill_attention
    from microvllm_tpu.ops.attention import prefill_attention_ref

    L, B, KV, G, D, PS, NP = 1, 1, 2, 2, 128, 16, 8
    H, S = KV * G, 32
    kc = jnp.zeros((L, NP, KV, PS, D))
    vc = jnp.zeros((L, NP, KV, PS, D))
    bt = jnp.zeros((B, 4), jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, D))
    ref = prefill_attention_ref(q, k, v, D ** -0.5)
    qk = q.reshape(B, S, KV, G, D).transpose(0, 2, 3, 1, 4)
    got = flash_prefill_attention(
        qk, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), kc, vc, bt,
        jnp.zeros(B, jnp.int32), jnp.full(B, S, jnp.int32), jnp.int32(0),
        scale=D ** -0.5, block_q=16, block_k=16, with_history=False,
        interpret=True)
    got_std = got.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)
    np.testing.assert_allclose(got_std, ref, rtol=2e-5, atol=2e-5)


def test_fused_norm_kernels_match_jnp():
    from microvllm_tpu.ops.pallas.fused_norm import (
        rmsnorm_pallas, rmsnorm_residual_pallas, swiglu_pallas)
    from microvllm_tpu.ops.normalization import rmsnorm, rmsnorm_residual
    from microvllm_tpu.ops.activations import swiglu

    x = jax.random.normal(jax.random.PRNGKey(0), (24, 256))
    r = jax.random.normal(jax.random.PRNGKey(1), (24, 256))
    w = jax.random.normal(jax.random.PRNGKey(2), (256,))

    np.testing.assert_allclose(rmsnorm_pallas(x, w, interpret=True),
                               rmsnorm(x, w), rtol=1e-5, atol=1e-5)
    n1, r1 = rmsnorm_residual_pallas(x, r, w, interpret=True)
    n2, r2 = rmsnorm_residual(x, r, w)
    np.testing.assert_allclose(n1, n2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(r1, r2, rtol=1e-5, atol=1e-5)

    g = jax.random.normal(jax.random.PRNGKey(3), (24, 256))
    u = jax.random.normal(jax.random.PRNGKey(4), (24, 256))
    np.testing.assert_allclose(swiglu_pallas(g, u, interpret=True),
                               swiglu(g, u), rtol=1e-5, atol=1e-5)
