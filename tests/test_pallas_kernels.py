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


def test_flash_prefill_wide_latent_heads():
    """MLA-shaped prefill (KV=1, G=16 query heads over a 640-lane padded
    latent, deepseek-v2-lite geometry): the VMEM-budget auto-shrink must
    drop block_q 128 -> 32 — the default tile needs ~21 MB of scoped VMEM
    on chip (>16 MB limit, hit by the first TPU run) — and still match
    the jnp oracle."""
    from microvllm_tpu.ops.attention import chunked_prefill_attention_ref
    from microvllm_tpu.ops.pallas.prefill_attention import flash_prefill_attention

    L, B, KV, G, D, PS, NP, MP = 1, 1, 1, 16, 640, 16, 16, 12
    S, layer = 128, 0
    kc = jnp.zeros((L, NP, KV, PS, D))
    vc = jnp.zeros((L, NP, KV, PS, D))
    bt = np.zeros((B, MP), np.int32)
    hist = np.array([32], np.int32)
    chunk = np.array([S], np.int32)
    n = -(-(int(hist[0]) + S) // PS)
    bt[0, :n] = range(1, 1 + n)
    bt = jnp.asarray(bt)
    kk = jax.random.normal(jax.random.PRNGKey(1), (32, KV, D))
    vv = jax.random.normal(jax.random.PRNGKey(9), (32, KV, D))
    pos = jnp.arange(32, dtype=jnp.int32)
    pages, offs = slot_coords(bt[0][None].repeat(32, 0), pos, PS)
    kl, vl = append_kv(kc[layer], vc[layer], kk, vv, pages, offs)
    kc, vc = kc.at[layer].set(kl), vc.at[layer].set(vl)

    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, KV * G, D))
    k = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, D))
    v = jax.random.normal(jax.random.PRNGKey(3), (B, S, KV, D))
    ref = chunked_prefill_attention_ref(q, k, v, kc[layer], vc[layer], bt,
                                        jnp.asarray(hist), D ** -0.5)
    qk = q.reshape(B, S, KV, G, D).transpose(0, 2, 3, 1, 4)
    got = flash_prefill_attention(
        qk, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), kc, vc, bt,
        jnp.asarray(hist), jnp.asarray(chunk), jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=2, interpret=True)
    got_std = got.transpose(0, 3, 1, 2, 4).reshape(B, S, KV * G, D)
    np.testing.assert_allclose(got_std[0], ref[0], rtol=2e-5, atol=2e-5)


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


@pytest.mark.parametrize("window", [12, 40, 200])
def test_flash_prefill_sliding_window(window):
    """Windowed flash prefill (history + in-chunk phases) vs the windowed
    jnp oracle: absolute-position window across the history boundary, and
    start-chunk skipping for deep histories."""
    from microvllm_tpu.ops.attention import chunked_prefill_attention_ref
    from microvllm_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attention)

    L, B, KV, G, D, PS, NP, MP = 2, 2, 2, 3, 128, 16, 32, 8
    H, S, layer = KV * G, 64, 1
    kc = jnp.zeros((L, NP, KV, PS, D))
    vc = jnp.zeros((L, NP, KV, PS, D))
    bt = np.zeros((B, MP), np.int32)
    hist = np.array([64, 0], np.int32)
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
                                        jnp.asarray(hist), D ** -0.5,
                                        window=window)
    qk = q.reshape(B, S, KV, G, D).transpose(0, 2, 3, 1, 4)
    got = flash_prefill_attention(
        qk, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), kc, vc, bt,
        jnp.asarray(hist), jnp.asarray(chunk), jnp.int32(layer),
        scale=D ** -0.5, block_q=16, block_k=16, pages_per_chunk=1,
        interpret=True, window=window)
    got_std = got.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)
    for b in range(B):
        cl = int(chunk[b])
        np.testing.assert_allclose(got_std[b, :cl], ref[b, :cl],
                                   rtol=2e-5, atol=2e-5)


def test_flash_prefill_int8_sliding_window():
    """Windowed INT8-history flash prefill vs the windowed jnp oracle."""
    from microvllm_tpu.ops.attention import (chunked_prefill_attention_ref,
                                             paged_decode_append_auto)
    from microvllm_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attention)

    L, B, KV, G, D, PS, NP, MP = 2, 1, 2, 2, 128, 16, 16, 8
    H, S, layer, window = KV * G, 32, 1, 24
    hist = 48
    kc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    vc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    ks = jnp.zeros((L, NP, KV, 128), jnp.float32)
    vs = jnp.zeros((L, NP, KV, 128), jnp.float32)
    bt = jnp.asarray(
        np.arange(1, 1 + MP, dtype=np.int32).reshape(1, MP))
    for t in range(hist):
        kk = jax.random.normal(jax.random.PRNGKey(100 + t), (1, KV, D))
        vv = jax.random.normal(jax.random.PRNGKey(900 + t), (1, KV, D))
        _, kc, vc, ks, vs = paged_decode_append_auto(
            jnp.zeros((1, H, D)), kk, vv, kc, vc, bt,
            jnp.array([t], jnp.int32), jnp.int32(layer), D ** -0.5, ks, vs)

    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, D))
    ref = chunked_prefill_attention_ref(
        q, k, v, kc[layer], vc[layer], bt, jnp.asarray([hist], jnp.int32),
        D ** -0.5, ks[layer], vs[layer], window=window)
    qk = q.reshape(B, S, KV, G, D).transpose(0, 2, 3, 1, 4)
    got = flash_prefill_attention(
        qk, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), kc, vc, bt,
        jnp.asarray([hist], jnp.int32), jnp.asarray([S], jnp.int32),
        jnp.int32(layer), scale=D ** -0.5, block_q=16, block_k=16,
        pages_per_chunk=1, k_scales=ks, v_scales=vs, interpret=True,
        window=window)
    got_std = got.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)
    np.testing.assert_allclose(got_std, ref, rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# Fused append + decode attention — the kernels the 7B bench actually runs
# (VERDICT r1 weak #2: these had no interpret-mode coverage).
# ---------------------------------------------------------------------------


def _stacked_cache(lens, L=2, layer=1, KV=2, D=128, PS=16, NP=16, MP=4,
                   dtype=jnp.float32):
    """Layer-stacked cache with `lens[b]` tokens appended at `layer`.

    Block tables have capacity for lens[b]+1 tokens (the engine's allocator
    always extends before a decode append; padding rows keep an all-trash
    table)."""
    kp = jnp.zeros((NP, KV, PS, D), dtype)
    vp = jnp.zeros((NP, KV, PS, D), dtype)
    bt = np.zeros((len(lens), MP), np.int32)
    pg = 1
    for b, n_tok in enumerate(lens):
        n = -(-(n_tok + 1) // PS) if n_tok else 0
        bt[b, :n] = range(pg, pg + n)
        pg += n
    bt = jnp.asarray(bt)
    for b, n_tok in enumerate(lens):
        if n_tok == 0:
            continue
        kk = jax.random.normal(jax.random.PRNGKey(b + 1), (n_tok, KV, D), dtype)
        vv = jax.random.normal(jax.random.PRNGKey(b + 9), (n_tok, KV, D), dtype)
        pos = jnp.arange(n_tok, dtype=jnp.int32)
        pages, offs = slot_coords(bt[b][None].repeat(n_tok, 0), pos, PS)
        kp, vp = append_kv(kp, vp, kk, vv, pages, offs)
    kc = jnp.zeros((L, NP, KV, PS, D), dtype).at[layer].set(kp)
    vc = jnp.zeros((L, NP, KV, PS, D), dtype).at[layer].set(vp)
    return kc, vc, bt


@pytest.mark.parametrize("lens,ppc", [
    ([17, 16, 0], 2),   # mid-page append, page-boundary append, padding row
    ([15, 31], 1),      # appends that exactly fill a page
    ([5], 4),
])
def test_decode_append_kernel_matches_jnp(lens, ppc):
    """Fused append kernel vs the jnp scatter+attend oracle, including the
    whole cache state (the RMW page rewrite must not corrupt neighbors)."""
    from microvllm_tpu.ops.attention import paged_decode_append_auto
    from microvllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_append)

    B, KV, G, D, layer = len(lens), 2, 2, 128, 1
    H = KV * G
    kc, vc, bt = _stacked_cache(lens, layer=layer, KV=KV, D=D)
    ctx = jnp.asarray(lens, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    k_new = jax.random.normal(jax.random.PRNGKey(1), (B, KV, D))
    v_new = jax.random.normal(jax.random.PRNGKey(2), (B, KV, D))

    # oracle: the jnp path (use_pallas() is False on CPU)
    ref_attn, ref_k, ref_v, _, _ = paged_decode_append_auto(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer), D ** -0.5)

    got_attn, got_k, got_v = paged_decode_attention_append(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=ppc, interpret=True)

    np.testing.assert_allclose(got_attn, ref_attn, rtol=2e-5, atol=2e-5)
    # full cache equality: catches neighbor-slot corruption and writes to
    # the wrong layer (layer 0 must stay zero except trash-page collisions)
    np.testing.assert_allclose(got_k, ref_k, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(got_k[0, 1:]).max()) == 0.0   # other layer untouched


@pytest.mark.parametrize("lens,ppc", [
    ([17, 16, 0], 2),
    ([15, 31], 1),
])
def test_decode_append_q_kernel_matches_jnp(lens, ppc):
    """INT8-KV fused append kernel vs the jnp quantize+scatter+attend oracle:
    values, scale pages, and attention output."""
    from microvllm_tpu.ops.attention import paged_decode_append_auto
    from microvllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_append_q)

    B, KV, G, D, PS, NP, MP, L, layer = len(lens), 2, 2, 128, 16, 16, 4, 2, 1
    H = KV * G
    # build a quantized cache by appending through the jnp oracle path
    kc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    vc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    ks = jnp.zeros((L, NP, KV, 128), jnp.float32)
    vs = jnp.zeros((L, NP, KV, 128), jnp.float32)
    bt = np.zeros((B, MP), np.int32)
    pg = 1
    for b, n_tok in enumerate(lens):
        n = -(-(n_tok + 1) // PS)
        bt[b, :n] = range(pg, pg + n)
        pg += n
    bt = jnp.asarray(bt)
    for b, n_tok in enumerate(lens):
        for t in range(n_tok):
            kk = jax.random.normal(jax.random.PRNGKey(100 + 7 * b + t),
                                   (1, KV, D))
            vv = jax.random.normal(jax.random.PRNGKey(900 + 7 * b + t),
                                   (1, KV, D))
            _, kc_, vc_, ks_, vs_ = paged_decode_append_auto(
                jnp.zeros((1, H, D)), kk[0][None], vv[0][None],
                kc, vc, bt[b][None], jnp.array([t], jnp.int32),
                jnp.int32(layer), D ** -0.5, ks, vs)
            kc, vc, ks, vs = kc_, vc_, ks_, vs_

    ctx = jnp.asarray(lens, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    k_new = jax.random.normal(jax.random.PRNGKey(1), (B, KV, D))
    v_new = jax.random.normal(jax.random.PRNGKey(2), (B, KV, D))

    ref_attn, ref_k, ref_v, ref_ks, ref_vs = paged_decode_append_auto(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer), D ** -0.5,
        ks, vs)

    got_attn, got_k, got_v, got_ks, got_vs = paged_decode_attention_append_q(
        q, k_new, v_new, kc, vc, ks, vs, bt, ctx, jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=ppc, interpret=True)

    # int8 values and scales must match the oracle exactly
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_allclose(got_ks, ref_ks, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got_vs, ref_vs, rtol=1e-6, atol=1e-9)
    # attention: kernel uses bf16 dequant operands; oracle is fp32
    np.testing.assert_allclose(got_attn, ref_attn, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("lens,ppc,window", [
    ([49, 16, 0], 1, 20),   # window spans a chunk boundary mid-page
    ([49, 33], 2, 20),      # start_chunk > 0 with double-buffered slots
    ([17, 5], 2, 64),       # window larger than context: full attention
    ([70], 1, 16),          # deep context, small window (many skipped chunks)
])
def test_decode_append_kernel_sliding_window(lens, ppc, window):
    """Windowed fused append kernel vs the windowed jnp oracle: the kernel
    starts streaming at the window's first chunk (skipped chunks are never
    DMA'd) and masks the boundary chunk."""
    from microvllm_tpu.ops.attention import paged_decode_append_auto
    from microvllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_append)

    B, KV, G, D, layer = len(lens), 2, 2, 128, 1
    H = KV * G
    kc, vc, bt = _stacked_cache(lens, layer=layer, KV=KV, D=D, MP=8, NP=32)
    ctx = jnp.asarray(lens, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    k_new = jax.random.normal(jax.random.PRNGKey(1), (B, KV, D))
    v_new = jax.random.normal(jax.random.PRNGKey(2), (B, KV, D))

    ref_attn, ref_k, ref_v, _, _ = paged_decode_append_auto(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer), D ** -0.5,
        window=window)

    got_attn, got_k, got_v = paged_decode_attention_append(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=ppc, interpret=True, window=window)

    np.testing.assert_allclose(got_attn, ref_attn, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_k, ref_k, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-6, atol=1e-6)


def test_decode_append_q_kernel_sliding_window():
    """Windowed INT8-KV fused append kernel vs the windowed jnp oracle."""
    from microvllm_tpu.ops.attention import paged_decode_append_auto
    from microvllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_append_q)

    lens, ppc, window = [49, 33], 1, 20
    B, KV, G, D, PS, NP, MP, L, layer = len(lens), 2, 2, 128, 16, 16, 8, 2, 1
    H = KV * G
    kc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    vc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    ks = jnp.zeros((L, NP, KV, 128), jnp.float32)
    vs = jnp.zeros((L, NP, KV, 128), jnp.float32)
    bt = np.zeros((B, MP), np.int32)
    pg = 1
    for b, n_tok in enumerate(lens):
        n = -(-(n_tok + 1) // PS)
        bt[b, :n] = range(pg, pg + n)
        pg += n
    bt = jnp.asarray(bt)
    for b, n_tok in enumerate(lens):
        for t in range(n_tok):
            kk = jax.random.normal(jax.random.PRNGKey(100 + 7 * b + t),
                                   (1, KV, D))
            vv = jax.random.normal(jax.random.PRNGKey(900 + 7 * b + t),
                                   (1, KV, D))
            _, kc, vc, ks, vs = paged_decode_append_auto(
                jnp.zeros((1, H, D)), kk[0][None], vv[0][None],
                kc, vc, bt[b][None], jnp.array([t], jnp.int32),
                jnp.int32(layer), D ** -0.5, ks, vs)

    ctx = jnp.asarray(lens, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D))
    k_new = jax.random.normal(jax.random.PRNGKey(1), (B, KV, D))
    v_new = jax.random.normal(jax.random.PRNGKey(2), (B, KV, D))

    ref_attn, ref_k, ref_v, ref_ks, ref_vs = paged_decode_append_auto(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer), D ** -0.5,
        ks, vs, window=window)

    got_attn, got_k, got_v, got_ks, got_vs = paged_decode_attention_append_q(
        q, k_new, v_new, kc, vc, ks, vs, bt, ctx, jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=ppc, interpret=True, window=window)

    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_allclose(got_ks, ref_ks, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got_vs, ref_vs, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got_attn, ref_attn, rtol=3e-2, atol=3e-2)


def test_store_kv_pages_q_matches_scatter():
    """INT8 bulk store: values + scale pages vs an explicit scatter oracle."""
    from microvllm_tpu.ops.attention import quantize_kv
    from microvllm_tpu.ops.pallas.kv_store import store_kv_pages_q

    L, B, KV, D, PS, NP, MP = 2, 2, 2, 128, 16, 16, 4
    S = 32
    kc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    vc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    ks = jnp.zeros((L, NP, KV, 128), jnp.float32)
    vs = jnp.zeros((L, NP, KV, 128), jnp.float32)
    bt = jnp.array([[1, 2, 3, 0], [5, 6, 0, 0]], dtype=jnp.int32)
    history = jnp.array([16, 0], jnp.int32)
    chunk_lens = jnp.array([32, 20], jnp.int32)
    k_f = jax.random.normal(jax.random.PRNGKey(0), (B, S, KV, D))
    v_f = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, D))
    k_q, k_s = quantize_kv(k_f)     # [B,S,KV,D] int8, [B,S,KV] f32
    v_q, v_s = quantize_kv(v_f)

    n_pg = S // PS

    def scale_pages(s):
        sp = jnp.zeros((B, n_pg, KV, 128), jnp.float32)
        return sp.at[..., :PS].set(
            s.reshape(B, n_pg, PS, KV).transpose(0, 1, 3, 2))

    kc2, vc2, ks2, vs2 = store_kv_pages_q(
        k_q.transpose(0, 2, 1, 3), v_q.transpose(0, 2, 1, 3),
        scale_pages(k_s), scale_pages(v_s), kc, vc, ks, vs,
        bt, history, chunk_lens, jnp.int32(1), interpret=True)

    for b in range(B):
        for t in range(int(chunk_lens[b])):
            pos = int(history[b]) + t
            page = int(bt[b, pos // PS])
            np.testing.assert_array_equal(
                np.asarray(kc2[1, page, :, pos % PS]),
                np.asarray(k_q[b, t]))
            np.testing.assert_array_equal(
                np.asarray(vc2[1, page, :, pos % PS]),
                np.asarray(v_q[b, t]))
            np.testing.assert_allclose(ks2[1, page, :, pos % PS],
                                       k_s[b, t], rtol=1e-6)
            np.testing.assert_allclose(vs2[1, page, :, pos % PS],
                                       v_s[b, t], rtol=1e-6)
    # other layer untouched
    assert int(jnp.abs(kc2[0]).max()) == 0
    assert float(jnp.abs(ks2[0]).max()) == 0.0


# ---------------------------------------------------------------------------
# Quantized matmuls: int4 unpack path + layer-stacked variant
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("K,N,M,gs", [(512, 768, 8, 128), (1024, 256, 16, 64)])
def test_quant_matmul_int4_matches_dequant(K, N, M, gs):
    """The nibble-packed int4 unpack inside the kernel vs QuantizedTensor's
    dequant (which round-trips pack/unpack in plain jnp)."""
    from microvllm_tpu.ops.pallas.quant_matmul import quant_matmul
    from microvllm_tpu.ops.quant import quantize

    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.05
    qt = quantize(w, 4, gs)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
    ref = x @ qt.dequant(jnp.float32)
    got = quant_matmul(x, qt.q, qt.scales, group_size=qt.group_size, bits=4,
                       block_m=8, block_n=256, block_k=qt.block_k,
                       interpret=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_matmul_stacked_matches_per_layer(bits):
    """Layer-stacked kernel (scalar-prefetch layer indexing) == per-layer
    unstacked result for every layer."""
    from microvllm_tpu.ops.pallas.quant_matmul import quant_matmul_stacked
    from microvllm_tpu.ops.quant import quantize

    L, K, N, M, gs = 3, 512, 384, 8, 128
    ws = [jax.random.normal(jax.random.PRNGKey(l), (K, N), jnp.float32) * 0.05
          for l in range(L)]
    qts = [quantize(w, bits, gs) for w in ws]
    q_stack = jnp.stack([t.q for t in qts])
    s_stack = jnp.stack([t.scales_tiled for t in qts])
    x = jax.random.normal(jax.random.PRNGKey(99), (M, K), jnp.float32)
    for l in range(L):
        ref = x @ qts[l].dequant(jnp.float32)
        got = quant_matmul_stacked(
            x, q_stack, s_stack, jnp.int32(l), group_size=gs, bits=bits,
            block_k=qts[l].block_k, block_m=8, block_n=128, interpret=True)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 2e-2, (bits, l, rel)


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_matmul_a8_matches_factored_oracle(bits):
    """W4A8/W8A8 kernel vs the exact factored oracle
    ``(x_q * x_s) @ dequant(w)`` — the per-group int8-dot + output-scale
    decomposition is mathematically exact, so tolerance is just f32
    accumulation order."""
    from microvllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_stacked_a8, quantize_activations)
    from microvllm_tpu.ops.quant import quantize

    L, K, N, M, gs = 2, 512, 384, 8, 128
    ws = [jax.random.normal(jax.random.PRNGKey(l), (K, N), jnp.float32) * 0.05
          for l in range(L)]
    qts = [quantize(w, bits, gs) for w in ws]
    q_stack = jnp.stack([t.q for t in qts])
    s_stack = jnp.stack([t.scales_tiled for t in qts])
    x = jax.random.normal(jax.random.PRNGKey(99), (M, K), jnp.float32)
    x_q, x_s = quantize_activations(x, gs)
    x_deq = (x_q.astype(jnp.float32).reshape(M, K // gs, gs)
             * x_s[..., None]).reshape(M, K)
    for l in range(L):
        ref = x_deq @ qts[l].dequant(jnp.float32)
        got = quant_matmul_stacked_a8(
            x_q, x_s, q_stack, s_stack, jnp.int32(l), group_size=gs,
            bits=bits, block_k=qts[l].block_k, block_m=8, block_n=128,
            out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        # and vs the unquantized-activation product: bounded by int8
        # activation quantization error
        full = x @ qts[l].dequant(jnp.float32)
        rel = float(jnp.linalg.norm(got - full) / jnp.linalg.norm(full))
        assert rel < 2e-2, (bits, l, rel)


@pytest.mark.parametrize("start,S", [(5, 8), (12, 8), (16, 4), (30, 5)])
def test_paged_append_rows_matches_scatter(start, S):
    """Slot-exact multi-row append at arbitrary (mid-page / page-crossing)
    offsets vs an explicit scatter oracle; whole-cache equality catches
    neighbor-slot corruption from the page RMW."""
    from microvllm_tpu.ops.pallas.kv_store import paged_append_rows

    L, B, KV, D, PS, NP, MP = 2, 2, 2, 128, 16, 16, 4
    rng = jax.random.PRNGKey(0)
    kc = jax.random.normal(rng, (L, NP, KV, PS, D))
    vc = jax.random.normal(jax.random.PRNGKey(1), (L, NP, KV, PS, D))
    bt = jnp.array([[1, 2, 3, 0], [5, 6, 7, 0]], dtype=jnp.int32)
    starts = jnp.array([start, start // 2], jnp.int32)
    k_new = jax.random.normal(jax.random.PRNGKey(2), (B, KV, S, D))
    v_new = jax.random.normal(jax.random.PRNGKey(3), (B, KV, S, D))

    ko, vo = kc, vc
    for b in range(B):
        for t in range(S):
            pos = int(starts[b]) + t
            page = int(bt[b, pos // PS])
            ko = ko.at[1, page, :, pos % PS].set(k_new[b, :, t])
            vo = vo.at[1, page, :, pos % PS].set(v_new[b, :, t])

    kc2, vc2 = paged_append_rows(k_new, v_new, kc, vc, bt, starts,
                                 jnp.int32(1), interpret=True)
    np.testing.assert_allclose(kc2, ko, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(vc2, vo, rtol=1e-6, atol=1e-6)


def test_flash_prefill_int8_history_matches_ref():
    """Quantized-history flash prefill (r1 fell back to the jnp path that
    materializes [B,H,S,max_ctx] scores) vs the dequantizing reference."""
    from microvllm_tpu.ops.attention import (chunked_prefill_attention_ref,
                                             quantize_kv)
    from microvllm_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attention)

    L, B, KV, G, D, PS, NP, MP = 2, 2, 2, 3, 128, 16, 32, 8
    H, S, layer = KV * G, 64, 1
    kc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    vc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    ks = jnp.zeros((L, NP, KV, 128), jnp.float32)
    vs = jnp.zeros((L, NP, KV, 128), jnp.float32)
    bt = np.zeros((B, MP), np.int32)
    hist = np.array([32, 16], np.int32)
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
        k_q, k_s = quantize_kv(kk)       # [hb, KV, D], [hb, KV]
        v_q, v_s = quantize_kv(vv)
        pos = jnp.arange(hb, dtype=jnp.int32)
        pages, offs = slot_coords(bt[b][None].repeat(hb, 0), pos, PS)
        kc = kc.at[layer, pages, :, offs].set(k_q)
        vc = vc.at[layer, pages, :, offs].set(v_q)
        ks = ks.at[layer, pages, :, offs].set(k_s)
        vs = vs.at[layer, pages, :, offs].set(v_s)

    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, D))
    ref = chunked_prefill_attention_ref(q, k, v, kc[layer], vc[layer], bt,
                                        jnp.asarray(hist), D ** -0.5,
                                        ks[layer], vs[layer])
    qk = q.reshape(B, S, KV, G, D).transpose(0, 2, 3, 1, 4)
    got = flash_prefill_attention(
        qk, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), kc, vc, bt,
        jnp.asarray(hist), jnp.asarray(chunk), jnp.int32(layer),
        scale=D ** -0.5, block_q=32, block_k=32, pages_per_chunk=2,
        k_scales=ks, v_scales=vs, interpret=True)
    got_std = got.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)
    for b in range(B):
        cl = int(chunk[b])
        # kernel dequantizes through bf16 operands; oracle is fp32
        np.testing.assert_allclose(got_std[b, :cl], ref[b, :cl],
                                   rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("bits,M", [(4, 1), (4, 8), (8, 8)])
def test_fused_mlp_a8_matches_oracle(bits, M):
    """One-kernel gate_up+SwiGLU+down vs a jnp oracle replicating the
    per-TI-tile activation re-quantization exactly."""
    from microvllm_tpu.ops.pallas.fused_mlp import fused_mlp_a8
    from microvllm_tpu.ops.pallas.quant_matmul import quantize_activations
    from microvllm_tpu.ops.quant import quantize

    L, K, I, H, gs = 2, 256, 512, 256, 128
    kg = jax.random.PRNGKey
    gu = [jnp.concatenate([jax.random.normal(kg(10 + l), (K, I)) * 0.05,
                           jax.random.normal(kg(20 + l), (K, I)) * 0.05], 1)
          for l in range(L)]
    dn = [jax.random.normal(kg(30 + l), (I, H)) * 0.05 for l in range(L)]
    q_gu = [quantize(w, bits, gs) for w in gu]
    q_dn = [quantize(w, bits, gs) for w in dn]
    TI = q_dn[0].block_k
    x = jax.random.normal(kg(0), (M, K))
    x_q, x_s = quantize_activations(x, gs)
    x_deq = (x_q.astype(jnp.float32).reshape(M, K // gs, gs)
             * x_s[..., None]).reshape(M, K)

    got = fused_mlp_a8(
        x_q, x_s, jnp.stack([t.q for t in q_gu]),
        jnp.stack([t.scales_tiled for t in q_gu]),
        jnp.stack([t.q for t in q_dn]),
        jnp.stack([t.scales_tiled for t in q_dn]),
        jnp.int32(1), group_size=gs, bits=bits, tile_i=TI,
        out_dtype=jnp.float32, interpret=True)

    wgu = q_gu[1].dequant(jnp.float32)
    wd = q_dn[1].dequant(jnp.float32)
    g = x_deq @ wgu[:, :I]
    u = x_deq @ wgu[:, I:]
    a = g * jax.nn.sigmoid(g) * u
    out = jnp.zeros((M, H), jnp.float32)
    for t in range(I // TI):
        at = a[:, t * TI:(t + 1) * TI]
        a_s = jnp.maximum(jnp.max(jnp.abs(at), axis=-1, keepdims=True)
                          / 127.0, 1e-10)
        at_q = jnp.clip(jnp.round(at / a_s), -127, 127) * a_s
        out = out + at_q @ wd[t * TI:(t + 1) * TI]
    np.testing.assert_allclose(got, out, rtol=2e-3, atol=2e-3)

    # sanity vs the full-precision MLP: bounded by weight quantization
    # error (int4 at these toy dims compounds to ~20% through 3 matmuls;
    # the exact-oracle check above is the correctness assertion)
    full = (lambda gg, uu: (gg * jax.nn.sigmoid(gg) * uu))(
        x @ gu[1][:, :I], x @ gu[1][:, I:]) @ dn[1]
    rel = float(jnp.linalg.norm(got - full) / jnp.linalg.norm(full))
    assert rel < (0.3 if bits == 4 else 0.15), rel


@pytest.mark.parametrize("bits,M", [(4, 1), (8, 8)])
def test_fused_mlp_block_matches_composition(bits, M):
    """The all-in-one MLP block (resid add + rmsnorm + MLP + resid add)
    vs composing the tested pieces in jnp."""
    from microvllm_tpu.ops.normalization import rmsnorm
    from microvllm_tpu.ops.pallas.fused_mlp import (fused_mlp_a8,
                                                    fused_mlp_block)
    from microvllm_tpu.ops.pallas.quant_matmul import quantize_activations
    from microvllm_tpu.ops.quant import quantize

    L, K, I, H, gs, eps = 2, 256, 512, 256, 128, 1e-6
    kg = jax.random.PRNGKey
    gu = [jnp.concatenate([jax.random.normal(kg(10 + l), (K, I)) * 0.05,
                           jax.random.normal(kg(20 + l), (K, I)) * 0.05], 1)
          for l in range(L)]
    dn = [jax.random.normal(kg(30 + l), (I, H)) * 0.05 for l in range(L)]
    q_gu = [quantize(w, bits, gs) for w in gu]
    q_dn = [quantize(w, bits, gs) for w in dn]
    TI = q_dn[0].block_k
    attn = jax.random.normal(kg(1), (M, K))
    hid = jax.random.normal(kg(2), (M, K))
    nw = jax.random.normal(kg(3), (K,)) * 0.1 + 1.0

    got = fused_mlp_block(
        attn, hid, nw, jnp.stack([t.q for t in q_gu]),
        jnp.stack([t.scales_tiled for t in q_gu]),
        jnp.stack([t.q for t in q_dn]),
        jnp.stack([t.scales_tiled for t in q_dn]),
        jnp.int32(1), group_size=gs, bits=bits, tile_i=TI, eps=eps,
        out_dtype=jnp.float32, interpret=True)

    # composition oracle: resid + fused_mlp_a8(quantize(rmsnorm(resid)))
    resid = attn + hid
    normed = rmsnorm(resid.astype(jnp.float32), nw, eps)
    x_q, x_s = quantize_activations(normed, gs)
    mlp = fused_mlp_a8(
        x_q, x_s, jnp.stack([t.q for t in q_gu]),
        jnp.stack([t.scales_tiled for t in q_gu]),
        jnp.stack([t.q for t in q_dn]),
        jnp.stack([t.scales_tiled for t in q_dn]),
        jnp.int32(1), group_size=gs, bits=bits, tile_i=TI,
        out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(got, resid + mlp, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bits,M,has_norm", [(4, 1, True), (8, 8, True),
                                             (4, 8, False)])
def test_quant_matmul_a8_fused_prologue(bits, M, has_norm):
    """In-kernel rmsnorm + activation quantization == XLA norm/quantize
    followed by the plain a8 kernel."""
    from microvllm_tpu.ops.normalization import rmsnorm
    from microvllm_tpu.ops.pallas.quant_matmul import (
        quant_matmul_stacked_a8, quant_matmul_stacked_a8_fused,
        quantize_activations)
    from microvllm_tpu.ops.quant import quantize

    L, K, N, gs, eps = 2, 512, 384, 128, 1e-6
    ws = [jax.random.normal(jax.random.PRNGKey(l), (K, N), jnp.float32) * 0.05
          for l in range(L)]
    qts = [quantize(w, bits, gs) for w in ws]
    q_stack = jnp.stack([t.q for t in qts])
    s_stack = jnp.stack([t.scales_tiled for t in qts])
    x = jax.random.normal(jax.random.PRNGKey(99), (M, K), jnp.float32)
    nw = jax.random.normal(jax.random.PRNGKey(5), (K,)) * 0.1 + 1.0

    got = quant_matmul_stacked_a8_fused(
        x, nw, q_stack, s_stack, jnp.int32(1), group_size=gs, bits=bits,
        block_k=qts[0].block_k, has_norm=has_norm, eps=eps,
        out_dtype=jnp.float32, interpret=True)

    xin = rmsnorm(x, nw, eps).astype(jnp.float32) if has_norm else x
    x_q, x_s = quantize_activations(xin, gs)
    ref = quant_matmul_stacked_a8(
        x_q, x_s, q_stack, s_stack, jnp.int32(1), group_size=gs, bits=bits,
        block_k=qts[0].block_k, block_m=8, block_n=128,
        out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


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


def test_decode_append_kernel_softcap():
    """Attention-logit soft-capping (gemma2) in the fused append kernel vs
    the capped jnp oracle — and the cap must actually change the output."""
    from microvllm_tpu.ops.attention import paged_decode_append_auto
    from microvllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_append)

    lens, cap = [17, 33, 0], 3.0
    B, KV, G, D, layer = len(lens), 2, 2, 128, 1
    H = KV * G
    kc, vc, bt = _stacked_cache(lens, layer=layer, KV=KV, D=D)
    ctx = jnp.asarray(lens, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D)) * 4.0
    k_new = jax.random.normal(jax.random.PRNGKey(1), (B, KV, D))
    v_new = jax.random.normal(jax.random.PRNGKey(2), (B, KV, D))

    ref_attn, ref_k, ref_v, _, _ = paged_decode_append_auto(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer), D ** -0.5,
        softcap=cap)
    got_attn, got_k, got_v = paged_decode_attention_append(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=2, interpret=True, softcap=cap)
    np.testing.assert_allclose(got_attn, ref_attn, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_k, ref_k, rtol=1e-6, atol=1e-6)

    uncapped, *_ = paged_decode_attention_append(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=2, interpret=True)
    assert float(jnp.abs(uncapped[:2] - got_attn[:2]).max()) > 1e-4


def test_decode_append_q_kernel_softcap():
    """Soft-capping composes with the INT8-KV decode kernel."""
    from microvllm_tpu.ops.attention import (paged_decode_append_auto,
                                             quantize_kv)
    from microvllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention_append_q)

    lens, cap = [21, 7], 2.5
    B, KV, G, D, layer, L = len(lens), 2, 2, 128, 1, 2
    H = KV * G
    NP, PS = 8, 16
    rng = np.random.default_rng(3)
    bt_rows = []
    kc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    vc = jnp.zeros((L, NP, KV, PS, D), jnp.int8)
    ks = jnp.zeros((L, NP, KV, 128), jnp.float32)
    vs = jnp.zeros((L, NP, KV, 128), jnp.float32)
    next_page = 1
    for blen in lens:
        n = -(-max(blen, 1) // PS) or 1
        row = list(range(next_page, next_page + n))
        next_page += n
        row += [0] * (4 - len(row))
        bt_rows.append(row)
        for t in range(blen):
            kq, kscale = quantize_kv(jnp.asarray(
                rng.standard_normal((KV, D)), jnp.float32))
            vq, vscale = quantize_kv(jnp.asarray(
                rng.standard_normal((KV, D)), jnp.float32))
            pg, off = row[t // PS], t % PS
            kc = kc.at[layer, pg, :, off].set(kq)
            vc = vc.at[layer, pg, :, off].set(vq)
            ks = ks.at[layer, pg, :, off].set(kscale)
            vs = vs.at[layer, pg, :, off].set(vscale)
    bt = jnp.asarray(bt_rows, jnp.int32)
    ctx = jnp.asarray(lens, jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D)) * 4.0
    k_new = jax.random.normal(jax.random.PRNGKey(1), (B, KV, D))
    v_new = jax.random.normal(jax.random.PRNGKey(2), (B, KV, D))

    ref_attn, *_ = paged_decode_append_auto(
        q, k_new, v_new, kc, vc, bt, ctx, jnp.int32(layer), D ** -0.5,
        k_scales=ks, v_scales=vs, softcap=cap)
    got_attn, *_ = paged_decode_attention_append_q(
        q, k_new, v_new, kc, vc, ks, vs, bt, ctx, jnp.int32(layer),
        scale=D ** -0.5, pages_per_chunk=1, interpret=True, softcap=cap)
    # bf16 in-kernel dots vs the fp32 gather-dequant oracle: the 4x-scaled
    # q pushes |scores| up where bf16 rounding is ~0.4% relative
    np.testing.assert_allclose(got_attn, ref_attn, rtol=5e-2, atol=5e-3)


def test_flash_prefill_softcap():
    """Soft-capping in the flash prefill kernel (history + current chunk)
    vs the capped chunked jnp oracle."""
    from microvllm_tpu.ops.attention import chunked_prefill_attention_ref
    from microvllm_tpu.ops.pallas.prefill_attention import (
        flash_prefill_attention)

    B, KV, G, S, D, layer, cap = 2, 2, 2, 32, 128, 1, 4.0
    H = KV * G
    hist = [20, 0]
    kc, vc, bt = _stacked_cache(hist, layer=layer, KV=KV, D=D)
    hl = jnp.asarray(hist, jnp.int32)
    cl = jnp.asarray([S, S - 5], jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D)) * 3.0
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, KV, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, KV, D))

    ref = chunked_prefill_attention_ref(
        q, k, v, kc[layer], vc[layer], bt, hl, D ** -0.5, softcap=cap)

    qt = q.reshape(B, S, KV, G, D).transpose(0, 2, 3, 1, 4)
    got = flash_prefill_attention(
        qt, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        kc, vc, bt, hl, cl, jnp.int32(layer), scale=D ** -0.5,
        block_q=16, block_k=16, pages_per_chunk=1, interpret=True,
        softcap=cap)
    got = got.transpose(0, 3, 1, 2, 4).reshape(B, S, H, D)
    # rows beyond chunk_len are don't-care
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1, :S - 5], ref[1, :S - 5],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bits,mode,slots_per_step",
                         [(4, "gather", 1), (4, "sweep", 1),
                          (8, "sweep", 1), (4, "sorted", 1),
                          (4, "gather", 2), (4, "sorted", 2),
                          (4, "sorted", 3), (8, "sweep", 4)])
def test_fused_moe_block_matches_composition(bits, mode, slots_per_step):
    """One-launch routed MoE block (resid + sum_j w_j * expert_{idx_j}(
    rmsnorm(resid))) vs composing the tested fused_mlp_a8 per expert.

    GATHER mode: one row, idx = the selected experts only. SWEEP mode:
    several rows, idx = all experts, per-row masked weights. SORTED mode:
    several rows, idx = sorted per-assignment expert ids WITH adjacent
    duplicates (the DMA-eliding batched-decode layout), one weight per
    (row, slot) assignment.
    """
    from microvllm_tpu.ops.normalization import rmsnorm
    from microvllm_tpu.ops.pallas.fused_mlp import fused_mlp_a8
    from microvllm_tpu.ops.pallas.fused_moe import fused_moe_block
    from microvllm_tpu.ops.pallas.quant_matmul import quantize_activations
    from microvllm_tpu.ops.quant import quantize

    L, E, K, I, gs, eps = 2, 4, 256, 512, 128, 1e-6
    kg = jax.random.PRNGKey
    gu = [jnp.concatenate(
        [jax.random.normal(kg(10 + n), (K, I)) * 0.05,
         jax.random.normal(kg(40 + n), (K, I)) * 0.05], 1)
        for n in range(L * E)]
    dn = [jax.random.normal(kg(70 + n), (I, K)) * 0.05 for n in range(L * E)]
    q_gu = [quantize(w, bits, gs) for w in gu]
    q_dn = [quantize(w, bits, gs) for w in dn]
    TI = q_dn[0].block_k
    layer = 1
    if mode == "gather":
        M = 1
        idx = jnp.asarray([layer * E + 2, layer * E + 0], jnp.int32)
        wts = jnp.asarray([[0.7, 0.2]], jnp.float32)
    elif mode == "sorted":
        # 3 rows x top-2 = 6 assignment slots, sorted: experts
        # [0, 0, 1, 2, 2, 3] — duplicates adjacent, one weight per slot
        M = 3
        eids = jnp.asarray([0, 0, 1, 2, 2, 3], jnp.int32)
        rows_of = jnp.asarray([0, 2, 1, 0, 1, 2])   # owning row per slot
        w_of = jnp.asarray([0.6, 0.5, 0.9, 0.4, 0.1, 0.5], jnp.float32)
        idx = layer * E + eids
        wts = jnp.zeros((M, 6), jnp.float32).at[
            rows_of, jnp.arange(6)].set(w_of)
    else:
        M = 5
        idx = layer * E + jnp.arange(E, dtype=jnp.int32)
        wts = jax.nn.softmax(jax.random.normal(kg(5), (M, E)))
        wts = jnp.where(wts > 0.2, wts, 0.0)     # sparse per-row selection
    attn = jax.random.normal(kg(1), (M, K))
    hid = jax.random.normal(kg(2), (M, K))
    nw = jax.random.normal(kg(3), (K,)) * 0.1 + 1.0

    S = slots_per_step
    pad = (-idx.shape[0]) % S
    idx_k, wts_k = idx, wts
    if pad:   # multi-slot padding: repeated ids with zero weights (exact)
        idx_k = jnp.concatenate([idx, jnp.broadcast_to(idx[-1:], (pad,))])
        wts_k = jnp.pad(wts, ((0, 0), (0, pad)))
    got = fused_moe_block(
        attn, hid, nw, idx_k, wts_k, jnp.stack([t.q for t in q_gu]),
        jnp.stack([t.scales_tiled for t in q_gu]),
        jnp.stack([t.q for t in q_dn]),
        jnp.stack([t.scales_tiled for t in q_dn]),
        group_size=gs, bits=bits, tile_i=TI, eps=eps,
        out_dtype=jnp.float32, interpret=True, slots_per_step=S)

    resid = attn + hid
    normed = rmsnorm(resid.astype(jnp.float32), nw, eps)
    x_q, x_s = quantize_activations(normed, gs)
    out = resid.astype(jnp.float32)
    for j in range(idx.shape[0]):
        mlp_j = fused_mlp_a8(
            x_q, x_s, jnp.stack([t.q for t in q_gu]),
            jnp.stack([t.scales_tiled for t in q_gu]),
            jnp.stack([t.q for t in q_dn]),
            jnp.stack([t.scales_tiled for t in q_dn]),
            idx[j], group_size=gs, bits=bits, tile_i=TI,
            out_dtype=jnp.float32, interpret=True)
        out = out + wts[:, j:j + 1] * mlp_j
    np.testing.assert_allclose(got, out, rtol=2e-3, atol=2e-3)
