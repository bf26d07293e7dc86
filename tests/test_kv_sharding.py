"""Sequence-parallel KV (page sharding over the ``seq`` mesh axis).

SURVEY.md §5's long-context mandate: KV sharded over the mesh so context
capacity scales with chips, not just kv-heads. These tests pin the three
layers of the design on the 8-virtual-device CPU mesh:

* `sp_local_tables` — global block tables -> per-rank compacted local
  tables + token counts (pure math, hand-checked);
* flash partials — the Pallas ``partials=True`` decode kernel (interpret
  mode) and the jnp oracle agree, and combining per-shard partials
  reproduces full attention exactly;
* shard_map end-to-end — decode over a page-sharded cache on a real
  2/4-rank mesh axis matches the single-device reference bitwise-close.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from microvllm_tpu.ops.attention import (
    NEG_INF,
    chunked_prefill_attention_ref,
    chunked_prefill_attention_sp,
    paged_decode_attention_ref,
    paged_decode_partials_ref,
    slot_coords,
    sp_local_tables,
    sp_owner_coords,
)


def _mesh(sp):
    devs = np.array(jax.devices("cpu")[:sp])
    return Mesh(devs, ("seq",))


def test_sp_local_tables_hand_example():
    # one seq: 5 pages of size 4, 18 tokens (last page has 2), sp=2.
    # global pages [7, 2, 9, 4, 12]: rank 0 owns evens {2, 4, 12},
    # rank 1 owns odds {7, 9}. Page 12 (global-last, 2 tokens) -> rank 0.
    tables = jnp.asarray([[7, 2, 9, 4, 12, 0, 0, 0]], jnp.int32)
    lens = jnp.asarray([18], jnp.int32)
    lt0, ll0 = sp_local_tables(tables, lens, 4, 2, jnp.int32(0))
    lt1, ll1 = sp_local_tables(tables, lens, 4, 2, jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(lt0)[0, :3], [1, 2, 6])
    assert int(ll0[0]) == 4 + 4 + 2
    np.testing.assert_array_equal(np.asarray(lt1)[0, :2], [3, 4])
    assert int(ll1[0]) == 4 + 4
    # padding/unused entries are local trash 0
    np.testing.assert_array_equal(np.asarray(lt0)[0, 3:], 0)
    np.testing.assert_array_equal(np.asarray(lt1)[0, 2:], 0)
    # zero-length row (padding) owns nothing anywhere
    lt, ll = sp_local_tables(tables, jnp.asarray([0], jnp.int32), 4, 2,
                             jnp.int32(1))
    assert int(ll[0]) == 0
    np.testing.assert_array_equal(np.asarray(lt), 0)


def test_sp_owner_coords():
    pages = jnp.asarray([6, 4, 0, 11], jnp.int32)
    np.testing.assert_array_equal(   # rank 0 owns 6 (->2) and 0 (->0)
        np.asarray(sp_owner_coords(pages, 3, jnp.int32(0))), [2, 0, 0, 0])
    np.testing.assert_array_equal(   # rank 1 owns 4 (->1)
        np.asarray(sp_owner_coords(pages, 3, jnp.int32(1))), [0, 1, 0, 0])
    np.testing.assert_array_equal(   # rank 2 owns 11 (->3)
        np.asarray(sp_owner_coords(pages, 3, jnp.int32(2))), [0, 0, 0, 3])


def _rand_cache(key, P_pages, kv, ps, d):
    k1, k2 = jax.random.split(key)
    k_pages = jax.random.normal(k1, (P_pages, kv, ps, d), jnp.float32)
    v_pages = jax.random.normal(k2, (P_pages, kv, ps, d), jnp.float32)
    return k_pages, v_pages


def test_partials_kernel_matches_ref_and_combines():
    """Pallas partials kernel (interpret) == jnp oracle; combining two
    disjoint-page shards' partials == full-cache attention."""
    from microvllm_tpu.ops.pallas.decode_attention import (
        paged_decode_attention)

    B, H, KV, D, ps, P_pages = 3, 4, 2, 128, 8, 10
    key = jax.random.PRNGKey(0)
    k_pages, v_pages = _rand_cache(key, P_pages, KV, ps, D)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, H, D), jnp.float32)
    tables = jnp.asarray([[3, 5, 7, 9], [2, 4, 6, 8], [0, 0, 0, 0]],
                         jnp.int32)
    lens = jnp.asarray([29, 16, 0], jnp.int32)
    scale = D ** -0.5

    acc, m, l = paged_decode_attention(
        q, k_pages, v_pages, tables, lens, scale=scale, partials=True,
        interpret=True, pages_per_chunk=1)
    acc_r, m_r, l_r = paged_decode_partials_ref(
        q, k_pages, v_pages, tables, lens, scale)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_r),
                               rtol=1e-5, atol=1e-5)
    # empty rows emit the combine identity
    np.testing.assert_allclose(np.asarray(l)[2], 0.0)
    np.testing.assert_allclose(np.asarray(acc)[2], 0.0)
    assert np.all(np.asarray(m)[2] <= NEG_INF / 2)
    valid = np.asarray(l_r) > 0
    np.testing.assert_allclose(np.asarray(m)[valid[..., 0]],
                               np.asarray(m_r)[valid[..., 0]],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_r),
                               rtol=1e-5, atol=1e-5)

    # split pages across 2 simulated ranks and combine manually
    full = paged_decode_attention_ref(
        q, k_pages, v_pages, tables, lens, scale)
    parts = []
    for rank in range(2):
        lt, ll = sp_local_tables(tables, lens, ps, 2, jnp.int32(rank))
        # rank's local cache shard: global page g -> local g // 2
        shard_k = k_pages[rank::2]
        shard_v = v_pages[rank::2]
        parts.append(paged_decode_partials_ref(
            q, shard_k, shard_v, lt, ll, scale))
    (a0, m0, l0), (a1, m1, l1) = parts
    mm = jnp.maximum(m0, m1)
    al0, al1 = jnp.exp(m0 - mm), jnp.exp(m1 - mm)
    lt = l0 * al0 + l1 * al1
    out = (a0 * al0 + a1 * al1) / jnp.maximum(lt, 1e-30)
    # padding row 2 (len 0): partials give 0 (kernel contract); the jnp
    # softmax ref gives a garbage uniform mean there — compare real rows
    np.testing.assert_allclose(np.asarray(out)[:2], np.asarray(full)[:2],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[2], 0.0)
    # trash-page redirects (local slot 0 = global pages 0..sp-1) never
    # leak into results because local lens exclude them by construction


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_decode_shard_map_matches_single_device(sp):
    """End-to-end: page-sharded decode attention inside shard_map over a
    real mesh axis == the single-device reference."""
    from microvllm_tpu.ops.attention import sp_decode_attention

    B, H, KV, D, ps = 4, 8, 4, 128, 8
    P_global = 4 * sp  # divisible shard
    key = jax.random.PRNGKey(2)
    k_pages, v_pages = _rand_cache(key, P_global, KV, ps, D)
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, D), jnp.float32)
    # sequences use pages >= sp (0..sp-1 reserved trash under sp)
    rng = np.random.default_rng(0)
    avail = np.arange(sp, P_global)
    tabs = np.zeros((B, 4), np.int32)
    lens = np.asarray([29, 16, 0, 7], np.int32)
    for b in range(B):
        n = -(-int(lens[b]) // ps)
        tabs[b, :n] = rng.choice(avail, size=n, replace=False)
    tables = jnp.asarray(tabs)
    lens_j = jnp.asarray(lens)
    scale = D ** -0.5

    ref = paged_decode_attention_ref(q, k_pages, v_pages, tables, lens_j,
                                     scale)

    mesh = _mesh(sp)

    def step(q, kp, vp, tables, lens):
        rank = jax.lax.axis_index("seq")
        lt, ll = sp_local_tables(tables, lens, ps, sp, rank)
        return sp_decode_attention(q, kp, vp, lt, ll, scale,
                                   sp_axis="seq")

    # cache page axis sharded over seq (interleaved: reorder pages so
    # rank r's contiguous shard holds global pages r, r+sp, r+2sp, ...)
    perm = np.concatenate([np.arange(r, P_global, sp) for r in range(sp)])
    f = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P("seq"), P("seq"), P(), P()),
        out_specs=P(), check_vma=False)
    out = f(q, k_pages[perm], v_pages[perm], tables, lens_j)
    real = np.asarray(lens) > 0   # padding rows: sp gives 0, ref garbage
    np.testing.assert_allclose(np.asarray(out)[real], np.asarray(ref)[real],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[~real], 0.0)


def test_sp_chunked_prefill_matches_ref():
    """Chunked-prefill attention under page sharding == the reference:
    history partials per rank + chunk causal on rank 0 only."""
    sp = 2
    B, S, H, KV, D, ps = 2, 8, 4, 2, 128, 8
    P_global = 8
    key = jax.random.PRNGKey(4)
    k_pages, v_pages = _rand_cache(key, P_global, KV, ps, D)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, KV, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, KV, D), jnp.float32)
    tables = jnp.asarray([[3, 5, 7, 0], [2, 4, 0, 0]], jnp.int32)
    hist = jnp.asarray([20, 11], jnp.int32)
    scale = D ** -0.5

    ref = chunked_prefill_attention_ref(
        q, k, v, k_pages, v_pages, tables, hist, scale)

    mesh = _mesh(sp)
    perm = np.concatenate([np.arange(r, P_global, sp) for r in range(sp)])

    def step(q, k, v, kp, vp, tables, hist):
        rank = jax.lax.axis_index("seq")
        lt, ll = sp_local_tables(tables, hist, ps, sp, rank)
        return chunked_prefill_attention_sp(
            q, k, v, kp, vp, lt, ll, scale, sp_axis="seq")

    f = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P("seq"), P("seq"), P(), P()),
        out_specs=P(), check_vma=False)
    out = f(q, k, v, k_pages[perm], v_pages[perm], tables, hist)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_store_scatter_roundtrip():
    """Owner-masked scatters reassemble the exact global cache."""
    sp = 2
    KV, ps, D = 2, 4, 128
    P_global = 8
    k_pages = jnp.zeros((P_global, KV, ps, D), jnp.float32)
    tables = jnp.asarray([[3, 5, 6, 0]], jnp.int32)
    # write 10 tokens at positions 0..9
    pos = jnp.arange(10, dtype=jnp.int32)[None, :]
    new = jax.random.normal(jax.random.PRNGKey(6), (1, 10, KV, D))
    page_ids, offsets = slot_coords(tables, pos, ps)
    shards = []
    for rank in range(sp):
        local = sp_owner_coords(page_ids, sp, jnp.int32(rank))
        shard = k_pages[rank::sp]
        shard = shard.at[local[0], :, offsets[0]].set(new[0])
        shards.append(np.asarray(shard))
    # reassemble: global page g = shards[g % sp][g // sp]; zero the trash
    # pages (0..sp-1) which absorbed the other ranks' redirects
    glob = np.zeros((P_global, KV, ps, D), np.float32)
    for g in range(sp, P_global):
        glob[g] = shards[g % sp][g // sp]
    want = np.asarray(
        k_pages.at[page_ids[0], :, offsets[0]].set(new[0]))
    np.testing.assert_allclose(glob[sp:], want[sp:], atol=0)
