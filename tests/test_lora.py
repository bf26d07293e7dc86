"""Multi-LoRA serving: batched per-request adapters inside the jitted step.

The dense-equivalence anchor: a request running adapter ``i`` must produce
exactly the tokens of a base engine whose projection weights were densified
to ``W + scaling * A_i @ B_i`` (float32 tiny model -> greedy ids match
exactly). Adapter slot 0 must be bit-identical to the base model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.config import (CacheConfig, EngineConfig, LoRAConfig,
                                  ModelConfig, SchedulerConfig)
from microvllm_tpu.models import transformer as model_lib
from microvllm_tpu.runtime.engine import InferenceEngine
from microvllm_tpu.runtime.sequence import SamplingParams

RANK = 4


def _cfg(lora=None, **over):
    cfg = EngineConfig(
        model=ModelConfig.tiny(dtype="float32"),
        cache=CacheConfig(num_pages=64, page_size=16, max_pages_per_seq=8),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_prefill_tokens=256, prefill_wait_s=0.0,
            decode_buckets=(1, 2, 4), prefill_len_buckets=(16, 32),
            prefill_batch_buckets=(1, 2), decode_spans=(1, 4)),
        max_model_len=128,
        default_max_new_tokens=6,
        lora=lora,
    )
    return cfg.replace(**over) if over else cfg


def _base_params(mcfg):
    return model_lib.init_params(mcfg, jax.random.PRNGKey(1))


def _rand_adapter(mcfg, seed):
    kg = jax.random.PRNGKey
    L, H, r = mcfg.num_layers, mcfg.hidden_size, RANK
    qkv_out = mcfg.q_dim + 2 * mcfg.kv_dim
    return {
        "qkv_a": jax.random.normal(kg(seed), (L, H, r)) * 0.3,
        "qkv_b": jax.random.normal(kg(seed + 1), (L, r, qkv_out)) * 0.3,
        "o_a": jax.random.normal(kg(seed + 2), (L, mcfg.q_dim, r)) * 0.3,
        "o_b": jax.random.normal(kg(seed + 3), (L, r, H)) * 0.3,
    }


def test_lora_delta_math():
    from microvllm_tpu.models.transformer import lora_delta

    kg = jax.random.PRNGKey
    N, K, r, M, B = 3, 8, 2, 6, 4
    A = jax.random.normal(kg(0), (N, K, r))
    Bm = jax.random.normal(kg(1), (N, r, M))
    x = jax.random.normal(kg(2), (B, K))
    ids = jnp.array([0, 2, 1, 2], jnp.int32)
    got = lora_delta(x, A, Bm, ids, 0.5)
    for b in range(B):
        ref = 0.5 * x[b] @ A[ids[b]] @ Bm[ids[b]]
        np.testing.assert_allclose(got[b], ref, rtol=1e-5, atol=1e-5)
    # 3D (prefill) input
    x3 = jax.random.normal(kg(3), (B, 5, K))
    got3 = lora_delta(x3, A, Bm, ids, 0.5)
    np.testing.assert_allclose(
        got3[1, 3], 0.5 * x3[1, 3] @ A[2] @ Bm[2], rtol=1e-5, atol=1e-5)


def test_adapter_zero_matches_base():
    """An engine with LoRA enabled but only slot 0 must reproduce the base
    engine's greedy tokens exactly (slot 0 is all-zero)."""
    mcfg = ModelConfig.tiny(dtype="float32")
    params = _base_params(mcfg)
    base = InferenceEngine(_cfg(), params=jax.tree.map(jnp.copy, params))
    lora = InferenceEngine(_cfg(lora=LoRAConfig(rank=RANK, max_adapters=4)),
                           params=jax.tree.map(jnp.copy, params))
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompt = [3, 1, 4, 1, 5]
    [b] = base.generate([prompt], sampling=sp)
    [l] = lora.generate([prompt], sampling=sp)
    assert b.output_token_ids == l.output_token_ids


def test_adapter_matches_densified_weights():
    """Adapter i == base engine with W += scaling * A_i @ B_i, and a mixed
    batch keeps rows independent (adapter 0 row still matches base)."""
    mcfg = ModelConfig.tiny(dtype="float32")
    lc = LoRAConfig(rank=RANK, max_adapters=4, alpha=2.0 * RANK)  # scale 2.0
    params = _base_params(mcfg)
    adapter = _rand_adapter(mcfg, seed=42)

    # densified twin: fold the adapter into wq/wk/wv/wo per layer
    dense = jax.tree.map(jnp.copy, params)
    layers = dict(dense["layers"])
    s = lc.scaling
    d_qkv = jnp.einsum("lkr,lrm->lkm", adapter["qkv_a"], adapter["qkv_b"])
    q_dim, kv = mcfg.q_dim, mcfg.kv_dim
    layers["wq"] = layers["wq"] + s * d_qkv[..., :q_dim]
    layers["wk"] = layers["wk"] + s * d_qkv[..., q_dim:q_dim + kv]
    layers["wv"] = layers["wv"] + s * d_qkv[..., q_dim + kv:]
    layers["wo"] = layers["wo"] + s * jnp.einsum(
        "lkr,lrm->lkm", adapter["o_a"], adapter["o_b"])
    dense["layers"] = layers

    eng = InferenceEngine(_cfg(lora=lc), params=jax.tree.map(jnp.copy, params))
    slot = eng.load_adapter(adapter)
    assert slot == 1
    dense_eng = InferenceEngine(_cfg(), params=dense)
    base_eng = InferenceEngine(_cfg(), params=jax.tree.map(jnp.copy, params))

    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    prompt_a, prompt_b = [3, 1, 4, 1, 5], [9, 2, 6]

    # mixed batch on the LoRA engine: row adapters (1, 0)
    ida = eng.add_request(prompt_token_ids=prompt_a, sampling=sp,
                          adapter_id=1)
    idb = eng.add_request(prompt_token_ids=prompt_b, sampling=sp)
    while not eng.scheduler.is_finished():
        eng.step()
    done = {q.seq_id: q for q in eng.scheduler.pop_finished()}

    [ref_a] = dense_eng.generate([prompt_a], sampling=sp)
    [ref_b] = base_eng.generate([prompt_b], sampling=sp)
    assert done[ida].output_token_ids == ref_a.output_token_ids
    assert done[idb].output_token_ids == ref_b.output_token_ids


def test_unknown_adapter_rejected():
    eng = InferenceEngine(_cfg(lora=LoRAConfig(rank=RANK, max_adapters=4)))
    with pytest.raises(ValueError, match="not loaded"):
        eng.add_request(prompt_token_ids=[1, 2], adapter_id=2)
    # base engine rejects any nonzero adapter
    base = InferenceEngine(_cfg())
    with pytest.raises(ValueError, match="not loaded"):
        base.add_request(prompt_token_ids=[1, 2], adapter_id=1)


def test_lora_slot_management():
    eng = InferenceEngine(_cfg(lora=LoRAConfig(rank=RANK, max_adapters=3)))
    mcfg = eng.mcfg
    assert eng.load_adapter(_rand_adapter(mcfg, 1)) == 1
    assert eng.load_adapter(_rand_adapter(mcfg, 2)) == 2
    with pytest.raises(ValueError, match="out of range"):
        eng.load_adapter(_rand_adapter(mcfg, 3))
    # reload over an existing slot is allowed
    assert eng.load_adapter(_rand_adapter(mcfg, 4), slot=1) == 1
