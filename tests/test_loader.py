"""Checkpoint loader: synthetic HF snapshot -> param tree round trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from microvllm_tpu.config import ModelConfig
from microvllm_tpu.models import transformer as T
from microvllm_tpu.models.loader import load_params


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    """Write a tiny qwen2-style HF snapshot (config.json + safetensors)."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("snap")
    cfg = dict(
        model_type="qwen2", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
        rms_norm_eps=1e-6, max_position_embeddings=256,
        tie_word_embeddings=True, attention_bias=True)
    json.dump(cfg, open(d / "config.json", "w"))

    rng = np.random.default_rng(0)
    t = {}
    t["model.embed_tokens.weight"] = rng.normal(size=(128, 32)).astype(np.float32)
    t["model.norm.weight"] = np.ones(32, np.float32)
    for i in range(2):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(32, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(32, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = rng.normal(size=(32, 32)).astype(np.float32)
        t[f"{p}.self_attn.k_proj.weight"] = rng.normal(size=(16, 32)).astype(np.float32)
        t[f"{p}.self_attn.v_proj.weight"] = rng.normal(size=(16, 32)).astype(np.float32)
        t[f"{p}.self_attn.o_proj.weight"] = rng.normal(size=(32, 32)).astype(np.float32)
        t[f"{p}.self_attn.q_proj.bias"] = rng.normal(size=(32,)).astype(np.float32)
        t[f"{p}.self_attn.k_proj.bias"] = rng.normal(size=(16,)).astype(np.float32)
        t[f"{p}.self_attn.v_proj.bias"] = rng.normal(size=(16,)).astype(np.float32)
        t[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(64, 32)).astype(np.float32)
        t[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(64, 32)).astype(np.float32)
        t[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(32, 64)).astype(np.float32)
    save_file(t, str(d / "model.safetensors"))
    return str(d), t


def test_config_from_hf(snapshot):
    path, _ = snapshot
    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "qwen2"
    assert cfg.num_layers == 2
    assert cfg.num_kv_heads == 2
    assert cfg.head_dim == 8
    assert cfg.qkv_bias
    assert cfg.tie_word_embeddings


def test_load_params_shapes_and_values(snapshot):
    path, raw = snapshot
    cfg, params = load_params(path)
    assert params["embed"].shape == (128, 32)
    assert params["layers"]["wq"].shape == (2, 32, 32)   # [L, in, out]
    assert params["layers"]["bq"].shape == (2, 32)
    assert params["lm_head"] is None                      # tied
    # transposition check: our [in, out] == HF [out, in].T
    np.testing.assert_allclose(
        np.asarray(params["layers"]["wq"][0].astype(jnp.float32)),
        raw["model.layers.0.self_attn.q_proj.weight"].T, rtol=1e-2)


def test_loaded_model_runs(snapshot):
    path, _ = snapshot
    cfg, params = load_params(path)
    tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
    logits = T.forward_logits(cfg, params, tokens)
    assert logits.shape == (1, 4, 128)
    assert bool(jnp.isfinite(logits).all())
