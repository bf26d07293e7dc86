"""HF checkpoint → param-pytree loader.

The real version of what the reference's dead-code adapter layer
(`models/adapter.py:7-53`, `models/configs/qwen.json`) was meant to do:
a declarative per-architecture name map from HF safetensors tensors to our
layer-stacked functional param tree. Works fully offline from a local
snapshot directory (zero-egress environment).
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp

from ..config import ModelConfig
from .transformer import Params

# HF name templates shared by llama/qwen2/mistral-family checkpoints.
_LAYER_MAP = {
    "attn_norm": "model.layers.{i}.input_layernorm.weight",
    "wq": "model.layers.{i}.self_attn.q_proj.weight",
    "wk": "model.layers.{i}.self_attn.k_proj.weight",
    "wv": "model.layers.{i}.self_attn.v_proj.weight",
    "wo": "model.layers.{i}.self_attn.o_proj.weight",
    "bq": "model.layers.{i}.self_attn.q_proj.bias",
    "bk": "model.layers.{i}.self_attn.k_proj.bias",
    "bv": "model.layers.{i}.self_attn.v_proj.bias",
    "q_norm": "model.layers.{i}.self_attn.q_norm.weight",   # qwen3 qk-norm
    "k_norm": "model.layers.{i}.self_attn.k_norm.weight",
    "mlp_norm": "model.layers.{i}.post_attention_layernorm.weight",
    "w_gate": "model.layers.{i}.mlp.gate_proj.weight",
    "w_up": "model.layers.{i}.mlp.up_proj.weight",
    "w_down": "model.layers.{i}.mlp.down_proj.weight",
}
_TRANSPOSED = {"wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"}

# gemma2: four norms per layer; HF's post_attention_layernorm is the
# SANDWICH norm on the attention output (llama reuses that name for the
# pre-MLP norm), and all norm weights use the (1 + w) convention, folded
# into the stored tensors at load time (see `load_params`).
_GEMMA2_NORMS = {
    "attn_norm": "model.layers.{i}.input_layernorm.weight",
    "post_attn_norm": "model.layers.{i}.post_attention_layernorm.weight",
    "mlp_norm": "model.layers.{i}.pre_feedforward_layernorm.weight",
    "post_mlp_norm": "model.layers.{i}.post_feedforward_layernorm.weight",
}
_NORM_KEYS = {"attn_norm", "mlp_norm", "post_attn_norm", "post_mlp_norm",
              "q_norm", "k_norm"}


def _open_checkpoint(path: str):
    """Yield a dict-like mapping tensor name -> jax array, lazily.

    Uses safetensors' flax framework so bf16 tensors load natively (the
    numpy framework cannot represent bfloat16).
    """
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    handles = [safe_open(f, framework="flax") for f in files]
    index: dict[str, int] = {}
    for hi, h in enumerate(handles):
        for name in h.keys():
            index[name] = hi

    class _CKPT:
        def __contains__(self, name):
            return name in index

        def __getitem__(self, name):
            return handles[index[name]].get_tensor(name)

        def keys(self):
            return index.keys()

    return _CKPT()


def load_params(path: str, cfg: ModelConfig | None = None) -> tuple[ModelConfig, Params]:
    """Load a local HF snapshot (config.json + *.safetensors) into our tree."""
    if cfg is None:
        cfg = ModelConfig.from_pretrained(path)
    dtype = cfg.jax_dtype
    ckpt = _open_checkpoint(path)

    def get(name: str) -> jnp.ndarray:
        return jnp.asarray(ckpt[name]).astype(dtype)

    # gemma stores RMSNorm weights zero-centered and applies (1 + w); fold
    # the +1 at load so runtime rmsnorm is identical across families.
    norm_offset = 1.0 if cfg.post_norms else 0.0
    layer_map = dict(_LAYER_MAP)
    if cfg.post_norms:
        layer_map.update(_GEMMA2_NORMS)

    layers: Params = {}
    for key, tmpl in layer_map.items():
        if tmpl.format(i=0) not in ckpt:
            continue  # e.g. biases absent for llama
        if cfg.mla and cfg.num_experts and key in ("w_gate", "w_up",
                                                   "w_down"):
            continue  # deepseek dense PREFIX only; stacked as *_d below
        x = jnp.stack([get(tmpl.format(i=i)) for i in range(cfg.num_layers)])
        if key in _TRANSPOSED:
            x = jnp.swapaxes(x, 1, 2)  # HF stores [out, in]; we want [in, out]
        if norm_offset and key in _NORM_KEYS:
            x = x + jnp.asarray(norm_offset, x.dtype)
        layers[key] = x

    # phi3 fused checkpoint layout: one qkv_proj ([q_dim+2*kv_dim, H]) and
    # one gate_up_proj ([2*I, H]) per layer. Split into our standard keys
    # (the runtime re-fuses QKV/gate-up itself at quantize time, in ITS
    # shard-aware interleaving — see transformer.init_params).
    if "wq" not in layers and "model.layers.0.self_attn.qkv_proj.weight" in ckpt:
        qkv = jnp.stack([get(f"model.layers.{i}.self_attn.qkv_proj.weight")
                         for i in range(cfg.num_layers)])
        qkv = jnp.swapaxes(qkv, 1, 2)  # [L, H, q+2kv]
        q, kv = cfg.q_dim, cfg.kv_dim
        layers["wq"] = qkv[:, :, :q]
        layers["wk"] = qkv[:, :, q:q + kv]
        layers["wv"] = qkv[:, :, q + kv:q + 2 * kv]
    if "w_gate" not in layers and ("model.layers.0.mlp.gate_up_proj.weight"
                                   in ckpt):
        gu = jnp.stack([get(f"model.layers.{i}.mlp.gate_up_proj.weight")
                        for i in range(cfg.num_layers)])
        gu = jnp.swapaxes(gu, 1, 2)  # [L, H, 2I]
        I = cfg.intermediate_size
        layers["w_gate"] = gu[:, :, :I]
        layers["w_up"] = gu[:, :, I:]

    if cfg.mla:
        # deepseek_v2 MLA projections (HF DeepseekV2Attention); [out, in]
        # storage transposed to our [in, out]
        def stack_t(tmpl, transpose=True, n=cfg.num_layers, base=0):
            xs = [get(tmpl.format(i=base + i)) for i in range(n)]
            xs = jnp.stack(xs)
            return jnp.swapaxes(xs, 1, 2) if transpose else xs

        pre = "model.layers.{i}.self_attn."
        layers["w_kv_a"] = stack_t(pre + "kv_a_proj_with_mqa.weight")
        layers["kv_a_norm"] = stack_t(pre + "kv_a_layernorm.weight",
                                      transpose=False)
        layers["w_kv_b"] = stack_t(pre + "kv_b_proj.weight")
        if cfg.q_lora_rank:
            layers["w_q_a"] = stack_t(pre + "q_a_proj.weight")
            layers["q_a_norm"] = stack_t(pre + "q_a_layernorm.weight",
                                         transpose=False)
            layers["w_q_b"] = stack_t(pre + "q_b_proj.weight")
        # else: the generic pass already loaded q_proj as "wq"
        k0 = cfg.first_k_dense_replace if cfg.num_experts else 0
        if k0:
            # dense prefix MLPs live under the plain mlp.* names on
            # the first k0 layers (the generic pass skips them for MLA)
            layers["w_gate_d"] = stack_t(
                "model.layers.{i}.mlp.gate_proj.weight", n=k0)
            layers["w_up_d"] = stack_t(
                "model.layers.{i}.mlp.up_proj.weight", n=k0)
            layers["w_down_d"] = stack_t(
                "model.layers.{i}.mlp.down_proj.weight", n=k0)
        if cfg.num_experts:
            L_moe = cfg.moe_layer_count
            layers["w_router"] = stack_t(
                "model.layers.{i}.mlp.gate.weight", n=L_moe, base=k0)
            if cfg.n_shared_experts:
                sh = "model.layers.{i}.mlp.shared_experts."
                layers["w_gate_sh"] = stack_t(sh + "gate_proj.weight",
                                              n=L_moe, base=k0)
                layers["w_up_sh"] = stack_t(sh + "up_proj.weight",
                                            n=L_moe, base=k0)
                layers["w_down_sh"] = stack_t(sh + "down_proj.weight",
                                              n=L_moe, base=k0)
            for key, wname in zip(("w_gate_e", "w_up_e", "w_down_e"),
                                  ("gate_proj", "up_proj", "down_proj")):
                layers[key] = jnp.stack([
                    jnp.stack([jnp.swapaxes(get(
                        f"model.layers.{k0 + i}.mlp.experts.{e}"
                        f".{wname}.weight"), 0, 1)
                        for e in range(cfg.num_experts)])
                    for i in range(L_moe)])

    if cfg.num_experts > 0 and not cfg.mla:
        # MoE: router + per-expert gate/up/down stacked [L, E, in, out]
        # (HF stores [out, in] per matrix). Name conventions: mixtral uses
        # block_sparse_moe.gate + experts.{e}.w1/w3/w2; olmoe uses
        # mlp.gate + experts.{e}.gate_proj/up_proj/down_proj.
        E = cfg.num_experts
        if f"model.layers.0.block_sparse_moe.gate.weight" in ckpt:
            blk, names = "block_sparse_moe", ("w1", "w3", "w2")
        else:
            blk, names = "mlp", ("gate_proj", "up_proj", "down_proj")
        layers["w_router"] = jnp.stack([jnp.swapaxes(get(
            f"model.layers.{i}.{blk}.gate.weight"), 0, 1)
            for i in range(cfg.num_layers)])
        for key, wname in zip(("w_gate_e", "w_up_e", "w_down_e"), names):
            layers[key] = jnp.stack([
                jnp.stack([jnp.swapaxes(get(
                    f"model.layers.{i}.{blk}.experts.{e}"
                    f".{wname}.weight"), 0, 1) for e in range(E)])
                for i in range(cfg.num_layers)])

    final_norm = get("model.norm.weight")
    if norm_offset:
        final_norm = final_norm + jnp.asarray(norm_offset, final_norm.dtype)
    params: Params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": final_norm,
        "lm_head": None,
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in ckpt:
        params["lm_head"] = jnp.swapaxes(get("lm_head.weight"), 0, 1)
    return cfg, params
