"""Typed configuration for the TPU-native inference engine.

Replaces the reference's hardcoded constants (`config/config.py:3-4`,
`core/engine.py:42-43`, `core/scheduler.py:12-29` in the reference repo) with
one declarative, serializable config layer.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Model config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for a llama/qwen2-family decoder."""

    vocab_size: int = 151936
    hidden_size: int = 896
    intermediate_size: int = 4864
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    rope_theta: float = 1000000.0
    # RoPE frequency scaling: None or ("llama3", factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings) — the llama-3.1
    # long-context remap (`ops/rope.py::_llama3_scaled`).
    rope_scaling: Optional[tuple] = None
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 32768
    qkv_bias: bool = True  # qwen2 uses bias on q/k/v projections
    tie_word_embeddings: bool = True
    dtype: str = "bfloat16"
    model_type: str = "qwen2"
    # Sliding-window attention (mistral family): each position attends to
    # at most the last `sliding_window` tokens. None = full attention.
    sliding_window: Optional[int] = None
    # Mixture-of-Experts (mixtral family): 0 = dense MLP; > 0 = routed
    # SwiGLU experts with top-`num_experts_per_tok` selection per token.
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # QK-norm: RMSNorm the query/key projections before RoPE.
    # kind "head" (qwen3): each head separately over head_dim (per-layer
    # weights of shape [head_dim]); kind "full" (olmoe): the whole flat
    # projection at once (weights of shape [q_dim] / [kv_dim]).
    qk_norm: bool = False
    qk_norm_kind: str = "head"
    # Renormalize the selected top-k routing weights to sum to 1 (HF
    # `norm_topk_prob`): mixtral does, olmoe does not.
    moe_renorm: bool = True
    # --- gemma2 family -----------------------------------------------------
    # Attention-logit soft-capping: s = cap * tanh(s / cap) before softmax,
    # applied in the jnp oracles AND inside the Pallas kernels.
    attn_logit_softcap: Optional[float] = None
    # Final-logit soft-capping on the lm_head output.
    final_logit_softcap: Optional[float] = None
    # Attention scale = query_pre_attn_scalar**-0.5 when set (gemma2 uses
    # head_dim for 9b but hidden/heads for 27b), else head_dim**-0.5.
    query_pre_attn_scalar: Optional[float] = None
    # Gated-MLP activation: "silu" (llama/qwen) or "gelu_tanh" (gemma).
    hidden_act: str = "silu"
    # Sandwich norms (gemma2): RMSNorm on the attention/MLP OUTPUT before
    # the residual add, in addition to the usual pre-norms (params carry
    # post_attn_norm / post_mlp_norm). Norm weights for gemma are stored
    # OFFSET-FOLDED: the loader adds the +1 of gemma's (1 + w) convention
    # at load time, so runtime rmsnorm is identical across families.
    post_norms: bool = False
    # Scale token embeddings by sqrt(hidden_size) (gemma).
    embed_scale: bool = False
    # Heterogeneous attention layout: per-position-in-period sliding flags.
    # () = homogeneous (sliding everywhere iff sliding_window is set).
    # gemma2: (True, False) — even layers sliding, odd layers global. The
    # layer scan runs over num_layers/len(pattern) groups with the period
    # unrolled so each sub-layer keeps a STATIC window for the kernels.
    sliding_pattern: tuple = ()
    # --- deepseek_v2 family: Multi-head Latent Attention (MLA) + MoE with
    # shared experts and a dense layer prefix ----------------------------
    # MLA compresses KV into a per-token LATENT: c = norm(W_dkv x)
    # [kv_lora_rank] plus one shared RoPE key k_pe [qk_rope_head_dim]. At
    # decode the up-projection W_uk is ABSORBED into the query (q_abs =
    # q_nope @ W_uk), turning attention into MQA over the cached
    # [c | k_pe] latent — the paged cache stores kv_lora_rank +
    # qk_rope_head_dim dims per token per layer instead of
    # 2*heads*head_dim (DeepSeek-V2-Lite: 576 vs 5120 floats, 8.9x).
    # head_dim above holds qk_nope + qk_rope (the q/k head width).
    kv_lora_rank: int = 0                 # > 0 enables MLA
    q_lora_rank: Optional[int] = None     # None = direct q projection
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0                   # per-head value width (128)
    # MoE shape: n_shared_experts dense "shared expert" MLPs of width
    # n_shared * intermediate_size added to every routed output;
    # the first first_k_dense_replace layers use a plain dense MLP of
    # width dense_intermediate_size (unrolled before the MoE layer scan).
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    dense_intermediate_size: int = 0
    routed_scaling_factor: float = 1.0
    # top-k selection: "greedy" (plain top-k, v2-lite) or
    # "group_limited_greedy" (v2: keep the topk_group groups with the
    # highest max-score, top-k within them; n_group groups of E/n_group)
    moe_topk_method: str = "greedy"
    moe_n_group: int = 0
    moe_topk_group: int = 0

    @property
    def mla(self) -> bool:
        return self.kv_lora_rank > 0

    @property
    def qk_nope_head_dim(self) -> int:
        return self.head_dim - self.qk_rope_head_dim

    @property
    def kv_cache_head_dim(self) -> int:
        """Per-token per-layer cached width: the MLA latent [c | k_pe], or
        the plain head_dim."""
        return (self.kv_lora_rank + self.qk_rope_head_dim if self.mla
                else self.head_dim)

    @property
    def o_in_dim(self) -> int:
        """o_proj input width (MLA: heads * v_head_dim, not q_dim)."""
        return (self.num_heads * self.v_head_dim if self.mla
                else self.q_dim)

    @property
    def moe_layer_count(self) -> int:
        """Layers with a routed MoE MLP (all, minus the dense prefix)."""
        return (self.num_layers - self.first_k_dense_replace
                if self.num_experts else 0)

    @property
    def plain_moe(self) -> bool:
        """MoE without deepseek extras — eligible for the one-launch
        fused MoE block (which bakes in plain greedy top-k routing and
        no shared-expert term)."""
        return bool(self.num_experts) and not (
            self.n_shared_experts or self.first_k_dense_replace
            or self.routed_scaling_factor != 1.0
            or self.moe_topk_method != "greedy")

    @property
    def attn_scale(self) -> float:
        base = self.query_pre_attn_scalar or self.head_dim
        return float(base) ** -0.5

    @property
    def layer_period(self) -> int:
        return max(1, len(self.sliding_pattern))

    def layer_window(self, j: int) -> Optional[int]:
        """Sliding window of sub-layer ``j`` within the period."""
        if self.sliding_window is None:
            return None
        if not self.sliding_pattern:
            return self.sliding_window
        return self.sliding_window if self.sliding_pattern[j] else None

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def jax_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_config(cls, cfg: dict[str, Any]) -> "ModelConfig":
        """Build from a HuggingFace ``config.json`` dict (qwen2/llama/mistral).

        Plays the role of the reference's ``models/adapter.py`` +
        ``models/configs/qwen.json`` mapping layer, but is actually used by
        the live path (the reference's adapter is dead code, see SURVEY.md §2).
        """
        model_type = cfg.get("model_type", "llama")
        hidden = cfg["hidden_size"]
        heads = cfg["num_attention_heads"]
        head_dim = cfg.get("head_dim") or hidden // heads
        if model_type == "deepseek_v2":
            return cls._from_deepseek_v2(cfg)
        # mistral uses sliding_window unconditionally when set; qwen2 ships
        # the field but gates it behind use_sliding_window (default False)
        window = cfg.get("sliding_window")
        if (model_type in ("qwen2", "qwen3", "qwen3_moe")
                and not cfg.get("use_sliding_window", False)):
            window = None
        gemma2 = model_type == "gemma2"
        if model_type == "qwen3_moe" and (
                cfg.get("mlp_only_layers")
                or cfg.get("decoder_sparse_step", 1) != 1):
            raise NotImplementedError(
                "qwen3_moe with dense layers mixed in (mlp_only_layers / "
                "decoder_sparse_step) is not supported: the layer scan "
                "assumes a homogeneous MoE stack")
        act = cfg.get("hidden_activation") or cfg.get("hidden_act", "silu")
        return cls(
            qk_norm=model_type in ("qwen3", "qwen3_moe", "olmoe"),
            qk_norm_kind="full" if model_type == "olmoe" else "head",
            moe_renorm=cfg.get("norm_topk_prob", model_type == "mixtral"),
            attn_logit_softcap=cfg.get("attn_logit_softcapping")
            if gemma2 else None,
            final_logit_softcap=cfg.get("final_logit_softcapping")
            if gemma2 else None,
            query_pre_attn_scalar=cfg.get("query_pre_attn_scalar"),
            hidden_act="gelu_tanh" if act in (
                "gelu_pytorch_tanh", "gelu_tanh") else "silu",
            post_norms=gemma2,
            embed_scale=gemma2,
            # gemma2 alternates sliding (even) / global (odd) layers
            sliding_pattern=(True, False) if gemma2 else (),
            sliding_window=window,
            # mixtral names the field num_local_experts; olmoe num_experts
            num_experts=(cfg.get("num_local_experts")
                         or cfg.get("num_experts", 0) or 0),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            vocab_size=cfg["vocab_size"],
            hidden_size=hidden,
            # qwen3_moe has BOTH a dense intermediate_size (only used on
            # mlp_only_layers, which we require empty) and the expert width
            # moe_intermediate_size; mixtral/olmoe reuse intermediate_size
            # as the per-expert width
            intermediate_size=(cfg["moe_intermediate_size"]
                               if model_type == "qwen3_moe"
                               else cfg["intermediate_size"]),
            num_layers=cfg["num_hidden_layers"],
            num_heads=heads,
            num_kv_heads=cfg.get("num_key_value_heads", heads),
            head_dim=head_dim,
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=_parse_rope_scaling(cfg.get("rope_scaling")),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            qkv_bias=(model_type == "qwen2" and cfg.get("attention_bias", True))
            or cfg.get("attention_bias", False),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            model_type=model_type,
        )

    @classmethod
    def _from_deepseek_v2(cls, cfg: dict[str, Any]) -> "ModelConfig":
        """DeepSeek-V2 family (HF `DeepseekV2ForCausalLM`): MLA attention
        + softmax-scored MoE with shared experts and a dense-layer prefix.
        Anchored against HF in tests/test_hf_differential.py."""
        rs = cfg.get("rope_scaling")
        if rs:
            raise NotImplementedError(
                "deepseek_v2 rope_scaling (yarn) is not supported yet; "
                "use a config without rope_scaling")
        if cfg.get("topk_method") not in (None, "greedy",
                                          "group_limited_greedy"):
            raise NotImplementedError(
                f"deepseek_v2 topk_method {cfg['topk_method']!r}")
        n_routed = cfg.get("n_routed_experts") or 0
        moe = (n_routed or 0) > 0 and cfg.get("num_experts_per_tok")
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=1,   # MQA over the cached [c | k_pe] latent
            # q/k head width; HF's config.head_dim (= qk_rope_head_dim)
            # is NOT the attention head width for MLA
            head_dim=cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"],
            kv_lora_rank=cfg["kv_lora_rank"],
            q_lora_rank=cfg.get("q_lora_rank"),
            qk_rope_head_dim=cfg["qk_rope_head_dim"],
            v_head_dim=cfg["v_head_dim"],
            intermediate_size=(cfg["moe_intermediate_size"] if moe
                               else cfg["intermediate_size"]),
            dense_intermediate_size=cfg["intermediate_size"],
            num_experts=n_routed if moe else 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok") or 2,
            n_shared_experts=cfg.get("n_shared_experts") or 0,
            first_k_dense_replace=cfg.get("first_k_dense_replace", 0),
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
            moe_renorm=cfg.get("norm_topk_prob", False),
            moe_topk_method=cfg.get("topk_method") or "greedy",
            moe_n_group=cfg.get("n_group") or 0,
            moe_topk_group=cfg.get("topk_group") or 0,
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            max_position_embeddings=cfg.get("max_position_embeddings",
                                            4096),
            qkv_bias=cfg.get("attention_bias", False),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            model_type="deepseek_v2",
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "ModelConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))

    @classmethod
    def tiny(cls, **overrides) -> "ModelConfig":
        """A tiny CPU-testable config (same family, toy sizes)."""
        base = dict(
            vocab_size=512,
            hidden_size=128,
            intermediate_size=256,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=32,
            rope_theta=10000.0,
            max_position_embeddings=1024,
            qkv_bias=True,
            tie_word_embeddings=True,
            dtype="float32",
        )
        base.update(overrides)
        return cls(**base)


# Well-known architectures, so benches/tests can build models without
# downloading anything (zero-egress environment).
PRESETS: dict[str, ModelConfig] = {
    "qwen2.5-0.5b": ModelConfig(
        vocab_size=151936, hidden_size=896, intermediate_size=4864,
        num_layers=24, num_heads=14, num_kv_heads=2, head_dim=64,
        rope_theta=1000000.0, tie_word_embeddings=True, qkv_bias=True,
        model_type="qwen2"),
    "qwen2.5-1.5b": ModelConfig(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
        rope_theta=1000000.0, tie_word_embeddings=True, qkv_bias=True,
        model_type="qwen2"),
    "qwen2.5-7b": ModelConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_layers=28, num_heads=28, num_kv_heads=4, head_dim=128,
        rope_theta=1000000.0, tie_word_embeddings=False, qkv_bias=True,
        model_type="qwen2"),
    "llama-3.2-1b": ModelConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_layers=16, num_heads=32, num_kv_heads=8, head_dim=64,
        rope_theta=500000.0, tie_word_embeddings=True, qkv_bias=False,
        rms_norm_eps=1e-5, model_type="llama"),
    "llama-3-8b": ModelConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-5, model_type="llama"),
    "llama-3.1-8b": ModelConfig(   # llama3 rope scaling: 128k context
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-5, model_type="llama",
        max_position_embeddings=131072,
        rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192.0)),
    "llama-3-70b": ModelConfig(
        vocab_size=128256, hidden_size=8192, intermediate_size=28672,
        num_layers=80, num_heads=64, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-5, model_type="llama"),
    "mistral-7b": ModelConfig(     # v0.1: sliding-window attention (4096)
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=10000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-5, model_type="mistral", sliding_window=4096),
    "qwen3-0.6b": ModelConfig(     # qk-norm family, tied embeddings
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_layers=28, num_heads=16, num_kv_heads=8, head_dim=128,
        rope_theta=1000000.0, tie_word_embeddings=True, qkv_bias=False,
        rms_norm_eps=1e-6, model_type="qwen3", qk_norm=True),
    "qwen3-8b": ModelConfig(       # qk-norm family (RMSNorm on q/k heads)
        vocab_size=151936, hidden_size=4096, intermediate_size=12288,
        num_layers=36, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=1000000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-6, model_type="qwen3", qk_norm=True),
    "gemma2-2b": ModelConfig(      # sandwich norms, softcaps, alt. SWA
        vocab_size=256000, hidden_size=2304, intermediate_size=9216,
        num_layers=26, num_heads=8, num_kv_heads=4, head_dim=256,
        rope_theta=10000.0, tie_word_embeddings=True, qkv_bias=False,
        rms_norm_eps=1e-6, model_type="gemma2", hidden_act="gelu_tanh",
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        query_pre_attn_scalar=256, post_norms=True, embed_scale=True,
        sliding_window=4096, sliding_pattern=(True, False)),
    "gemma2-9b": ModelConfig(
        vocab_size=256000, hidden_size=3584, intermediate_size=14336,
        num_layers=42, num_heads=16, num_kv_heads=8, head_dim=256,
        rope_theta=10000.0, tie_word_embeddings=True, qkv_bias=False,
        rms_norm_eps=1e-6, model_type="gemma2", hidden_act="gelu_tanh",
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        query_pre_attn_scalar=256, post_norms=True, embed_scale=True,
        sliding_window=4096, sliding_pattern=(True, False)),
    "mixtral-8x7b": ModelConfig(   # Mixture-of-Experts (8 experts, top-2)
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=1000000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-5, model_type="mixtral",
        num_experts=8, num_experts_per_tok=2),
    "deepseek-v2-lite": ModelConfig(   # MLA: 27-layer 16B total / 2.4B
        vocab_size=102400,             # active; KV latent 576/token/layer
        hidden_size=2048,              # vs 5120 for its MHA layout (8.9x)
        intermediate_size=1408,        # moe expert width
        dense_intermediate_size=10944,
        num_layers=27, num_heads=16, num_kv_heads=1,
        head_dim=192,                  # qk_nope 128 + qk_rope 64
        kv_lora_rank=512, q_lora_rank=None, qk_rope_head_dim=64,
        v_head_dim=128,
        num_experts=64, num_experts_per_tok=6, n_shared_experts=2,
        first_k_dense_replace=1, routed_scaling_factor=1.0,
        moe_renorm=False, rope_theta=10000.0, tie_word_embeddings=False,
        qkv_bias=False, rms_norm_eps=1e-6, max_position_embeddings=4096,
        model_type="deepseek_v2"),
    "olmoe-1b-7b": ModelConfig(    # chip-sized MoE: 64 experts, top-8,
        vocab_size=50304,          # 6.9B total / 1.3B active params
        hidden_size=2048, intermediate_size=1024,
        num_layers=16, num_heads=16, num_kv_heads=16, head_dim=128,
        rope_theta=10000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-5, max_position_embeddings=4096,
        model_type="olmoe", num_experts=64, num_experts_per_tok=8,
        qk_norm=True, qk_norm_kind="full", moe_renorm=False),
    "qwen3-30b-a3b": ModelConfig(  # qk-norm MoE: 128 experts, top-8
        vocab_size=151936, hidden_size=2048, intermediate_size=768,
        num_layers=48, num_heads=32, num_kv_heads=4, head_dim=128,
        rope_theta=1000000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-6, model_type="qwen3_moe", qk_norm=True,
        num_experts=128, num_experts_per_tok=8, moe_renorm=True),
    "phi3-mini": ModelConfig(      # fused qkv/gate_up checkpoints, SWA 2047
        vocab_size=32064, hidden_size=3072, intermediate_size=8192,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=96,
        rope_theta=10000.0, tie_word_embeddings=False, qkv_bias=False,
        rms_norm_eps=1e-5, max_position_embeddings=4096,
        model_type="phi3", sliding_window=2047),
}


# ---------------------------------------------------------------------------
# Quantization config
# ---------------------------------------------------------------------------


def _parse_rope_scaling(rs) -> Optional[tuple]:
    """HF ``rope_scaling`` dict -> our frozen tuple (llama-3.1 only; the
    default/null and unsupported kinds raise rather than silently
    mis-position long contexts)."""
    if not rs:
        return None
    kind = rs.get("rope_type") or rs.get("type")
    if kind in (None, "default"):
        return None
    if kind != "llama3":
        raise ValueError(f"unsupported rope_scaling type {kind!r}")
    return ("llama3", float(rs["factor"]), float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            float(rs["original_max_position_embeddings"]))


@dataclass(frozen=True)
class QuantConfig:
    """Weight-only + KV-cache quantization settings."""

    weight_bits: int = 16         # 16 (off), 8, or 4
    weight_group_size: int = 128  # contraction-dim group for scales
    kv_bits: int = 16             # 16 (off) or 8

    @property
    def quantize_weights(self) -> bool:
        return self.weight_bits in (4, 8)

    @property
    def quantize_kv(self) -> bool:
        return self.kv_bits == 8


# ---------------------------------------------------------------------------
# LoRA config (multi-adapter serving)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LoRAConfig:
    """Multi-LoRA serving: up to ``max_adapters`` low-rank adapters live on
    device as ``[L, N, K, r]`` stacks; each request selects one by id and
    the batched delta is gathered inside the jitted step (new capability —
    the reference serves exactly one set of weights). Adapter slot 0 is
    all-zero (the base model). Targets: the fused qkv and o projections.
    """

    rank: int = 16
    max_adapters: int = 8         # including slot 0 (= base)
    alpha: float = 16.0           # delta scaling = alpha / rank

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


# ---------------------------------------------------------------------------
# Parallelism config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParallelConfig:
    """Mesh layout. TP shards heads/intermediate over the ``model`` axis
    (the reference's Megatron-style split, `model_graph.py:97-116`), DP
    replicates over ``data``, and SP shards the KV cache's PAGE axis over
    ``seq`` (sequence/context parallelism: each rank owns the pages
    ``{g : g % sp == rank}``, attends its local shard with flash partials,
    and one psum combines — KV capacity scales sp-fold; SURVEY.md §5's
    long-context mandate, no reference counterpart)."""

    tp_size: int = 1
    dp_size: int = 1
    sp_size: int = 1

    @property
    def world_size(self) -> int:
        return self.tp_size * self.dp_size * self.sp_size


# ---------------------------------------------------------------------------
# Engine / cache / scheduler config
# ---------------------------------------------------------------------------


def _default_decode_buckets() -> tuple[int, ...]:
    return (1, 2, 4, 8, 16, 32, 64)


def _default_prefill_buckets() -> tuple[int, ...]:
    return (64, 128, 256, 512, 1024, 2048)


@dataclass(frozen=True)
class CacheConfig:
    """Paged KV cache geometry.

    Device layout per layer is ``[num_pages, kv_heads, page_size, head_dim]``
    so the trailing two dims are TPU-tile aligned. Page 0 is a reserved trash
    page that absorbs writes from padding slots (instead of the reference's
    sequence-duplication + dedupe-mask scheme, `scheduler.py:87-94`).
    """

    num_pages: int = 256          # total pages, including trash page 0
    page_size: int = 64           # tokens per page (multiple of 16)
    max_pages_per_seq: int = 32   # static width of block tables
    prefix_cache: bool = False    # content-addressed reuse of full KV pages
                                  # across requests (vLLM-style automatic
                                  # prefix caching; absent in the reference)
    reserved_pages: int = 1       # leading trash pages never allocated.
                                  # 1 normally; sp under sequence-parallel KV
                                  # (pages 0..sp-1 are each rank's local
                                  # trash slot 0 — see ops/attention.py
                                  # sp_owner_coords)

    @property
    def max_context(self) -> int:
        return self.page_size * self.max_pages_per_seq

    @property
    def num_usable_pages(self) -> int:
        return self.num_pages - self.reserved_pages


def moe_uses_ep(model: ModelConfig, tp_size: int) -> bool:
    """Whether a sharded MoE model runs EXPERT-parallel (whole experts per
    rank; requires num_experts % tp == 0) rather than sharding each
    expert's intermediate dim. Both the model code (models/moe.py call
    sites) and the param sharding specs (parallel/sharding.py) key off
    this single predicate so they cannot disagree."""
    return (model.num_experts > 0 and tp_size > 1
            and model.num_experts % tp_size == 0)


def auto_page_size(max_context: int) -> int:
    """Default KV page size keyed on the target context length.

    128-token pages halve the number of per-chunk DMA issues in the decode
    attention kernel; measured +9% single-stream at 3800-token context on
    v5e (RESULTS.md long-context table). Short/medium contexts keep 64:
    page granularity is also the allocation granularity, and 128-token
    pages waste up to 127 slots per short sequence.
    """
    return 128 if max_context >= 3072 else 64


@dataclass(frozen=True)
class SchedulerConfig:
    """Continuous-batching knobs (reference: `core/scheduler.py:11-29`)."""

    max_batch_size: int = 64
    max_prefill_tokens: int = 4096
    prefill_wait_s: float = 0.004     # batch-forming timeout
    decode_buckets: tuple[int, ...] = field(default_factory=_default_decode_buckets)
    prefill_len_buckets: tuple[int, ...] = field(default_factory=_default_prefill_buckets)
    prefill_batch_buckets: tuple[int, ...] = (1, 2, 4, 8)
    # Multi-step decode: how many tokens to generate per jitted span with
    # on-device token feedback (amortizes host round-trips; streaming
    # callbacks then fire in bursts of the chosen span). The scheduler picks
    # the largest bucket all batch members have page capacity for; (1,) gives
    # per-token latency.
    decode_spans: tuple[int, ...] = (1, 2, 4, 8, 16)
    # Adaptive span for interactive streams: when set and the decode batch
    # contains a streaming (SSE) consumer, the span is capped at this value
    # while the load is light (running sequences <= stream_span_uncap_at) —
    # tokens reach the client in bursts of at most `stream_span_cap` instead
    # of max(decode_spans). Under heavier load the cap lifts and large spans
    # amortize the host round-trip across the whole batch.
    stream_span_cap: Optional[int] = None
    stream_span_uncap_at: int = 8
    # Chunked-prefill fairness: at most this many consecutive prefill steps
    # before a decode step is interposed when sequences are RUNNING. Bounds
    # the inter-token gap running streams see while a long prompt is being
    # chunk-prefilled (the reference interleaves naturally per step because
    # it has no chunking, `core/scheduler.py:67-94`; vLLM bounds this with
    # mixed prefill/decode batches). 0 = never interleave (r2 behavior).
    prefill_interleave: int = 2


@dataclass(frozen=True)
class EngineConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    quant: QuantConfig = field(default_factory=QuantConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    lora: Optional[LoRAConfig] = None   # multi-LoRA serving (None = off)
    max_model_len: int = 2048            # clamp on prompt+generation length
    default_max_new_tokens: int = 512
    seed: int = 0
    # Speculative decoding (greedy-only n-gram lookup; see
    # models/speculative.py). spec_k = draft tokens verified per forward
    # (0 = off); spec_steps = propose/verify rounds per device dispatch;
    # spec_ngram = match length for the history lookup.
    spec_k: int = 0
    spec_steps: int = 4
    spec_ngram: int = 2
    # Adaptive speculation: n-gram drafting only pays above ~70% draft
    # acceptance (measured, RESULTS.md spec table — at low acceptance the
    # verify pass wastes a k+1-token prefill per round and lockstep breaks
    # into ramp-down stragglers). When enabled, the engine tracks a
    # trailing acceptance EMA and DISENGAGES speculation (plain decode
    # spans) once the EMA falls below spec_accept_floor, re-probing with
    # one speculative span every spec_reprobe_spans plain spans so a
    # traffic shift back to repetitive text re-engages it. vLLM disengages
    # its speculative path dynamically too; the reference has none.
    spec_adaptive: bool = True
    spec_accept_floor: float = 0.7
    spec_reprobe_spans: int = 16
    spec_min_rounds: int = 8     # EMA samples required before disengaging
    # Rejection-sampling verification for temperature>0 rows: the n-gram
    # draft is a point mass, so exact speculative sampling = accept draft
    # x with prob p(x), else sample the renormalized residual p\{x} — the
    # emitted stream is distributed identically to plain decode
    # (models/speculative.py). False = sampled batches fall back to plain
    # spans (the pre-r4 behavior). Per-request SEEDED rows always fall
    # back (the spec path consumes a different random stream).
    spec_sampled: bool = True
    # Per-token logprobs (0 = off). When > 0 the decode/prefill steps emit
    # each token's log-probability + the top-k alternatives (raw-logit
    # log-softmax) as extra device outputs — a separate compiled variant,
    # warmed with the rest, so enabling it is an engine-build choice rather
    # than a mid-serving cold compile. Requests opt in per-call via
    # SamplingParams.logprobs <= logprobs_k.
    logprobs_k: int = 0
    # Sampling penalties (presence/frequency/repetition). When True the
    # decode/prefill steps carry on-device (counts, seen) state built from
    # each sequence's token history and apply OpenAI/HF penalties to the
    # logits before sampling (`ops/sampling.py::apply_penalties`) — one
    # compiled variant for the whole engine, warmed with the rest.
    # Requests that set penalties on an engine built without this raise.
    enable_penalties: bool = False
    # Penalty history window: 0 = penalize over the FULL prompt+output
    # history (OpenAI semantics; the span upload is [B, max_model_len]).
    # > 0 = only the last N tokens count (llama.cpp repeat_last_n-style),
    # bounding the per-span host->device upload to [B, N] — set this on
    # long-context configs (at 128k the full-history upload is 4 MB/span
    # at b8; with a 2k window it is 64 KB).
    penalty_window: int = 0

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)

    def validate(self) -> None:
        m, c = self.model, self.cache
        if not 0 <= self.logprobs_k <= 32:
            raise ValueError("logprobs_k must be in [0, 32]")
        if m.mla and self.parallel.tp_size > 1:
            if m.num_heads % self.parallel.tp_size:
                raise ValueError(
                    "MLA requires num_heads divisible by tp_size")
            if (self.quant.quantize_weights
                    and m.num_experts % self.parallel.tp_size):
                raise NotImplementedError(
                    "quantized deepseek_v2 under TP needs expert "
                    "parallelism (num_experts % tp == 0)")
        if m.mla and self.lora is not None:
            raise NotImplementedError(
                "LoRA adapters on MLA (deepseek_v2) models are not "
                "supported yet")
        if c.page_size % 16 != 0:
            raise ValueError(f"page_size {c.page_size} must be a multiple of 16")
        if self.max_model_len > c.max_context:
            raise ValueError(
                f"max_model_len {self.max_model_len} exceeds cache capacity "
                f"{c.max_context} (= page_size * max_pages_per_seq)")
        if m.num_heads % m.num_kv_heads != 0:
            raise ValueError("num_heads must be divisible by num_kv_heads")
        if m.num_layers % m.layer_period != 0:
            raise ValueError(
                f"num_layers {m.num_layers} not divisible by the "
                f"sliding_pattern period {m.layer_period}")
        tp = self.parallel.tp_size
        if tp > 1:
            if m.num_kv_heads % tp != 0 and tp % m.num_kv_heads != 0:
                raise ValueError(
                    f"tp_size {tp} incompatible with {m.num_kv_heads} kv heads")
            if m.num_heads % tp != 0:
                raise ValueError(
                    f"num_heads {m.num_heads} not divisible by tp_size {tp}")
        if self.lora is not None:
            if self.lora.rank < 1 or self.lora.max_adapters < 2:
                raise ValueError("LoRA needs rank >= 1, max_adapters >= 2")
        if self.enable_penalties and (tp > 1 or self.parallel.dp_size > 1):
            raise ValueError(
                "enable_penalties is single-rank only for now (the sharded "
                "step fns do not thread the penalty state)")
        sp = self.parallel.sp_size
        if sp > 1:
            if c.num_pages % sp:
                raise ValueError(
                    f"num_pages {c.num_pages} must be divisible by "
                    f"sp_size {sp} (the page axis shards over 'seq')")
            if c.reserved_pages != sp:
                raise ValueError(
                    "sequence-parallel KV needs cache.reserved_pages == "
                    f"sp_size (got {c.reserved_pages} != {sp}): global "
                    "pages 0..sp-1 are the per-rank trash slots — "
                    "InferenceEngine sets this automatically")
            if m.sliding_window is not None:
                raise NotImplementedError(
                    "sliding-window attention under sequence-parallel KV "
                    "is unsupported (window masking needs global slot "
                    "order; the per-rank shards are compacted)")
            if self.spec_k:
                raise NotImplementedError(
                    "speculative decoding under sequence-parallel KV is "
                    "unsupported (spec verify windows use slot-exact "
                    "stores the sp scatter path does not implement)")
            if self.enable_penalties:
                raise ValueError("enable_penalties is single-rank only")
        elif c.reserved_pages != 1:
            raise ValueError("reserved_pages != 1 requires sp_size > 1")


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; the largest bucket if none fits."""
    for b in buckets:
        if n <= b:
            return b
    return max(buckets)
