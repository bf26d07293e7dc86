"""SwiGLU activation.

Equivalent of the reference's Triton `_swiglu_kernel` (`kernel/swiglu.py:6-46`).
On TPU, `silu(gate) * up` is pure VPU work that XLA fuses into the producing
matmul, so the jnp form is already the fast path; the fused
dequant+matmul+SwiGLU Pallas kernel for quantized weights lives in
`microvllm_tpu/ops/pallas/quant_matmul.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(gate) * up


def geglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """GeGLU (gemma family): tanh-approximated GELU on the gate."""
    return jax.nn.gelu(gate, approximate=True) * up


def glu_act(kind: str):
    """Gated-MLP activation by name: 'silu' (llama/qwen) or 'gelu_tanh'
    (gemma)."""
    return {"silu": swiglu, "gelu_tanh": geglu}[kind]


def swiglu_packed(gate_up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU on a concatenated [..., 2*d] tensor, layout [up | gate] matching
    the reference's `kernel/swiglu.py:49-60` convention."""
    d = gate_up.shape[-1] // 2
    up, gate = gate_up[..., :d], gate_up[..., d:]
    return swiglu(gate, up)
