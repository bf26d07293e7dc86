"""RMSNorm ops.

Equivalent of the reference's Triton kernels in `kernel/rmsnorm_add.py` and
`kernel/rmsnorm_residual.py`. On TPU, plain jnp RMSNorm fuses into the
adjacent matmul under XLA, so the jnp forms below ARE the fast path; a Pallas
variant exists in `microvllm_tpu/ops/pallas/fused_norm.py` for cases where we
want explicit control (and to match the reference's native-kernel inventory).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMS-normalize over the last axis. Compute in fp32, emit x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rmsnorm_residual(x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray,
                     eps: float = 1e-6) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused add + RMSNorm: returns (norm(x + residual), x + residual).

    Mirrors the reference's `rmsnorm_residual_gemm` two-output contract
    (`kernel/rmsnorm_residual.py:74-124`).
    """
    new_residual = x + residual
    return rmsnorm(new_residual, weight, eps), new_residual
