"""Rotary position embeddings, half-rotation convention.

Functional equivalent of the reference's `core/layer/rope.py:4-44` and the
precomputed cos/sin pools in `core/paged_attention.py:42-76`, done the JAX
way: cos/sin are computed on device from positions each call (cheap VPU work
that XLA fuses into the surrounding ops), so there is no host-managed pool or
dynamic extension logic.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions.

    positions: int array of any shape ``[...]``.
    Returns (cos, sin) with shape ``[..., head_dim // 2]``.
    """
    half = head_dim // 2
    freq_exponents = jnp.arange(half, dtype=jnp.float32) / half
    inv_freq = 1.0 / (theta ** freq_exponents)          # [half]
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding to ``x`` of shape ``[..., num_heads, head_dim]``.

    cos/sin have shape ``[..., head_dim // 2]`` matching x's leading dims
    (broadcast over the heads axis).
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    c = cos[..., None, :]
    s = sin[..., None, :]
    out1 = x1 * c - x2 * s
    out2 = x2 * c + x1 * s
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
