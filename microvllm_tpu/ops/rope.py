"""Rotary position embeddings, half-rotation convention.

Functional equivalent of the reference's `core/layer/rope.py:4-44` and the
precomputed cos/sin pools in `core/paged_attention.py:42-76`, done the JAX
way: cos/sin are computed on device from positions each call (cheap VPU work
that XLA fuses into the surrounding ops), so there is no host-managed pool or
dynamic extension logic.
"""

from __future__ import annotations

import jax.numpy as jnp


def _llama3_scaled(inv_freq: jnp.ndarray, factor: float, low_f: float,
                   high_f: float, orig_ctx: float) -> jnp.ndarray:
    """Llama-3.1 frequency scaling (HF ``_compute_llama3_parameters``):
    long wavelengths (low frequencies) divide by ``factor``, short ones
    stay, and the band in between interpolates smoothly."""
    import math

    wavelen = 2.0 * math.pi / inv_freq
    low_wl = orig_ctx / low_f
    high_wl = orig_ctx / high_f
    scaled = inv_freq / factor
    smooth = (orig_ctx / wavelen - low_f) / (high_f - low_f)
    mid = (1.0 - smooth) * scaled + smooth * inv_freq
    return jnp.where(wavelen > low_wl, scaled,
                     jnp.where(wavelen < high_wl, inv_freq, mid))


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32,
                 scaling: tuple | None = None
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions.

    positions: int array of any shape ``[...]``.
    scaling: optional ``("llama3", factor, low_freq_factor,
    high_freq_factor, original_max_position_embeddings)`` — the
    llama-3.1 long-context frequency remap.
    Returns (cos, sin) with shape ``[..., head_dim // 2]``.
    """
    half = head_dim // 2
    freq_exponents = jnp.arange(half, dtype=jnp.float32) / half
    inv_freq = 1.0 / (theta ** freq_exponents)          # [half]
    if scaling is not None:
        kind, *args = scaling
        if kind != "llama3":
            raise ValueError(f"unsupported rope scaling {kind!r}")
        inv_freq = _llama3_scaled(inv_freq, *map(float, args))
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


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray,
                           sin: jnp.ndarray) -> jnp.ndarray:
    """Rotary embedding in the INTERLEAVED-pair convention: adjacent
    elements (2i, 2i+1) form the complex pair rotated by angle i — HF
    deepseek_v2's ``apply_rotary_emb`` (torch.view_as_complex on
    ``[..., d/2, 2]``), unlike the llama half-split used by apply_rope.

    x: ``[..., num_heads, head_dim]``; cos/sin: ``[..., head_dim // 2]``
    (same tables as apply_rope — only the pairing differs).
    """
    xe = x[..., 0::2]
    xo = x[..., 1::2]
    c = cos[..., None, :]
    s = sin[..., None, :]
    oe = xe * c - xo * s
    oo = xe * s + xo * c
    return jnp.stack([oe, oo], axis=-1).reshape(x.shape).astype(x.dtype)
