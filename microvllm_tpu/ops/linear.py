"""Linear projection with transparent quantized-weight dispatch."""

from __future__ import annotations

import jax.numpy as jnp

from .quant import QuantizedTensor


def linear(x: jnp.ndarray, w, bias=None) -> jnp.ndarray:
    """``x @ w (+ bias)`` where ``w`` is a plain ``[in, out]`` array or a
    :class:`QuantizedTensor`. Contraction over the last axis of ``x``."""
    if isinstance(w, QuantizedTensor):
        w = w.dequant(x.dtype)
    y = jnp.einsum("...i,io->...o", x, w)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
