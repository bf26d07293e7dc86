"""Pallas fused RMSNorm / residual-add-RMSNorm / SwiGLU kernels.

Native equivalents of the reference's Triton kernels
(`kernel/rmsnorm_add.py:9-86`, `kernel/rmsnorm_residual.py:74-124`,
`kernel/swiglu.py:6-46`). On TPU, XLA already fuses these elementwise
patterns into adjacent matmuls, so the jnp forms in `ops/normalization.py` /
`ops/activations.py` are the default hot path; these kernels exist for
explicit control (e.g. when an op boundary blocks XLA fusion) and are
benchmarked against the jnp forms in `tools/bench_kernels.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[...] = (x * jax.lax.rsqrt(var + eps)
                  * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def rmsnorm_pallas(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6,
                   block_rows: int = 256, interpret: bool = False):
    """RMSNorm over the last axis of ``[rows, hidden]``."""
    rows, hidden = x.shape
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, hidden), lambda i: (i, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, hidden), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, weight)


def _rmsnorm_residual_kernel(x_ref, res_ref, w_ref, normed_ref, resid_ref,
                             *, eps: float):
    r = x_ref[...].astype(jnp.float32) + res_ref[...].astype(jnp.float32)
    var = jnp.mean(r * r, axis=-1, keepdims=True)
    resid_ref[...] = r.astype(resid_ref.dtype)
    normed_ref[...] = (r * jax.lax.rsqrt(var + eps)
                       * w_ref[...].astype(jnp.float32)).astype(
        normed_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def rmsnorm_residual_pallas(x: jnp.ndarray, residual: jnp.ndarray,
                            weight: jnp.ndarray, eps: float = 1e-6,
                            block_rows: int = 128, interpret: bool = False):
    """Fused add+norm with both outputs (the reference's
    `rmsnorm_residual_gemm` two-output contract)."""
    rows, hidden = x.shape
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        functools.partial(_rmsnorm_residual_kernel, eps=eps),
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, hidden), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, hidden), lambda i: (i, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, hidden), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, hidden), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ],
        interpret=interpret,
    )(x, residual, weight)


def _swiglu_kernel(gate_ref, up_ref, o_ref):
    g = gate_ref[...].astype(jnp.float32)
    o_ref[...] = (g * jax.lax.logistic(g)
                  * up_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def swiglu_pallas(gate: jnp.ndarray, up: jnp.ndarray,
                  block_rows: int = 256, interpret: bool = False):
    """silu(gate) * up (the reference's `_swiglu_kernel`)."""
    rows, inter = gate.shape
    block_rows = min(block_rows, rows)
    return pl.pallas_call(
        _swiglu_kernel,
        grid=(pl.cdiv(rows, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, inter), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, inter), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, inter), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(gate.shape, gate.dtype),
        interpret=interpret,
    )(gate, up)
