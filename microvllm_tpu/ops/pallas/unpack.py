"""Nibble unpack for int4-packed weight tiles (shared by the quantized
kernels; layout from `ops/quant.py::pack_int4_rows`).

Two implementations, selected by ``MVT_UNPACK``:

* ``i32`` (default): widen each packed byte to int32, then shift. One VPU
  lane per BYTE — the historical path.
* ``i8``: arithmetic shifts directly on int8 vectors. Mosaic keeps int8
  vregs packed 4-per-32-bit-word ((8,128)x(4,1) tiling), so sub-word
  shifts touch 4x fewer vector words than the widened path. The int4
  unpack is the VPU floor of the W4A8 kernels (~150 us/layer on the 7B
  fused MLP, overlapping a 142 us DMA — RESULTS.md r2 probe): cutting
  its op count is the only lever left to make those kernels DMA-bound.

Both produce identical int8 nibble values (sign-extended); correctness is
locked by the interpret-mode kernel tests which run each mode.
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def _mode() -> str:
    return os.environ.get("MVT_UNPACK", "i32")


def unpack4(p: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """``[rows/2, cols]`` nibble-packed int8 -> ``[rows, cols]`` int8.

    Group-local split: each group's packed rows hold the group's first
    ``group_size/2`` rows in the low nibbles and the rest in the high
    nibbles, so the unpack concatenates along the sublane dim INSIDE the
    group reshape (no cross-group shuffles).
    """
    rows2, cols = p.shape[-2], p.shape[-1]
    rows = rows2 * 2
    half_g = group_size // 2
    if _mode() == "i8":
        x = p.reshape(rows // group_size, half_g, cols)
        lo = (x << 4) >> 4                    # int8 arithmetic shifts
        hi = x >> 4
        return jnp.concatenate([lo, hi], axis=1).reshape(rows, cols)
    x = p.astype(jnp.int32).reshape(rows // group_size, half_g, cols)
    lo = (x << 28) >> 28                      # sign-extend low nibble
    hi = x >> 4                               # arithmetic: high nibble
    return jnp.concatenate([lo, hi], axis=1).reshape(rows, cols).astype(
        jnp.int8)
