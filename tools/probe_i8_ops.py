#!/usr/bin/env python
"""Probe which int8/int16 elementwise ops Mosaic legalizes on this TPU.

MVT_UNPACK=i8 (int8-native nibble unpack) fails to lower: `arith.shli`
on vector<i8> does not legalize. If multiplies / arithmetic right shifts
legalize on i8 (or i16), a mul-based unpack (lo: (x*16)>>4, hi: x>>4)
could still process 4x lanes per VPU op vs the int32-lane default.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")

CASES = {
    "i8_mul16": lambda x: x * jnp.int8(16),
    "i8_shrai4": lambda x: jax.lax.shift_right_arithmetic(x, jnp.int8(4)),
    "i8_mul_shra": lambda x: jax.lax.shift_right_arithmetic(
        x * jnp.int8(16), jnp.int8(4)),
    "i8_and15": lambda x: jax.lax.bitwise_and(x, jnp.int8(15)),
    "i16_shli4": lambda x: jax.lax.shift_left(
        x.astype(jnp.int16), jnp.int16(4)).astype(jnp.int8),
    "i16_shra4": lambda x: jax.lax.shift_right_arithmetic(
        x.astype(jnp.int16), jnp.int16(4)).astype(jnp.int8),
}


def main():
    x = np.arange(-128, 128, dtype=np.int8).reshape(2, 128)
    x = np.tile(x, (4, 1))  # [8, 128]
    for name, fn in CASES.items():
        def kernel(x_ref, o_ref, fn=fn):
            o_ref[...] = fn(x_ref[...])
        try:
            y = pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
            )(jnp.asarray(x))
            ynp = np.asarray(y)
            ref = np.asarray(fn(jnp.asarray(x)))
            ok = np.array_equal(ynp, ref)
            print(f"{name:14s} LOWERS  correct={ok}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:100]
            print(f"{name:14s} FAILS   {msg}", flush=True)


if __name__ == "__main__":
    main()
