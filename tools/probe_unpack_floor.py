#!/usr/bin/env python
"""Falsifiable floor probe for the fused W4A8 MLP block (r3 VERDICT #1).

Claim under test: the ~151 us/layer fused-MLP time is a DMA floor — the
VPU int4 nibble-unpack overlaps the weight DMA and is NOT the bottleneck.

Method: three kernel variants that DMA byte-identical weight blocks
(the production packed stacks, same BlockSpecs, same grid):

  prod       unpack4 both nibbles + full-K int8 dots   (the real kernel)
  nounpack   NO unpack: treat the packed [K/2, TI] block as int8 weights
             of half contraction — zero unpack VPU ops, half the MXU dots,
             SAME HBM bytes. If this is no faster than prod, the kernel is
             DMA-bound and the floor stands. If it is much faster, the
             unpack/compute path is the bottleneck and worth attacking.
  halfdots   unpack4 (full VPU unpack cost) but dot only the low-nibble
             half — separates unpack cost from MXU dot cost when prod and
             nounpack disagree.

All variants chain layer calls with a data dependency (decode layers are
sequential) and subtract the measured dispatch floor; numerics are
irrelevant (weights random, outputs only anchored against DCE).

Run:  timeout 570 python tools/probe_unpack_floor.py [--layers 8 --iters 6]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from microvllm_tpu.ops.pallas.fused_mlp import _group_dots
from microvllm_tpu.ops.pallas.unpack import unpack4


def _probe_kernel(layer_ref, x_ref, xs_ref, qg_ref, qu_ref, sg_ref, su_ref,
                  qd_ref, sd_ref, o_ref, acc_ref, *, group_size: int,
                  K: int, TI: int, H: int, n_tiles: int, variant: str):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gs = group_size
    G_k = K // gs
    gpt = max(1, G_k // sg_ref.shape[1])
    x_q = x_ref[...]
    xs = xs_ref[...]

    def xrow(g):
        return xs[:, g][:, None]

    def wrow(ref):
        return lambda g: ref[0, (g // gpt) % ref.shape[1],
                             g % ref.shape[2]][None, :]

    if variant == "prod":
        wg, wu = unpack4(qg_ref[0], gs), unpack4(qu_ref[0], gs)
        xg = x_q
    elif variant == "nounpack":
        # same DMA'd bytes, reinterpreted as int8 of half contraction
        wg, wu = qg_ref[0], qu_ref[0]
        xg = x_q[:, : K // 2]
    else:  # halfdots: full unpack VPU cost, half the MXU dots
        wg = unpack4(qg_ref[0], gs)[: K // 2]
        wu = unpack4(qu_ref[0], gs)[: K // 2]
        xg = x_q[:, : K // 2]

    g_acc = _group_dots(xg, wg, xrow, wrow(sg_ref), gs)
    u_acc = _group_dots(xg, wu, xrow, wrow(su_ref), gs)
    a = g_acc * jax.nn.sigmoid(g_acc) * u_acc

    a_s = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0,
                      1e-10)
    a_q = jnp.clip(jnp.round(a / a_s), -127, 127).astype(jnp.int8)

    if variant == "prod":
        wd = unpack4(qd_ref[0], gs)
        ad = a_q
    elif variant == "nounpack":
        wd = qd_ref[0]
        ad = a_q[:, : TI // 2]
    else:
        wd = unpack4(qd_ref[0], gs)[: TI // 2]
        ad = a_q[:, : TI // 2]
    acc_ref[...] += _group_dots(ad, wd, lambda g: a_s,
                                lambda g: sd_ref[0, 0, g % sd_ref.shape[2]]
                                [None, :], gs)

    @pl.when(i == n_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("group_size", "tile_i", "variant"))
def probe_block(x_q, x_scales, q_gu, s_gu, q_dn, s_dn, layer, *,
                group_size: int, tile_i: int, variant: str):
    M, K = x_q.shape
    L, _, two_i = q_gu.shape
    I = two_i // 2
    H = q_dn.shape[2]
    TI = tile_i
    n_tiles = I // TI
    n_kg, srows = s_gu.shape[1], s_gu.shape[2]
    srows_d = s_dn.shape[2]
    Mp = max(8, M)
    xs_pad = jnp.zeros((Mp, 128), jnp.float32).at[:M, : K // group_size].set(
        x_scales)
    x_pad = jnp.zeros((Mp, K), jnp.int8).at[:M].set(x_q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i, lr: (0, 0)),
            pl.BlockSpec((Mp, 128), lambda i, lr: (0, 0)),
            pl.BlockSpec((1, K // 2, TI), lambda i, lr: (lr[0], 0, i)),
            pl.BlockSpec((1, K // 2, TI),
                         lambda i, lr, _n=n_tiles: (lr[0], 0, _n + i)),
            pl.BlockSpec((1, n_kg, srows, TI), lambda i, lr: (lr[0], 0, 0, i)),
            pl.BlockSpec((1, n_kg, srows, TI),
                         lambda i, lr, _n=n_tiles: (lr[0], 0, 0, _n + i)),
            pl.BlockSpec((1, TI // 2, H), lambda i, lr: (lr[0], i, 0)),
            pl.BlockSpec((1, 1, srows_d, H), lambda i, lr: (lr[0], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Mp, H), lambda i, lr: (0, 0)),
        scratch_shapes=[pltpu.VMEM((Mp, H), jnp.float32)],
    )
    kernel = functools.partial(_probe_kernel, group_size=group_size, K=K,
                               TI=TI, H=H, n_tiles=n_tiles, variant=variant)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, H), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (K * 2 * I + I * H),
            bytes_accessed=int((K * 2 * I + I * H) / 2 + M * K),
            transcendentals=M * I),
    )(jnp.atleast_1d(layer).astype(jnp.int32), x_pad, xs_pad, q_gu, q_gu,
      s_gu, s_gu, q_dn, s_dn)
    return out[:M]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    # 256 sequential calls ≈ 38 ms device time: the ~28±4 ms tunnel RTT
    # (which swamped a 28-call chain — negative per-layer residuals)
    # becomes a <15% correction instead of the whole signal
    ap.add_argument("--chain", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--M", type=int, default=8)
    args = ap.parse_args()

    # qwen2.5-7b MLP geometry (the bench model): H=3584, I=18944, gs=128,
    # TI = block_k = 512 (prod default from ops/quant.default_block_k)
    K, I, gs, TI = 3584, 18944, 128, 512
    L, M = args.layers, args.M
    H = K
    kg = jax.random.PRNGKey(0)
    ks = jax.random.split(kg, 4)
    q_gu = jax.random.randint(ks[0], (L, K // 2, 2 * I), -128, 127,
                              jnp.int8)
    q_dn = jax.random.randint(ks[1], (L, TI // 2 * (I // TI), H), -128, 127,
                              jnp.int8).reshape(L, I // 2, H)
    # scales tiled like the prod layout: [L, n_k, srows, N]
    n_kg = K // TI if K % TI == 0 else 1
    s_gu = jnp.abs(jax.random.normal(ks[2], (L, 7, TI // gs * 1, 2 * I),
                                     jnp.float32)) * 0.01 + 0.01
    s_dn = jnp.abs(jax.random.normal(ks[3], (L, I // TI, TI // gs, H),
                                     jnp.float32)) * 0.01 + 0.01
    x_q = jax.random.randint(kg, (M, K), -128, 127, jnp.int8)
    x_s = jnp.abs(jax.random.normal(kg, (M, K // gs), jnp.float32)) * 0.01

    bytes_per_layer = (K * 2 * I + I * H) / 2
    print(f"geometry: K={K} I={I} TI={TI} L={L} M={M}; "
          f"{bytes_per_layer / 1e6:.1f} MB weights/layer "
          f"(roofline @819GB/s = {bytes_per_layer / 819e9 * 1e6:.0f} us)",
          file=sys.stderr)

    def chain(variant):
        # lax.scan keeps the traced program one kernel instance long (a
        # 28-call inlined chain broke the axon remote-compile pipe); the
        # layer index rides the scalar-prefetch BlockSpecs exactly like
        # the production layer scan, and the carry creates the sequential
        # dependency a real decode layer stack has. Weights are ARGUMENTS
        # — closing over them bakes 500+ MB of constants into the HLO and
        # kills the remote-compile transport.
        @functools.partial(jax.jit, static_argnames=())
        def run(x_q, x_s, q_gu, s_gu, q_dn, s_dn):
            def body(xq, i):
                out = probe_block(xq, x_s, q_gu, s_gu, q_dn, s_dn,
                                  i % L, group_size=gs, tile_i=TI,
                                  variant=variant)
                # OPAQUE dependency (runtime-zero but not provably so):
                # `out * 0` constant-folds, decoupling iterations and
                # letting the chain overlap — measured 89 us/layer,
                # below the DMA roofline, i.e. invalid
                dep = jnp.where(out[0, 0] > 1e30, 1, 0).astype(jnp.int8)
                return x_q + dep, out[0, 0]
            _, outs = jax.lax.scan(body, x_q,
                                   jnp.arange(args.chain, dtype=jnp.int32))
            return outs[-1]
        return lambda a, b: run(a, b, q_gu, s_gu, q_dn, s_dn)

    def chain_prod_block():
        """The PRODUCTION _fused_mlp_resid_kernel in the same harness —
        its output feeds the next call's input, a naturally opaque
        sequential dependency; ties the probe to the 151 us/layer
        xplane figure."""
        from microvllm_tpu.ops.pallas.fused_mlp import fused_mlp_block
        nw = jnp.ones((K,), jnp.float32)

        @jax.jit
        def run(attn, hid, q_gu, s_gu, q_dn, s_dn):
            def body(carry, i):
                a, h = carry
                out = fused_mlp_block(a, h, nw, q_gu, s_gu, q_dn, s_dn,
                                      i % L, group_size=gs, bits=4,
                                      tile_i=TI)
                return (out, h), out[0, 0]
            _, outs = jax.lax.scan(
                body, (attn, hid), jnp.arange(args.chain, dtype=jnp.int32))
            return outs[-1]
        return lambda a, b: run(a, b, q_gu, s_gu, q_dn, s_dn)

    # dispatch floor: same chain of trivial ops
    @jax.jit
    def floor_chain(x):
        def body(c, _):
            return c + 1.0, c[0, 0]
        _, outs = jax.lax.scan(body, x, jnp.arange(args.chain))
        return outs[-1]

    xf = jnp.zeros((8, 128), jnp.float32)
    np.asarray(floor_chain(xf))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        np.asarray(floor_chain(xf))
    floor_s = (time.perf_counter() - t0) / args.iters
    print(f"dispatch floor: {floor_s * 1e3:.2f} ms/chain", file=sys.stderr)

    results = {}
    attn = jax.random.normal(kg, (M, K), jnp.bfloat16) * 0.1
    hid = jax.random.normal(ks[2], (M, K), jnp.bfloat16) * 0.1
    runs = [("prod_block", chain_prod_block(), (attn, hid))]
    runs += [(v, chain(v), (x_q, x_s))
             for v in ("prod", "nounpack", "halfdots")]
    for variant, run, inputs in runs:
        np.asarray(run(*inputs))           # compile + warm
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(run(*inputs))
            best = min(best, time.perf_counter() - t0)
        per_layer_us = (best - floor_s) / args.chain * 1e6
        results[variant] = per_layer_us
        print(f"{variant:10s}: {per_layer_us:8.1f} us/layer "
              f"(chain best {best * 1e3:.1f} ms)", file=sys.stderr)

    import json
    roof = bytes_per_layer / 819e9 * 1e6
    print(json.dumps({"probe": "unpack_floor",
                      "us_per_layer": {k: round(v, 1)
                                       for k, v in results.items()},
                      "dma_roofline_us": round(roof, 1),
                      "dma_bound": bool(
                          results["nounpack"] > 0.92 * results["prod"])}))


if __name__ == "__main__":
    main()
