"""Prove-or-close probe for the prefill a8 MXU floor (VERDICT r4 #3).

RESULTS r4 attributes prefill a8 matmuls running at ~50-60% of int8-MXU
peak to pipeline bubbles from the per-128-group f32 rescale between
short-contraction int8 dots, naming two falsifiable levers. This probe
times THREE kernels with IDENTICAL grids/blocks/DMA at the production
7B prefill shape (M=256 chunk, gate_up [3584, 37888] int4), isolating
the rescale strategy:

  v0  per-group rescale   — production semantics (_qmm_stacked_a8_kernel):
                            gpt short dots, 3 VPU f32 ops on [M, TN] each;
  v1  int32-chain         — same gpt short dots accumulated in INT32, one
                            f32 rescale per k-tile (per-column-scale
                            numerics: measures the rescale-elimination
                            ceiling with the SAME dot shapes);
  v2  whole-tile dot      — one [M, block_k] x [block_k, TN] int8 dot per
                            k-tile, one rescale (per-column numerics AND
                            long contraction: the absolute a8 ceiling).

v0 == production is sanity-checked against quant_matmul_stacked_a8's
timing. If v1/v2 >> v0, a per-column-scale prefill mode is worth its
accuracy cost (the --fidelity table says group->column coarsening is
risky for MoE/MLA); if v1 ~= v0, the floor is DMA/dot-issue, not VPU
rescale, and the 50-60% attribution is wrong -> re-derive.

Usage: python tools/probe_prefill_a8.py   (TPU; ~6 compiles, cold ~5 min)
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microvllm_tpu.ops.pallas.unpack import unpack4  # noqa: E402
from microvllm_tpu.ops.quant import quantize  # noqa: E402

M, K, N = 256, 3584, 2 * 18944          # qwen2.5-7b gate_up at chunk 256
import os as _os
GS, BITS = 128, int(_os.environ.get("MVT_PROBE_BITS", "4"))
BLOCK_K, BLOCK_N = 896, 512
INT8_TOPS = 394.1e12                     # v5e peak (bf16 197)


def _kernel(x_ref, xs_ref, q_ref, s_ref, o_ref, acc_ref, *, variant: str,
            gpt: int, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    tn = q_ref.shape[-1]
    w = unpack4(q_ref[...], GS) if BITS == 4 else q_ref[...]
    ws = s_ref[k, :gpt, :]                               # [gpt, TN] f32
    xsk = xs_ref[0]                                      # [M, 128] k-tile

    if variant == "group":                               # production
        wg = w.reshape(gpt, GS, tn)
        acc = acc_ref[...]
        for g in range(gpt):
            xg = x_ref[:, g * GS:(g + 1) * GS]
            r = jax.lax.dot_general(
                xg, wg[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + r.astype(jnp.float32) * (
                xsk[:, g][:, None] * ws[g][None, :])
        acc_ref[...] = acc
    elif variant == "i32chain":                          # lever ceiling
        wg = w.reshape(gpt, GS, tn)
        r = jnp.zeros((x_ref.shape[0], tn), jnp.int32)
        for g in range(gpt):
            xg = x_ref[:, g * GS:(g + 1) * GS]
            r = r + jax.lax.dot_general(
                xg, wg[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        acc_ref[...] += r.astype(jnp.float32) * (
            xsk[:, 0][:, None] * ws[0][None, :])
    else:                                                # whole-tile dot
        r = jax.lax.dot_general(
            x_ref[...], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[...] += r.astype(jnp.float32) * (
            xsk[:, 0][:, None] * ws[0][None, :])

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(x_q, x_s, q, s_tiled, *, variant: str):
    n_k = K // BLOCK_K
    gpt = BLOCK_K // GS
    grid = (pl.cdiv(M, 256), pl.cdiv(N, BLOCK_N), n_k)
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant, gpt=gpt, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((256, BLOCK_K), lambda m, n, k: (m, k)),
            pl.BlockSpec((1, 256, 128), lambda m, n, k: (k, 0, 0)),
            pl.BlockSpec((BLOCK_K // (2 if BITS == 4 else 1), BLOCK_N),
                         lambda m, n, k: (k, n)),
            pl.BlockSpec((n_k, 8, BLOCK_N), lambda m, n, k: (0, 0, n)),
        ],
        out_specs=pl.BlockSpec((256, BLOCK_N), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((256, BLOCK_N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )(x_q, x_s, q, s_tiled)


def main():
    kg = jax.random.PRNGKey
    w = jax.random.normal(kg(0), (K, N), jnp.float32) * 0.02
    qt = quantize(w, BITS, GS)
    n_k = K // BLOCK_K
    # scales in the probe's [n_k, 8, N] row-padded tile layout
    s_tiled = np.zeros((n_k, 8, N), np.float32)
    sc = np.asarray(qt.scales)                         # [K//GS, N]
    gpt = BLOCK_K // GS
    for kb in range(n_k):
        s_tiled[kb, :gpt] = sc[kb * gpt:(kb + 1) * gpt]
    x = jax.random.normal(kg(1), (M, K), jnp.float32)
    # per-group int8 activations (production prologue's output)
    xg = np.asarray(x).reshape(M, K // GS, GS)
    xs_flat = np.maximum(np.abs(xg).max(-1) / 127.0, 1e-10)  # [M, K//GS]
    x_q = np.clip(np.round(xg / xs_flat[..., None]), -127, 127
                  ).astype(np.int8).reshape(M, K)
    # probe-kernel layout: [n_k, M, 128] (dynamic lane indexing is not
    # lowerable; the k-tile rides the leading block dim, like production)
    gpt_m = BLOCK_K // GS
    xs = np.zeros((K // BLOCK_K, M, 128), np.float32)
    xs[:, :, :gpt_m] = xs_flat.reshape(M, K // BLOCK_K, gpt_m).transpose(
        1, 0, 2)

    flops = 2 * M * K * N
    peak_us = flops / INT8_TOPS * 1e6
    print(f"shape [{M},{K}]x[{K},{N}] int4-w int8-a; "
          f"int8 peak {peak_us:.0f} us", flush=True)

    # IN-JIT timing (scan-chained, slope between chain lengths): a
    # standalone dispatch costs ~1.45 ms fixed on this rig — more than
    # the kernels under test (CLAUDE.md gotcha / probe_moe_step_overhead)
    def timed(call, tag):
        def chain_fn(length):
            @jax.jit
            def chain(xq, xs_, q, st):
                def body(c, _):
                    o = call(c, xs_, q, st)
                    # data dependence without changing values
                    return c + (o[0, 0] * 0).astype(jnp.int8), None
                c, _ = jax.lax.scan(body, xq, None, length=length)
                return c
            return chain

        a = (jnp.asarray(x_q), jnp.asarray(xs), qt.q, jnp.asarray(s_tiled))
        ts = {}
        for length in (4, 16):
            f = chain_fn(length)
            np.asarray(f(*a)[0, :1])
            t0 = time.monotonic()
            iters = 20
            o = a[0]
            for _ in range(iters):
                o = f(o, *a[1:])
            np.asarray(o[0, :1])
            ts[length] = (time.monotonic() - t0) / iters
        us = (ts[16] - ts[4]) / 12 * 1e6
        print(f"{tag:10s}: {us:7.1f} us in-jit "
              f"({peak_us / us * 100:5.1f}% of int8 peak)", flush=True)

    for variant in ("group", "i32chain", "whole"):
        timed(functools.partial(run_variant, variant=variant), variant)

    # ground truth: the production kernel via its public API
    from microvllm_tpu.ops.pallas.quant_matmul import quant_matmul_stacked_a8
    qs = jnp.asarray(qt.scales_tiled)

    xsf = jnp.asarray(xs_flat)

    def prod(xq, xs_, q, st):
        return quant_matmul_stacked_a8(
            xq, xsf, q[None], qs[None], jnp.int32(0), group_size=GS,
            bits=BITS, block_k=BLOCK_K)
    timed(prod, "production")


if __name__ == "__main__":
    main()
