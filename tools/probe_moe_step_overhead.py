"""Isolate the fused-MoE per-grid-step cost: same grid + operand structure
as fused_moe_block at deepseek b8 shapes (48 slots, merged gate|up), with
the kernel body swapped:

  full   — production _slot_part compute (unpack + dots + rescales);
  noop   — body touches only acc (operand windows still stream/elide);
  nowt   — same noop but WITHOUT the per-slot weight operands (grid and
           scalar prefetch only): pure pipeline machinery.

If noop ~= full, per-step cost is pipeline/operand machinery, not compute
— the lever is restructuring to ONE grid step with a manual-DMA slot loop,
not reducing slot compute. If nowt << noop, it's the per-operand window
bookkeeping/DMA waits.

Usage: python tools/probe_moe_step_overhead.py [deepseek|olmoe]
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

from microvllm_tpu.ops.pallas.fused_mlp import _group_dots  # noqa: E402
from microvllm_tpu.ops.pallas.unpack import unpack4  # noqa: E402
from microvllm_tpu.ops.quant import quantize  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "deepseek"
if which == "deepseek":
    L, E, K, I, gs, n_slots = 2, 64, 2048, 1408, 128, 48
else:
    L, E, K, I, gs, n_slots = 2, 64, 2048, 1024, 128, 64
M = 8
kg = jax.random.PRNGKey
gu = quantize(jax.random.normal(kg(1), (K, 2 * I), jnp.float32) * 0.05,
              4, gs)
dn = quantize(jax.random.normal(kg(2), (I, K), jnp.float32) * 0.05, 4, gs)
q_gu = jnp.broadcast_to(gu.q[None], (L * E, *gu.q.shape)).copy()
s_gu = jnp.broadcast_to(gu.scales_tiled[None],
                        (L * E, *gu.scales_tiled.shape)).copy()
q_dn = jnp.broadcast_to(dn.q[None], (L * E, *dn.q.shape)).copy()
s_dn = jnp.broadcast_to(dn.scales_tiled[None],
                        (L * E, *dn.scales_tiled.shape)).copy()
n_kg, srows = s_gu.shape[1], s_gu.shape[2]
srows_d = s_dn.shape[2]

x_q = jnp.ones((M, K), jnp.int8)
xs = jnp.full((M, K // gs), 0.01, jnp.float32)
ids = sorted(np.random.default_rng(0).integers(0, E, n_slots).tolist())
idx = jnp.asarray([e * L + 1 for e in ids], jnp.int32)


def kernel(idx_ref, x_ref, xs_ref, *refs, mode: str, nops: int):
    o_ref, acc_ref = refs[nops:]
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if mode == "full":
        qgu_ref, sgu_ref, qd_ref, sd_ref = refs[:4]
        gpt = (K // gs) // sgu_ref.shape[1]
        w = unpack4(qgu_ref[0], gs)
        xrow = lambda g: xs_ref[:, g][:, None]
        wrow = lambda g: sgu_ref[0, g // gpt, g % gpt][None, :]
        out = _group_dots(x_ref[...], w, xrow, wrow, gs)
        ga, ua = out[:, :I], out[:, I:]
        a = ga * jax.nn.sigmoid(ga) * ua
        a_s = jnp.maximum(
            jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0, 1e-10)
        a_q = jnp.clip(jnp.round(a / a_s), -127, 127).astype(jnp.int8)
        wd = unpack4(qd_ref[0], gs)
        acc_ref[...] += _group_dots(
            a_q, wd, lambda g: a_s, lambda g: sd_ref[0, 0, g][None, :], gs)
    else:
        acc_ref[...] += 1.0

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def build(mode: str):
    if mode == "nowt":
        specs, args, nops = [], [], 0
    else:
        specs = [
            pl.BlockSpec((1, K // 2, 2 * I), lambda j, ix: (ix[j], 0, 0)),
            pl.BlockSpec((1, n_kg, srows, 2 * I),
                         lambda j, ix: (ix[j], 0, 0, 0)),
            pl.BlockSpec((1, I // 2, K), lambda j, ix: (ix[j], 0, 0)),
            pl.BlockSpec((1, 1, srows_d, K), lambda j, ix: (ix[j], 0, 0, 0)),
        ]
        args = [q_gu, s_gu, q_dn, s_dn]
        nops = 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_slots,),
        in_specs=[pl.BlockSpec((M, K), lambda j, ix: (0, 0)),
                  pl.BlockSpec((M, K // gs), lambda j, ix: (0, 0))] + specs,
        out_specs=pl.BlockSpec((M, K), lambda j, ix: (0, 0)),
        scratch_shapes=[pltpu.VMEM((M, K), jnp.float32)],
    )
    return jax.jit(lambda *a: pl.pallas_call(
        functools.partial(kernel, mode=mode, nops=nops),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 << 20),
    )(*a))


for mode in ("full", "noop", "nowt"):
    f = build(mode)
    args = (idx, x_q, xs) + ((q_gu, s_gu, q_dn, s_dn)
                             if mode != "nowt" else ())
    o = f(*args)
    np.asarray(o[0, :1])
    t0 = time.monotonic()
    for _ in range(30):
        o = f(*args)
    np.asarray(o[0, :1])
    dt = (time.monotonic() - t0) / 30 * 1e3
    print(f"{which} {mode:5s}: {dt:.3f} ms ({dt * 1e3 / n_slots:.1f} "
          f"us/slot)", flush=True)


def build_nowt(n: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((M, K), lambda j, ix: (0, 0)),
                  pl.BlockSpec((M, K // gs), lambda j, ix: (0, 0))],
        out_specs=pl.BlockSpec((M, K), lambda j, ix: (0, 0)),
        scratch_shapes=[pltpu.VMEM((M, K), jnp.float32)],
    )
    return jax.jit(lambda *a: pl.pallas_call(
        functools.partial(kernel, mode="nowt", nops=0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 << 20),
    )(*a))


if len(sys.argv) > 2 and sys.argv[2] == "sweep":
    for n in (1, 6, 12, 48, 96, 192):
        f = build_nowt(n)
        pad = jnp.broadcast_to(idx[:1], (n,)) if n > n_slots else idx[:n]
        o = f(pad, x_q, xs)
        np.asarray(o[0, :1])
        t0 = time.monotonic()
        for _ in range(30):
            o = f(pad, x_q, xs)
        np.asarray(o[0, :1])
        dt = (time.monotonic() - t0) / 30 * 1e3
        print(f"nowt grid={n:4d}: {dt:.3f} ms ({dt * 1e3 / n:.1f} us/step)",
              flush=True)
