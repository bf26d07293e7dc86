"""IN-JIT fused-MoE microbench — the corrected methodology.

r5 discovery (tools/probe_moe_step_overhead.py sweep): a standalone
jitted pallas_call on this rig costs ~1.45 ms PER DISPATCH regardless of
grid length — an empty 1-step kernel and an empty 192-step kernel time
identically. Every per-slot number from standalone-call probes (r4's
elision probe, r5's multi-slot/dup probes) was that fixed dispatch floor
divided by the slot count; their conclusions about per-step compute were
CONFOUNDED.

This probe times `lax.scan`-chained kernel launches INSIDE one jitted
program (data-dependent carry, weights closed over — exactly how the
decode step invokes the block per layer), subtracting nothing: per-launch
time = slope over 32 chained launches. Variants:

  real    — realistic sorted b8 routing (dups present)
  unique  — 48/64 distinct experts (dedup never fires)
  dup     — one expert for every slot (dedup always fires after slot 0)
  noop    — MVT-free empty-body floor measured via a 1-slot launch

Usage: python tools/probe_moe_injit.py [deepseek|olmoe] [iters]
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microvllm_tpu.ops.pallas.fused_moe import fused_moe_block  # noqa: E402
from microvllm_tpu.ops.quant import quantize  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "deepseek"
N_CHAIN = 32
if which == "deepseek":
    L, E, K, I, gs, n_slots = 2, 64, 2048, 1408, 128, 48   # b8 x top-6
else:
    L, E, K, I, gs, n_slots = 2, 64, 2048, 1024, 128, 64   # b8 x top-8
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
TI = dn.block_k
hid = jax.random.normal(kg(4), (M, K), jnp.bfloat16)
nw = jnp.ones((K,), jnp.float32)

rng = np.random.default_rng(0)
CASES = {
    "real": sorted(rng.integers(0, E, n_slots).tolist()),
    "unique": sorted(rng.choice(E, size=min(n_slots, E),
                                replace=False).tolist()),
    "dup": [7] * n_slots,
}


def timed(ids, label, S=1):
    ns = len(ids)
    pad = (-ns) % S
    ids = list(ids) + [ids[-1]] * pad
    idx = jnp.asarray([e * L + 1 for e in ids], jnp.int32)
    wts = jnp.concatenate([jnp.full((M, ns), 0.02, jnp.float32),
                           jnp.zeros((M, pad), jnp.float32)], axis=1)

    def chain_fn(length):
        @jax.jit
        def chain(a, qg, sg, qd, sd):
            # weight stacks as ARGUMENTS: closing over them would bake
            # 370 MB of constants into the HLO (remote compile HTTP 413)
            def body(c, _):
                return fused_moe_block(
                    c, hid, nw, idx, wts, qg, sg, qd, sd,
                    group_size=gs, bits=4, tile_i=TI, eps=1e-6,
                    out_dtype=jnp.bfloat16, slots_per_step=S), None
            c, _ = jax.lax.scan(body, a, None, length=length)
            return c
        return chain

    a0 = jax.random.normal(kg(3), (M, K), jnp.bfloat16)
    times = {}
    for length in (8, N_CHAIN):
        chain = chain_fn(length)
        np.asarray(chain(a0, q_gu, s_gu, q_dn, s_dn)[0, :1])   # compile
        t0 = time.monotonic()
        iters = 20
        o = a0
        for _ in range(iters):
            o = chain(o, q_gu, s_gu, q_dn, s_dn)
        np.asarray(o[0, :1])
        times[length] = (time.monotonic() - t0) / iters
    # slope removes the per-dispatch overhead the r5 sweep exposed
    per_launch = (times[N_CHAIN] - times[8]) / (N_CHAIN - 8) * 1e6
    print(f"{which} {label:7s} S={S}: {per_launch:7.1f} us/launch in-jit "
          f"({per_launch / ns:.2f} us/slot, {ns} slots)", flush=True)


if len(sys.argv) > 2 and sys.argv[2] == "ssweep":
    for S in (1, 2, 4, 8):
        timed(CASES["real"], "real", S=S)
else:
    for label, ids in CASES.items():
        timed(ids, label)
