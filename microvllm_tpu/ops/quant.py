"""Weight-only quantization: symmetric group-wise INT8 / INT4.

New first-class capability vs the reference (which is bf16-only). Scales are
per (contraction-group, output-column); dequantization is expressed so XLA
fuses the int→bf16 convert + scale multiply into the consuming matmul's
operand read (on-the-fly dequant at HBM-roofline bandwidth). A fully fused
Pallas dequant-matmul lives in `microvllm_tpu/ops/pallas/quant_matmul.py`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

def pack_int4_rows(q: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Pack int4 values (stored in int8, range [-8, 7]) two-per-byte along
    the contraction dim, nibble-split WITHIN each scale group.

    Group g's byte row r holds w[g*gs + r] in the low nibble and
    w[g*gs + gs/2 + r] in the high nibble (r < gs/2), so a kernel tile
    unpacks with two shifts + a sublane-adjacent concat — no row shuffle.
    """
    in_dim, out_dim = q.shape
    gs = group_size
    assert gs % 2 == 0 and in_dim % gs == 0
    g = q.reshape(in_dim // gs, 2, gs // 2, out_dim)   # [G, lo/hi, gs/2, N]
    lo = g[:, 0].astype(jnp.int8) & 0x0F
    hi = (g[:, 1].astype(jnp.int8) & 0x0F) << 4
    return (lo | hi).reshape(in_dim // 2, out_dim).astype(jnp.int8)


def unpack_int4_rows(packed: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Inverse of :func:`pack_int4_rows` (sign-extended int8 output)."""
    half, out_dim = packed.shape
    gs = group_size
    p = packed.reshape(half * 2 // gs, gs // 2, out_dim)
    lo = (p << 4).astype(jnp.int8) >> 4                 # arithmetic: sign ext
    hi = p >> 4                                         # arithmetic on int8
    w = jnp.concatenate([lo, hi], axis=1)               # [G, gs, N]
    return w.reshape(half * 2, out_dim)


def tile_scales_for_kernel(scales: jnp.ndarray, group_size: int,
                           block_k: int) -> jnp.ndarray:
    """Retile ``[G, N]`` scales to the kernel's per-k-tile layout
    ``[n_k, srows, N]`` (srows = groups-per-tile padded to a multiple of 8,
    so each tile's scale block is sublane-legal). Precomputed at quantize
    time so the matmul never touches the [G, N] layout on the hot path."""
    G, N = scales.shape
    K = G * group_size
    n_k = K // block_k
    gpt = block_k // group_size
    srows = -(-gpt // 8) * 8
    out = jnp.zeros((n_k, srows, N), scales.dtype)
    return out.at[:, :gpt].set(scales.reshape(n_k, gpt, N))


def default_block_k(K: int, group_size: int, tp: int = 1) -> int:
    """Largest contraction tile <= 1024 that divides K (and the per-rank
    K/tp shard, so the tiled-scale layout shards evenly under row-parallel
    TP) while holding whole groups. Bigger k-tiles mean fewer grid steps —
    per-step overhead is the floor for decode-sized m (e.g. K=3584 gets
    896 -> 4 steps instead of 512 -> 7)."""
    local_k = K // tp if tp > 1 and K % tp == 0 else K

    def best_under(cap: int) -> int:
        for mult in range(min(cap // group_size, local_k // group_size),
                          0, -1):
            if local_k % (mult * group_size) == 0:
                return mult * group_size
        return group_size

    best = best_under(1024)
    if best < 512:
        # Divisibility forced a pathologically thin tile: deepseek-v2's
        # expert I=1408 = 11 x 128 only admits 128 under the 1024 cap,
        # which runs the fused-MoE kernel at 11x more grid steps with
        # 128-wide MXU chains (measured ~134 GB/s effective vs the dense
        # kernel's ~670). Allow up to 2048 when that recovers a >=512
        # tile — the [block_k, n_tile] VMEM weight blocks stay ~2 MB.
        wide = best_under(2048)
        if wide >= 512:
            best = wide
    return best


def mlp_pad_cols(I: int) -> int:
    """Extra intermediate columns (per gate/up half) so a 1024-wide
    contraction tile divides the padded I (env ``MVT_MLP_PAD_I=1``).

    The fused-MLP kernel's tile_i is pinned to w_down's block_k; 7B's
    I=18944 only admits 512 (148 groups = 4x37), so the kernel runs 37
    grid steps per launch. Zero-padding to 19456 (+2.7% HBM) admits 1024
    -> 19 steps: trades bytes for per-step overhead. Exact: silu(0)*up=0
    through zero down-rows.
    """
    import os

    v = os.environ.get("MVT_MLP_PAD_I", "0")
    if v in ("0", ""):
        return 0
    target = 1024 if v == "1" else int(v)   # pad-to-multiple-of tile width
    return (target - I % target) % target


def pad_gate_up_stack(gu: jnp.ndarray, I: int, pad: int) -> jnp.ndarray:
    """``[L, K, 2I]`` fused gate|up -> ``[L, K, 2(I+pad)]`` with zero
    columns appended to EACH half (the kernel indexes up at block I/TI)."""
    if pad == 0:
        return gu
    L, K, _ = gu.shape
    z = jnp.zeros((L, K, pad), gu.dtype)
    return jnp.concatenate([gu[..., :I], z, gu[..., I:], z], axis=-1)


def interleave_columns(ws: list, tp: int) -> jnp.ndarray:
    """Rank-major fused column concat for tensor parallelism.

    Output column order is ``[rank0's slice of each w | rank1's | ...]`` so
    a contiguous column shard over ``tp`` ranks hands rank r exactly
    ``(w0_r | w1_r | ...)`` — a per-rank fused weight with the same local
    layout as the single-rank fusion. This is what lets the fused-QKV /
    fused-gate|up a8 kernels run unchanged inside shard_map: the kernels
    and the model's local-dim slicing never see the global interleaving.
    Group-wise quantization is per-column, so quantize(interleave) ==
    interleave(quantize): bit-identical to quantizing each piece alone.
    """
    if tp == 1:
        return jnp.concatenate(ws, axis=-1)
    parts = []
    for r in range(tp):
        for w in ws:
            n = w.shape[-1]
            assert n % tp == 0, (n, tp)
            parts.append(w[..., r * (n // tp):(r + 1) * (n // tp)])
    return jnp.concatenate(parts, axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedTensor:
    """Group-wise symmetric quantized 2D weight ``[in_dim, out_dim]``.

    bits=8: ``q`` is ``[in_dim, out_dim]`` int8.
    bits=4: ``q`` is ``[in_dim // 2, out_dim]`` int8, nibble-packed per
    group (see :func:`pack_int4_rows`) — half the HBM traffic of int8.

    ``scales_tiled`` is the kernel-layout copy of ``scales`` (see
    :func:`tile_scales_for_kernel`); ``block_k`` records the tiling it was
    built for. Leaves may carry a leading layer-stack dim (the model stacks
    layers for `lax.scan`); the Pallas kernels then index the layer inside
    their BlockSpecs — no per-layer weight slicing/copying.
    """

    q: jnp.ndarray
    scales: jnp.ndarray     # [in_dim // group_size, out_dim] float32
    bits: int
    group_size: int
    scales_tiled: jnp.ndarray | None = None
    block_k: int = 0

    def tree_flatten(self):
        return ((self.q, self.scales, self.scales_tiled),
                (self.bits, self.group_size, self.block_k))

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scales, scales_tiled = children
        bits, group_size, block_k = aux
        return cls(q=q, scales=scales, bits=bits, group_size=group_size,
                   scales_tiled=scales_tiled, block_k=block_k)

    @property
    def stacked(self) -> bool:
        return self.q.ndim == 3

    @property
    def in_dim(self) -> int:
        return self.q.shape[-2] * (2 if self.bits == 4 else 1)

    @property
    def out_dim(self) -> int:
        return self.q.shape[-1]

    @property
    def shape(self):
        return (self.in_dim, self.out_dim)

    def unpacked(self) -> jnp.ndarray:
        if self.bits == 4:
            if self.stacked:
                return jax.vmap(
                    lambda p: unpack_int4_rows(p, self.group_size))(self.q)
            return unpack_int4_rows(self.q, self.group_size)
        return self.q

    def dequant(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        in_dim, out_dim = self.in_dim, self.out_dim
        g = self.group_size
        # compute in the requested dtype so XLA can fuse the convert+scale
        # into the consuming matmul's operand read (an fp32 intermediate
        # would force a full-weight materialization)
        lead = self.q.shape[:-2]
        w = self.unpacked().astype(dtype).reshape(
            *lead, in_dim // g, g, out_dim)
        w = w * self.scales[..., :, None, :].astype(dtype)
        return w.reshape(*lead, in_dim, out_dim)


def quantize(w: jnp.ndarray, bits: int, group_size: int = 128,
             tp: int = 1) -> QuantizedTensor:
    """Quantize a ``[in_dim, out_dim]`` weight symmetrically per group/column."""
    assert bits in (4, 8), bits
    in_dim, out_dim = w.shape
    if in_dim % group_size != 0:
        # shrink group size to a divisor (keeps tiny test models working)
        while in_dim % group_size != 0:
            group_size //= 2
    qmax = (1 << (bits - 1)) - 1  # 127 or 7
    wf = w.astype(jnp.float32).reshape(in_dim // group_size, group_size, out_dim)
    absmax = jnp.max(jnp.abs(wf), axis=1)                       # [G, out]
    scales = jnp.maximum(absmax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wf / scales[:, None, :]), -qmax - 1, qmax)
    q = q.reshape(in_dim, out_dim).astype(jnp.int8)
    if bits == 4:
        q = pack_int4_rows(q, group_size)
    block_k = default_block_k(in_dim, group_size, tp)
    return QuantizedTensor(
        q=q, scales=scales, bits=bits, group_size=group_size,
        scales_tiled=tile_scales_for_kernel(scales, group_size, block_k),
        block_k=block_k)


def quantize_params(params, bits: int, group_size: int = 128, tp: int = 1,
                    fuse: bool | None = None):
    """Quantize every 2D projection weight in a model param tree.

    Embedding, norms, and biases stay in their original dtype; only matmul
    weights (ndim==2, both dims >= group threshold, excluding the embedding)
    are quantized.
    """

    # Row-parallel weights (contraction dim sharded under TP) need a
    # block_k that divides the per-rank K shard; column-parallel weights
    # keep the full-K-optimal tile (their contraction dim is replicated).
    _ROW_PARALLEL = {"wo", "w_down"}

    def _quant_layer_stack(w, w_tp):
        # layer-stacked weights are [L, in, out]; lax.map processes one layer
        # at a time so the fp32 intermediate stays per-layer sized (vmap
        # would materialize the whole stack in fp32 — OOM at 7B scale).
        return jax.lax.map(lambda x: quantize(x, bits, group_size, w_tp), w)

    out = dict(params)
    layers = dict(params["layers"])

    # Fuse QKV / gate|up column-wise (fewer kernel launches; per-column
    # group quantization makes this bit-identical to quantizing
    # separately). Under TP the concat is rank-interleaved
    # (`interleave_columns`) so each rank's contiguous column shard is its
    # own fused (q_r|k_r|v_r) / (gate_r|up_r) block — the fused a8 kernels
    # run unchanged inside shard_map.
    fuse = True if fuse is None else fuse

    def _tp_ok(*names):
        return all(layers[n].shape[-1] % tp == 0 for n in names)

    if fuse and all(isinstance(layers.get(n), jnp.ndarray)
                    for n in ("wq", "wk", "wv")) and _tp_ok("wq", "wk", "wv"):
        layers["wqkv"] = interleave_columns(
            [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], tp)
        if "bq" in layers:
            layers["bqkv"] = interleave_columns(
                [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")], tp)
    if fuse and all(isinstance(layers.get(n), jnp.ndarray)
                    for n in ("w_gate", "w_up")) and _tp_ok("w_gate", "w_up"):
        inter = layers["w_gate"].shape[-1]
        layers["w_gate_up"] = interleave_columns(
            [layers.pop("w_gate"), layers.pop("w_up")], tp)
        if tp == 1:
            pad_i = mlp_pad_cols(inter)
            if pad_i:
                layers["w_gate_up"] = pad_gate_up_stack(
                    layers["w_gate_up"], inter, pad_i)
                dn = layers.pop("w_down")
                layers["w_down"] = jnp.concatenate(
                    [dn, jnp.zeros((dn.shape[0], pad_i, dn.shape[2]),
                                   dn.dtype)], axis=1)

    if (isinstance(layers.get("w_gate_e"), jnp.ndarray)
            and isinstance(layers.get("w_up_e"), jnp.ndarray)
            and (tp == 1 or layers["w_gate_e"].shape[1] % tp == 0)):
        # MoE expert stacks [L, E, H, I] -> quantized EXPERT-MAJOR
        # [E*L, ...] (flat index e*L + l) for the gather/sweep kernels
        # (models/moe.py::moe_mlp_quant). gate|up fuse column-wise per
        # expert (bit-identical, like the dense w_gate_up); the concat
        # happens per expert inside lax.map so the fp transient stays one
        # expert large. Expert-major means expert parallelism (E % tp == 0,
        # `config.moe_uses_ep`) is a plain first-axis shard — each rank
        # holds E/tp whole quantized experts. Contraction dims (H, I) are
        # never sharded under EP, so block_k stays the full-K tp=1 choice.
        ge, ue = layers.pop("w_gate_e"), layers.pop("w_up_e")
        Lx, Ex, Hx, Ix = ge.shape
        pair = (jnp.swapaxes(ge, 0, 1).reshape(Ex * Lx, Hx, Ix),
                jnp.swapaxes(ue, 0, 1).reshape(Ex * Lx, Hx, Ix))
        layers["w_gate_up_e"] = jax.lax.map(
            lambda t: quantize(jnp.concatenate(t, axis=-1), bits,
                               group_size, 1), pair)
        del ge, ue, pair
        dn = jnp.swapaxes(layers.pop("w_down_e"), 0, 1).reshape(
            Ex * Lx, Ix, Hx)
        layers["w_down_e"] = _quant_layer_stack(dn, 1)
        del dn

    # deepseek_v2 per-layer stacks: MLA projections (w_kv_b is consumed
    # reshaped by the absorbed einsums — stays bf16) and shared experts.
    # Skipped when the contraction dim is not a group multiple (e.g. the
    # dense-prefix MLP's intermediate 10944).
    _ROW_PARALLEL = _ROW_PARALLEL | {"w_down_sh"}
    _COL_GUARDED = {"w_q_b", "w_gate_sh", "w_up_sh"}   # new names only
    for name in ("wqkv", "w_gate_up", "wq", "wk", "wv", "wo", "w_gate",
                 "w_up", "w_down", "w_q_a", "w_q_b", "w_kv_a",
                 "w_gate_sh", "w_up_sh", "w_down_sh"):
        v = layers.get(name)
        if not isinstance(v, jnp.ndarray) or v.shape[-2] % group_size:
            continue
        if name in _ROW_PARALLEL and (v.shape[-2] // group_size) % tp:
            continue   # scale-group axis would not shard evenly under TP
        if name in _COL_GUARDED and v.shape[-1] % tp:
            continue
        layers[name] = _quant_layer_stack(
            v, tp if name in _ROW_PARALLEL else 1)
    out["layers"] = layers
    if isinstance(out.get("lm_head"), jnp.ndarray) and out["lm_head"] is not None:
        out["lm_head"] = quantize(out["lm_head"], bits, group_size)
    elif out.get("lm_head") is None and isinstance(out.get("embed"),
                                                   jnp.ndarray):
        # tied embeddings: quantize a transposed copy for the lm_head so
        # big-vocab tied models (gemma2's 256k, qwen's 152k at 0.5B) ride
        # the a8 wide-N kernel instead of a bf16 [H, V] matmul — faster,
        # and it removes the transposed-embed transient that OOMed
        # gemma2-9b's first prefill (embed itself stays bf16 for the
        # token-id gather).
        out["lm_head"] = quantize(
            jnp.swapaxes(out["embed"], 0, 1), bits, group_size)
    return out
