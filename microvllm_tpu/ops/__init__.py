from .activations import swiglu, swiglu_packed
from .attention import (
    append_kv,
    chunked_prefill_attention_ref,
    dequantize_kv,
    gather_kv_pages,
    pad_head,
    padded_head_dim,
    paged_decode_append_auto,
    paged_decode_attention_ref,
    prefill_attention_ref,
    quantize_kv,
    slot_coords,
    use_pallas,
)
from .linear import linear
from .normalization import rmsnorm, rmsnorm_residual
from .quant import (
    QuantizedTensor,
    pack_int4_rows,
    quantize,
    quantize_params,
    unpack_int4_rows,
)
from .rope import apply_rope, rope_cos_sin
from .sampling import sample_tokens
