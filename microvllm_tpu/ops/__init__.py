from .activations import swiglu, swiglu_packed
from .attention import (
    append_kv,
    chunked_prefill_attention_ref,
    paged_decode_attention_ref,
    prefill_attention_ref,
    slot_coords,
)
from .linear import linear
from .normalization import rmsnorm, rmsnorm_residual
from .quant import QuantizedTensor, quantize, quantize_params
from .rope import apply_rope, rope_cos_sin
from .sampling import sample_tokens
