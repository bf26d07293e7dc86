from .loader import load_params
from .transformer import (
    decode_step,
    forward_logits,
    init_kv_cache,
    init_params,
    prefill_step,
)
