from .flash_attention import (NEG_INF, flash_attention,
                              flash_attention_reference, get_flash_mode,
                              set_flash_mode)
from .dilated import dense_to_sparse, dilated_attention, sparse_to_dense
from .dilated_fast import dilated_attention_fast
from .dilated_fused import fused_dilated_attention, fused_eligible
from .alibi_flash import alibi_attention_reference, alibi_flash_attention
from .gelu_ln import gelu_ln, gelu_ln_eligible, gelu_ln_ref

__all__ = [
    "gelu_ln", "gelu_ln_eligible", "gelu_ln_ref",
    "NEG_INF", "flash_attention", "flash_attention_reference",
    "get_flash_mode", "set_flash_mode",
    "dense_to_sparse", "sparse_to_dense", "dilated_attention",
    "dilated_attention_fast", "fused_dilated_attention",
    "fused_eligible", "alibi_attention_reference",
    "alibi_flash_attention",
]
