from miner_tpu.ops.poly_attention import (
    poly_attention_fused,
    poly_attention_reference,
)
from miner_tpu.ops.fastformer_attn import (
    fastformer_attention_fused,
    fastformer_attention_reference,
)
from miner_tpu.ops.lookup_score import lookup_score_fused, lookup_score_reference

__all__ = [
    "poly_attention_fused",
    "poly_attention_reference",
    "fastformer_attention_fused",
    "fastformer_attention_reference",
    "lookup_score_fused",
    "lookup_score_reference",
]
