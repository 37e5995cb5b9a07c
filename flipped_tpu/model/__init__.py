from .layers import (apply_rope, ffn_hidden_size, precompute_rope, rms_norm,
                     swiglu)
from .attention import adapter_gated_attention, video_block_bias
from .llama import (Attention, CrossAttentionModule, FeedForward,
                    FlippedVQAModel, Linear, RMSNorm, TransformerBlock)
from .pallas import flash_adapter_attention
from .pipeline import (PipelinedModel, pipeline_encode, stack_layer_params,
                       unstack_layer_params, validate_pp)

__all__ = [
    "apply_rope", "ffn_hidden_size", "precompute_rope", "rms_norm", "swiglu",
    "adapter_gated_attention", "video_block_bias", "Attention",
    "CrossAttentionModule", "FeedForward", "FlippedVQAModel", "Linear",
    "RMSNorm", "TransformerBlock", "flash_adapter_attention",
    "PipelinedModel", "pipeline_encode", "stack_layer_params",
    "unstack_layer_params", "validate_pp",
]
