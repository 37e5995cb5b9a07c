"""Pallas TPU kernels for the hot attention path.

`flash_adapter_attention` streams the causal text segment block-by-block
(online softmax) while folding in the video-block gate2 bias; the adapter
prefix segment is a tiny exact attention recombined outside the kernel —
mathematically identical to the reference's two-segment softmax
(reference: llama/model.py:111-126), see model/attention.py for the
decomposition argument.

Falls back to the exact einsum path when Pallas is unavailable (CPU tests).
"""
from .flash_attention import flash_adapter_attention

__all__ = ["flash_adapter_attention"]
