"""Weight-only int8 quantization of the frozen backbone.

Converts a bf16/f32 frozen param tree (as produced by the converter /
builder) into the structure `FlippedVQAModel(quantized=True)` expects: every
frozen Linear 'kernel' (in, out) becomes {'kernel_q': int8, 'scale': f32
(out,)} with per-output-channel absmax scaling. Norm weights and the token
embedding stay in bf16 (they are small). Trainable projections are not part
of the frozen tree and stay full precision.

This is an addition over the reference (which runs the backbone in fp16,
llama_vqa.py:63-65): int8 halves frozen-weight HBM (7B: ~12.6 → ~6.3 GB),
buying batch size and the 'qkv' remat policy on 16 GB chips.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# Frozen matmul kernels to quantize (module name whose 'kernel' qualifies).
_QUANT_MODULES = ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "output")


def quantize_kernel(kernel) -> dict:
    """(in, out) float kernel → {'kernel_q': int8, 'scale': f32 (out,)}."""
    k = np.asarray(kernel, np.float32)
    scale = np.abs(k).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale)}


def dequantize_kernel(node: dict) -> np.ndarray:
    q = np.asarray(node["kernel_q"], np.float32)
    return q * np.asarray(node["scale"], np.float32)[None, :]


def quantize_frozen(frozen: dict) -> dict:
    """Rewrite a frozen param tree in place-shape: qualifying Linear subtrees
    {'kernel': W} become {'kernel_q': ..., 'scale': ...}."""

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        if name in _QUANT_MODULES and "kernel" in node and node["kernel"] is not None:
            return quantize_kernel(node["kernel"])
        return {k: walk(v, k) for k, v in node.items()}

    return walk(frozen)


def randomize_quantized(frozen: dict, seed: int = 0) -> dict:
    """Fill zero-initialized int8 kernels with random weights (synthetic /
    benchmark runs without a real checkpoint). Frees each zero buffer as it
    is replaced so peak HBM stays ~1× the tree (13B fits on one chip)."""
    rs = np.random.RandomState(seed)

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "kernel_q" in node:
            q = node["kernel_q"]
            fan_in = q.shape[0]
            new = {
                "kernel_q": jnp.asarray(
                    rs.randint(-127, 128, q.shape).astype(np.int8)),
                "scale": jnp.full(q.shape[1:],
                                  1.0 / (127.0 * np.sqrt(fan_in)),
                                  jnp.float32),
            }
            for old in (q, node.get("scale")):
                if hasattr(old, "delete"):
                    try:
                        old.delete()
                    except Exception:
                        pass
            return new
        return {k: walk(v) for k, v in node.items()}

    return walk(frozen)
