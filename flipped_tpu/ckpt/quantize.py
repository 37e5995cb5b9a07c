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


def quantize_kernel(kernel, group: int = 0) -> dict:
    """(in, out) float kernel → {'kernel_q': int8, 'scale': f32}.

    group=0: per-output-channel absmax scales, scale (out,).
    group>0: GROUPED (sub-channel) scales over `group`-sized input slices,
    scale (in/group, out) — outlier-robust: an amplified input row degrades
    only its own group's resolution (used by --quantize int8g|w8a8g; see
    scripts/int8_parity_study.py --weights outlier for the evidence)."""
    k = np.asarray(kernel, np.float32)
    if group > 0 and k.shape[0] % group == 0:
        g_count = k.shape[0] // group
        kg = k.reshape(g_count, group, k.shape[1])
        scale = np.abs(kg).max(axis=1) / 127.0          # (G, out)
        scale = np.maximum(scale, 1e-8)
        q = np.clip(np.round(kg / scale[:, None, :]), -127,
                    127).astype(np.int8).reshape(k.shape)
        return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale)}
    scale = np.abs(k).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale)}


def dequantize_kernel(node: dict) -> np.ndarray:
    q = np.asarray(node["kernel_q"], np.float32)
    s = np.asarray(node["scale"], np.float32)
    if s.ndim == 2:                                     # grouped (G, out)
        group = q.shape[0] // s.shape[0]
        return (q.reshape(s.shape[0], group, q.shape[1])
                * s[:, None, :]).reshape(q.shape)
    return q * s[None, :]


def quantize_frozen(frozen: dict, group: int = 0) -> dict:
    """Rewrite a frozen param tree in place-shape: qualifying Linear subtrees
    {'kernel': W} become {'kernel_q': ..., 'scale': ...}."""

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        if name in _QUANT_MODULES and "kernel" in node and node["kernel"] is not None:
            return quantize_kernel(node["kernel"], group)
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
                # scale keeps the tree's own shape: (out,) per-channel or
                # (G, out) grouped
                "scale": jnp.full(np.shape(node.get("scale", q[0])),
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
