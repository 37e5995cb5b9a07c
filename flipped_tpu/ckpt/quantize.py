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


def outlier_count(k_dim: int) -> int:
    """Number of bf16-passthrough input rows for --quantize int8o|w8a8o.

    8 per 1024 input dims (~0.8%) with a floor of 8 — above LLM.int8()'s
    observed 0.1–0.5% emergent-outlier fraction, and small enough that the
    dense correction matmul is noise next to the int8 backbone matmul.
    Fixed per k_dim (not data-dependent) so every layer's leaves keep static
    shapes and stack/scan cleanly."""
    return max(8, (k_dim // 1024) * 8)


def quantize_kernel(kernel, group: int = 0, outliers: int = 0,
                    bits: int = 8) -> dict:
    """(in, out) float kernel → {'kernel_q': int8, 'scale': f32}.

    group=0: per-output-channel absmax scales, scale (out,).
    group>0: GROUPED (sub-channel) scales over `group`-sized input slices,
    scale (in/group, out) — outlier-robust: an amplified input row degrades
    only its own group's resolution (used by --quantize int8g|w8a8g; see
    scripts/int8_parity_study.py --weights outlier for the evidence).
    outliers>0: additionally extract the `outliers` largest-absmax input
    ROWS into a dense bf16 passthrough ({'out_idx': (n,) i32 sorted,
    'out_w': (n, out) bf16}, LLM.int8()-style mixed decomposition) and
    quantize the remainder with those rows zeroed — their magnitude no
    longer pollutes any absmax window (--quantize int8o|w8a8o).
    bits=4: PACKED 4-bit weights with mandatory grouped scales and
    symmetric ±7 levels → {'kernel_q4': int8 (in, out/2) split-half packed,
    'scale': f32 (in/group, out)} — see model/int4.py. Falls back to a
    single group when `group` doesn't divide the input dim (tiny configs);
    incompatible with the outlier-row passthrough (use the rotation modes
    int4r|w4a8r for outlier robustness at 4 bits)."""
    if bits == 4:
        if outliers:
            raise ValueError("int4 + outlier passthrough is unsupported — "
                             "use --quantize int4r|w4a8r instead")
        group = group or 128  # grouped scales are mandatory at 4 bits —
        # mirror Linear's default so quantize_kernel(bits=4) with the
        # group-0 default can never produce a whole-K absmax window at 7B
        k = np.asarray(kernel, np.float32)
        k_dim, n = k.shape
        g = group if k_dim % group == 0 else k_dim
        kg = k.reshape(k_dim // g, g, n)
        scale = np.maximum(np.abs(kg).max(axis=1) / 7.0, 1e-8)  # (G, out)
        q = np.clip(np.round(kg / scale[:, None, :]), -7,
                    7).astype(np.int8).reshape(k_dim, n)
        from ..model.int4 import pack_int4
        return {"kernel_q4": jnp.asarray(pack_int4(q)),
                "scale": jnp.asarray(scale)}
    k = np.asarray(kernel, np.float32)
    extra = {}
    if outliers > 0:
        row_amax = np.abs(k).max(axis=1)
        idx = np.sort(np.argpartition(row_amax, -outliers)[-outliers:])
        extra = {"out_idx": jnp.asarray(idx.astype(np.int32)),
                 "out_w": jnp.asarray(k[idx].astype(jnp.bfloat16))}
        k = k.copy()
        k[idx] = 0.0
    if group > 0 and k.shape[0] % group == 0:
        g_count = k.shape[0] // group
        kg = k.reshape(g_count, group, k.shape[1])
        scale = np.abs(kg).max(axis=1) / 127.0          # (G, out)
        scale = np.maximum(scale, 1e-8)
        q = np.clip(np.round(kg / scale[:, None, :]), -127,
                    127).astype(np.int8).reshape(k.shape)
        return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale),
                **extra}
    scale = np.abs(k).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale), **extra}


def dequantize_kernel(node: dict) -> np.ndarray:
    s = np.asarray(node["scale"], np.float32)
    if "kernel_q4" in node:
        from ..model.int4 import unpack_int4_np
        q = unpack_int4_np(np.asarray(node["kernel_q4"])).astype(np.float32)
        group = q.shape[0] // s.shape[0]
        return (q.reshape(s.shape[0], group, q.shape[1])
                * s[:, None, :]).reshape(q.shape)
    q = np.asarray(node["kernel_q"], np.float32)
    if s.ndim == 2:                                     # grouped (G, out)
        group = q.shape[0] // s.shape[0]
        w = (q.reshape(s.shape[0], group, q.shape[1])
             * s[:, None, :]).reshape(q.shape)
    else:
        w = q * s[None, :]
    if "out_w" in node:  # passthrough rows were zeroed before quantization
        w[np.asarray(node["out_idx"])] = np.asarray(node["out_w"], np.float32)
    return w


def quantize_frozen(frozen: dict, group: int = 0,
                    outlier_rows: bool = False, bits: int = 8) -> dict:
    """Rewrite a frozen param tree in place-shape: qualifying Linear subtrees
    {'kernel': W} become {'kernel_q': ..., 'scale': ...} (plus
    'out_idx'/'out_w' when outlier_rows). bits=4 packs 4-bit weights
    ('kernel_q4', model/int4.py) — EXCEPT the LM head ('output'), which
    stays int8: its logits feed the eval argmin (engine.py:87-93) directly
    and it is only 0.13 GB at 7B."""

    def walk(node, name=""):
        if not isinstance(node, dict):
            return node
        if name in _QUANT_MODULES and "kernel" in node and node["kernel"] is not None:
            n_out = outlier_count(np.shape(node["kernel"])[0]) if outlier_rows else 0
            leaf_bits = 8 if name == "output" else bits
            # bits=4 forces grouped scales everywhere (incl. the int8 head,
            # matching the model's quant_group=128 under int4 modes)
            leaf_group = (group or 128) if bits == 4 else group
            return quantize_kernel(node["kernel"], leaf_group, n_out,
                                   leaf_bits)
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
        if "kernel_q4" in node:
            q4 = node["kernel_q4"]
            fan_in = q4.shape[0]
            from ..model.int4 import pack_int4
            vals = rs.randint(-7, 8, (fan_in, q4.shape[1] * 2)).astype(np.int8)
            new = {
                "kernel_q4": jnp.asarray(pack_int4(vals)),
                "scale": jnp.full(np.shape(node["scale"]),
                                  1.0 / (7.0 * np.sqrt(fan_in)), jnp.float32),
            }
            for old in (q4, node.get("scale")):
                if hasattr(old, "delete"):
                    try:
                        old.delete()
                    except Exception:
                        pass
            return new
        if "kernel_q" in node:
            q = node["kernel_q"]
            fan_in = q.shape[0]
            kq = rs.randint(-127, 128, q.shape).astype(np.int8)
            new = {
                # scale keeps the tree's own shape: (out,) per-channel or
                # (G, out) grouped
                "scale": jnp.full(np.shape(node.get("scale", q[0])),
                                  1.0 / (127.0 * np.sqrt(fan_in)),
                                  jnp.float32),
            }
            if "out_w" in node:  # outlier-passthrough leaves (int8o/w8a8o)
                n_out = node["out_w"].shape[0]
                idx = np.sort(rs.choice(fan_in, size=n_out,
                                        replace=False)).astype(np.int32)
                # invariant from quantize_kernel: passthrough rows are ZERO
                # in kernel_q (the Linear adds them back exactly) — a random
                # row there would double-count those input dims
                kq[idx] = 0
                new["out_idx"] = jnp.asarray(idx)
                new["out_w"] = jnp.asarray(
                    (rs.randn(*np.shape(node["out_w"])) / np.sqrt(fan_in)
                     ).astype(jnp.bfloat16))
            new["kernel_q"] = jnp.asarray(kq)
            for old in (q, node.get("scale"), node.get("out_w"),
                        node.get("out_idx")):
                if hasattr(old, "delete"):
                    try:
                        old.delete()
                    except Exception:
                        pass
            return new
        return {k: walk(v) for k, v in node.items()}

    return walk(frozen)
