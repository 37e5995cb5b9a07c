"""Flax LLaMA with adapter prompting, attention gates, and video splicing.

TPU-native re-design of the reference Transformer (reference:
llama/model.py:172-365) with the same math but idiomatic JAX structure:

  * The three objectives share one `encode()` over a stacked batch instead of
    three sequential layer sweeps (reference: model.py:338-345) — XLA sees one
    big matmul stream, and per-sequence `video_start` (sentinel -1) replaces
    the reference's Python-level branch between gated/ungated objectives.
  * Video features are spliced by a one-hot scatter-matmul over per-example
    positions, covering both the reference's slice-assign for VQA/VAQ
    (model.py:326-332) and the scatter_add for QAV (model.py:334-336).
  * Token embeddings are frozen via stop_gradient (reference computes them
    under torch.no_grad, model.py:286-294).
  * Generation runs on a real KV cache (`prefill` + `decode_step`) instead of
    the reference's full O(S²) re-forward per generated token
    (model.py:429-442). The dead always-allocated per-layer cache of the
    reference (model.py:82-83) does not exist — caches are explicit values.

Parameter tree mirrors the reference state_dict names (tok_embeddings,
layers_N.attention.wq…, norm, output, adapter_query, temporal_emb,
visual_proj, audio_proj, video_audio_cross_attn) so the checkpoint converter
is a pure rename/transpose (see ckpt/convert.py).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..core.config import ModelConfig
from .attention import (adapter_gated_attention, chunk_extend_attention,
                        decode_attention)
from .int8 import int8_matmul, int8_matmul_dgrad
from .layers import apply_rope, apply_rope_at, precompute_rope, rms_norm
from .pallas import flash_adapter_attention
from .pallas.flash_attention import sp_flash_or_einsum


def _torch_linear_init():
    # U(±1/sqrt(fan_in)) — torch nn.Linear default bound (fan_in is derived
    # from the kernel shape by variance_scaling itself).
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class Linear(nn.Module):
    """Bias-free linear with the kernel stored (in, out).

    quantized=True stores the kernel as int8 with per-output-channel f32
    scales (weight-only quantization): the frozen 7B backbone drops from
    ~12.6 GB to ~6.3 GB of HBM, dequantizing one layer at a time into the
    matmul. Opt-in (--quantize int8) — small numerical deltas vs bf16.

    act_quant=True additionally quantizes the *activations* per token and
    runs the matmul as int8×int8→int32 on the MXU (2× the bf16 rate on
    v5e) — the w8a8 path (--quantize w8a8); see model/int8.py.

    quant_group>0 switches to GROUPED (sub-channel) scales — (K/group, N)
    for weights and per-(token, group) for activations — the outlier-robust
    variant (--quantize int8g|w8a8g): one amplified channel degrades only
    its own `quant_group` input dims, not a whole absmax window.

    quant_outliers=True additionally carries the ~0.8% largest-absmax input
    rows as a dense bf16 passthrough (LLM.int8()-style mixed decomposition,
    --quantize int8o|w8a8o): those rows are zeroed in kernel_q at
    quantization time (ckpt/quantize.py), their exact contribution is the
    tiny x[:, idx] @ out_w matmul, and under act_quant the same columns are
    masked out of x before per-(token, group) quantization — outlier
    ACTIVATION channels stop inflating the activation scales too.

    weight_bits=4 stores the kernel PACKED two-per-byte ('kernel_q4',
    (K, N/2) split-half layout, model/int4.py) with mandatory grouped
    scales — 3.2 GB for the frozen 7B backbone (--quantize int4|w4a8;
    compose with the rotation fold as int4r|w4a8r)."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    quantized: bool = False
    act_quant: bool = False
    quant_group: int = 0
    quant_outliers: bool = False
    weight_bits: int = 8
    # False → XLA-only quantized matmuls (no pallas_call): required under
    # GSPMD-partitioned jits (sequence parallelism), where a Pallas kernel
    # is a single-device program and would force gathers around every matmul
    quant_pallas: bool = True
    # w8a8d: run the backward dx dot int8-quantized too (per-channel w8a8
    # only — enforced by core/config.quant_flags). See int8_matmul_dgrad.
    dgrad_quant: bool = False

    @nn.compact
    def __call__(self, x):
        if self.quantized and self.weight_bits == 4:
            if self.quant_outliers:
                raise ValueError("int4 + outlier passthrough is unsupported "
                                 "(use --quantize int4r|w4a8r)")
            from .int4 import (int4_matmul, int4_matmul_grouped,
                               int4_matmul_grouped_xla, int4_matmul_xla)
            k_dim = x.shape[-1]
            group = self.quant_group or 128
            g_count = k_dim // group if k_dim % group == 0 else 1
            kq4 = self.param("kernel_q4", nn.initializers.zeros,
                             (k_dim, self.features // 2), jnp.int8)
            scale = self.param("scale", nn.initializers.ones,
                               (g_count, self.features), jnp.float32)
            if self.act_quant:
                mm = (int4_matmul_grouped if self.quant_pallas
                      else int4_matmul_grouped_xla)
                return mm(x, kq4, scale)
            return (int4_matmul if self.quant_pallas
                    else int4_matmul_xla)(x, kq4, scale)
        if self.quantized:
            k_dim = x.shape[-1]
            kq = self.param("kernel_q", nn.initializers.zeros,
                            (k_dim, self.features), jnp.int8)
            passthrough = 0.0
            if self.quant_outliers:
                from ..ckpt.quantize import outlier_count
                n_out = outlier_count(k_dim)
                oi = self.param(
                    "out_idx",
                    lambda key, shape, dtype: jnp.arange(shape[0], dtype=dtype),
                    (n_out,), jnp.int32)
                ow = self.param("out_w", nn.initializers.zeros,
                                (n_out, self.features), self.param_dtype)
                x_out = jnp.take(x, oi, axis=-1).astype(self.dtype)
                passthrough = x_out @ ow.astype(self.dtype)
                if self.act_quant:
                    # keep outlier activation channels out of the absmax
                    # windows; their contribution is exact via passthrough
                    # (the matching kernel_q rows are zero)
                    x = x * jnp.ones((k_dim,), x.dtype).at[oi].set(0)
            if self.quant_group > 0 and k_dim % self.quant_group == 0:
                from .int8 import int8_matmul_grouped, int8_matmul_grouped_xla
                g_count = k_dim // self.quant_group
                scale = self.param("scale", nn.initializers.ones,
                                   (g_count, self.features), jnp.float32)
                if self.act_quant:
                    mm = (int8_matmul_grouped if self.quant_pallas
                          else int8_matmul_grouped_xla)
                    return mm(x, kq, scale) + passthrough
                from .int4 import ad_taint_in_manual_mesh
                kq, scale = ad_taint_in_manual_mesh(x, kq, scale)
                kernel = (kq.reshape(g_count, self.quant_group,
                                     self.features).astype(self.dtype)
                          * scale[:, None, :].astype(self.dtype)
                          ).reshape(k_dim, self.features)
                return x @ kernel + passthrough
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            if self.act_quant:
                mm = int8_matmul_dgrad if self.dgrad_quant else int8_matmul
                return mm(x, kq, scale) + passthrough
            from .int4 import ad_taint_in_manual_mesh
            kq, scale = ad_taint_in_manual_mesh(x, kq, scale)
            kernel = kq.astype(self.dtype) * scale.astype(self.dtype)[None, :]
            return x @ kernel + passthrough
        kernel = self.param("kernel", _torch_linear_init(),
                            (x.shape[-1], self.features), self.param_dtype)
        return x @ kernel.astype(self.dtype)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,),
                            self.param_dtype)
        return rms_norm(x, weight, self.eps)


class Attention(nn.Module):
    """Adapter-gated attention (reference: model.py:70-128)."""

    cfg: ModelConfig
    dtype: Any = jnp.bfloat16
    frozen_dtype: Any = jnp.bfloat16
    trainable_dtype: Any = jnp.float32
    use_flash: bool = False
    quantized: bool = False
    act_quant: bool = False
    quant_group: int = 0
    quant_outliers: bool = False
    weight_bits: int = 8
    quant_pallas: bool = True
    dgrad_quant: bool = False
    # sequence parallelism: dispatch to the shard_map'd streaming kernels
    # (sp_flash_or_einsum) — the single-device Pallas wrappers cannot be
    # GSPMD-partitioned
    seq_shard: bool = False

    def setup(self):
        cfg = self.cfg
        lin = functools.partial(Linear, cfg.dim, dtype=self.dtype,
                                param_dtype=self.frozen_dtype,
                                quantized=self.quantized,
                                act_quant=self.act_quant,
                                quant_group=self.quant_group,
                                quant_outliers=self.quant_outliers,
                                weight_bits=self.weight_bits,
                                quant_pallas=self.quant_pallas,
                                dgrad_quant=self.dgrad_quant)
        self.wq, self.wk, self.wv, self.wo = (lin(name=n) for n in
                                              ("wq", "wk", "wv", "wo"))
        # Zero-init tanh gate on the adapter segment; -bias init on the
        # video-block gate (reference: model.py:84-85).
        self.gate1 = self.param("gate1", nn.initializers.zeros,
                                (cfg.n_heads,), self.trainable_dtype)
        self.gate2 = self.param(
            "gate2", lambda key, shape, dtype: jnp.full(shape, -cfg.bias,
                                                        dtype),
            (cfg.n_heads,), self.trainable_dtype)

    def _qkv(self, x, rope_cos, rope_sin):
        b, s, _ = x.shape
        h, dh = self.cfg.n_heads, self.cfg.head_dim
        q = self.wq(x).reshape(b, s, h, dh)
        k = self.wk(x).reshape(b, s, h, dh)
        v = self.wv(x).reshape(b, s, h, dh)
        cos, sin = rope_cos[:s], rope_sin[:s]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # Named for selective remat: with a frozen backbone, attention
        # backward needs no weight grads — saving rope'd q/k/v makes the
        # whole attention recompute-free under the 'qkv' remat policy.
        q = checkpoint_name(q, "attn_q")
        k = checkpoint_name(k, "attn_k")
        v = checkpoint_name(v, "attn_v")
        return q, k, v

    def _adapter_kv(self, adapter):
        h, dh = self.cfg.n_heads, self.cfg.head_dim
        if adapter is None:
            # Layers below the adapter window: zeroed segment (tanh(0)·p = 0)
            ak = jnp.zeros((1, h, dh), self.dtype)
            av = jnp.zeros((1, h, dh), self.dtype)
            g1 = jnp.zeros((h,), self.trainable_dtype)
            return ak, av, g1
        al = adapter.shape[0]
        ak = self.wk(adapter.astype(self.dtype)).reshape(al, h, dh)
        av = self.wv(adapter.astype(self.dtype)).reshape(al, h, dh)
        return ak, av, self.gate1

    def _attend_fn(self):
        """Trace-time attention dispatch. The single-device Pallas wrappers
        cannot live inside a GSPMD-partitioned jit (a pallas_call is a
        single-device program — the partitioner would all-gather q/k/v to
        global shape around it), so on ANY multi-device ambient mesh flash
        routes through the shard_map'd streaming wrappers
        (sp_flash_or_einsum: batch over 'dp', sequence over 'sp', heads
        over 'tp'; with sp=1 that is plain batch/head-parallel flash with
        zero collectives)."""
        from ..core.mesh import mesh_is_multi_device
        if not self.use_flash:
            return adapter_gated_attention
        if self.seq_shard or mesh_is_multi_device():
            return sp_flash_or_einsum
        return flash_adapter_attention

    def __call__(self, x, rope_cos, rope_sin, adapter, video_start):
        q, k, v = self._qkv(x, rope_cos, rope_sin)
        ak, av, g1 = self._adapter_kv(adapter)
        out = self._attend_fn()(q, k, v, ak, av, g1, self.gate2, video_start,
                                self.cfg.max_feats)
        out = checkpoint_name(out, "attn_out")
        return self.wo(out)

    def prefill(self, x, rope_cos, rope_sin, adapter, video_start):
        """Full forward that also returns the rope'd K / V for the cache."""
        q, k, v = self._qkv(x, rope_cos, rope_sin)
        ak, av, g1 = self._adapter_kv(adapter)
        out = self._attend_fn()(q, k, v, ak, av, g1, self.gate2, video_start,
                                self.cfg.max_feats)
        return self.wo(out), k, v

    def extend(self, x, rope_cos, rope_sin, adapter, video_start,
               cache_k, cache_v, prefix, n_opt):
        """Prefix-shared chunk attention: x (B, n_opt*L, D), per-example
        shared-prompt length prefix (B,). Chunk rows at absolute positions
        prefix + (row % L)."""
        b, nl, _ = x.shape
        h, dh = self.cfg.n_heads, self.cfg.head_dim
        chunk_len = nl // n_opt
        q = self.wq(x).reshape(b, nl, h, dh)
        k = self.wk(x).reshape(b, nl, h, dh)
        v = self.wv(x).reshape(b, nl, h, dh)
        pos = prefix[:, None] + (jnp.arange(nl) % chunk_len)[None]  # (B,nl)
        cos = rope_cos[pos]
        sin = rope_sin[pos]
        q = apply_rope_at(q, cos, sin)
        k = apply_rope_at(k, cos, sin)
        ak, av, g1 = self._adapter_kv(adapter)
        out = chunk_extend_attention(q, k, v, cache_k, cache_v, ak, av, g1,
                                     self.gate2, video_start, prefix, n_opt,
                                     self.cfg.max_feats)
        return self.wo(out)

    def decode(self, x, rope_cos, rope_sin, adapter, video_start,
               cache_k, cache_v, pos):
        """Single-token step: x (B,1,D), pos (B,) absolute positions."""
        b = x.shape[0]
        h, dh = self.cfg.n_heads, self.cfg.head_dim
        q = self.wq(x).reshape(b, 1, h, dh)
        k = self.wk(x).reshape(b, 1, h, dh)
        v = self.wv(x).reshape(b, 1, h, dh)
        cos = rope_cos[pos][:, None]          # (B, 1, Dh/2)
        sin = rope_sin[pos][:, None]
        q = apply_rope_at(q, cos, sin)
        k = apply_rope_at(k, cos, sin)
        # in-place-able scatter of the new K/V at per-example pos (XLA can
        # alias this into the scan carry, unlike a one-hot blend)
        batch_idx = jnp.arange(b)
        cache_k = cache_k.at[batch_idx, pos].set(k[:, 0].astype(cache_k.dtype))
        cache_v = cache_v.at[batch_idx, pos].set(v[:, 0].astype(cache_v.dtype))
        ak, av, g1 = self._adapter_kv(adapter)
        out = decode_attention(q, cache_k, cache_v, ak, av, g1, self.gate2,
                               video_start, pos, self.cfg.max_feats)
        return self.wo(out), cache_k, cache_v



class FeedForward(nn.Module):
    """SwiGLU FFN (reference: model.py:131-142)."""

    cfg: ModelConfig
    dtype: Any = jnp.bfloat16
    frozen_dtype: Any = jnp.bfloat16
    quantized: bool = False
    act_quant: bool = False
    quant_group: int = 0
    quant_outliers: bool = False
    weight_bits: int = 8
    quant_pallas: bool = True
    dgrad_quant: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = self.cfg.ffn_hidden
        lin = functools.partial(Linear, dtype=self.dtype,
                                param_dtype=self.frozen_dtype,
                                quantized=self.quantized,
                                act_quant=self.act_quant,
                                quant_group=self.quant_group,
                                quant_outliers=self.quant_outliers,
                                weight_bits=self.weight_bits,
                                quant_pallas=self.quant_pallas,
                                dgrad_quant=self.dgrad_quant)
        w1 = lin(hidden, name="w1")
        w2 = lin(self.cfg.dim, name="w2")
        w3 = lin(hidden, name="w3")
        return w2(jax.nn.silu(w1(x)) * w3(x))


class TransformerBlock(nn.Module):
    """Pre-norm residual block (reference: model.py:172-187)."""

    cfg: ModelConfig
    dtype: Any = jnp.bfloat16
    frozen_dtype: Any = jnp.bfloat16
    trainable_dtype: Any = jnp.float32
    use_flash: bool = False
    quantized: bool = False
    act_quant: bool = False
    quant_group: int = 0
    quant_outliers: bool = False
    weight_bits: int = 8
    quant_pallas: bool = True
    seq_shard: bool = False
    dgrad_quant: bool = False

    def setup(self):
        self.attention = Attention(self.cfg, self.dtype, self.frozen_dtype,
                                   self.trainable_dtype, self.use_flash,
                                   self.quantized, self.act_quant,
                                   self.quant_group, self.quant_outliers,
                                   self.weight_bits, self.quant_pallas,
                                   dgrad_quant=self.dgrad_quant,
                                   seq_shard=self.seq_shard)
        self.feed_forward = FeedForward(self.cfg, self.dtype,
                                        self.frozen_dtype, self.quantized,
                                        self.act_quant, self.quant_group,
                                        self.quant_outliers,
                                        self.weight_bits, self.quant_pallas,
                                        dgrad_quant=self.dgrad_quant)
        self.attention_norm = RMSNorm(self.cfg.dim, self.cfg.norm_eps,
                                      self.frozen_dtype)
        self.ffn_norm = RMSNorm(self.cfg.dim, self.cfg.norm_eps,
                                self.frozen_dtype)

    def __call__(self, x, rope_cos, rope_sin, adapter, video_start):
        h = x + self.attention(self.attention_norm(x), rope_cos, rope_sin,
                               adapter, video_start)
        return h + self.feed_forward(self.ffn_norm(h))

    def prefill(self, x, rope_cos, rope_sin, adapter, video_start):
        attn, k, v = self.attention.prefill(self.attention_norm(x), rope_cos,
                                            rope_sin, adapter, video_start)
        h = x + attn
        return h + self.feed_forward(self.ffn_norm(h)), k, v

    def decode(self, x, rope_cos, rope_sin, adapter, video_start,
               cache_k, cache_v, pos):
        attn, ck, cv = self.attention.decode(
            self.attention_norm(x), rope_cos, rope_sin, adapter, video_start,
            cache_k, cache_v, pos)
        h = x + attn
        return h + self.feed_forward(self.ffn_norm(h)), ck, cv

    def extend(self, x, rope_cos, rope_sin, adapter, video_start,
               cache_k, cache_v, prefix, n_opt):
        attn = self.attention.extend(self.attention_norm(x), rope_cos,
                                     rope_sin, adapter, video_start,
                                     cache_k, cache_v, prefix, n_opt)
        h = x + attn
        return h + self.feed_forward(self.ffn_norm(h))


class CrossAttentionModule(nn.Module):
    """Single cross-attention of video queries over audio keys/values for the
    'attention' audio-merge mode (reference: model.py:145-169)."""

    feature_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, video, audio):
        # torch Linear with bias (reference: model.py:148-150)
        dense = functools.partial(nn.Dense, self.feature_dim, use_bias=True,
                                  dtype=self.dtype, param_dtype=self.dtype)
        q = dense(name="query")(video.astype(self.dtype))
        k = dense(name="key")(audio.astype(self.dtype))
        v = dense(name="value")(audio.astype(self.dtype))
        scores = jnp.einsum("bfd,bad->bfa", q, k) / jnp.sqrt(
            jnp.asarray(self.feature_dim, self.dtype))
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bfa,bad->bfd", probs, v)


class FlippedVQAModel(nn.Module):
    """The full adapter-gated LLaMA (reference: model.py:190-365)."""

    cfg: ModelConfig
    dtype: Any = jnp.bfloat16
    frozen_dtype: Any = jnp.bfloat16
    trainable_dtype: Any = jnp.float32
    use_flash: bool = False
    remat: bool = False
    # 'full' recomputes whole blocks in backward; 'qkv' additionally saves
    # the rope'd q/k/v and attention outputs so the (weight-grad-free, frozen)
    # attention never recomputes — ~2.4 GB extra at 7B/S=128 for less
    # recompute FLOPs.
    remat_policy: str = "full"
    # checkpoint every `remat_group` consecutive blocks as ONE remat unit:
    # only group-boundary residuals are saved (n_layers/group instead of
    # n_layers boundary activations — at 7B/S=16k each boundary is 128 MB,
    # so group=2 frees ~2.1 GB), at the cost of holding `group` layers'
    # recomputed intermediates at once during that group's backward. Total
    # recompute FLOPs are unchanged (every layer still recomputes exactly
    # once). The S=16k capacity row needs group=2 to fit 16 GB.
    remat_group: int = 1
    # int8 weight-only quantization of the frozen backbone matmuls
    quantized: bool = False
    # w8a8: additionally run block matmuls as int8×int8 on the MXU (2× rate).
    # The LM head ('output') stays weight-only — its logits feed the eval
    # argmin (engine.py:87-93) directly, so it keeps bf16 activations.
    act_quant: bool = False
    # grouped (sub-channel) scales: scale shape (K/quant_group, N), plus
    # per-(token, group) activation scales under act_quant — the
    # outlier-robust int8 variant (--quantize int8g|w8a8g)
    quant_group: int = 0
    # bf16 passthrough of the largest-absmax input rows per matmul
    # (LLM.int8()-style mixed decomposition, --quantize int8o|w8a8o)
    quant_outliers: bool = False
    # 4 = packed int4 frozen weights with grouped scales (--quantize
    # int4|w4a8, model/int4.py). The LM head stays int8 weight-only: its
    # logits feed the eval argmin (engine.py:87-93) directly, and it is
    # 0.13 GB at 7B.
    weight_bits: int = 8
    # w8a8d: int8-quantized activation-GRADIENT dx dots in the block
    # backward too (int8.int8_matmul_dgrad; --quantize w8a8d|w8a8rd). The
    # LM head is untouched (weight-only, exact bf16 dx).
    dgrad_quant: bool = False
    # Sequence parallelism (--sp > 1, core/mesh.py): constrain the residual
    # stream to (dp, sp, None) at every block boundary so GSPMD shards
    # norms/MLP/projections over S/sp tokens per chip and inserts the K/V
    # all-gather inside attention. Requires tracing inside a Mesh that has
    # the 'sp' axis. Einsum attention path only (the Pallas kernel is a
    # single-device program; sharding it needs shard_map — future work).
    seq_shard: bool = False
    # Residual-stream rotation folded into the checkpoint
    # (ckpt/rotate.py, --quantize int8r|w8a8r): every weight transform is
    # offline; the ONE runtime difference is the QAV head, which consumes
    # norm(h)·vfᵀ directly (reference model.py:358-361) and so needs the
    # folded final-norm γ restored via the stored Rᵀdiag(γ)R matrix.
    rotated: bool = False

    def setup(self):
        cfg = self.cfg
        self.tok_embeddings = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=self.dtype,
            param_dtype=self.frozen_dtype,
            embedding_init=nn.initializers.normal(1.0))
        self.blocks = [
            TransformerBlock(cfg, self.dtype, self.frozen_dtype,
                             self.trainable_dtype, self.use_flash,
                             self.quantized, self.act_quant,
                             self.quant_group, self.quant_outliers,
                             self.weight_bits, not self.seq_shard,
                             self.seq_shard, dgrad_quant=self.dgrad_quant,
                             name=f"layers_{i}")
            for i in range(cfg.n_layers)
        ]
        self.norm = RMSNorm(cfg.dim, cfg.norm_eps, self.frozen_dtype,
                            name="norm")
        self.output = Linear(cfg.vocab_size, dtype=self.dtype,
                             param_dtype=self.frozen_dtype,
                             quantized=self.quantized,
                             quant_group=self.quant_group,
                             quant_outliers=self.quant_outliers,
                             name="output")
        if self.rotated:
            # Rᵀ diag(γ_norm) R (symmetric; identity until the rotated
            # checkpoint is grafted in). Frozen: no TRAINABLE_MARKERS match.
            self.qav_rot = self.param(
                "qav_rot",
                lambda key, shape, dtype: jnp.eye(shape[0], dtype=dtype),
                (cfg.dim, cfg.dim), jnp.float32)
        # Trainables (reference: model.py:208, 229; llama_vqa.py:71-77)
        self.adapter_query = self.param(
            "adapter_query", nn.initializers.normal(1.0),
            (cfg.adapter_len * cfg.adapter_layer, cfg.dim),
            self.trainable_dtype)
        self.temporal_emb = self.param(
            "temporal_emb", nn.initializers.normal(1.0),
            (cfg.max_feats, cfg.dim), self.trainable_dtype)

        merge = cfg.audio_merge
        proj = functools.partial(Linear, cfg.dim, dtype=self.dtype,
                                 param_dtype=self.trainable_dtype)
        if merge == "audio_only":
            self.audio_proj = proj(name="audio_proj")
        elif merge == "concat":
            self.visual_proj = proj(name="visual_proj")
        elif merge == "sum":
            self.audio_proj = proj(name="audio_proj")
            self.visual_proj = proj(name="visual_proj")
        elif merge == "attention":
            self.audio_proj = Linear(cfg.visual_dim, dtype=self.dtype,
                                     param_dtype=self.trainable_dtype,
                                     name="audio_proj")
            self.video_audio_cross_attn = CrossAttentionModule(
                cfg.visual_dim, dtype=jnp.float32,
                name="video_audio_cross_attn")
            self.visual_proj = proj(name="visual_proj")
        else:  # video only
            self.visual_proj = proj(name="visual_proj")

    # --- multimodal fusion (reference: model.py:306-322) --------------------
    def fuse(self, video: Optional[jax.Array],
             audio: Optional[jax.Array]) -> jax.Array:
        """Project video/audio features into model space → (B, F, dim).
        This is the reference's `_video_feature` (pre-temporal-embedding),
        which the QAV head also consumes (model.py:360)."""
        merge = self.cfg.audio_merge
        if merge == "audio_only":
            return self.audio_proj(audio.astype(self.dtype))
        if merge == "concat":
            return self.visual_proj(
                jnp.concatenate([video, audio], axis=-1).astype(self.dtype))
        if merge == "sum":
            return (self.audio_proj(audio.astype(self.dtype))
                    + self.visual_proj(video.astype(self.dtype)))
        if merge == "attention":
            a = self.audio_proj(audio.astype(self.dtype))
            fused = self.video_audio_cross_attn(video, a)
            return self.visual_proj(fused.astype(self.dtype))
        return self.visual_proj(video.astype(self.dtype))

    def add_temporal(self, video_feature: jax.Array) -> jax.Array:
        # (reference: model.py:324)
        return (video_feature
                + self.temporal_emb[None].astype(self.dtype)).astype(self.dtype)

    def _embed_and_splice(self, tokens, video_feature, splice_index):
        s = tokens.shape[1]
        h = jax.lax.stop_gradient(self.tok_embeddings(tokens))
        vf = self.add_temporal(video_feature)
        # One-hot scatter: overwrite splice positions with video features;
        # indices ≥ S drop (truncation-safe, cf. base_dataset.py:84-91).
        onehot = jax.nn.one_hot(splice_index, s, dtype=self.dtype)  # (B,F,S)
        is_video = jnp.einsum("bfs->bs", onehot)
        return (h * (1.0 - is_video[..., None])
                + jnp.einsum("bfs,bfd->bsd", onehot, vf))

    def _adapters(self):
        cfg = self.cfg
        adapters = self.adapter_query.reshape(cfg.adapter_layer,
                                              cfg.adapter_len, cfg.dim)
        first_adapted = cfg.n_layers - cfg.adapter_layer
        return adapters, first_adapted

    def _active_blocks(self):
        """The reference runs ONLY the last adapter_layer blocks —
        `self.layers[-1 * self.adapter_layer:]` (model.py:338, and likewise
        in its eval/generation paths) — so with adapter_layer < n_layers the
        early blocks are skipped entirely, not merely run adapter-free.
        Every reference config uses adapter_layer == n_layers, where the
        two readings coincide; we reproduce the skip for exact parity
        (tests/test_reference_parity.py covers adapter_layer < n_layers)."""
        adapters, first_adapted = self._adapters()
        return list(zip(self.blocks[first_adapted:], adapters))

    # --- backbone ------------------------------------------------------------
    def encode(self, tokens: jax.Array, video_feature: jax.Array,
               video_start: jax.Array, splice_index: jax.Array) -> jax.Array:
        """Embed, splice video, run all blocks + final norm → (B, S, dim).

        tokens:        (B, S) int32
        video_feature: (B, F, dim) — output of fuse() (temporal emb is added
                       here, reference: model.py:324)
        video_start:   (B,) int32; -1 → no gate2 video block (QAV rows)
        splice_index:  (B, F) int32 — positions receiving video features
        """
        cfg = self.cfg
        h = self._embed_and_splice(tokens, video_feature, splice_index)
        rope_cos, rope_sin = precompute_rope(cfg.head_dim, tokens.shape[1],
                                             cfg.rope_theta)
        policy = None
        if self.remat and self.remat_policy == "qkv":
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_q", "attn_k", "attn_v", "attn_out")
        h = self._seq_wsc(h)
        if self.remat and self.remat_group > 1:
            # group remat: one checkpoint over `remat_group` blocks — only
            # group-boundary h is saved (see remat_group field note). The
            # group bounds are static closure args (nn.remat static_argnums
            # counts the module at 0).
            group_call = nn.remat(type(self)._run_block_range,
                                  static_argnums=(5, 6), policy=policy)
            n = len(self._active_blocks())
            for start in range(0, n, self.remat_group):
                stop = min(start + self.remat_group, n)
                h = group_call(self, h, rope_cos, rope_sin, video_start,
                               start, stop)
            return self.norm(h)
        if self.remat:
            block_call = nn.remat(TransformerBlock.__call__, policy=policy)
        else:
            block_call = TransformerBlock.__call__
        for block, adapter in self._active_blocks():
            h = block_call(block, h, rope_cos, rope_sin, adapter, video_start)
            h = self._seq_wsc(h)
        return self.norm(h)

    def _run_block_range(self, h, rope_cos, rope_sin, video_start,
                         start: int, stop: int):
        """Run active blocks [start, stop) — the remat_group checkpoint
        unit. Per-block sequence-parallel sharding constraints stay inside
        so GSPMD keeps the residual stream sp-sharded across the group."""
        for block, adapter in self._active_blocks()[start:stop]:
            h = block(h, rope_cos, rope_sin, adapter, video_start)
            h = self._seq_wsc(h)
        return h

    def _seq_wsc(self, h):
        """Residual-stream sharding constraint for sequence parallelism
        (seq_shard=True): (batch → dp, sequence → sp, features replicated
        within the sp group — tp sharding of projections is unaffected)."""
        if not self.seq_shard:
            return h
        from jax.sharding import PartitionSpec as P

        from ..core.mesh import DP_AXIS, SP_AXIS
        return jax.lax.with_sharding_constraint(h, P(DP_AXIS, SP_AXIS, None))

    def lm_logits(self, h: jax.Array) -> jax.Array:
        return self.output(h)

    def qav_logits(self, h: jax.Array, video_feature: jax.Array) -> jax.Array:
        """Frame-ordering logits: h · video_featureᵀ / tau over the F frames
        (reference: model.py:358-361 — uses the *pre-temporal* features)."""
        vf = video_feature.astype(jnp.float32)
        if self.rotated:
            # restore the folded final-norm γ inside the bilinear form:
            # norm(h)⊙γ · vfᵀ == h_rot · (Rᵀdiag(γ)R) vf_rotᵀ
            vf = vf @ self.qav_rot.astype(jnp.float32)
        return (jnp.einsum("bsd,bfd->bsf", h[:, :-1].astype(jnp.float32), vf)
                / self.cfg.tau)

    # --- KV-cache generation --------------------------------------------------
    def prefill(self, tokens: jax.Array, video_feature: jax.Array,
                video_start: jax.Array, splice_index: jax.Array,
                cache_len: int):
        """Run the prompt once, filling a KV cache of length cache_len.
        Returns (h_normed (B,S,D), cache_k (L,B,Smax,H,Dh), cache_v)."""
        cfg = self.cfg
        b, s = tokens.shape
        h = self._embed_and_splice(tokens, video_feature, splice_index)
        rope_cos, rope_sin = precompute_rope(cfg.head_dim, cache_len,
                                             cfg.rope_theta)
        ck_all, cv_all = [], []
        pad = cache_len - s
        for block, adapter in self._active_blocks():
            h, k, v = block.prefill(h, rope_cos, rope_sin, adapter,
                                    video_start)
            ck_all.append(jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))))
            cv_all.append(jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))))
        return (self.norm(h), jnp.stack(ck_all), jnp.stack(cv_all))

    def extend_logits(self, tokens: jax.Array, cache_k: jax.Array,
                      cache_v: jax.Array, prefix: jax.Array,
                      video_start: jax.Array) -> jax.Array:
        """Score n_opt candidate continuations against a shared prompt cache.

        tokens: (B, n_opt, L) int32 — per-option answer-span tokens starting
        at absolute position prefix (B,). Returns logits (B, n_opt, L, V).
        Together with `prefill`, this replaces the reference's per-option
        full forwards (model_my_original_mod.py:249-377) at ~n_opt× lower
        FLOPs for prompt-dominated sequences.
        """
        cfg = self.cfg
        b, n_opt, chunk_len = tokens.shape
        cache_len = cache_k.shape[2]
        h = jax.lax.stop_gradient(
            self.tok_embeddings(tokens.reshape(b, n_opt * chunk_len)))
        rope_cos, rope_sin = precompute_rope(cfg.head_dim, cache_len,
                                             cfg.rope_theta)
        for i, (block, adapter) in enumerate(self._active_blocks()):
            h = block.extend(h, rope_cos, rope_sin, adapter, video_start,
                             cache_k[i], cache_v[i], prefix, n_opt)
        logits = self.output(self.norm(h))
        return logits.reshape(b, n_opt, chunk_len, cfg.vocab_size)

    def decode_step(self, token: jax.Array, cache_k: jax.Array,
                    cache_v: jax.Array, pos: jax.Array,
                    video_start: jax.Array):
        """One greedy-decode step.

        token: (B,) int32 — the token AT position pos (just generated or the
        last prompt token); returns logits predicting position pos+1 and the
        updated caches.
        """
        cfg = self.cfg
        cache_len = cache_k.shape[2]
        h = jax.lax.stop_gradient(self.tok_embeddings(token[:, None]))
        rope_cos, rope_sin = precompute_rope(cfg.head_dim, cache_len,
                                             cfg.rope_theta)
        new_ck, new_cv = [], []
        for i, (block, adapter) in enumerate(self._active_blocks()):
            h, ck, cv = block.decode(h, rope_cos, rope_sin, adapter,
                                     video_start, cache_k[i], cache_v[i], pos)
            new_ck.append(ck)
            new_cv.append(cv)
        logits = self.output(self.norm(h))[:, 0]
        return logits, jnp.stack(new_ck), jnp.stack(new_cv)

    def __call__(self, tokens, video, audio, video_start, splice_index):
        """Init/compile convenience: fuse → encode → logits."""
        vf = self.fuse(video, audio)
        h = self.encode(tokens, vf, video_start, splice_index)
        return self.lm_logits(h), self.qav_logits(h, vf)
