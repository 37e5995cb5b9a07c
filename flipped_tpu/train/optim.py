"""Optimizer: partial freeze, AdamW with weight-decay masking, warmup-cosine.

Reproduces the reference's training setup:
  * Partial freeze by parameter name — gate/adapter/temporal_emb/visual_proj
    train in f32, everything else stays frozen (reference:
    llama_vqa.py:71-77). We additionally train audio_proj and
    video_audio_cross_attn, fixing the fork bug where the audio path stayed
    frozen at random init (SURVEY.md §2).
  * AdamW betas (0.9, 0.95) with timm-style weight-decay grouping: no decay
    on 1-D params (biases, norms, gates) (reference: train.py:119-121).
  * Fractional-epoch linear warmup → half-cycle cosine, applied once per
    accumulation boundary (reference: util/lr_sched.py:9-21, engine.py:22-23).

Instead of torch's requires_grad flags, the param tree is *partitioned* into
(trainable, frozen) subtrees — grads and optimizer state exist only for the
~4.6M trainable params, and the frozen 7B stays bf16 and untouched.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import TrainConfig

TRAINABLE_MARKERS = ("gate", "adapter", "temporal_emb", "visual_proj",
                     "audio_proj", "video_audio_cross_attn")


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def is_trainable(path: str) -> bool:
    return any(m in path for m in TRAINABLE_MARKERS)


def partition_params(params) -> Tuple[Dict, Dict]:
    """Split a param tree into (trainable, frozen) — leaves not in a subtree
    are replaced by None placeholders so the structures merge losslessly."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    train_leaves, frozen_leaves = [], []
    for key_path, leaf in flat:
        if is_trainable(_path_str(key_path)):
            train_leaves.append(leaf)
            frozen_leaves.append(None)
        else:
            train_leaves.append(None)
            frozen_leaves.append(leaf)
    mk = lambda leaves: jax.tree_util.tree_unflatten(treedef, leaves)
    return mk(train_leaves), mk(frozen_leaves)


def merge_params(trainable, frozen):
    """Recursive union of the two partitions; None placeholders defer to the
    other side and vanish. Tolerates structural differences inside a subtree
    (e.g. quantized frozen kernels: {'kernel_q','scale'} vs a trainable
    placeholder {'kernel': None})."""
    if trainable is None:
        return frozen
    if frozen is None:
        return trainable
    if isinstance(trainable, dict) and isinstance(frozen, dict):
        out = {}
        for k in set(trainable) | set(frozen):
            v = merge_params(trainable.get(k), frozen.get(k))
            if v is None or (isinstance(v, dict) and not v):
                continue
            out[k] = v
        return out
    return trainable


def cast_partitions(trainable, frozen, trainable_dtype=jnp.float32,
                    frozen_dtype=jnp.bfloat16):
    """Apply the dtype policy: f32 trainables (reference casts them to float,
    llama_vqa.py:74), bf16 frozen backbone — EXCEPT int8 quantization
    'scale' leaves, which stay per-channel f32 by design (model/int8.py)."""
    cast = lambda dt: (lambda x: x.astype(dt) if x is not None
                       and jnp.issubdtype(x.dtype, jnp.floating) else x)
    none_leaf = lambda x: x is None
    trainable = jax.tree_util.tree_map(cast(trainable_dtype), trainable,
                                       is_leaf=none_leaf)

    def cast_frozen(node):
        if not isinstance(node, dict):
            return cast(frozen_dtype)(node)
        # 'scale' (int8 dequant) and 'qav_rot' (rotation-fold restore,
        # ckpt/rotate.py) stay f32 — both feed f32 numerics directly
        return {k: (v if k in ("scale", "qav_rot") and v is not None
                    else cast_frozen(v))
                for k, v in node.items()}

    return trainable, cast_frozen(frozen)


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int, world_batch: int):
    """lr(update_idx) matching adjust_learning_rate (lr_sched.py:9-21): the
    epoch fraction advances by accum_iter data steps per optimizer update."""
    base_lr = cfg.absolute_lr(world_batch)

    def schedule(count):
        epoch = count * cfg.accum_iter / steps_per_epoch
        warm = base_lr * epoch / cfg.warmup_epochs
        progress = (epoch - cfg.warmup_epochs) / max(
            cfg.epochs - cfg.warmup_epochs, 1e-8)
        cos = cfg.min_lr + (base_lr - cfg.min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * progress))
        return jnp.where(epoch < cfg.warmup_epochs, warm, cos)

    return schedule


def wd_mask(params):
    # timm param_groups_weight_decay: no decay on 1-D params/biases
    # (None placeholders are empty subtrees in JAX and skip tree_map).
    # Leaves under a stacked layer tree (pipeline parallelism,
    # model/pipeline.py) carry a leading (n_layers,) axis.
    # EXCEPTION — gate1/gate2 DO decay: the reference stores them as
    # (1, n_heads, 1, 1) 4-D tensors (model.py:84-85), so timm's ndim<=1
    # rule puts them in the DECAY group (train.py:119-121). We store gates
    # 1-D (H,), which would silently exempt them — caught by the multi-step
    # training-trajectory oracle (tests/test_reference_parity.py), where the
    # reference's gates shrank measurably faster over 30 AdamW updates.
    def decay(key_path, p):
        path = _path_str(key_path)
        if "gate" in path.rsplit("/", 1)[-1]:
            return True
        stacked = "layers_stacked" in path
        return p.ndim > (2 if stacked else 1)

    return jax.tree_util.tree_map_with_path(decay, params)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int, world_batch: int,
                   ) -> optax.GradientTransformation:
    schedule = lr_schedule(cfg, steps_per_epoch, world_batch)

    chain = [optax.clip_by_global_norm(cfg.clip_grad)] if cfg.clip_grad else []
    chain.append(optax.adamw(learning_rate=schedule, b1=0.9, b2=0.95,
                             weight_decay=cfg.weight_decay, mask=wd_mask))
    return optax.chain(*chain)
