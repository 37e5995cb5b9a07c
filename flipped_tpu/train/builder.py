"""Model + parameter assembly (the reference's LLaMA_VQA, llama_vqa.py:6-78).

Builds the Flax model from params.json (or a named preset), loads the frozen
backbone from a converted safetensors checkpoint (converting Meta's
consolidated.*.pth on the fly if torch is available), initializes fresh
trainables, and returns the partitioned (trainable f32, frozen bf16) trees.
Falls back to random frozen weights when no checkpoint exists (synthetic
runs / tests)."""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
import jax
import jax.numpy as jnp

from ..ckpt.convert import convert_meta_checkpoint, load_frozen_params
from ..core.config import MODEL_PRESETS, ModelConfig, RunConfig
from ..model import FlippedVQAModel
from ..text import load_tokenizer
from .optim import cast_partitions, partition_params


def resolve_model_config(run_cfg: RunConfig) -> ModelConfig:
    name = run_cfg.model_name.replace("_adapter", "")
    model_dir = Path(run_cfg.llama_model_path) / run_cfg.model_name
    overrides = dict(
        max_seq_len=run_cfg.data.max_seq_len,
        adapter_len=run_cfg.model.adapter_len,
        adapter_layer=run_cfg.model.adapter_layer,
        max_feats=run_cfg.model.max_feats, bias=run_cfg.model.bias,
        tau=run_cfg.model.tau, audio_merge=run_cfg.model.audio_merge)
    if (model_dir / "params.json").exists():
        # (reference: llama_vqa.py:8-9)
        cfg = ModelConfig.from_params_json(str(model_dir / "params.json"),
                                           **overrides)
    elif (preset := MODEL_PRESETS.get(name)) is not None:
        cfg = ModelConfig(**{**preset, **overrides})
    else:
        cfg = run_cfg.model
    if cfg.adapter_layer > cfg.n_layers:
        # "last adapter_layer layers" can't exceed the model; clamping avoids
        # dead adapter rows when e.g. the 7B default --adapter_layer 32 is
        # used with a smaller model
        cfg = dataclasses.replace(cfg, adapter_layer=cfg.n_layers)
    return cfg


def build_model(run_cfg: RunConfig, use_flash: bool | None = None,
                remat: bool = True):
    cfg = resolve_model_config(run_cfg)
    seq_shard = run_cfg.mesh.sp > 1
    if use_flash is None:
        use_flash = (run_cfg.train.flash_attention
                     and jax.default_backend() == "tpu")
    if seq_shard and use_flash:
        # under sp the model dispatches attention to the shard_map'd
        # streaming kernels (sp_flash_or_einsum): local q rows against
        # all-gathered K/V with global q_offset — no O(S²) buffer on any
        # device. Requires the trainer's jax.set_mesh context (cli/train.py).
        print("sequence parallelism (--sp > 1): attention runs the "
              "shard_map'd streaming flash kernels")
    from ..core.config import quant_flags
    if run_cfg.mesh.pp > 1:
        from ..model.pipeline import validate_pp
        validate_pp(run_cfg.mesh, cfg, run_cfg.train.is_generation_task)
        print(f"pipeline parallelism (--pp {run_cfg.mesh.pp}): layer stack "
              f"stored stacked, GPipe microbatch schedule over the pp axis")
    model = FlippedVQAModel(cfg, use_flash=use_flash,
                            remat=remat and run_cfg.train.remat,
                            remat_policy=run_cfg.train.remat_policy,
                            remat_group=run_cfg.train.remat_group,
                            seq_shard=seq_shard,
                            **quant_flags(run_cfg.train.quantize))
    return model, cfg


def init_params(model, cfg: ModelConfig, seed: int = 0):
    if getattr(model, "seq_shard", False):
        # init runs before the trainer enters its mesh; the sequence-parallel
        # sharding constraints need one. They don't affect param shapes —
        # init through an unconstrained clone.
        model = model.clone(seq_shard=False)
    tokens = jnp.zeros((1, min(cfg.max_seq_len, 16)), jnp.int32)
    merge = cfg.audio_merge
    video = (None if merge == "audio_only"
             else jnp.zeros((1, cfg.max_feats, cfg.visual_dim), jnp.float32))
    if merge == "attention":
        audio = jnp.zeros((1, 1, cfg.audio_dim), jnp.float32)
    elif merge in ("sum", "concat", "audio_only"):
        audio = jnp.zeros((1, cfg.max_feats, cfg.audio_dim), jnp.float32)
    else:
        audio = None
    vs = jnp.zeros((1,), jnp.int32)
    splice = jnp.zeros((1, cfg.max_feats), jnp.int32)
    return jax.jit(model.init)(jax.random.PRNGKey(seed), tokens, video,
                               audio, vs, splice)["params"]


def load_or_convert_frozen(run_cfg: RunConfig) -> dict | None:
    """Find (or produce) the converted safetensors for the frozen backbone."""
    model_dir = Path(run_cfg.llama_model_path) / run_cfg.model_name
    st = model_dir / "model.flax.safetensors"
    if st.exists():
        return load_frozen_params(str(st))
    if list(model_dir.glob("*.pth")):
        print(f"converting Meta checkpoint under {model_dir} → {st}")
        convert_meta_checkpoint(str(model_dir), str(st))
        return load_frozen_params(str(st))
    return None


def build_train_state(run_cfg: RunConfig, seed: int = 0,
                      use_flash: bool | None = None, remat: bool = True):
    """→ (model, cfg, tokenizer, trainable, frozen). Frozen comes from the
    converted checkpoint when present (reference: llama_vqa.py:63-77), else
    stays at random init with a warning."""
    model, cfg = build_model(run_cfg, use_flash=use_flash, remat=remat)
    tok_path = run_cfg.tokenizer_path or os.path.join(
        run_cfg.llama_model_path, "tokenizer.model")
    tokenizer = load_tokenizer(tok_path if os.path.exists(tok_path) else "",
                               n_words=cfg.vocab_size)
    if tokenizer.n_words != cfg.vocab_size:
        size = (os.path.getsize(tok_path) if os.path.exists(tok_path)
                else "<missing>")
        raise ValueError(
            f"tokenizer vocab ({tokenizer.n_words}, "
            f"{type(tokenizer).__name__} from {tok_path}, "
            f"file size {size}) != model "
            f"vocab_size ({cfg.vocab_size}) — embedding lookups would go out "
            f"of bounds (NaN loss). Use a matching --model preset or "
            f"--tokenizer_path.")

    params = init_params(model, cfg, seed)
    trainable, frozen = partition_params(params)
    loaded = load_or_convert_frozen(run_cfg)
    quantized = run_cfg.train.quantize != "none"
    if loaded is not None and run_cfg.train.quantize.endswith("r"):
        # Fold the residual-stream rotation into the bf16 checkpoint BEFORE
        # on-the-fly quantization (ckpt/rotate.py). Deterministic in the
        # default seed, so resume/evaluate rebuild the identical tree.
        # Fresh-init trainables (adapter_query etc.) simply live in rotated
        # coordinates — an equivalent parametrization.
        from ..ckpt.rotate import rotate_params

        print("folding residual-stream rotation into the checkpoint "
              "(--quantize *r)")
        loaded = rotate_params(loaded, cfg.n_layers, cfg.adapter_layer)
    if loaded is not None:
        # graft loaded leaves into the frozen tree; missing keys keep their
        # random init with a LOUD warning (the reference's
        # load_state_dict(strict=False), llama_vqa.py:68, is silent — a
        # part-random frozen backbone otherwise only shows up as mysteriously
        # bad accuracy); extra checkpoint keys are ignored. bf16 kernels are
        # quantized on the fly when the model runs int8.
        from ..ckpt.quantize import quantize_kernel

        missing = []

        def graft(dst, src, path=""):
            if quantized and "kernel_q4" in dst and "kernel" in src:
                # packed int4 leaf: K is intact (packing is along N), so the
                # group width is inferred exactly as for int8
                group = dst["kernel_q4"].shape[0] // dst["scale"].shape[0]
                return quantize_kernel(src["kernel"], group, 0, bits=4)
            if quantized and "kernel_q" in dst and "kernel" in src:
                group = (dst["kernel_q"].shape[0] // dst["scale"].shape[0]
                         if getattr(dst.get("scale"), "ndim", 1) == 2 else 0)
                n_out = dst["out_w"].shape[0] if "out_w" in dst else 0
                return quantize_kernel(src["kernel"], group, n_out)
            out = {}
            for k, v in dst.items():
                p = f"{path}/{k}" if path else k
                if v is None:
                    out[k] = None
                elif isinstance(v, dict):
                    out[k] = graft(v, src.get(k, {}), p)
                elif k in src:
                    out[k] = src[k]
                else:
                    missing.append(p)
                    out[k] = v
            return out

        frozen = graft(frozen, loaded)
        if missing:
            print(f"WARNING: checkpoint is missing {len(missing)} frozen "
                  f"leaves — they stay RANDOMLY initialized (first few: "
                  f"{missing[:5]}). The converted checkpoint is likely "
                  f"incomplete.")
    else:
        print("WARNING: no LLaMA checkpoint found — frozen backbone stays "
              "randomly initialized (synthetic mode)")
        if quantized:
            from ..ckpt.quantize import randomize_quantized
            frozen = randomize_quantized(frozen, seed)
    trainable, frozen = cast_partitions(trainable, frozen)
    if run_cfg.mesh.pp > 1:
        # Pipeline parallelism: restack the per-layer subtrees ONCE here
        # (host-side) into `layers_stacked` with a leading (n_layers,) axis
        # — sharded over the 'pp' mesh axis by core/mesh.py:param_pspec —
        # and wrap the model so `encode` runs the GPipe schedule
        # (model/pipeline.py). Checkpoints written under --pp carry the
        # stacked trainables; unstack_layer_params converts for pp=1 interop.
        from ..model.pipeline import PipelinedModel, stack_layer_params
        trainable = stack_layer_params(trainable, cfg.n_layers)
        frozen = stack_layer_params(frozen, cfg.n_layers)
        model = PipelinedModel(model, run_cfg.mesh.pp_microbatches)
    return model, cfg, tokenizer, trainable, frozen
