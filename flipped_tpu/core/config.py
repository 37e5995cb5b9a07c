"""Configuration dataclasses for the flipped_tpu framework.

Mirrors the reference CLI surface (reference: train.py:24-75 `get_args_parser`
and train.py:154-168 `validate_args`) plus the LLaMA model hyperparameters
(reference: llama/model.py:17-29 `ModelArgs`, llama_vqa.py:61-62), re-expressed
as typed dataclasses so that every jit-traced function receives static,
hashable config.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ModelConfig:
    """Static architecture hyperparameters of the adapter-gated LLaMA.

    Defaults are LLaMA-7B; `from_params_json` ingests Meta's params.json the
    same way the reference builds ModelArgs (llama_vqa.py:8-9, 61-62).
    """

    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    vocab_size: int = 32000
    multiple_of: int = 256
    norm_eps: float = 1e-6
    max_seq_len: int = 128
    # Adapter prompting (reference: model.py:208, 304, 338-345)
    adapter_len: int = 10
    adapter_layer: int = 32
    # Video splice (reference: model.py:193-194, 229)
    max_feats: int = 10
    visual_dim: int = 768
    audio_dim: int = 1024
    # Attention gate2 init magnitude (reference: model.py:85, train.py:65)
    bias: float = 3.0
    # QAV logit temperature (reference: model.py:248, 361; train.py:66)
    tau: float = 100.0
    rope_theta: float = 10000.0
    # Audio fusion: None | 'audio_only' | 'sum' | 'concat' | 'attention'
    # (reference: model.py:208-227, train.py:71-73)
    audio_merge: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def ffn_hidden(self) -> int:
        # SwiGLU hidden sizing (reference: model.py:131-135)
        hidden = int(2 * (4 * self.dim) / 3)
        return self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)

    @classmethod
    def from_params_json(cls, path: str, **overrides) -> "ModelConfig":
        with open(path) as f:
            params = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        merged = {k: v for k, v in params.items() if k in known}
        merged.update(overrides)
        return cls(**merged)


# Named presets matching Meta's released sizes; the reference selects these
# via `--model llama7B_adapter` + params.json (llama_vqa.py:8-9).
MODEL_PRESETS = {
    "tiny": dict(dim=64, n_layers=2, n_heads=4, vocab_size=512, multiple_of=32),
    # CPU-runnable model with the real 32k vocab (exercises real-tokenizer
    # paths that tiny's small-vocab MockTokenizer mode cannot)
    "small": dict(dim=256, n_layers=2, n_heads=4, multiple_of=32),
    "llama7B": dict(dim=4096, n_layers=32, n_heads=32),
    "llama13B": dict(dim=5120, n_layers=40, n_heads=40),
    "llama33B": dict(dim=6656, n_layers=60, n_heads=52),
}


@dataclass(frozen=True)
class DataConfig:
    """Dataset + batching configuration (reference: train.py:26-36, 45-55)."""

    dataset: str = "nextqa"
    data_root: str = "./data"
    batch_size: int = 8
    max_seq_len: int = 128
    max_feats: int = 10
    num_workers: int = 2
    # Subtitles for VLEP/TVQA (reference: train.py:67)
    sub: bool = False
    # Audio flags (reference: train.py:71-73)
    audio: bool = False
    audio_only: bool = False
    audio_merge: str = "none"
    # Generation-style answers (MUSIC-AVQA): free-form answer text instead
    # of "(A)" option letters (reference: tokenizer.py:78-100). Mirrored
    # from TrainConfig because the datasets encode prompts from DataConfig.
    is_generation_task: bool = False
    seed: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer + schedule + objective configuration.

    Reference: train.py:27-43 (epochs/lr/warmup/wd), train.py:63-64 (vaq/qav
    toggles), train.py:104-107 (lr scaling), util/lr_sched.py:9-21 (schedule).
    """

    epochs: int = 5
    warmup_epochs: float = 2.0
    accum_iter: int = 1
    blr: float = 9e-2
    lr: Optional[float] = None  # absolute lr; derived from blr when None
    min_lr: float = 0.0
    weight_decay: float = 0.14
    # Flipped objectives (VQA always on)
    vaq: bool = False
    qav: bool = False
    # Eval style (reference: train.py:68)
    is_generation_task: bool = False
    seed: int = 0
    output_dir: str = "./output_dir"
    resume: str = ""
    start_epoch: int = 0
    clip_grad: Optional[float] = None
    # Rematerialize transformer blocks to trade FLOPs for HBM
    remat: bool = True
    remat_policy: str = "full"
    # checkpoint every N consecutive blocks as one remat unit (1 = per
    # block): fewer saved boundary activations, same recompute FLOPs —
    # the long-context capacity knob (model/llama.py remat_group note)
    remat_group: int = 1
    # int8 weight-only quantization of the frozen backbone ('none' | 'int8')
    quantize: str = "none"
    # Use the Pallas flash-attention kernel on TPU (einsum fallback otherwise)
    flash_attention: bool = True
    # LM-head CE in sequence chunks of this size (0 = dense full-vocab
    # logits). Bounds vocab-width memory at long context — the 3-objective
    # stack at S=4096 overflows 16 GB on the dense head alone.
    lm_head_chunk: int = 0

    def absolute_lr(self, world_batch: int) -> float:
        # lr = blr * eff_batch / 256 (reference: train.py:104-107)
        if self.lr is not None:
            return self.lr
        return self.blr * world_batch / 256.0


def quant_flags(mode: str) -> dict:
    """Decode a --quantize mode string into FlippedVQAModel quantization
    kwargs — the ONE place the string grammar lives (int8/w8a8 base,
    'g' = grouped 128-wide sub-channel scales, 'o' = grouped + bf16
    outlier-row passthrough, 'r' = residual-stream rotation folded into the
    checkpoint with PLAIN absmax scales, ckpt/rotate.py; int4/w4a8 = packed
    4-bit weights with mandatory grouped scales, model/int4.py — also
    composable with 'r'). Used by the builder, bench, and the parity study
    so the call sites cannot drift. Trailing 'd' = int8-quantized
    activation-GRADIENT dx dots too (int8.int8_matmul_dgrad) — per-channel
    w8a8 only (w8a8d|w8a8rd): the grouped/int4 backwards route through the
    Pallas dx kernels, which dequantize per block already."""
    dgrad = mode.endswith("d") and mode != "none"
    if dgrad:
        if mode not in ("w8a8d", "w8a8rd"):
            raise ValueError(
                f"--quantize {mode}: the 'd' (quantized-dgrad) suffix "
                f"composes only with per-channel w8a8 (w8a8d|w8a8rd)")
        mode = mode[:-1]
    bits4 = mode in ("int4", "w4a8", "int4r", "w4a8r")
    return {
        "quantized": mode != "none",
        "act_quant": mode.startswith(("w8a8", "w4a8")),
        "weight_bits": 4 if bits4 else 8,
        "quant_group": 128 if (bits4 or mode[-1:] in ("g", "o")) else 0,
        "quant_outliers": mode.endswith("o"),
        "rotated": mode.endswith("r"),
        "dgrad_quant": dgrad,
    }


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. Axis sizes of 1 collapse to pure data parallel.

    The reference is data-parallel only (SURVEY.md §2); tensor parallelism is
    exposed here as an optional `tp` axis whose shardings reuse the reference
    checkpoint split-dim table (llama_vqa.py:42-58). `sp` additionally shards
    the SEQUENCE dim of the residual stream (GSPMD sequence/context
    parallelism, core/mesh.py) — the long-context axis: activation residency
    per chip scales 1/sp, which is what bounds S≥4096 training on 16 GB
    chips (docs/PERF.md). `pp` partitions the LAYER stack into pipeline
    stages (model/pipeline.py): block params are stored stacked
    (n_layers, ...) and sharded over 'pp'; a partial-auto shard_map'd GPipe
    schedule rotates microbatch activations through the stages via ppermute
    — the capacity axis for models whose weights exceed one chip (33B/65B).
    pp composes with dp, tp (stacked kernels shard P('pp', None, 'tp')),
    and sp (sequence sharding rides GSPMD inside the stage bodies with
    einsum attention).
    """

    dp: int = -1  # -1: all remaining devices
    pp: int = 1
    sp: int = 1
    tp: int = 1
    # microbatches per pipeline round-trip (0 → pp): the bubble fraction is
    # (pp-1)/(microbatches+pp-1), so more microbatches amortize it
    pp_microbatches: int = 0


@dataclass
class RunConfig:
    """Top-level bundle handed to the trainer/CLI."""

    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    llama_model_path: str = "./pretrained/llama/"
    model_name: str = "llama7B"
    tokenizer_path: str = ""
    debug: bool = False


def get_args_parser() -> argparse.ArgumentParser:
    """CLI flags with names matching the reference (train.py:24-75) so the
    reference's run scripts translate one-to-one."""
    p = argparse.ArgumentParser("flipped_tpu training", add_help=False)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--epochs", default=5, type=int)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--llama_model_path", default="./pretrained/llama/", type=str)
    p.add_argument("--tokenizer_path", default="", type=str,
                   help="explicit tokenizer.model path (default: "
                        "<llama_model_path>/tokenizer.model)")
    p.add_argument("--model", default="llama7B", type=str)
    p.add_argument("--adapter_layer", type=int, default=32)
    p.add_argument("--adapter_len", type=int, default=10)
    p.add_argument("--max_seq_len", type=int, default=128)
    p.add_argument("--max_feats", type=int, default=10)
    p.add_argument("--weight_decay", type=float, default=0.14)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--blr", type=float, default=9e-2)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=float, default=2.0)
    p.add_argument("--dataset", default="nextqa", type=str)
    p.add_argument("--data_root", default="./data", type=str)
    p.add_argument("--output_dir", default="./output_dir")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--num_workers", default=2, type=int)
    p.add_argument("--vaq", action="store_true")
    p.add_argument("--qav", action="store_true")
    p.add_argument("--bias", type=float, default=3.0)
    p.add_argument("--tau", type=float, default=100.0)
    p.add_argument("--sub", action="store_true")
    p.add_argument("--is_generation_task", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--audio", action="store_true")
    p.add_argument("--audio_only", action="store_true")
    p.add_argument("--audio_merge", type=str, default="none",
                   choices=["sum", "concat", "attention", "none"])
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel mesh axis: splits the layer stack "
                        "into pp stages (stacked per-stage weights, "
                        "shard_map'd GPipe microbatch schedule) — the "
                        "capacity axis when the frozen backbone exceeds one "
                        "chip. Composes with dp, tp, and sp")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="microbatches per pipeline round-trip (0 → pp); "
                        "bubble fraction is (pp-1)/(M+pp-1)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel mesh axis: shards the residual "
                        "stream's sequence dim (activation residency per "
                        "chip scales 1/sp — the long-context axis)")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--trace_dir", default="",
                   help="write a jax.profiler trace of early train steps")
    p.add_argument("--loader", default="thread", choices=["thread", "grain"],
                   help="input pipeline backend")
    p.add_argument("--remat_policy", default="full", choices=["full", "qkv"],
                   help="'qkv' saves attention q/k/v+out (no attention "
                        "recompute; +~2.4GB at 7B) — use when HBM allows")
    p.add_argument("--remat_group", type=int, default=1,
                   help="checkpoint every N consecutive blocks as one remat "
                        "unit (fewer saved boundaries, same recompute "
                        "FLOPs) — 2 fits the 7B 16k-context recipe")
    p.add_argument("--quantize", default="none",
                   choices=["none", "int8", "w8a8", "int8g", "w8a8g",
                            "int8o", "w8a8o", "int8r", "w8a8r",
                            "int4", "w4a8", "int4r", "w4a8r",
                            "w8a8d", "w8a8rd"],
                   help="int8: weight-only quantization of the frozen "
                        "backbone (halves its HBM); w8a8: additionally "
                        "quantize activations per token and run block "
                        "matmuls as int8×int8 on the MXU (2× rate); the "
                        "'g' variants use grouped (128-wide sub-channel) "
                        "scales — outlier-robust, slightly slower; the "
                        "'o' variants add a dense bf16 passthrough of the "
                        "~0.8% largest-absmax input rows on top of grouped "
                        "scales (LLM.int8()-style mixed decomposition); "
                        "the 'r' variants instead fold a residual-stream "
                        "rotation into the checkpoint (QuaRot-style "
                        "incoherence, ckpt/rotate.py) and keep PLAIN absmax "
                        "scales — outlier-immune at full w8a8 speed; "
                        "recommended for real trained checkpoints; "
                        "int4/w4a8: packed 4-bit frozen weights with "
                        "grouped scales (backbone 12.6→3.2 GB at 7B, the "
                        "QLoRA regime — frozen backbone, f32 adapters), "
                        "LM head stays int8; int4r/w4a8r compose with the "
                        "rotation fold")
    p.add_argument("--lm_head_chunk", type=int, default=0,
                   help="compute the LM-head cross-entropy in sequence "
                        "chunks of this size instead of materializing "
                        "(rows, S, vocab) logits — needed for the "
                        "3-objective stack at long context (e.g. 512 at "
                        "S=4096); 0 = dense")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--no_flash", action="store_true")
    p.add_argument("--clip_grad", type=float, default=None)
    return p


def validate_audio_flags(audio: bool, audio_only: bool, audio_merge: str) -> Optional[str]:
    """Audio-flag consistency (reference: train.py:154-168). Returns the
    resolved merge mode for ModelConfig.audio_merge."""
    if audio_only and not audio:
        raise ValueError("audio_only requires audio")
    if audio and audio_only:
        if audio_merge not in ("none", None):
            raise ValueError("audio_only must not specify a merge method")
        return "audio_only"
    if audio:
        if audio_merge not in ("sum", "concat", "attention"):
            raise ValueError("audio without audio_only requires a merge method")
        return audio_merge
    return None


def run_config_from_args(args: argparse.Namespace) -> RunConfig:
    merge = validate_audio_flags(args.audio, args.audio_only, args.audio_merge)
    name = args.model.replace("_adapter", "")
    if name not in MODEL_PRESETS:
        raise ValueError(
            f"unknown --model '{args.model}' — choose from "
            f"{sorted(MODEL_PRESETS)} (a silent 7B fallback would build the "
            f"wrong architecture)")
    preset = MODEL_PRESETS[name]
    model = ModelConfig(
        max_seq_len=args.max_seq_len,
        adapter_len=args.adapter_len,
        adapter_layer=args.adapter_layer,
        max_feats=args.max_feats,
        bias=args.bias,
        tau=args.tau,
        audio_merge=merge,
        **preset,
    )
    data = DataConfig(
        dataset=args.dataset, data_root=args.data_root,
        batch_size=args.batch_size, max_seq_len=args.max_seq_len,
        max_feats=args.max_feats, num_workers=args.num_workers, sub=args.sub,
        audio=args.audio, audio_only=args.audio_only,
        audio_merge=args.audio_merge,
        is_generation_task=args.is_generation_task, seed=args.seed,
    )
    train = TrainConfig(
        epochs=args.epochs, warmup_epochs=args.warmup_epochs,
        accum_iter=args.accum_iter, blr=args.blr, lr=args.lr,
        min_lr=args.min_lr, weight_decay=args.weight_decay, vaq=args.vaq,
        qav=args.qav, is_generation_task=args.is_generation_task,
        seed=args.seed, output_dir=args.output_dir, resume=args.resume,
        start_epoch=args.start_epoch, clip_grad=args.clip_grad,
        remat=not args.no_remat, flash_attention=not args.no_flash,
        remat_policy=args.remat_policy, quantize=args.quantize,
        remat_group=args.remat_group,
        lm_head_chunk=args.lm_head_chunk,
    )
    mesh = MeshConfig(dp=args.dp, pp=getattr(args, "pp", 1), sp=args.sp,
                      tp=args.tp,
                      pp_microbatches=getattr(args, "pp_microbatches", 0))
    return RunConfig(model=model, data=data, train=train, mesh=mesh,
                     llama_model_path=args.llama_model_path,
                     tokenizer_path=args.tokenizer_path,
                     model_name=args.model, debug=args.debug)
