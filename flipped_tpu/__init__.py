"""flipped_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-QA fine-tuning framework.

Re-designed from scratch with the capabilities of Flipped-VQA (EMNLP 2023,
arXiv:2310.15747): a frozen LLaMA backbone with learnable adapter prompt
prefixes, zero-init tanh attention gates, projected CLIP-ViT-L/14 video (and
optional ImageBind audio) features spliced into the token stream, and three
flipped training objectives (VQA, VAQ, QAV).

Layer map (see SURVEY.md for the reference analysis):
  core/   config dataclasses, device mesh + sharding rules, dtype policy
  text/   tokenizer backends + pure prompt encoders + label-mask builders
  data/   dataset readers (7 benchmarks), feature stores, batch pipeline
  model/  Flax LLaMA with adapter-gated attention; Pallas flash kernels
  ckpt/   torch-checkpoint converter (offline) + Orbax train checkpoints
  train/  jit train/eval steps, optax optimizer, trainer loop, generation
  utils/  metrics, qtype accuracy buckets, JSON-lines logging
  cli/    train entrypoint mirroring the reference CLI surface
"""

__version__ = "0.1.0"
