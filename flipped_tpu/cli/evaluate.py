"""Evaluation-only CLI: load an adapter checkpoint and score a split.

    python -m flipped_tpu.cli.evaluate --model llama7B --dataset nextqa \
        --resume checkpoint_best --output_dir ./output_dir/nextqa

The reference has no standalone eval entrypoint (validation only runs inside
train.py's epoch loop); this covers the deploy/serve use of a trained
adapter: classification scoring or generation matching on val/test data.
"""
from __future__ import annotations

import json
import os

import jax


from ..ckpt.manager import CheckpointManager
from ..core.config import get_args_parser, run_config_from_args
from ..core.distributed import init_distributed_mode
from ..core.mesh import loader_shards, make_mesh, param_shardings
from ..data.pipeline import load_data
from ..train.builder import build_train_state
from ..train.generation import make_generation_step
from ..train.optim import make_optimizer
from ..train.step import make_eval_step
from ..utils.logging import setup_for_distributed
from .train import val_one_epoch


def main(args):
    init_distributed_mode()
    setup_for_distributed()
    run_cfg = run_config_from_args(args)
    mesh = make_mesh(run_cfg.mesh)

    model, cfg, tokenizer, trainable, frozen = build_train_state(run_cfg)
    # jax.set_mesh (not the legacy `with mesh:`): the sequence-parallel
    # attention path resolves shard_map's mesh from this context
    with jax.set_mesh(mesh):
        # same sharding policy as cli/train.py: TP rules on the frozen
        # backbone, replication everywhere else
        trainable = jax.device_put(trainable, param_shardings(mesh, trainable))
        frozen = jax.device_put(frozen, param_shardings(mesh, frozen))

        if run_cfg.train.resume:
            mgr = CheckpointManager(run_cfg.train.output_dir)
            tx = make_optimizer(run_cfg.train, 1, run_cfg.data.batch_size)
            opt_state = tx.init(trainable)
            trainable, _, meta = mgr.restore(run_cfg.train.resume, trainable,
                                             opt_state)
            print(f"loaded {run_cfg.train.resume} "
                  f"(epoch {meta['epoch']}, best_acc {meta['best_acc']:.4f})")

        shard_idx, n_shards = loader_shards(mesh)
        loader_val = load_data(run_cfg.data, tokenizer, "val",
                               backend=getattr(args, "loader", "thread"),
                               process_index=shard_idx,
                               process_count=n_shards)
        # same setup-time span pinning as cli/train.py: multi-process eval
        # runs with zero per-batch collectives
        span_pin = None
        if not run_cfg.train.is_generation_task:
            from ..data.pipeline import pinned_eval_span
            span_pin = pinned_eval_span(loader_val.dataset,
                                        run_cfg.data.max_seq_len)
        # the cached scorer works under --pp too (pipelined prefill/extend
        # with a pp-sharded cache — same policy as cli/train.py)
        eval_step = make_eval_step(model, cached=True, span_len=span_pin)
        gen_step = (make_generation_step(model, tokenizer.eos_id)
                    if run_cfg.train.is_generation_task else None)
        stats = val_one_epoch(tokenizer, eval_step, gen_step,
                              trainable, frozen, loader_val, 0, mesh,
                              run_cfg, args)
        print(json.dumps({f"val_{k}": v for k, v in stats.items()}))
        return stats


if __name__ == "__main__":
    main(get_args_parser().parse_args())
