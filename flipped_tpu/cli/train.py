"""Training CLI — the reference's train.py + engine.py as one entrypoint.

Run:  python -m flipped_tpu.cli.train --dataset nextqa --batch_size 8
          --max_seq_len 128 --vaq --qav --bias 3.5 --tau 100 --blr 9e-2 …

Control flow mirrors the reference (train.py:78-152): distributed init →
loaders → model build → optimizer → epoch loop {train_one_epoch,
val_one_epoch, best-acc checkpoint, JSON-lines log}. Differences are
TPU-native: GSPMD mesh instead of DDP/NCCL, no grad scaler (bf16), and the
jit steps carry grad accumulation inside (engine.py:37-41 semantics).
"""
from __future__ import annotations

import math
import os
import sys
import time
from typing import Dict

import numpy as np

import jax

from ..ckpt.manager import CheckpointManager
from ..core.config import get_args_parser, run_config_from_args
from ..core.distributed import init_distributed_mode
from ..core.mesh import (DP_AXIS, loader_shards, make_mesh, param_shardings,
                         replicated)
from ..data.pipeline import load_data
from ..train.builder import build_train_state
from ..train.generation import decode_generated, make_generation_step
from ..train.optim import lr_schedule, make_optimizer
from ..train.step import make_eval_step, make_train_step, required_eval_span
from ..utils.logging import (save_result, setup_for_distributed,
                             write_log_line)
from ..utils.metrics import MetricLogger, SmoothedValue, log_qtype


def _shard_batch(batch: Dict[str, np.ndarray], mesh, train: bool):
    """dp-shard the batch axis (axis 1 under the accum axis for training,
    axis 0 for eval); scalars replicate.

    Multi-process: each process's loader yields only its OWN shard of the
    global batch (DistributedSampler semantics, reference:
    dataloader/__init__.py:21), so the global array is assembled from
    process-local data — the per-process rows land on that process's dp
    slots of the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    multi = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if (k in ("valid", "answer", "qtype", "gt_answer", "qid")
                or not isinstance(v, np.ndarray) or np.ndim(v) == 0):
            continue
        spec = P(None, DP_AXIS) if train else P(DP_AXIS)
        if np.ndim(v) < (2 if train else 1):
            spec = P()
        sharding = NamedSharding(mesh, spec)
        if multi:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def _fetch_local_rows(x, n_rows: int, shard_index: int = None) -> np.ndarray:
    """Host-fetch this loader-shard's rows of a jit output whose leading axis
    is the (possibly process-sharded) batch axis. Single-process: plain
    np.asarray. Multi-process: concatenate the addressable shards (each
    loader shard's rows live on its dp-group's devices), deduping replicas
    (tp); for fully-replicated outputs, slice this shard's contiguous block.
    `shard_index` is the loader's dp-group shard (loader_shards), which
    differs from process_index when tp spans process boundaries."""
    if jax.process_count() == 1:
        return np.asarray(x)
    if x.is_fully_replicated:
        g = np.asarray(x)
        p = jax.process_index() if shard_index is None else shard_index
        return g[p * n_rows:(p + 1) * n_rows]
    seen, parts = set(), []
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start in seen:
            continue
        seen.add(start)
        parts.append((start, np.asarray(s.data)))
    parts.sort(key=lambda t: t[0])
    return np.concatenate([d for _, d in parts], axis=0)


def train_one_epoch(step, trainable, opt_state, frozen, loader, epoch, mesh,
                    args):
    """(reference: engine.py:10-56)"""
    logger = MetricLogger()
    logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
    print_freq = max(len(loader) // 4, 1)
    loader.set_epoch(epoch)

    trace_dir = getattr(args, "trace_dir", "")
    # trace the FIRST epoch actually run (works under --resume) and stop no
    # later than the final batch, so short epochs still produce a trace
    trace_this_epoch = trace_dir and epoch == getattr(args, "start_epoch", 0)
    trace_stop_it = min(4, max(len(loader) - 1, 1))
    tracing = False
    for it, batch in enumerate(logger.log_every(iter(loader), print_freq,
                                                f"Epoch: [{epoch}]")):
        if trace_this_epoch and it == 1:
            # skip step 0 (compile); trace a handful of steady-state steps
            jax.profiler.start_trace(trace_dir)
            tracing = True
        sharded = _shard_batch(batch, mesh, train=True)
        trainable, opt_state, m = step(trainable, opt_state, frozen, sharded)
        loss = float(m.loss)
        if tracing and it >= trace_stop_it:
            jax.profiler.stop_trace()
            tracing = False
            trace_this_epoch = False
        if not math.isfinite(loss):
            # (reference: engine.py:33-35)
            print(f"Loss is {loss}, stopping training")
            sys.exit(1)
        logger.update(loss=loss, vqa_loss=float(m.vqa_loss),
                      vaq_loss=float(m.vaq_loss), qav_loss=float(m.qav_loss),
                      grad_norm=float(m.grad_norm))
        logger.update(lr=float(m.lr))
        if args.debug:
            break
    logger.synchronize_between_processes()
    print("Averaged stats:", logger)
    return trainable, opt_state, logger.averages()


def val_one_epoch(tokenizer, eval_step, gen_step, trainable, frozen,
                  loader, epoch, mesh, run_cfg, args):
    """(reference: engine.py:59-145)"""
    logger = MetricLogger()
    print_freq = max(len(loader) // 4, 1)
    extracted_all = []
    dataset = run_cfg.data.dataset

    # loader shard coords (== dp-group shard; differs from process_index
    # when tp spans process boundaries, core/mesh.py:loader_shards). When
    # several processes share one loader shard, only the group leader
    # contributes extracted answers (the others would write duplicates);
    # metric meters update on every process — the duplication is uniform, so
    # synced averages are unchanged.
    pi = getattr(loader, "process_index", 0)
    pc = getattr(loader, "process_count", 1)
    shard_group = max(1, jax.process_count() // max(pc, 1))
    is_shard_leader = jax.process_index() % shard_group == 0
    for it, batch in enumerate(logger.log_every(iter(loader), print_freq,
                                                f"Epoch: [{epoch}]")):
        valid = int(batch.get("valid", batch["answer"].shape[0]))
        answer = batch["answer"][:valid]
        qtype = batch["qtype"][:valid]
        sharded = _shard_batch(
            {k: v for k, v in batch.items()
             if k not in ("answer", "qtype", "valid")}, mesh, train=False)

        n_local = batch["answer"].shape[0]
        if run_cfg.train.is_generation_task:
            out = gen_step(trainable, frozen, sharded)
            generated = _fetch_local_rows(out["generated"], n_local,
                                          pi)[:valid]
            prediction = _fetch_local_rows(out["prediction"], n_local,
                                           pi)[:valid]
            answers = [decode_generated(tokenizer, g, tokenizer.eos_id)
                       for g in generated]
            # real dataset row ids carried through the batch (pack_eval_batch
            # stamps item.qid) — correct under ANY loader order, shuffled or
            # Grain-reordered included; rank-merged answer files stay
            # disjoint because index SELECTION is sharded per process
            if is_shard_leader:
                qids = batch["qid"][:valid]
                extracted_all += [
                    {"qid": int(q), "generated_answer": a}
                    for q, a in zip(qids, answers)]
            if dataset == "musicavqa":
                # string-prefix match vs the single GT option
                # (reference: engine.py:100-116)
                gt = batch.get("gt_answer", [""] * valid)[:valid]
                correct = np.array(
                    [1.0 if a.startswith(str(g)) else 0.0
                     for a, g in zip(answers, gt)], np.float32)
            else:
                correct = (prediction == answer).astype(np.float32)
        else:
            # span from the loader's pack-time scalars — no device fetch, no
            # collective. Multi-process runs have the span PINNED into
            # eval_step at setup (dataset_eval_span, identical on every
            # process), which makes span_info ignored there; the allgather
            # fallback only fires in the defensively-impossible case of a
            # multi-process batch whose labels precede prefix.
            if eval_step.span_free:
                span_info = None  # dense scorer (e.g. --pp): no span at all
            elif "span_need" in batch and (jax.process_count() == 1
                                           or eval_step.span_pinned):
                span_info = (int(batch["span_need"]),
                             bool(batch["span_exact"]))
            else:
                span_info = required_eval_span(batch)
            out = eval_step(trainable, frozen, sharded, span_info=span_info)
            prediction = _fetch_local_rows(out["prediction"], n_local,
                                           pi)[:valid]
            correct = (prediction == answer).astype(np.float32)

        acc = float(correct.mean()) if valid else 0.0
        log_qtype(dataset, qtype, correct, logger)
        logger.update(n=valid, acc=acc)
        if args.debug:
            break

    logger.synchronize_between_processes()
    print("Averaged stats:", logger)
    if run_cfg.train.is_generation_task and run_cfg.train.output_dir:
        save_result(extracted_all,
                    os.path.join(run_cfg.train.output_dir,
                                 "extracted_answers"),
                    f"extracted_answers_epoch{epoch}")
    return logger.averages()


def main(args):
    init_distributed_mode()
    setup_for_distributed()

    run_cfg = run_config_from_args(args)
    print(f"job dir: {os.path.dirname(os.path.realpath(__file__))}")
    print(str(run_cfg).replace(", ", ",\n"))

    mesh = make_mesh(run_cfg.mesh)
    np.random.seed(run_cfg.train.seed + jax.process_index())

    model, cfg, tokenizer, trainable, frozen = build_train_state(run_cfg)
    # jax.set_mesh (not the legacy `with mesh:`): the sequence-parallel
    # attention path resolves shard_map's mesh from this context
    with jax.set_mesh(mesh):
        # TP-ruled shardings: the frozen backbone follows the reference
        # checkpoint's column/row split-dim table over the tp axis
        # (mesh.py:_TP_RULES); trainables (adapter/gates/projections) all
        # fall through to replication, so the optimizer state stays
        # replicated too. With tp=1 every rule degrades to replication.
        trainable = jax.device_put(trainable, param_shardings(mesh, trainable))
        frozen = jax.device_put(frozen, param_shardings(mesh, frozen))

        backend = getattr(args, "loader", "thread")
        shard_idx, n_shards = loader_shards(mesh)
        loader_train = load_data(run_cfg.data, tokenizer, "train",
                                 accum_iter=run_cfg.train.accum_iter,
                                 backend=backend, process_index=shard_idx,
                                 process_count=n_shards)
        loader_val = load_data(run_cfg.data, tokenizer, "val",
                               backend=backend, process_index=shard_idx,
                               process_count=n_shards)

        # examples per optimizer update (reference eff_bs = bs·accum·world,
        # train.py:104-107): batch_size is PER LOADER SHARD here — each
        # dp row-group's loader yields batch_size rows and dp-sharding
        # splits those rows over the group's share of the dp axis, so dp
        # must NOT be multiplied in again. n_shards == process_count except
        # when tp spans process boundaries (loader_shards).
        world_batch = (run_cfg.data.batch_size * run_cfg.train.accum_iter
                       * n_shards)
        print(f"effective batch size: {world_batch}")
        print(f"actual lr: {run_cfg.train.absolute_lr(world_batch):.2e}")

        steps_per_epoch = max(len(loader_train) * run_cfg.train.accum_iter, 1)
        lr_fn = lr_schedule(run_cfg.train, steps_per_epoch, world_batch)
        tx = make_optimizer(run_cfg.train, steps_per_epoch, world_batch)
        if run_cfg.mesh.pp > 1:
            # stacked per-layer trainables (gates) are sharded over 'pp' —
            # init under jit so the AdamW moments inherit those shardings
            opt_state = jax.jit(tx.init)(trainable)
        else:
            opt_state = tx.init(trainable)
            opt_state = jax.device_put(opt_state, replicated(mesh))

        train_step = make_train_step(model, tx, vaq=run_cfg.train.vaq,
                                     qav=run_cfg.train.qav, lr_fn=lr_fn,
                                     lm_chunk=run_cfg.train.lm_head_chunk)
        # multi-process: pin one dataset-level span at setup so the SPMD eval
        # program is identical on every process with ZERO per-batch
        # collectives (policy shared with cli/evaluate.py)
        span_pin = None
        if not run_cfg.train.is_generation_task:
            from ..data.pipeline import pinned_eval_span
            span_pin = pinned_eval_span(loader_val.dataset,
                                        run_cfg.data.max_seq_len)
            if span_pin is not None:
                print(f"eval span pinned: {span_pin}")
        # the cached scorer works under --pp too: PipelinedModel routes
        # prefill/extend through the GPipe schedule with a pp-sharded cache
        # (model/pipeline.py pipeline_prefill / pipeline_extend_logits)
        eval_step = make_eval_step(model, cached=True, span_len=span_pin)
        gen_step = (make_generation_step(model, tokenizer.eos_id)
                    if run_cfg.train.is_generation_task else None)

        mgr = CheckpointManager(run_cfg.train.output_dir)
        start_epoch, best_acc = run_cfg.train.start_epoch, 0.0
        if run_cfg.train.resume and mgr.exists(run_cfg.train.resume):
            trainable, opt_state, meta = mgr.restore(
                run_cfg.train.resume, trainable, opt_state)
            start_epoch = meta["epoch"] + 1
            best_acc = meta.get("best_acc", 0.0)
            print(f"resumed from {run_cfg.train.resume} at epoch {start_epoch}")

        print(f"Start training for {run_cfg.train.epochs} epochs")
        t_start = time.time()
        for epoch in range(start_epoch, run_cfg.train.epochs):
            trainable, opt_state, train_stats = train_one_epoch(
                train_step, trainable, opt_state, frozen, loader_train,
                epoch, mesh, args)
            val_stats = val_one_epoch(
                tokenizer, eval_step, gen_step, trainable, frozen,
                loader_val, epoch, mesh, run_cfg, args)

            # mgr.save is called on ALL processes — Orbax's multihost logic
            # elects the writer and barriers internally; val_stats are synced
            # so every process takes the same branch. (A process-0-only call
            # would deadlock Orbax's internal sync when process_count > 1.)
            if run_cfg.train.output_dir and best_acc < val_stats.get("acc", 0):
                best_acc = val_stats["acc"]
                mgr.save("checkpoint_best", trainable, opt_state, epoch,
                         best_acc)
                print(f"saved checkpoint_best (acc={best_acc:.4f})")
            if run_cfg.train.output_dir:
                # preemption-safe rolling checkpoint (adapter-only, ~MBs) —
                # an addition over the reference's best-only policy
                # (SURVEY.md §5: no elastic recovery in the reference)
                mgr.save("checkpoint_last", trainable, opt_state, epoch,
                         best_acc)

            log_stats = {**{f"train_{k}": v for k, v in train_stats.items()},
                         "epoch": epoch,
                         **{f"val_{k}": v for k, v in val_stats.items()}}
            write_log_line(run_cfg.train.output_dir, log_stats)
            if args.debug:
                break

        print(f"Training time {time.time() - t_start:.0f}s, "
              f"best acc {best_acc:.4f}")
        return best_acc


if __name__ == "__main__":
    parser = get_args_parser()
    main(parser.parse_args())
