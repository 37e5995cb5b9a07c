"""Donation/layout audit of the w8a8 default's copy bucket (VERDICT r04 #6).

docs/PERF.md attributes the default's 21.1 ms copy bucket to operand
re-tiling around the seven quantized matmuls — "nothing is a single
removable buffer". Before accepting that as floor, this probe asks XLA
itself: compile the SAME train step with the frozen int8 weight streams'
input layouts left to the compiler (``Format(Layout.AUTO)``,
jax.experimental.layout) instead of JAX's default row-major, device_put the
weights into whatever XLA chose, and time both executables back to back.

If XLA:TPU picks non-default layouts for the (K, N) int8 kernels, the
re-tiling copies become a one-time host-side transform and the step gets
faster; if it keeps row-major everywhere, the copy bucket is confirmed
layout-optimal and the floor argument stands with numbers.

Run (TPU):
    python scripts/layout_probe.py --preset 7b --quantize w8a8 --steps 20

Timing protocol follows bench.py: salted inputs (the relay content-caches
execution results across processes) + donated-buffer chaining with one
terminal host fetch inside the timed window.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="7b")
    ap.add_argument("--quantize", default="w8a8")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    from bench import PRESETS
    from flipped_tpu.ckpt.quantize import randomize_quantized
    from flipped_tpu.core.config import TrainConfig, quant_flags
    from flipped_tpu.data import add_accum_axis, make_synthetic_items, \
        pack_train_batch
    from flipped_tpu.model import FlippedVQAModel
    from flipped_tpu.text import MockTokenizer
    from flipped_tpu.train import (cast_partitions, make_optimizer,
                                   make_train_step, partition_params)

    cfg = PRESETS[args.preset]
    on_tpu = jax.default_backend() == "tpu"
    tok = MockTokenizer(cfg.vocab_size)
    model = FlippedVQAModel(cfg, use_flash=on_tpu,
                            **quant_flags(args.quantize))

    b = args.batch
    items = make_synthetic_items(tok, b, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len,
                                 visual_dim=cfg.visual_dim,
                                 seed=int.from_bytes(os.urandom(4), "little"))
    batch = pack_train_batch(items, cfg.max_feats)

    print(f"[layout] init {args.preset} on {jax.devices()[0].device_kind}…",
          file=sys.stderr)
    init_batch = {k: jnp.array(v[:1]) for k, v in batch.items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), init_batch["vqa_tokens"], init_batch["video"],
        None, init_batch["vqa_video_start"], init_batch["vqa_splice"])["params"]
    trainable, frozen = partition_params(params)
    trainable, frozen = cast_partitions(trainable, frozen)
    frozen = randomize_quantized(frozen, seed=1)

    tcfg = TrainConfig(epochs=5, warmup_epochs=2, accum_iter=1, blr=9e-2,
                       weight_decay=0.14, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=100, world_batch=b)
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, vaq=True, qav=True)
    batch = {k: jnp.array(v) for k, v in add_accum_axis(batch, 1).items()}

    def timed(run, tr, opt):
        for _ in range(args.warmup):
            tr, opt, m = run(tr, opt)
        float(m.loss)  # host fetch: the relay only truly waits on a fetch
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tr, opt, m = run(tr, opt)
        float(m.loss)
        return (time.perf_counter() - t0) / args.steps, float(m.loss)

    def fresh():
        # trainable/opt_state are donated by the step — each leg gets copies
        # (small: f32 adapters + moments; the 13 GB frozen tree is shared)
        return (jax.tree_util.tree_map(jnp.array, trainable),
                jax.tree_util.tree_map(jnp.array, opt_state))

    # --- leg 1: default layouts (the shipping jit path) ----------------------
    print("[layout] compiling default-layout step…", file=sys.stderr)
    t0 = time.perf_counter()
    tr, opt = fresh()
    tr, opt, m = step(tr, opt, frozen, batch)
    float(m.loss)
    print(f"[layout] default compile+first {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    dt_def, loss_def = timed(lambda a, c: step(a, c, frozen, batch), tr, opt)

    # --- leg 2: XLA-chosen (AUTO) layouts for the frozen weight stream -------
    from jax.experimental.layout import Format, Layout

    inner = step.__wrapped__ if hasattr(step, "__wrapped__") else None
    if inner is None:  # make_train_step returns the jitted fn directly
        # re-derive the undecorated function by rebuilding with jit stripped:
        # jax.jit objects keep the original under ._fun in 0.9 — fall back to
        # calling jit again over the jitted fn (jit-of-jit is flattened).
        inner = step
    auto_frozen = jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), frozen)
    jit_auto = jax.jit(inner,
                       in_shardings=(None, None, auto_frozen, None),
                       donate_argnums=(0, 1))
    print("[layout] compiling AUTO-layout step…", file=sys.stderr)
    t0 = time.perf_counter()
    lowered = jit_auto.lower(trainable, opt_state, frozen, batch)
    compiled = lowered.compile()
    print(f"[layout] AUTO compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    in_fmts = compiled.input_formats
    # input_formats mirrors the arg pytree ((trainable, opt, frozen, batch))
    frz_fmts = in_fmts[0][2]
    flat_f, tdef = jax.tree_util.tree_flatten(frozen)
    flat_fmt = jax.tree_util.tree_leaves(frz_fmts)
    nondefault = []
    for leaf, fmt in zip(flat_f, flat_fmt):
        lay = fmt.layout if hasattr(fmt, "layout") else fmt
        mtm = getattr(lay, "major_to_minor", None)
        tiling = getattr(lay, "tiling", None)
        default = tuple(range(leaf.ndim))
        if mtm is not None and (tuple(mtm) != default or tiling):
            nondefault.append((leaf.shape, str(leaf.dtype), str(lay)))
    print(f"[layout] XLA chose non-default layouts for "
          f"{len(nondefault)}/{len(flat_f)} frozen leaves", file=sys.stderr)
    for s, d, l in nondefault[:12]:
        print(f"    {d}{list(s)} -> {l}", file=sys.stderr)

    # Move the frozen tree into the AUTO layouts LEAF-WISE, deleting each
    # source buffer as soon as its copy lands: a whole-tree device_put
    # holds two full weight sets (2×7 GB at 7B w8a8) and OOMs a 16 GB chip
    # alongside the leg-1 executable's reservations.
    tr, opt = None, None  # drop leg-1 donated-chain outputs
    flat_frozen, fdef = jax.tree_util.tree_flatten(frozen)
    del frozen
    flat_fmts2 = jax.tree_util.tree_leaves(frz_fmts)
    moved = []
    for leaf, fmt in zip(flat_frozen, flat_fmts2):
        new = jax.device_put(leaf, fmt)
        jax.block_until_ready(new)
        leaf.delete()
        moved.append(new)
    del flat_frozen
    frozen_auto = jax.tree_util.tree_unflatten(fdef, moved)
    tr2, opt2 = fresh()
    t0 = time.perf_counter()
    tr2, opt2, m2 = compiled(tr2, opt2, frozen_auto, batch)
    float(m2.loss)
    print(f"[layout] AUTO first step {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    dt_auto, loss_auto = timed(
        lambda a, c: compiled(a, c, frozen_auto, batch), tr2, opt2)

    print(json.dumps({
        "metric": "layout_probe_step_time_s",
        "preset": args.preset, "quantize": args.quantize,
        "default_s": round(dt_def, 4), "auto_s": round(dt_auto, 4),
        "speedup": round(dt_def / dt_auto, 4),
        "nondefault_layouts": len(nondefault),
        "frozen_leaves": len(flat_f),
        "loss_default": round(loss_def, 4), "loss_auto": round(loss_auto, 4),
    }))


if __name__ == "__main__":
    main()
