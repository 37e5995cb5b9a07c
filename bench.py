"""Benchmark: NExT-QA LLaMA-7B fine-tune train-step throughput on one chip.

Measures the reference's headline configuration (README.md:62-64: 7B,
max_seq_len 128, max_feats 10, --vaq --qav triple objective) as
examples/sec/chip and MFU, printing ONE JSON line.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md), so the driver-set north star is used: measured MFU / 0.45
(the ≥45%-MFU target on TPU).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from flipped_tpu.core.config import ModelConfig, TrainConfig
from flipped_tpu.data import add_accum_axis, make_synthetic_items, pack_train_batch
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.text import MockTokenizer
from flipped_tpu.train import (make_optimizer, make_train_step,
                               cast_partitions, partition_params)

PRESETS = {
    "7b": ModelConfig(dim=4096, n_layers=32, n_heads=32, vocab_size=32000,
                      multiple_of=256, max_seq_len=128, adapter_len=10,
                      adapter_layer=32, max_feats=10, bias=3.5, tau=100.0),
    # TVQA long-context recipe (reference: README.md:94-96 — seq 650, bs 1)
    "7b_tvqa": ModelConfig(dim=4096, n_layers=32, n_heads=32,
                           vocab_size=32000, multiple_of=256,
                           max_seq_len=650, adapter_len=10, adapter_layer=32,
                           max_feats=10, bias=3.0, tau=100.0),
    # DramaQA recipe (reference: README.md:78-80 — seq 384, bs 2, bias 3)
    "7b_dramaqa": ModelConfig(dim=4096, n_layers=32, n_heads=32,
                              vocab_size=32000, multiple_of=256,
                              max_seq_len=384, adapter_len=10,
                              adapter_layer=32, max_feats=10, bias=3.0,
                              tau=100.0),
    # VLEP recipe (reference: README.md:86-88 — seq 256, bs 4)
    "7b_vlep": ModelConfig(dim=4096, n_layers=32, n_heads=32,
                           vocab_size=32000, multiple_of=256,
                           max_seq_len=256, adapter_len=10, adapter_layer=32,
                           max_feats=10, bias=3.0, tau=100.0),
    # Long-context synthetic row: S=4096 exceeds both single-pass kernel
    # design points (MAX_SEQ_FWD/BWD), so the streaming online-softmax
    # Pallas kernels carry the whole step — no reference recipe reaches
    # this length (max S=650, README.md:94-96); this measures the rebuild's
    # removal of the O(S²) ceiling (SURVEY §5)
    "7b_s4k": ModelConfig(dim=4096, n_layers=32, n_heads=32,
                          vocab_size=32000, multiple_of=256,
                          max_seq_len=4096, adapter_len=10, adapter_layer=32,
                          max_feats=10, bias=3.0, tau=100.0),
    # S=8192: double the s4k row — streaming kernels have no design bound;
    # fits a 16 GB chip only with full remat + --vqa_only + --lm_head_chunk
    "7b_s8k": ModelConfig(dim=4096, n_layers=32, n_heads=32,
                          vocab_size=32000, multiple_of=256,
                          max_seq_len=8192, adapter_len=10, adapter_layer=32,
                          max_feats=10, bias=3.0, tau=100.0),
    # S=16384: the capacity composition row — packed int4 weights (3.6 GB)
    # + full remat + chunked LM-head CE leave the 16 GB chip to the
    # streaming kernels' S-linear activations (~4.3 GB of block inputs)
    "7b_s16k": ModelConfig(dim=4096, n_layers=32, n_heads=32,
                           vocab_size=32000, multiple_of=256,
                           max_seq_len=16384, adapter_len=10,
                           adapter_layer=32, max_feats=10, bias=3.0,
                           tau=100.0),
    # 13B (reference 13B runs use --adapter_layer 40, run-nextqa13B-array.sh)
    "13b": ModelConfig(dim=5120, n_layers=40, n_heads=40, vocab_size=32000,
                       multiple_of=256, max_seq_len=128, adapter_len=10,
                       adapter_layer=40, max_feats=10, bias=3.5, tau=100.0),
    "small": ModelConfig(dim=512, n_layers=4, n_heads=8, vocab_size=32000,
                         multiple_of=256, max_seq_len=128, adapter_len=10,
                         adapter_layer=4, max_feats=10),
    "tiny": ModelConfig(dim=64, n_layers=2, n_heads=4, vocab_size=512,
                        multiple_of=32, max_seq_len=128, adapter_len=10,
                        adapter_layer=2, max_feats=10, visual_dim=16),
}

# bf16 peak FLOPs per chip by TPU generation (for MFU).
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v6 lite": 918e12,   # v6e (Trillium)
    "cpu": 1e12,
}


def _hbm_extra() -> dict:
    """{'hbm_live_gib', 'hbm_peak_gib'} when the backend reports HBM stats
    (reference logs max GPU memory per print, util/misc.py:162-170)."""
    from flipped_tpu.utils.metrics import device_memory_gib

    mem = device_memory_gib()
    if mem is None:
        return {}
    return {"hbm_live_gib": round(mem[0], 3), "hbm_peak_gib": round(mem[1], 3)}


def peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return PEAK_FLOPS["cpu"]


def train_step_flops(cfg: ModelConfig, n_seqs_lm: int, n_seqs_total: int,
                     s: int) -> float:
    """Analytic model FLOPs for one fused train step (fwd + frozen bwd).

    Backbone matmul flops per token per layer: QKVO 8·D² + SwiGLU 6·D·Hf,
    attention 4·S·D (scores+PV, causal halves it → 2·S·D effective; we count
    the dense 4·S·D the kernel actually performs). LM head 2·D·V on VQA/VAQ
    rows only. Backward through frozen weights costs ≈1× forward (activation
    grads only, no weight-grad matmuls for the frozen 7B) → ×2 total.
    """
    d, hf, v, l = cfg.dim, cfg.ffn_hidden, cfg.vocab_size, cfg.n_layers
    per_tok_layer = 8 * d * d + 6 * d * hf + 4 * s * d
    backbone = n_seqs_total * s * l * per_tok_layer
    head = n_seqs_lm * s * 2 * d * v
    return 2.0 * (backbone + head)


def bench_eval(args, cfg, model, trainable, frozen, tok):
    """Classification-eval throughput: dense per-option forwards vs the
    prefix-shared cached scorer."""
    from flipped_tpu.data import pack_eval_batch
    from flipped_tpu.train import make_eval_step

    # distinct, per-run-unique batches — this environment's TPU relay caches
    # execution RESULTS content-addressed across processes, which fakes
    # sub-ms step times for any previously-seen (program, inputs) pair
    nonce = int.from_bytes(os.urandom(4), "little")
    batches = []
    span = 1
    # one EXTRA batch for warmup: the relay content-caches results, so the
    # timed loop must never resubmit the warmed (program, inputs) pair
    for i in range(args.steps + 1):
        items = make_synthetic_items(tok, args.batch, max_feats=cfg.max_feats,
                                     max_seq_len=cfg.max_seq_len, split="val",
                                     visual_dim=cfg.visual_dim,
                                     seed=nonce + i)
        batch = pack_eval_batch(items, cfg.max_feats)
        assert bool(batch["span_exact"])  # pack-time scalars, host-side
        span = max(span, int(batch["span_need"]))
        batches.append({k: jnp.array(v) for k, v in batch.items()
                        if isinstance(v, np.ndarray)
                        and k not in ("answer", "qtype", "qid",
                                      "span_need", "span_exact")})
    span = -(-span // 8) * 8  # pin one compile shape across all batches

    results = {}
    for name, cached in (("cached", True), ("dense", False)):
        step = make_eval_step(model, cached=cached,
                              span_len=span if cached else None)
        out = step(trainable, frozen, batches[-1])
        float(out["scores"].sum())  # block_until_ready doesn't truly wait
        t0 = time.perf_counter()    # on this env's relay; a host fetch does
        for jb in batches[:-1]:     # warmed batch excluded (relay-cached)
            out = step(trainable, frozen, jb)
            float(out["scores"].sum())
        results[name] = (time.perf_counter() - t0) / args.steps
        print(f"[bench] eval {name}: {results[name]:.4f}s/batch",
              file=sys.stderr)

    speedup = results["dense"] / results["cached"]
    print(json.dumps({
        "metric": f"nextqa_{args.preset}_eval_examples_per_sec_per_chip",
        "value": round(args.batch / results["cached"], 3),
        "unit": "examples/s/chip",
        "vs_baseline": round(speedup, 3),
        "extra": {"cached_s": round(results["cached"], 4),
                  "dense_s": round(results["dense"], 4),
                  "cached_vs_dense_speedup": round(speedup, 3),
                  "batch": args.batch, "n_options": 5,
                  "seq_len": cfg.max_seq_len,
                  "device": jax.devices()[0].device_kind,
                  **_hbm_extra()},
    }))


def bench_generation(args, cfg, model, trainable, frozen, tok):
    """Generation-eval throughput: batched prefill + 31 KV-cached decode
    steps (the reference re-runs the full O(S²) forward per token per
    example, model.py:429-442 — ~31·S/(S+31) ≈ 25× more attention-layer
    work at S=128)."""
    from flipped_tpu.data import pack_eval_batch
    from flipped_tpu.train.generation import make_generation_step

    nonce = int.from_bytes(os.urandom(4), "little")
    batches = []
    # extra batch for warmup — see bench_eval's relay-caching note
    for i in range(args.steps + 1):
        items = make_synthetic_items(tok, args.batch, max_feats=cfg.max_feats,
                                     max_seq_len=cfg.max_seq_len, split="val",
                                     visual_dim=cfg.visual_dim,
                                     seed=nonce + i)
        batch = pack_eval_batch(items, cfg.max_feats)
        batches.append({k: jnp.array(v) for k, v in batch.items()
                        if isinstance(v, np.ndarray)
                        and k not in ("answer", "qtype", "qid",
                                      "span_need", "span_exact")})

    from flipped_tpu.train.generation import MAX_NEW_TOKENS

    gen_step = make_generation_step(model, tok.eos_id)
    out = gen_step(trainable, frozen, batches[-1])
    int(out["generated"][0, 0])  # force completion (relay: fetch, not block)
    t0 = time.perf_counter()
    for jb in batches[:-1]:      # warmed batch excluded (relay-cached)
        out = gen_step(trainable, frozen, jb)
        int(out["generated"][0, 0])
    dt = (time.perf_counter() - t0) / args.steps

    extra = {"step_time_s": round(dt, 4), "new_tokens": MAX_NEW_TOKENS,
             "batch": args.batch, "seq_len": cfg.max_seq_len,
             "device": jax.devices()[0].device_kind, **_hbm_extra()}
    vs_baseline = 1.0
    if args.ref_style:
        ref_dt, agree = _ref_style_generation(args, model, trainable, frozen,
                                              batches, gen_step)
        vs_baseline = round(ref_dt / dt, 3)
        extra.update(ref_style_step_time_s=round(ref_dt, 4),
                     kv_cache_speedup=vs_baseline,
                     greedy_token_agreement=round(agree, 4))
    print(json.dumps({
        "metric": f"nextqa_{args.preset}_generation_examples_per_sec_per_chip",
        "value": round(args.batch / dt, 3),
        "unit": "examples/s/chip",
        "vs_baseline": vs_baseline,
        "extra": extra,
    }))


def _ref_style_generation(args, model, trainable, frozen, batches, gen_step):
    """Time the reference's generation DESIGN on this chip: each of the 31
    token positions re-runs the full forward over the whole sequence
    (reference: model.py:429-442 — and the reference additionally loops per
    batch item; this batched version is GENEROUS to the baseline). Returns
    (s/batch, greedy-token agreement vs the KV-cached decode)."""
    from flipped_tpu.train import merge_params
    from flipped_tpu.train.generation import MAX_NEW_TOKENS

    @jax.jit
    def forward_logits_at(trainable, frozen, tokens, video, vstart, splice,
                          pos):
        params = {"params": merge_params(trainable, frozen)}
        vf = model.apply(params, video, None, method="fuse")
        h = model.apply(params, tokens, vf, vstart, splice, method="encode")
        h_at = jnp.take_along_axis(h, pos[:, None, None], axis=1)
        return model.apply(params, h_at, method="lm_logits")[:, 0]

    def run(jb):
        t = jb["vqa_tokens"][:, 0]
        prefix = jb["prefix"].astype(jnp.int32)
        cols = jnp.arange(t.shape[1])[None]
        outs = []
        for i in range(MAX_NEW_TOKENS):
            logits = forward_logits_at(trainable, frozen, t, jb["video"],
                                       jb["vqa_video_start"],
                                       jb["vqa_splice"], prefix - 1 + i)
            nxt = jnp.argmax(logits, -1).astype(t.dtype)
            outs.append(nxt)
            t = jnp.where(cols == (prefix + i)[:, None], nxt[:, None], t)
        return jnp.stack(outs, axis=1)  # (B, 31)

    assert len(batches) >= 2, "--ref_style needs --steps >= 2"
    gen_ref = run(batches[0])          # warm/compile on a distinct batch
    int(gen_ref[0, 0])
    n_timed = min(3, len(batches) - 1)
    t0 = time.perf_counter()
    for jb in batches[1:1 + n_timed]:
        gen_ref = run(jb)
        int(gen_ref[0, 0])
    ref_dt = (time.perf_counter() - t0) / n_timed

    # greedy-token agreement: the KV-cached decode must reproduce the
    # full-re-forward tokens (bf16 near-ties can differ on random weights)
    kv = np.asarray(gen_step(trainable, frozen,
                             batches[1])["generated"])
    agree = float((np.asarray(run(batches[1])) == kv).mean())
    print(f"[bench] ref-style {ref_dt:.3f}s/batch, kv agreement {agree:.4f}",
          file=sys.stderr)
    return ref_dt, agree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="7b", choices=list(PRESETS))
    # defaults = the fastest configuration measured on a 16 GB v5e that is
    # parity-validated vs bf16 at full 7B shape: w8a8 frozen backbone (int8
    # activations × int8 weights on the MXU's doubled int8 rate), per-chip
    # batch 8, no rematerialisation — 0.451 s/step, 91.3% bf16-equivalent
    # MFU. Evidence in docs/PERF.md: eval decisions flip only at statistical
    # ties (1,024-example study) AND 128-step training trajectories track
    # bf16 within ~0.1% relative loss. Fall-backs: --quantize int8 (73.8%
    # MFU), --quantize none --batch 4 --remat (best bf16, 57.8%).
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--remat", dest="remat", action="store_true")
    ap.add_argument("--no_remat", dest="remat", action="store_false")
    ap.set_defaults(remat=False)
    ap.add_argument("--remat_policy", default="qkv", choices=["full", "qkv"])
    ap.add_argument("--remat_group", type=int, default=1,
                    help="checkpoint every N blocks as one remat unit "
                         "(2 = the 16k-context capacity knob)")
    ap.add_argument("--quantize", default="w8a8",
                    choices=["none", "int8", "w8a8", "int8g", "w8a8g",
                             "int4", "w4a8", "int4r", "w4a8r",
                             "int8o", "w8a8o", "int8r", "w8a8r",
                             "w8a8d", "w8a8rd"])
    ap.add_argument("--mode", default="train",
                    choices=["train", "eval", "generation"])
    ap.add_argument("--ref_style", action="store_true",
                    help="generation mode: also time the reference's "
                         "full-re-forward-per-token design for an honest "
                         "vs_baseline (costs one extra compile)")
    ap.add_argument("--trace_dir", default="",
                    help="write a jax.profiler trace of the timed steps")
    ap.add_argument("--cost_analysis", action="store_true",
                    help="print XLA's compiled cost analysis (flops / bytes "
                         "accessed) for the train step — roofline-attribution "
                         "evidence when the TPU relay returns no "
                         "device-plane trace events")
    ap.add_argument("--lm_head_chunk", type=int, default=0,
                    help="chunked LM-head CE (0 = dense full-vocab logits)")
    ap.add_argument("--vqa_only", action="store_true",
                    help="train mode: VQA objective only (no VAQ/QAV "
                         "stack) — the long-context 7b_s4k row uses this "
                         "to fit 16 GB HBM at S=4096")
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    on_tpu = jax.default_backend() == "tpu"
    tok = MockTokenizer(cfg.vocab_size)
    from flipped_tpu.core.config import quant_flags
    model = FlippedVQAModel(cfg, use_flash=on_tpu and not args.no_flash,
                            remat=args.remat,
                            remat_policy=args.remat_policy,
                            remat_group=args.remat_group,
                            **quant_flags(args.quantize))

    b = args.batch * args.accum
    # per-run-unique data: the env's TPU relay content-caches execution
    # results, and a repeated (weights, batch) trajectory could replay
    items = make_synthetic_items(tok, b, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len,
                                 visual_dim=cfg.visual_dim,
                                 seed=int.from_bytes(os.urandom(4), "little"))
    batch = pack_train_batch(items, cfg.max_feats)

    print(f"[bench] init {args.preset} on {jax.devices()[0].device_kind}…",
          file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    init_batch = {k: jnp.array(v[:1]) for k, v in batch.items()}
    params = jax.jit(model.init)(
        rng, init_batch["vqa_tokens"], init_batch["video"], None,
        init_batch["vqa_video_start"], init_batch["vqa_splice"])["params"]
    trainable, frozen = partition_params(params)
    trainable, frozen = cast_partitions(trainable, frozen)
    if args.quantize != "none":
        from flipped_tpu.ckpt.quantize import randomize_quantized
        frozen = randomize_quantized(frozen, seed=1)

    if args.mode == "eval":
        bench_eval(args, cfg, model, trainable, frozen, tok)
        return
    if args.mode == "generation":
        bench_generation(args, cfg, model, trainable, frozen, tok)
        return

    vaq = qav = not args.vqa_only
    tcfg = TrainConfig(epochs=5, warmup_epochs=2, accum_iter=args.accum,
                       blr=9e-2, weight_decay=0.14, vaq=vaq, qav=qav)
    tx = make_optimizer(tcfg, steps_per_epoch=100, world_batch=b)
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, vaq=vaq, qav=qav,
                           lm_chunk=args.lm_head_chunk)

    batch = {k: jnp.array(v) for k, v in add_accum_axis(batch, args.accum).items()}

    print("[bench] compiling…", file=sys.stderr)
    t0 = time.perf_counter()
    trainable, opt_state, m = step(trainable, opt_state, frozen, batch)
    jax.block_until_ready(m.loss)
    print(f"[bench] compile+first step {time.perf_counter()-t0:.1f}s, "
          f"loss={float(m.loss):.3f}", file=sys.stderr)

    if args.cost_analysis:
        # post-first-step values have the same avals; the HLO is cache-hit
        try:
            ca = step.lower(trainable, opt_state, frozen,
                            batch).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):  # older jax returns [dict]
                ca = ca[0]
            keys = {k: v for k, v in ca.items()
                    if k in ("flops", "bytes accessed", "bytes accessed0{}",
                             "bytes accessed1{}", "bytes accessedout{}",
                             "optimal_seconds", "utilization operand 0 {}")}
            print("[bench] cost_analysis: "
                  + json.dumps({k: float(v) for k, v in keys.items()}),
                  file=sys.stderr)
        except Exception as e:  # relay/backend may not expose it — say so
            print(f"[bench] cost_analysis unavailable: {e!r}", file=sys.stderr)

    for _ in range(args.warmup):
        trainable, opt_state, m = step(trainable, opt_state, frozen, batch)
    # host fetch, not block_until_ready: on this environment's relay only a
    # fetch truly waits — without it, in-flight warmup work would leak into
    # the timed window below
    float(m.loss)

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        trainable, opt_state, m = step(trainable, opt_state, frozen, batch)
    # donated-buffer chaining serializes the steps; the terminal host fetch
    # (inside the timed window) guarantees the tail step actually finished
    float(m.loss)
    dt = (time.perf_counter() - t0) / args.steps
    if args.trace_dir:
        jax.profiler.stop_trace()

    # per-step spread: a second pass with a host fetch per step. Each fetch
    # adds one host round-trip, so p50 here slightly exceeds the chained
    # mean above — reported for dispersion, not as the headline.
    per_step = []
    for _ in range(args.steps):
        t1 = time.perf_counter()
        trainable, opt_state, m = step(trainable, opt_state, frozen, batch)
        float(m.loss)
        per_step.append(time.perf_counter() - t1)
    p50, p95 = (float(x) for x in np.percentile(per_step, [50, 95]))

    examples_per_sec = b / dt
    s = cfg.max_seq_len
    n_obj_lm, n_obj = (1, 1) if args.vqa_only else (2, 3)
    flops = train_step_flops(cfg, n_seqs_lm=n_obj_lm * b,
                             n_seqs_total=n_obj * b, s=s)
    mfu = flops / dt / peak_flops()
    # int8-activation configs (w8a8*/w4a8*) run the backbone MACs at the
    # MXU's doubled int8 rate — report utilization against BOTH peaks so
    # neither a parser nor a skimmer can misread 'mfu' (which is and stays
    # bf16-equivalent for cross-config comparability; docs/PERF.md ¹ note)
    int8_macs = args.quantize.startswith(("w8a8", "w4a8"))
    mfu_int8_peak = (flops / dt / (2.0 * peak_flops())) if int8_macs else None

    result = {
        "metric": "nextqa_7b_train_examples_per_sec_per_chip"
                  if args.preset == "7b" else
                  f"nextqa_{args.preset}_train_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 3),
        "unit": "examples/s/chip",
        "vs_baseline": round(mfu / 0.45, 4),
        "extra": {
            "step_time_s": round(dt, 4),
            "step_time_p50_s": round(p50, 4),
            "step_time_p95_s": round(p95, 4),
            "vs_baseline_note": "measured MFU / 0.45 target-MFU — the "
                                "reference publishes no throughput numbers "
                                "(BASELINE.md); NOT a ratio to a measured "
                                "PyTorch baseline",
            "mfu": round(mfu, 4),
            "mfu_bf16_equiv": round(mfu, 4),
            "mfu_note": "mfu == mfu_bf16_equiv: model FLOPs / bf16 peak "
                        "(197 TF v5e) for cross-config comparability; "
                        "mfu_int8_peak divides by the doubled int8 MXU rate "
                        "and is the true hardware utilization for "
                        "int8-activation (w8a8*/w4a8*) configs",
            **({"mfu_int8_peak": round(mfu_int8_peak, 4)}
               if mfu_int8_peak is not None else {}),
            "model_flops_per_step": flops,
            "device": jax.devices()[0].device_kind,
            "batch": args.batch, "accum": args.accum,
            "seq_len": s, "loss": round(float(m.loss), 4),
            "quantize": args.quantize,
            "remat": args.remat and args.remat_policy,
            **({"remat_group": args.remat_group}
               if args.remat_group > 1 else {}),
            **_hbm_extra(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
