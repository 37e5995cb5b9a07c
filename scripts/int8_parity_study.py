"""int8-vs-bf16 eval-decision parity study at REAL 7B shapes.

Quantifies how far weight-only int8 quantization of the frozen backbone
perturbs the classification decision (argmin per-option score, reference:
engine.py:87-93) at full LLaMA-7B depth/width — the evidence VERDICT r01
asked for before making the 73.5%-MFU int8 config the bench default.

Both phases synthesize IDENTICAL backbone weights host-side (seeded, leaf by
leaf, pushed to device and freed — peak host RAM ~1 leaf), so the comparison
isolates pure quantization error:

    phase bf16:  kernels = bf16(w)
    phase int8:  kernels = per-channel absmax int8 of the SAME bf16(w)

then both score the SAME 1k+ synthetic eval examples with the production
prefix-shared cached scorer and the report phase computes per-option score
deltas, argmin flip rate, and the decision-margin envelope (a flip can only
happen when the bf16 decision margin is smaller than the int8 score
perturbation — reporting max |Δscore| bounds which decisions are stable).

Run (TPU, ~2 compiles through the relay):
    python scripts/int8_parity_study.py --phase bf16 --out /tmp/int8_study
    python scripts/int8_parity_study.py --phase int8 --out /tmp/int8_study
    python scripts/int8_parity_study.py --phase report --out /tmp/int8_study
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


# Residual-stream role of each backbone matmul (for the 'outlier' ensemble):
# readers consume the residual basis on their INPUT rows, writers produce it
# on their OUTPUT columns. Amplifying one global set of residual channels in
# both reproduces the emergent-outlier-feature structure of trained LLMs
# (LLM.int8(): ~0.1–0.5% of hidden dims at 20–100× magnitude) — writers make
# downstream ACTIVATIONS carry outlier channels (the per-token act-quant
# stressor for w8a8), readers put outlier ROWS inside each output channel's
# absmax window (the weight-quant stressor for int8).
_RESIDUAL_READERS = ("wq", "wk", "wv", "w1", "w3", "output")
_RESIDUAL_WRITERS = ("wo", "w2")
OUTLIER_FRAC = 0.005          # fraction of residual dims amplified
OUTLIER_RANGE = (10.0, 30.0)  # amplification factors (× channel RMS)


class _SynthCache:
    """Directory cache of synthesized (post-fold, post-quantize) leaves.

    The rotated phases spend ~45 min of HOST time per leg on draw + fold +
    quantize at 7B — identical across the eval and train legs (same
    weight_seed) and across int8r/w8a8r (same kernels; act-quant is a
    runtime flag). Caching the finished leaves lets that work run ONCE
    (even offline, --phase synth on the CPU backend while the TPU is busy
    or down) and each leg just device_put the arrays. bf16 leaves are
    stored as uint16 views (np.save has no native bfloat16); MANIFEST.json
    is written LAST and doubles as the completeness marker."""

    def __init__(self, cache_dir: str):
        import json
        self.dir = cache_dir
        self.manifest_path = os.path.join(cache_dir, "MANIFEST.json")
        self.loading = os.path.exists(self.manifest_path)
        self.manifest = (json.load(open(self.manifest_path))
                         if self.loading else {})

    def _fn(self, path):
        return os.path.join(self.dir, path.replace("/", "__") + ".npy")

    def save(self, path, arr):
        a = np.asarray(arr)
        dt = str(a.dtype)
        os.makedirs(self.dir, exist_ok=True)
        np.save(self._fn(path), a.view(np.uint16) if dt == "bfloat16" else a)
        self.manifest[path] = dt

    def load(self, path):
        a = np.load(self._fn(path))
        if self.manifest[path] == "bfloat16":
            import ml_dtypes
            a = a.view(ml_dtypes.bfloat16)
        return a

    def keys_under(self, prefix):
        return sorted(k for k in self.manifest if k.startswith(prefix + "/"))

    def finish(self):
        import json
        if not self.loading:
            os.makedirs(self.dir, exist_ok=True)
            with open(self.manifest_path, "w") as f:
                json.dump(self.manifest, f)


def _synthesize_frozen(frozen, seed: int, quantize: bool,
                       dist: str = "gaussian", model_dim: int = 0,
                       group: int = 0, outliers: bool = False, rot=None,
                       cache: _SynthCache | None = None,
                       materialize: bool = True):
    """Replace every frozen matmul kernel with a deterministic random weight
    (identical draws across phases), as bf16 or as int8-of-that-bf16.
    Pushes leaf by leaf and frees the init buffer, so peak HBM stays ~1×.

    dist: 'gaussian' (round-2 baseline), 'student_t' (df=4 heavy tails,
    variance-normalized — random large individual entries), or 'outlier'
    (gaussian + one global set of amplified residual channels, see above).

    rot (ckpt.rotate.Rotation): the int8r/w8a8r phases fold the
    residual-stream rotation into each kernel BEFORE plain-absmax
    quantization (readers: Rᵀ·W on the input axis; writers: W·R on the
    output axis) — host-side per leaf, so peak host RAM stays ~1 leaf. The
    study's norm weights are at their flax init (ones), so the γ folds of
    ckpt/rotate.py are no-ops here and qav_rot = RᵀIR = I (the model's
    identity init is already correct); _rotate_residual_tensors handles
    the non-kernel residual-space tensors.
    """
    import jax
    import jax.numpy as jnp

    from flipped_tpu.ckpt.quantize import outlier_count, quantize_kernel

    rs = np.random.RandomState(seed)
    if dist == "outlier":
        o_rs = np.random.RandomState(seed + 7919)   # same dims every phase
        n_o = max(1, int(OUTLIER_FRAC * model_dim))
        o_dims = np.sort(o_rs.choice(model_dim, size=n_o, replace=False))
        o_fac = o_rs.uniform(*OUTLIER_RANGE, size=n_o).astype(np.float32)

    def draw(shape, fan_in, name):
        if dist == "student_t":
            # df=4 student-t has variance df/(df-2)=2 → normalize to match
            # the gaussian ensemble's scale
            w = rs.standard_t(4, size=shape).astype(np.float32) / np.sqrt(2.0)
        else:
            w = rs.randn(*shape).astype(np.float32)
        w /= np.sqrt(fan_in)
        if dist == "outlier":
            if name in _RESIDUAL_READERS and shape[0] == model_dim:
                w[o_dims, :] *= o_fac[:, None]
            if name in _RESIDUAL_WRITERS and shape[-1] == model_dim:
                w[:, o_dims] *= o_fac[None, :]
        if rot is not None:
            if name in _RESIDUAL_READERS and shape[0] == model_dim:
                w = rot.left_t(w)
            if name in _RESIDUAL_WRITERS and shape[-1] == model_dim:
                w = rot.right(w)
        return w

    def emit(out, path, parts, original):
        """Place finished leaves (device or cache or both)."""
        if hasattr(original, "delete"):
            original.delete()
        for qk, qv in parts.items():
            if cache is not None and not cache.loading:
                cache.save(f"{path}/{qk}", qv)
            out[qk] = jax.device_put(qv) if materialize else None

    def walk(node, name="", path=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k in node:  # insertion order — identical tree traversal per phase
            v = node[k]
            p = f"{path}/{k}" if path else k
            if k in ("kernel", "kernel_q", "kernel_q4") and v is not None:
                if cache is not None and cache.loading:
                    # finished leaves live under the kernel's PARENT path
                    # (kernel vs kernel_q/scale/... depends on the mode tag)
                    if hasattr(v, "delete"):
                        v.delete()
                    for full in cache.keys_under(path):
                        leaf = full[len(path) + 1:]
                        out[leaf] = (jax.device_put(cache.load(full))
                                     if materialize else None)
                    continue
                shape = v.shape
                if k == "kernel_q4":    # packed along N (model/int4.py)
                    shape = (shape[0], shape[1] * 2)
                fan_in = shape[0]
                w = draw(shape, fan_in, name)
                wb = w.astype(jnp.bfloat16)  # the converted-checkpoint dtype
                if k == "kernel_q4":
                    # per-leaf group from the model's own scale shape
                    # (tiny configs fall back to a single group)
                    g4 = fan_in // node["scale"].shape[0]
                    emit(out, path, quantize_kernel(
                        np.asarray(wb, np.float32), g4, 0, bits=4), v)
                elif quantize:
                    n_out = outlier_count(fan_in) if outliers else 0
                    emit(out, path, quantize_kernel(
                        np.asarray(wb, np.float32), group, n_out), v)
                else:
                    emit(out, path, {k: wb}, v)
            elif (k in ("scale", "out_idx", "out_w")
                  and ("kernel_q" in node or "kernel_q4" in node)):
                continue  # rewritten alongside kernel_q above
            else:
                out[k] = walk(v, k, p)
        return out

    tree = walk(frozen)
    if cache is not None:
        cache.finish()
    return tree


def _rotate_residual_tensors(trainable, frozen, rot):
    """Rotate the non-kernel tensors living in the residual basis so the
    rotated phase is mathematically the SAME model as the bf16 phase:
    tok_embeddings (frozen) and adapter_query / temporal_emb / visual_proj
    (trainable, at flax init). Norm γ = 1 in the study, so the adapter's
    γ⁻¹ pre-division (ckpt/rotate.py) is a no-op and a'_l = a_l R."""
    import jax
    import jax.numpy as jnp

    def rot_leaf(x, fold):
        y = fold(np.asarray(x, np.float32))
        return jax.device_put(jnp.asarray(y).astype(x.dtype))

    frozen = dict(frozen)
    te = dict(frozen["tok_embeddings"])
    te["embedding"] = rot_leaf(te["embedding"], rot.right)
    frozen["tok_embeddings"] = te

    trainable = dict(trainable)
    trainable["adapter_query"] = rot_leaf(trainable["adapter_query"],
                                          rot.right)
    trainable["temporal_emb"] = rot_leaf(trainable["temporal_emb"], rot.right)
    vp = dict(trainable["visual_proj"])
    vp["kernel"] = rot_leaf(vp["kernel"], rot.right)
    trainable["visual_proj"] = vp
    return trainable, frozen


ROTATION_SEED = 999  # fixed across phases/legs — any value works


def _flags_for(args) -> dict:
    from flipped_tpu.core.config import quant_flags
    flags = quant_flags("none" if args.phase in ("bf16", "bf16r")
                        else args.phase)
    if args.phase == "bf16r":
        flags["rotated"] = True
    return flags


def _cache_for(args, flags):
    """Shared synthesis cache dir per (ensemble, seed, leaf-content mode) —
    int8r/w8a8r share one (act-quant is runtime-only), as do the eval and
    train legs (same weight_seed)."""
    if not args.cache:
        return None
    tag = (f"{args.weights}_s{args.weight_seed + 1}_"
           + ("bf16" if not flags["quantized"]
              else f"q{flags['quant_group']}"
                   + ("b4" if flags.get("weight_bits", 8) == 4 else "")
                   + ("o" if flags["quant_outliers"] else ""))
           + ("r" if flags["rotated"] else ""))
    return _SynthCache(os.path.join(args.cache, tag))


def run_synth(args):
    """--synth_only: run draw + fold + quantize on the HOST and fill the
    --cache directory, without touching any device (shape tree via
    jax.eval_shape) — lets the expensive rotated-phase synthesis run
    offline while the TPU is busy or down."""
    import jax
    import jax.numpy as jnp

    from flipped_tpu.model import FlippedVQAModel
    from flipped_tpu.train import partition_params

    flags = _flags_for(args)
    cache = _cache_for(args, flags)
    if cache is None:
        raise SystemExit("--synth_only needs --cache")
    if cache.loading:
        print(f"[study:synth:{args.phase}:{args.weights}] cache already "
              f"complete at {cache.dir}", file=sys.stderr)
        return
    cfg = _config(args)
    model = FlippedVQAModel(cfg, **flags)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(args.weight_seed),
        jnp.zeros((1, 16), jnp.int32),
        jnp.zeros((1, cfg.max_feats, cfg.visual_dim), jnp.float32), None,
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.max_feats), jnp.int32))["params"]
    _, frozen = partition_params(shapes)
    rot = None
    if flags.get("rotated"):
        from flipped_tpu.ckpt.rotate import Rotation
        rot = Rotation(cfg.dim, seed=ROTATION_SEED)
    _synthesize_frozen(frozen, seed=args.weight_seed + 1,
                       quantize=flags["quantized"], dist=args.weights,
                       model_dim=cfg.dim, group=flags["quant_group"],
                       outliers=flags["quant_outliers"], rot=rot,
                       cache=cache, materialize=False)
    print(f"[study:synth:{args.phase}:{args.weights}] cache filled at "
          f"{cache.dir} ({time.perf_counter() - t0:.0f}s)", file=sys.stderr)


def run_train_phase(args):
    """Training-parity leg: same synthesized weights + batches, N optimizer
    steps; saves the loss/grad-norm trajectory for bf16-vs-int8 comparison
    (training through the quantized backbone perturbs the activations that
    gradients to the adapters flow through)."""
    import jax
    import jax.numpy as jnp

    from flipped_tpu.core.config import ModelConfig, TrainConfig
    from flipped_tpu.data import (add_accum_axis, make_synthetic_items,
                                  pack_train_batch)
    from flipped_tpu.model import FlippedVQAModel
    from flipped_tpu.text import MockTokenizer
    from flipped_tpu.train import (make_optimizer, make_train_step,
                                   partition_params)

    from flipped_tpu.core.config import quant_flags
    flags = _flags_for(args)
    quantized, group = flags["quantized"], flags["quant_group"]
    outliers = flags["quant_outliers"]
    cfg = _config(args)
    tok = MockTokenizer(cfg.vocab_size)
    on_tpu = jax.default_backend() == "tpu"
    # remat: bf16 needs it for HBM; plain int8/w8a8 fit without it at
    # batch 8; the grouped/outlier variants' ~0.3 GB of sub-channel scales
    # tip batch-8 no-remat just past 16 GB, so they remat too (recompute is
    # bit-deterministic — the loss trajectory is unaffected)
    model = FlippedVQAModel(cfg, **flags,
                            use_flash=on_tpu,
                            remat=not quantized or group > 0)

    batches = []
    for i in range(args.steps):
        items = make_synthetic_items(tok, args.batch, max_feats=cfg.max_feats,
                                     max_seq_len=cfg.max_seq_len,
                                     visual_dim=cfg.visual_dim,
                                     seed=args.data_seed + i)
        b = pack_train_batch(items, cfg.max_feats)
        batches.append({k: jnp.array(v)
                        for k, v in add_accum_axis(b, 1).items()})

    print(f"[study:train:{args.phase}] init on "
          f"{jax.devices()[0].device_kind}…", file=sys.stderr)
    ib = batches[0]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.weight_seed), ib["vqa_tokens"][0],
        ib["video"][0], None, ib["vqa_video_start"][0],
        ib["vqa_splice"][0])["params"]
    trainable, frozen = partition_params(params)
    rot = None
    if flags.get("rotated"):
        from flipped_tpu.ckpt.rotate import Rotation
        rot = Rotation(cfg.dim, seed=ROTATION_SEED)
    frozen = _synthesize_frozen(frozen, seed=args.weight_seed + 1,
                                quantize=quantized, dist=args.weights,
                                model_dim=cfg.dim, group=group,
                                outliers=outliers, rot=rot,
                                cache=_cache_for(args, flags))
    if rot is not None:
        trainable, frozen = _rotate_residual_tensors(trainable, frozen, rot)

    tcfg = TrainConfig(epochs=5, warmup_epochs=1, accum_iter=1, blr=9e-2,
                       weight_decay=0.14, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=args.steps,
                        world_batch=args.batch)
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, vaq=True, qav=True)

    losses, gnorms = [], []
    t0 = time.perf_counter()
    for i, b in enumerate(batches):
        trainable, opt_state, m = step(trainable, opt_state, frozen, b)
        losses.append(float(m.loss))
        gnorms.append(float(m.grad_norm))
        if i == 0:
            print(f"[study:train:{args.phase}] compile+first step "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, f"train_{args.phase}{_sfx(args)}.npz"),
             loss=np.asarray(losses), grad_norm=np.asarray(gnorms))
    print(f"[study:train:{args.phase}:{args.weights}] {args.steps} steps "
          f"({time.perf_counter() - t0:.1f}s) → {args.out}", file=sys.stderr)


def _sfx(args) -> str:
    """Output-file suffix per weight ensemble ('' keeps the round-2 gaussian
    files readable in place)."""
    return "" if args.weights == "gaussian" else f"_{args.weights}"


DISTS = ("gaussian", "student_t", "outlier")


def report_train(args):
    out_all = {}
    for dist in DISTS:
        sfx = "" if dist == "gaussian" else f"_{dist}"
        bf_path = os.path.join(args.out, f"train_bf16{sfx}.npz")
        if not os.path.exists(bf_path):
            continue
        bf = np.load(bf_path)
        out = {"n_steps": int(len(bf["loss"])),
               "loss_first_bf16": float(bf["loss"][0]),
               "loss_last_bf16": float(bf["loss"][-1]),
               "loss_drop_bf16": float(bf["loss"][0] - bf["loss"][-1])}
        bfr_path = os.path.join(args.out, f"train_bf16r{sfx}.npz")
        bfr = np.load(bfr_path) if os.path.exists(bfr_path) else None
        for ph in ("int8", "w8a8", "w8a8d", "int8g", "w8a8g", "int8o",
                   "w8a8o", "int8r", "w8a8r", "bf16r", "int4", "w4a8",
                   "int4r", "w4a8r"):
            path = os.path.join(args.out, f"train_{ph}{sfx}.npz")
            if not os.path.exists(path):
                continue
            q8 = np.load(path)
            # rotated trajectories compare against the rotated-unquantized
            # control (see report(): reparametrization vs quantization)
            base = bfr if (ph.endswith("r") and ph != "bf16r"
                           and bfr is not None) else bf
            dl = np.abs(base["loss"] - q8["loss"])
            out[ph] = {
                "loss_first": float(q8["loss"][0]),
                "loss_last": float(q8["loss"][-1]),
                "loss_drop": float(q8["loss"][0] - q8["loss"][-1]),
                "loss_abs_delta_mean": float(dl.mean()),
                "loss_abs_delta_max": float(dl.max()),
                "loss_rel_delta_mean": float(
                    (dl / np.abs(base["loss"])).mean()),
                "grad_norm_rel_delta_mean": float(
                    (np.abs(base["grad_norm"] - q8["grad_norm"])
                     / np.abs(base["grad_norm"])).mean()),
                **({"baseline": "bf16r"} if base is bfr else {}),
            }
        out_all[dist] = out
    print(json.dumps(out_all, indent=2))
    with open(os.path.join(args.out, "report_train.json"), "w") as f:
        json.dump(out_all, f, indent=2)


def _config(args):
    from flipped_tpu.core.config import ModelConfig

    if args.preset == "7b":
        return ModelConfig(dim=4096, n_layers=32, n_heads=32,
                           vocab_size=32000, multiple_of=256, max_seq_len=128,
                           adapter_len=10, adapter_layer=32, max_feats=10,
                           bias=3.5, tau=100.0)
    if args.preset == "small":
        # CPU-runnable scale where outlier incoherence is already visible
        # (dim 512 spreads an outlier by √512 ≈ 23×) — used to pre-validate
        # the rotation phases without TPU time
        return ModelConfig(dim=512, n_layers=4, n_heads=8, vocab_size=4096,
                           multiple_of=64, max_seq_len=128, adapter_len=10,
                           adapter_layer=4, max_feats=10, visual_dim=16)
    return ModelConfig(dim=64, n_layers=2, n_heads=4, vocab_size=512,
                       multiple_of=32, max_seq_len=128, adapter_len=10,
                       adapter_layer=2, max_feats=10, visual_dim=16)


def run_phase(args):
    import jax
    import jax.numpy as jnp

    from flipped_tpu.data import make_synthetic_items, pack_eval_batch
    from flipped_tpu.model import FlippedVQAModel
    from flipped_tpu.text import MockTokenizer
    from flipped_tpu.train import (make_eval_step, partition_params,
                                   required_eval_span)

    from flipped_tpu.core.config import quant_flags
    flags = _flags_for(args)
    quantized, group = flags["quantized"], flags["quant_group"]
    outliers = flags["quant_outliers"]
    cfg = _config(args)
    tok = MockTokenizer(cfg.vocab_size)
    on_tpu = jax.default_backend() == "tpu"
    model = FlippedVQAModel(cfg, **flags, use_flash=on_tpu)

    # identical eval data across phases: fixed seeds, NOT salted — both
    # phases must score the very same examples
    batches, raw = [], []
    span = 1
    for i in range(args.steps):
        items = make_synthetic_items(tok, args.batch, max_feats=cfg.max_feats,
                                     max_seq_len=cfg.max_seq_len, split="val",
                                     visual_dim=cfg.visual_dim,
                                     seed=args.data_seed + i)
        b = pack_eval_batch(items, cfg.max_feats)
        need, exact = required_eval_span(b)
        assert exact
        span = max(span, need)
        raw.append(b)
    span = -(-span // 8) * 8

    print(f"[study:{args.phase}] init 7B on "
          f"{jax.devices()[0].device_kind}…", file=sys.stderr)
    ib = raw[0]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.weight_seed),
        jnp.array(ib["vqa_tokens"][:1, 0]), jnp.array(ib["video"][:1]), None,
        jnp.array(ib["vqa_video_start"][:1]),
        jnp.array(ib["vqa_splice"][:1]))["params"]
    trainable, frozen = partition_params(params)
    # trainable adapters/gates keep their (path-keyed, phase-identical) flax
    # init; the backbone is re-synthesized identically in both phases
    rot = None
    if flags.get("rotated"):
        from flipped_tpu.ckpt.rotate import Rotation
        rot = Rotation(cfg.dim, seed=ROTATION_SEED)
    frozen = _synthesize_frozen(frozen, seed=args.weight_seed + 1,
                                quantize=quantized, dist=args.weights,
                                model_dim=cfg.dim, group=group,
                                outliers=outliers, rot=rot,
                                cache=_cache_for(args, flags))
    if rot is not None:
        trainable, frozen = _rotate_residual_tensors(trainable, frozen, rot)

    step = make_eval_step(model, cached=True, span_len=span)
    all_scores, all_answers = [], []
    t0 = time.perf_counter()
    for i, b in enumerate(raw):
        jb = {k: jnp.array(v) for k, v in b.items()
              if isinstance(v, np.ndarray) and k not in ("answer", "qtype", "qid")}
        out = step(trainable, frozen, jb)
        all_scores.append(np.asarray(out["scores"], np.float64))
        all_answers.append(b["answer"])
        if i == 0:
            print(f"[study:{args.phase}] compile+first batch "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    scores = np.concatenate(all_scores)        # (N·B, n_opt)
    answers = np.concatenate(all_answers)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, f"scores_{args.phase}{_sfx(args)}.npz"),
             scores=scores, answers=answers, span=span)
    print(f"[study:{args.phase}:{args.weights}] scored {len(scores)} "
          f"examples ({time.perf_counter() - t0:.1f}s) → {args.out}",
          file=sys.stderr)


def report(args):
    """Compare every quantized phase present on disk against its bf16
    baseline, per weight ensemble."""
    out_all = {}
    for dist in DISTS:
        sfx = "" if dist == "gaussian" else f"_{dist}"
        bf_path = os.path.join(args.out, f"scores_bf16{sfx}.npz")
        if not os.path.exists(bf_path):
            continue
        bf = np.load(bf_path)
        bfr_path = os.path.join(args.out, f"scores_bf16r{sfx}.npz")
        bfr = np.load(bfr_path) if os.path.exists(bfr_path) else None
        out_all[dist] = {}
        for phase in ("int8", "w8a8", "w8a8d", "int8g", "w8a8g", "int8o",
                      "w8a8o", "int8r", "w8a8r", "bf16r", "int4", "w4a8",
                      "int4r", "w4a8r"):
            path = os.path.join(args.out, f"scores_{phase}{sfx}.npz")
            if not os.path.exists(path):
                continue
            # rotated phases are a REPARAMETRIZATION: their bf16 rounding
            # pattern differs from the unrotated model's, which random
            # (chaos-amplifying) synthetic weights blow up into large score
            # deltas that have nothing to do with quantization. Compare
            # int8r/w8a8r against the rotated-unquantized bf16r control so
            # the delta isolates QUANTIZATION error; the bf16r-vs-bf16 row
            # itself quantifies the reparametrization floor.
            base = bfr if (phase.endswith("r") and phase != "bf16r"
                           and bfr is not None) else bf
            cmp = _compare(base, np.load(path))
            if base is bfr:
                cmp["baseline"] = "bf16r"
            out_all[dist][phase] = cmp
    print(json.dumps(out_all, indent=2))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(out_all, f, indent=2)


def _compare(bf, q8):
    s_bf, s_q8 = bf["scores"], q8["scores"]
    assert s_bf.shape == s_q8.shape
    n = len(s_bf)

    delta = np.abs(s_q8 - s_bf)                      # per-option |Δscore|
    pred_bf, pred_q8 = s_bf.argmin(-1), s_q8.argmin(-1)
    flips = pred_bf != pred_q8
    srt = np.sort(s_bf, axis=-1)
    margin = srt[:, 1] - srt[:, 0]                   # bf16 decision margin

    out = {
        "n_examples": int(n),
        "n_options": int(s_bf.shape[1]),
        "score_delta_mean": float(delta.mean()),
        "score_delta_p99": float(np.quantile(delta, 0.99)),
        "score_delta_p999": float(np.quantile(delta, 0.999)),
        "score_delta_max": float(delta.max()),
        "argmin_flip_rate": float(flips.mean()),
        "n_flips": int(flips.sum()),
        "bf16_margin_median": float(np.median(margin)),
        "bf16_margin_p10": float(np.quantile(margin, 0.10)),
        "max_flipped_margin": float(margin[flips].max()) if flips.any() else 0.0,
        "accuracy_bf16": float((pred_bf == bf["answers"]).mean()),
        "accuracy_quant": float((pred_q8 == bf["answers"]).mean()),
        # the envelope: decisions with margin above this bound CANNOT flip
        # (|Δ(s_i - s_j)| ≤ 2·max|Δs|)
        "stability_margin_bound": float(2 * delta.max()),
        "frac_examples_above_bound": float(
            (margin > 2 * delta.max()).mean()),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["bf16", "int8", "w8a8", "w8a8d", "int8g",
                             "w8a8g", "int8o", "w8a8o", "int8r", "w8a8r",
                             "bf16r", "int4", "w4a8", "int4r", "w4a8r",
                             "report"])
    ap.add_argument("--out", default="/tmp/int8_study")
    ap.add_argument("--preset", default="7b", choices=["7b", "small", "tiny"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--data_seed", type=int, default=1234)
    ap.add_argument("--weight_seed", type=int, default=0)
    ap.add_argument("--mode", default="eval", choices=["eval", "train"])
    ap.add_argument("--weights", default="gaussian", choices=list(DISTS),
                    help="weight ensemble: gaussian (round-2 baseline), "
                         "student_t (heavy tails), outlier (amplified "
                         "residual channels — the absmax stressor)")
    ap.add_argument("--cache", default="",
                    help="directory for the synthesized-leaf cache "
                         "(draw+fold+quantize runs once; legs just load)")
    ap.add_argument("--synth_only", action="store_true",
                    help="fill the --cache for this phase on the host and "
                         "exit (no device needed)")
    args = ap.parse_args()
    if args.synth_only:
        # Host-only work: pin the CPU platform BEFORE any jax use so leaf
        # construction (jnp.asarray in quantize_kernel) never touches the
        # TPU tunnel — synth must run while the TPU is busy or down.
        import jax
        jax.config.update("jax_platforms", "cpu")
        run_synth(args)
    elif args.phase == "report":
        report_train(args) if args.mode == "train" else report(args)
    elif args.mode == "train":
        run_train_phase(args)
    else:
        run_phase(args)


if __name__ == "__main__":
    main()
