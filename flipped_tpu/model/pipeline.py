"""Pipeline parallelism: the layer stack split into stages over a 'pp' mesh
axis, with a shard_map'd GPipe microbatch schedule.

The reference cannot run models whose weights exceed one accelerator — its
only parallelism is DDP (reference: util/misc.py:220-250, train.py:116),
which replicates the full backbone per device. This module adds the capacity
axis TPU-natively: block parameters are *stored stacked* — one
``layers_stacked`` subtree with a leading ``(n_layers, ...)`` axis, sharded
over the mesh's ``pp`` axis (core/mesh.py:param_pspec) — so each stage holds
only ``n_layers/pp`` layers' weights. The block sweep inside ``encode`` is
replaced by a classic GPipe schedule expressed as a ``lax.scan`` over
pipeline ticks inside ``jax.shard_map``:

  * the local batch is split into M microbatches;
  * at tick t, stage s runs its layers on microbatch ``t - s`` (stage 0
    feeds microbatch t; later stages consume the activation ppermuted from
    their predecessor at the previous tick);
  * after ``M + pp - 1`` ticks every microbatch has crossed all stages; the
    last stage's per-tick outputs are the encoded activations, broadcast
    back with one masked ``psum`` over 'pp'.

Ticks that fall in the pipeline bubble compute on clamped (stale) inputs and
their outputs are discarded — the standard GPipe bubble, a
``(pp-1)/(M+pp-1)`` fraction of the schedule. Backward is plain autodiff:
the transpose of ``ppermute`` is the reverse ``ppermute``, so gradients flow
stage-to-stage as a reverse pipeline; per-stage trainables (gates) and the
per-layer adapter slices come back sharded over 'pp', and replicated inputs
(the spliced embeddings, rope tables) are psum-reduced by shard_map's
transpose automatically.

The shard_map is *partial-auto* (``axis_names={'pp'}``): only the pipeline
axis is manual; dp and tp stay GSPMD-automatic inside the stage body, so
the batch rides its usual dp sharding and tp-sharded stacked weights keep
their Megatron column/row layout on the non-layer axes — pp×dp×tp compose
from one implementation. (Pallas fast paths stay live inside: the quant
and flash dispatches detect the already-manual 'pp' axis and nest their
own shard_maps over the remaining auto axes — see _block_module.)

Scope: training, eval, AND generation — :func:`pipeline_prefill` keeps each
stage's layers' K/V resident (the cache is pp-sharded on the layer axis),
:func:`pipeline_extend_logits` sweeps the option chunks through the stages
against it, and :func:`pipeline_decode_step` rings each generated token
through the stages (latency-bound by design — (pp−1)/pp idle per tick —
but the only way to greedy-decode a backbone too big for one chip).
sp inside a pp run composes through
GSPMD (per-block residual constraints in the stage bodies), and the
sp-FLASH streaming wrappers nest too: when another shard_map is already
manual over 'pp', they take manual only {dp, sp, tp} (flash_attention.py
_sp_specs) — so long-context flash attention runs inside pipeline stages.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..core.mesh import DP_AXIS, PP_AXIS
from .layers import precompute_rope
from .llama import TransformerBlock


# --- stacked parameter layout ------------------------------------------------

def stack_layer_params(params: dict, n_layers: int) -> dict:
    """Per-layer ``layers_i`` subtrees → one ``layers_stacked`` subtree whose
    leaves carry a leading ``(n_layers,)`` axis (sharded over 'pp' by
    core/mesh.py:param_pspec). Works on partitioned trees too: ``None``
    placeholders are empty subtrees to JAX and pass through untouched.
    Host-side, once at build time — never inside a jit (restacking per step
    would copy the whole frozen backbone)."""
    layers = [params[f"layers_{i}"] for i in range(n_layers)]
    out = {k: v for k, v in params.items()
           if not (k.startswith("layers_") and k != "layers_stacked")}
    out["layers_stacked"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return out


def unstack_layer_params(params: dict, n_layers: int) -> dict:
    """Inverse of :func:`stack_layer_params` — for checkpoint interop with
    pp=1 runs and the reference-layout exporter."""
    st = params["layers_stacked"]
    out = {k: v for k, v in params.items() if k != "layers_stacked"}
    for i in range(n_layers):
        out[f"layers_{i}"] = jax.tree.map(lambda x, i=i: x[i], st)
    return out


def validate_pp(mesh_cfg, cfg, is_generation_task: bool = False) -> None:
    """Reject configurations the v1 pipeline cannot run, loudly and early."""
    pp = max(1, mesh_cfg.pp)
    if pp <= 1:
        return
    if cfg.n_layers % pp:
        raise ValueError(
            f"--pp {pp} must divide n_layers={cfg.n_layers} evenly "
            f"(stages would be ragged)")
    if cfg.adapter_layer != cfg.n_layers:
        raise ValueError(
            f"--pp requires adapter_layer == n_layers "
            f"(got {cfg.adapter_layer} != {cfg.n_layers}): the reference's "
            f"layer-window SKIPS early blocks entirely (model.py:338), which "
            f"would leave pipeline stages empty")
    # generation tasks run under pp too: pipeline_prefill fills pp-sharded
    # caches and pipeline_decode_step rings each token through the stages
    # (latency-bound but correct — the capacity-mesh generation path)
    del is_generation_task


# --- the pipelined encode ------------------------------------------------------

def _block_module(model) -> TransformerBlock:
    """A standalone TransformerBlock matching the model's block flags —
    exactly how FlippedVQAModel.setup constructs its layers_i submodules, so
    ``block.apply({'params': one_layer_tree}, ...)`` is the same function.

    Pallas fast paths stay LIVE inside the stage bodies: both the quant
    matmuls (pallas_mesh_dispatch, model/int8.py) and flash attention
    (Attention._attend_fn → the sp streaming wrappers) detect the
    already-manual 'pp' axis via the abstract mesh's axis_types and nest
    their own shard_maps over the remaining auto axes only — per-stage
    compute is per-device along pp, so the kernels run unchanged. Sharded
    layouts the kernels can't take manual (e.g. live sp for the quant
    matmuls) fall back to the GSPMD-partitionable XLA formulations
    automatically."""
    return TransformerBlock(model.cfg, model.dtype, model.frozen_dtype,
                            model.trainable_dtype,
                            use_flash=model.use_flash,
                            quantized=model.quantized,
                            act_quant=model.act_quant,
                            quant_group=model.quant_group,
                            quant_outliers=model.quant_outliers,
                            weight_bits=model.weight_bits,
                            quant_pallas=True, seq_shard=False)


def _block_apply_fn(model):
    block = _block_module(model)

    def apply_block(p_layer, h, cos, sin, adapter, video_start):
        out = block.apply({"params": p_layer}, h, cos, sin, adapter,
                          video_start)
        if model.seq_shard:
            # sequence parallelism inside a pipeline stage: the model-level
            # residual constraint (llama.py _seq_wsc) doesn't reach blocks
            # applied here; pin (batch → dp, sequence → sp) on the auto
            # axes so GSPMD keeps S/sp tokens per chip through the stage.
            # (With use_flash, attention runs the NESTED sp-flash shard_map
            # — see _block_module; einsum otherwise.)
            from jax.sharding import PartitionSpec as P

            from ..core.mesh import SP_AXIS
            out = jax.lax.with_sharding_constraint(
                out, P(DP_AXIS, SP_AXIS, None))
        return out

    if model.remat and model.remat_policy == "qkv":
        policy = jax.checkpoint_policies.save_only_these_names(
            "attn_q", "attn_k", "attn_v", "attn_out")
        return jax.checkpoint(apply_block, policy=policy)
    if model.remat:
        return jax.checkpoint(apply_block)
    return apply_block


def _pick_microbatches(requested: int, pp: int, rows: int) -> int:
    """Largest M ≤ requested (default pp) that divides `rows` (each dp
    shard's row count, so microbatches stripe evenly across dp) — shrinking
    instead of erroring keeps odd eval tails runnable (M=1 is a degenerate
    but correct pipeline)."""
    m = max(1, requested or pp)
    while rows % m:
        m -= 1
    return m


def pipeline_encode(model, variables, tokens, video_feature, video_start,
                    splice_index, microbatches: int = 0):
    """Drop-in for ``FlippedVQAModel.encode`` on stacked parameters.

    Embed+splice and the final norm run as plain GSPMD code outside the
    pipeline (they are cheap and their params are replicated); the block
    sweep runs the shard_map'd GPipe schedule over the ambient mesh's 'pp'
    axis. With no 'pp' axis in context (or pp=1) the sweep degrades to a
    single ``lax.scan`` over the stacked layers — the MaxText-style scanned
    formulation, same math, one compiled block body.
    """
    cfg = model.cfg
    params = variables["params"] if "params" in variables else variables
    stacked = params["layers_stacked"]
    rest = {k: v for k, v in params.items() if k != "layers_stacked"}

    h = model.apply({"params": rest}, tokens, video_feature, splice_index,
                    method="_embed_and_splice")
    rope_cos, rope_sin = precompute_rope(cfg.head_dim, tokens.shape[1],
                                         cfg.rope_theta)
    # validate_pp pinned adapter_layer == n_layers: every block is active
    # and owns one adapter slice (reference: model.py:338-345)
    adapters = rest["adapter_query"].reshape(cfg.n_layers, cfg.adapter_len,
                                             cfg.dim)
    apply_block = _block_apply_fn(model)

    mesh = jax.sharding.get_abstract_mesh()
    pp = mesh.shape.get(PP_AXIS, 1) if PP_AXIS in mesh.axis_names else 1
    if pp <= 1:
        def body(carry, xs):
            p_layer, adapter = xs
            return apply_block(p_layer, carry, rope_cos, rope_sin, adapter,
                               video_start), None
        h, _ = lax.scan(body, h, (stacked, adapters))
        return model.apply({"params": rest}, h, method=lambda m, x: m.norm(x))

    # Microbatch count must divide each dp shard's rows (not just the global
    # batch): microbatches are STRIPED across the dp-sharded batch axis
    # below so every dp row-group computes its own slice of every
    # microbatch — contiguous global blocks would align each microbatch
    # with ONE dp group and serialize the dp axis through the pipeline.
    dp = mesh.shape.get(DP_AXIS, 1) if DP_AXIS in mesh.axis_names else 1
    b_glob = tokens.shape[0]
    rows_per_dp = b_glob // dp if (dp > 1 and b_glob % dp == 0) else b_glob
    m_count = _pick_microbatches(microbatches, pp, rows_per_dp)
    n_ticks = m_count + pp - 1
    # The residual stream crosses the shard_map boundary in f32: an explicit
    # bf16 psum (the masked broadcast below, and the transposes of the
    # replicated boundary arrays in backward) lowers to an all-reduce whose
    # reduction computation XLA CPU's AllReducePromotion pass cannot clone
    # (copy-rooted) — a hard compiler crash. The stage body casts straight
    # back, so the blocks still compute in model.dtype; cost is one cast of
    # h per encode, not per layer.
    io_dtype = h.dtype

    def local_fn(p_stage, a_stage, h_glob, vs_glob, cos, sin):
        # Partial-auto shard_map: only 'pp' is manual. p_stage/a_stage are
        # this stage's (n_layers/pp, ...) layer slice; h_glob/vs_glob keep
        # their GLOBAL batch shape — dp (and any tp sharding of the weights'
        # non-layer axes) stays GSPMD-automatic inside, so the stage body is
        # ordinary partitioned XLA code.
        stage = lax.axis_index(PP_AXIS)
        h_glob = h_glob.astype(io_dtype)
        b = h_glob.shape[0]
        mb = b // m_count
        # STRIPED microbatches: microbatch t = rows {t, m+t, 2m+t, …}. The
        # (mb, m_count) reshape keeps the dp-sharded batch blocks contiguous
        # on axis 0 (m_count divides each dp shard's rows), so after the
        # moveaxis the per-tick dynamic_index slices a REPLICATED axis and
        # every dp row-group computes its own mb/dp rows of every
        # microbatch — no resharding, no dp serialization.
        h_mub = jnp.moveaxis(
            h_glob.reshape((mb, m_count) + h_glob.shape[1:]), 1, 0)
        vs_mub = jnp.moveaxis(vs_glob.reshape(mb, m_count), 1, 0)

        def stage_fn(h_in, vstart):
            def body(carry, xs):
                p_layer, adapter = xs
                return apply_block(p_layer, carry, cos, sin, adapter,
                                   vstart), None
            out, _ = lax.scan(body, h_in, (p_stage, a_stage))
            return out

        def tick(recv, t):
            feed = lax.dynamic_index_in_dim(
                h_mub, jnp.clip(t, 0, m_count - 1), 0, keepdims=False)
            inp = jnp.where(stage == 0, feed, recv)
            # this stage's microbatch at tick t is (t - stage); bubble
            # ticks clamp to a stale index and their outputs are discarded
            vstart = lax.dynamic_index_in_dim(
                vs_mub, jnp.clip(t - stage, 0, m_count - 1), 0,
                keepdims=False)
            out = stage_fn(inp, vstart)
            nxt = lax.ppermute(out, PP_AXIS,
                               [(i, (i + 1) % pp) for i in range(pp)])
            return nxt, out

        recv0 = jnp.zeros((mb,) + h_glob.shape[1:], h_glob.dtype)
        _, ys = lax.scan(tick, recv0, jnp.arange(n_ticks))
        # the last stage emitted microbatch m at tick m + pp - 1; broadcast
        # its slice to all stages (masked psum — zeros elsewhere)
        outs = jnp.where(stage == pp - 1, ys[pp - 1:],
                         jnp.zeros_like(ys[pp - 1:]))
        outs = lax.psum(outs.astype(jnp.float32), PP_AXIS)
        # invert the microbatch striping back to batch-row order
        return jnp.moveaxis(outs, 0, 1).reshape(h_glob.shape)

    stacked_specs = jax.tree.map(lambda _: P(PP_AXIS), stacked)
    h = jax.shard_map(
        local_fn,
        in_specs=(stacked_specs, P(PP_AXIS), P(), P(), P(), P()),
        out_specs=P(),
        axis_names={PP_AXIS},
        # replication over 'pp' is established by the final masked psum;
        # the vma checker cannot see that through the scanned schedule
        check_vma=False,
    )(stacked, adapters, h.astype(jnp.float32), video_start, rope_cos,
      rope_sin)
    h = h.astype(io_dtype)
    return model.apply({"params": rest}, h, method=lambda m, x: m.norm(x))


def _pp_setup(model, variables):
    """Shared scaffold: split params, resolve the mesh, build adapters."""
    cfg = model.cfg
    params = variables["params"] if "params" in variables else variables
    stacked = params["layers_stacked"]
    rest = {k: v for k, v in params.items() if k != "layers_stacked"}
    adapters = rest["adapter_query"].reshape(cfg.n_layers, cfg.adapter_len,
                                             cfg.dim)
    mesh = jax.sharding.get_abstract_mesh()
    pp = mesh.shape.get(PP_AXIS, 1) if PP_AXIS in mesh.axis_names else 1
    return cfg, stacked, rest, adapters, mesh, pp


def _stripe(x, m_count):
    """(b, …) → (m_count, b/m_count, …): microbatch t = rows {t, m+t, …}
    (dp-shard-aligned; see pipeline_encode)."""
    mb = x.shape[0] // m_count
    return jnp.moveaxis(x.reshape((mb, m_count) + x.shape[1:]), 1, 0)


def _unstripe(x):
    """(m_count, mb, …) → (b, …): inverse of :func:`_stripe`."""
    return jnp.moveaxis(x, 0, 1).reshape((-1,) + x.shape[2:])


def pipeline_prefill(model, variables, tokens, video_feature, video_start,
                     splice_index, cache_len: int, microbatches: int = 0):
    """Pipelined ``Transformer.prefill``: the prompt crosses the stages once
    and each stage KEEPS the K/V of its own layers — the returned caches
    are (L, B, cache_len, H, Dh) sharded over 'pp' on the layer axis, ready
    for :func:`pipeline_extend_logits`. Eval-only (no backward → bubble
    cost is wall-clock only)."""
    cfg, stacked, rest, adapters, mesh, pp = _pp_setup(model, variables)
    h = model.apply({"params": rest}, tokens, video_feature, splice_index,
                    method="_embed_and_splice")
    rope_cos, rope_sin = precompute_rope(cfg.head_dim, cache_len,
                                         cfg.rope_theta)
    block = _block_module(model)
    s = tokens.shape[1]
    pad = cache_len - s

    if pp <= 1:
        def body1(carry, xs):
            p_layer, adapter = xs
            h2, k, v = block.apply({"params": p_layer}, carry, rope_cos,
                                   rope_sin, adapter, video_start,
                                   method="prefill")
            return h2, (k, v)
        h, (ck, cv) = lax.scan(body1, h, (stacked, adapters))
    else:
        dp = mesh.shape.get(DP_AXIS, 1) if DP_AXIS in mesh.axis_names else 1
        b_glob = tokens.shape[0]
        rows = b_glob // dp if (dp > 1 and b_glob % dp == 0) else b_glob
        m_count = _pick_microbatches(microbatches, pp, rows)
        n_ticks = m_count + pp - 1
        io_dtype = h.dtype

        def local_fn(p_stage, a_stage, h_glob, vs_glob, cos, sin):
            stage = lax.axis_index(PP_AXIS)
            h_glob = h_glob.astype(io_dtype)
            mb = h_glob.shape[0] // m_count
            h_mub = _stripe(h_glob, m_count)
            vs_mub = _stripe(vs_glob, m_count)

            def stage_fn(h_in, vstart):
                def sbody(carry, xs):
                    p_layer, adapter = xs
                    h2, k, v = block.apply({"params": p_layer}, carry, cos,
                                           sin, adapter, vstart,
                                           method="prefill")
                    return h2, (k, v)
                out, (ks, vs_) = lax.scan(sbody, h_in, (p_stage, a_stage))
                return out, ks, vs_

            def tick(recv, t):
                feed = lax.dynamic_index_in_dim(
                    h_mub, jnp.clip(t, 0, m_count - 1), 0, keepdims=False)
                inp = jnp.where(stage == 0, feed, recv)
                vstart = lax.dynamic_index_in_dim(
                    vs_mub, jnp.clip(t - stage, 0, m_count - 1), 0,
                    keepdims=False)
                out, ks, vs_ = stage_fn(inp, vstart)
                nxt = lax.ppermute(out, PP_AXIS,
                                   [(i, (i + 1) % pp) for i in range(pp)])
                return nxt, (out, ks, vs_)

            recv0 = jnp.zeros((mb,) + h_glob.shape[1:], h_glob.dtype)
            _, (ys, kys, vys) = lax.scan(tick, recv0, jnp.arange(n_ticks))
            outs = jnp.where(stage == pp - 1, ys[pp - 1:],
                             jnp.zeros_like(ys[pp - 1:]))
            outs = lax.psum(outs.astype(jnp.float32), PP_AXIS)
            h_out = _unstripe(outs)
            # this stage computed its REAL microbatch m at tick m + stage:
            # gather those ticks' K/V — (M, lps, mb, s, H, Dh)
            idx = jnp.arange(m_count) + stage
            def assemble(c):
                c = jnp.take(c, idx, axis=0)
                c = jnp.moveaxis(c, 0, 2)          # (lps, mb, M, s, H, Dh)
                return c.reshape((c.shape[0], c.shape[1] * c.shape[2])
                                 + c.shape[3:])
            return h_out, assemble(kys), assemble(vys)

        stacked_specs = jax.tree.map(lambda _: P(PP_AXIS), stacked)
        h, ck, cv = jax.shard_map(
            local_fn,
            in_specs=(stacked_specs, P(PP_AXIS), P(), P(), P(), P()),
            out_specs=(P(), P(PP_AXIS), P(PP_AXIS)),
            axis_names={PP_AXIS},
            check_vma=False,
        )(stacked, adapters, h.astype(jnp.float32), video_start, rope_cos,
          rope_sin)
        h = h.astype(io_dtype)

    if pad > 0:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))
        ck = jnp.pad(ck, widths)
        cv = jnp.pad(cv, widths)
    h = model.apply({"params": rest}, h, method=lambda m, x: m.norm(x))
    return h, ck, cv


def pipeline_decode_step(model, variables, token, cache_k, cache_v, pos,
                         video_start):
    """Pipelined ``Transformer.decode_step``: ONE token crosses the stage
    ring — stage s runs its layers at tick s against its pp-sharded cache
    slice and ppermutes the activation onward; after pp ticks the last
    stage's output is psum-broadcast and the head produces the next-token
    logits. Latency-bound by design ((pp−1)/pp of each tick is idle wait —
    the whole batch decodes one token per ring traversal), but CORRECT and
    the only way to greedy-decode a backbone too big for one chip
    (reference capability: llama/model.py:367-546, which replicates the
    full model per GPU). Inactive ticks compute on stale inputs and their
    outputs AND cache writes are discarded."""
    cfg, stacked, rest, adapters, mesh, pp = _pp_setup(model, variables)
    cache_len = cache_k.shape[2]
    h = jax.lax.stop_gradient(model.apply(
        {"params": rest}, token[:, None],
        method=lambda m, t: m.tok_embeddings(t)))
    rope_cos, rope_sin = precompute_rope(cfg.head_dim, cache_len,
                                         cfg.rope_theta)
    block = _block_module(model)

    def apply_decode(p_layer, h_in, cos, sin, adapter, vstart, ck_l, cv_l,
                     pos_):
        return block.apply({"params": p_layer}, h_in, cos, sin, adapter,
                           vstart, ck_l, cv_l, pos_, method="decode")

    if pp <= 1:
        def body1(carry, xs):
            p_layer, adapter, ck_l, cv_l = xs
            h2, ck2, cv2 = apply_decode(p_layer, carry, rope_cos, rope_sin,
                                        adapter, video_start, ck_l, cv_l,
                                        pos)
            return h2, (ck2, cv2)
        h, (ck, cv) = lax.scan(body1, h, (stacked, adapters, cache_k,
                                          cache_v))
    else:
        io_dtype = h.dtype

        def local_fn(p_stage, a_stage, ck_stage, cv_stage, h0, pos_g, vs_g,
                     cos, sin):
            stage = lax.axis_index(PP_AXIS)
            h0 = h0.astype(io_dtype)

            def tick(carry, t):
                recv, ck_st, cv_st = carry
                # stage 0 is only active at tick 0 and always feeds from h0;
                # later stages consume the ppermuted predecessor output
                inp = jnp.where(stage == 0, h0, recv)

                def sbody(c, xs):
                    p_layer, adapter, ck_l, cv_l = xs
                    h2, ck2, cv2 = apply_decode(p_layer, c, cos, sin,
                                                adapter, vs_g, ck_l, cv_l,
                                                pos_g)
                    return h2, (ck2, cv2)

                out, (cks, cvs) = lax.scan(sbody, inp,
                                           (p_stage, a_stage, ck_st, cv_st))
                active = t == stage
                ck_st = jnp.where(active, cks, ck_st)   # discard bubble
                cv_st = jnp.where(active, cvs, cv_st)   # cache writes
                nxt = lax.ppermute(out, PP_AXIS,
                                   [(i, (i + 1) % pp) for i in range(pp)])
                keep = jnp.where((stage == pp - 1) & active, out,
                                 jnp.zeros_like(out))
                return (nxt, ck_st, cv_st), keep

            (_, ck_f, cv_f), ys = lax.scan(
                tick, (jnp.zeros_like(h0), ck_stage, cv_stage),
                jnp.arange(pp))
            # exactly one (stage, tick) pair contributed a nonzero `keep`
            h_out = lax.psum(ys.sum(0).astype(jnp.float32), PP_AXIS)
            return h_out, ck_f, cv_f

        stacked_specs = jax.tree.map(lambda _: P(PP_AXIS), stacked)
        h, ck, cv = jax.shard_map(
            local_fn,
            in_specs=(stacked_specs, P(PP_AXIS), P(PP_AXIS), P(PP_AXIS),
                      P(), P(), P(), P(), P()),
            out_specs=(P(), P(PP_AXIS), P(PP_AXIS)),
            axis_names={PP_AXIS},
            check_vma=False,
        )(stacked, adapters, cache_k, cache_v, h.astype(jnp.float32), pos,
          video_start, rope_cos, rope_sin)
        h = h.astype(io_dtype)

    logits = model.apply({"params": rest}, h,
                         method=lambda m, x: m.output(m.norm(x)))[:, 0]
    return logits, ck, cv


def pipeline_extend_logits(model, variables, tokens, cache_k, cache_v,
                           prefix, video_start, microbatches: int = 0):
    """Pipelined ``Transformer.extend_logits``: the option chunks sweep the
    stages with each stage reading ITS layers' slice of the pp-sharded
    cache from :func:`pipeline_prefill`."""
    cfg, stacked, rest, adapters, mesh, pp = _pp_setup(model, variables)
    b, n_opt, chunk_len = tokens.shape
    cache_len = cache_k.shape[2]
    h = jax.lax.stop_gradient(model.apply(
        {"params": rest}, tokens.reshape(b, n_opt * chunk_len),
        method=lambda m, t: m.tok_embeddings(t)))
    rope_cos, rope_sin = precompute_rope(cfg.head_dim, cache_len,
                                         cfg.rope_theta)
    block = _block_module(model)

    def apply_extend(p_layer, h_in, cos, sin, adapter, vstart, ck_l, cv_l,
                     pr):
        return block.apply({"params": p_layer}, h_in, cos, sin, adapter,
                           vstart, ck_l, cv_l, pr, n_opt, method="extend")

    if pp <= 1:
        def body1(carry, xs):
            p_layer, adapter, ck_l, cv_l = xs
            return apply_extend(p_layer, carry, rope_cos, rope_sin, adapter,
                                video_start, ck_l, cv_l, prefix), None
        h, _ = lax.scan(body1, h, (stacked, adapters, cache_k, cache_v))
    else:
        dp = mesh.shape.get(DP_AXIS, 1) if DP_AXIS in mesh.axis_names else 1
        rows = b // dp if (dp > 1 and b % dp == 0) else b
        m_count = _pick_microbatches(microbatches, pp, rows)
        n_ticks = m_count + pp - 1
        io_dtype = h.dtype

        def local_fn(p_stage, a_stage, ck_stage, cv_stage, h_glob, pr_glob,
                     vs_glob, cos, sin):
            stage = lax.axis_index(PP_AXIS)
            h_glob = h_glob.astype(io_dtype)
            mb = h_glob.shape[0] // m_count
            h_mub = _stripe(h_glob, m_count)
            pr_mub = _stripe(pr_glob, m_count)
            vs_mub = _stripe(vs_glob, m_count)
            # caches: stripe the batch axis (axis 1) identically
            def stripe_cache(c):
                lps = c.shape[0]
                c = c.reshape((lps, mb, m_count) + c.shape[2:])
                return jnp.moveaxis(c, 2, 0)       # (M, lps, mb, S, H, Dh)
            ck_mub = stripe_cache(ck_stage)
            cv_mub = stripe_cache(cv_stage)

            def stage_fn(h_in, pr, vstart, ck_t, cv_t):
                def sbody(carry, xs):
                    p_layer, adapter, ck_l, cv_l = xs
                    return apply_extend(p_layer, carry, cos, sin, adapter,
                                        vstart, ck_l, cv_l, pr), None
                out, _ = lax.scan(sbody, h_in,
                                  (p_stage, a_stage, ck_t, cv_t))
                return out

            def tick(recv, t):
                feed = lax.dynamic_index_in_dim(
                    h_mub, jnp.clip(t, 0, m_count - 1), 0, keepdims=False)
                inp = jnp.where(stage == 0, feed, recv)
                mi = jnp.clip(t - stage, 0, m_count - 1)
                pr = lax.dynamic_index_in_dim(pr_mub, mi, 0, keepdims=False)
                vstart = lax.dynamic_index_in_dim(vs_mub, mi, 0,
                                                  keepdims=False)
                ck_t = lax.dynamic_index_in_dim(ck_mub, mi, 0,
                                                keepdims=False)
                cv_t = lax.dynamic_index_in_dim(cv_mub, mi, 0,
                                                keepdims=False)
                out = stage_fn(inp, pr, vstart, ck_t, cv_t)
                nxt = lax.ppermute(out, PP_AXIS,
                                   [(i, (i + 1) % pp) for i in range(pp)])
                return nxt, out

            recv0 = jnp.zeros((mb,) + h_glob.shape[1:], h_glob.dtype)
            _, ys = lax.scan(tick, recv0, jnp.arange(n_ticks))
            outs = jnp.where(stage == pp - 1, ys[pp - 1:],
                             jnp.zeros_like(ys[pp - 1:]))
            outs = lax.psum(outs.astype(jnp.float32), PP_AXIS)
            return _unstripe(outs)

        stacked_specs = jax.tree.map(lambda _: P(PP_AXIS), stacked)
        h = jax.shard_map(
            local_fn,
            in_specs=(stacked_specs, P(PP_AXIS), P(PP_AXIS), P(PP_AXIS),
                      P(), P(), P(), P(), P()),
            out_specs=P(),
            axis_names={PP_AXIS},
            check_vma=False,
        )(stacked, adapters, cache_k, cache_v, h.astype(jnp.float32),
          prefix, video_start, rope_cos, rope_sin)
        h = h.astype(io_dtype)

    logits = model.apply({"params": rest}, h,
                         method=lambda m, x: m.output(m.norm(x)))
    return logits.reshape(b, n_opt, chunk_len, cfg.vocab_size)


# --- the model wrapper ---------------------------------------------------------

class PipelinedModel:
    """Duck-types the ``model.apply(variables, ..., method=...)`` surface the
    training/eval engines use (train/objectives.py, train/step.py), routing
    ``encode``/``prefill``/``extend_logits`` through the pipelined
    implementations and everything else to the wrapped model with the
    stacked subtree stripped. Built by train/builder.py when --pp > 1."""

    def __init__(self, model, microbatches: int = 0):
        self._model = model
        self._microbatches = microbatches

    @property
    def inner(self):
        return self._model

    def apply(self, variables, *args, method=None, **kwargs):
        if method == "encode":
            return pipeline_encode(self._model, variables, *args,
                                   microbatches=self._microbatches, **kwargs)
        if method == "prefill":
            return pipeline_prefill(self._model, variables, *args,
                                    microbatches=self._microbatches,
                                    **kwargs)
        if method == "extend_logits":
            return pipeline_extend_logits(self._model, variables, *args,
                                          microbatches=self._microbatches,
                                          **kwargs)
        if method == "decode_step":
            return pipeline_decode_step(self._model, variables, *args,
                                        **kwargs)
        if method is None:
            # __call__ convenience (fuse → encode → heads), pipelined
            tokens, video, audio, video_start, splice_index = args
            vf = self.apply(variables, video, audio, method="fuse")
            h = self.apply(variables, tokens, vf, video_start, splice_index,
                           method="encode")
            return (self.apply(variables, h, method="lm_logits"),
                    self.apply(variables, h, vf, method="qav_logits"))
        return self._model.apply(self._strip(variables), *args,
                                 method=method, **kwargs)

    @staticmethod
    def _strip(variables):
        p = variables["params"] if "params" in variables else variables
        return {"params": {k: v for k, v in p.items()
                           if k != "layers_stacked"}}

    def clone(self, **kwargs):
        return PipelinedModel(self._model.clone(**kwargs),
                              self._microbatches)

    def __getattr__(self, name):
        return getattr(self._model, name)
