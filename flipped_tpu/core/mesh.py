"""Device mesh construction and sharding rules.

TPU-native replacement of the reference's NCCL/DDP runtime (reference:
util/misc.py:220-250 `init_distributed_mode`, train.py:116 DDP wrap): instead
of per-process NCCL process groups, we build one `jax.sharding.Mesh` over all
devices and let GSPMD insert the gradient all-reduce over ICI/DCN from the
`pjit` shardings.

Axes:
  dp — data parallel: the batch axis is sharded here (the reference's only
       parallelism, via DistributedSampler + DDP allreduce).
  sp — sequence parallel: the residual stream's SEQUENCE dim is sharded here
       via GSPMD sharding constraints (FlippedVQAModel(seq_shard=True) —
       norms/MLP/projections run on S/sp tokens per chip; attention
       all-gathers K/V over the axis). Activation residency per chip scales
       1/sp — the long-context axis (S=4096 training is activation-bound on
       16 GB chips, docs/PERF.md).
  tp — tensor parallel: optional Megatron-style sharding of attention heads
       and the SwiGLU hidden dim, reusing the reference checkpoint's
       column/row split-dim table (llama_vqa.py:42-58).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import MeshConfig

DP_AXIS = "dp"
PP_AXIS = "pp"
SP_AXIS = "sp"
TP_AXIS = "tp"


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    tp = max(1, cfg.tp)
    sp = max(1, cfg.sp)
    pp = max(1, cfg.pp)
    dp = cfg.dp if cfg.dp > 0 else n // (pp * tp * sp)
    if dp * pp * sp * tp > n:
        raise ValueError(f"mesh {dp}x{pp}x{sp}x{tp} > {n} devices")
    # an explicit smaller mesh uses the first dp*pp*sp*tp devices; tp
    # innermost (its collectives are per-matmul — keep them on the fastest
    # ICI links); pp outermost of the model axes (one activation ppermute
    # per stage boundary — the lowest-bandwidth collective here)
    dev_array = np.asarray(devices[:dp * pp * sp * tp]).reshape(dp, pp, sp, tp)
    return Mesh(dev_array, (DP_AXIS, PP_AXIS, SP_AXIS, TP_AXIS))


def loader_shards(mesh: Mesh) -> tuple:
    """(shard_index, shard_count) for the data loader under this mesh.

    The loader shards the dataset along the mesh's dp axis, not the raw
    process index: with the process-major device order of `jax.devices()`
    and the (dp, pp, sp, tp) row-major mesh reshape, `pp·sp·tp` columns
    that span process boundaries (pp·sp·tp > local_device_count) put several
    processes inside ONE dp row-group — those processes must feed IDENTICAL rows or
    the assembled global batch is garbage. When pp·sp·tp fits inside a process
    (the common case, over intra-host ICI), this degrades to the
    DistributedSampler-style per-process slice (reference:
    dataloader/__init__.py:21)."""
    local = max(jax.local_device_count(), 1)
    # devices per dp row = the model axes (pp·sp·tp) — every device in a row
    # consumes the same batch rows
    model_cols = (mesh.shape.get(PP_AXIS, 1) * mesh.shape.get(SP_AXIS, 1)
                  * mesh.shape.get(TP_AXIS, 1))
    if model_cols > local:
        # dp row-groups span processes: the grouping arithmetic below is
        # only correct when whole processes tile each row evenly. An
        # irregular topology would SILENTLY feed different rows to
        # processes that share a row-group — refuse instead.
        if model_cols % local:
            raise ValueError(
                f"pp*sp*tp={model_cols} does not divide evenly into "
                f"processes of {local} local devices; choose pp/sp/tp so "
                f"each dp row-group is a whole number of processes")
    elif model_cols > 1 and local % model_cols:
        raise ValueError(
            f"local_device_count={local} is not a multiple of "
            f"pp*sp*tp={model_cols}; dp rows would straddle process "
            f"boundaries unevenly — choose pp/sp/tp dividing {local}")
    group = max(1, model_cols // local)  # processes sharing one dp row-group
    return (jax.process_index() // group,
            max(1, jax.process_count() // group))


def mesh_is_multi_device() -> bool:
    """True when the ambient (jax.set_mesh) abstract mesh has any axis of
    size > 1 — the regime where a bare pallas_call is a partitioning hazard
    (GSPMD cannot partition a single-device program; its operands would be
    all-gathered to global shape). Trace-time check: model code uses it to
    route Pallas fast paths through shard_map'd wrappers instead."""
    mesh = jax.sharding.get_abstract_mesh()
    return any(mesh.shape[ax] > 1 for ax in mesh.axis_names)


def manual_axes(mesh=None) -> frozenset:
    """Axis names already bound Manual in the abstract mesh — i.e. we are
    tracing inside a shard_map body over them (the pipeline's 'pp' stage
    bodies). Callers use this to avoid re-taking bound axes in nested
    shard_maps and to pick lowering branches at trace time.

    Compare AxisType by ENUM IDENTITY: `str(AxisType.Manual)` is
    'AxisType.Manual' (its repr is 'Manual'), so the earlier
    `str(t) == "Manual"` comparison silently matched nothing and every
    nested-context detection downstream of it was dead code
    (tests/test_sharding.py pins this)."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    try:
        from jax.sharding import AxisType
        return frozenset(ax for ax, t in zip(mesh.axis_names, mesh.axis_types)
                         if t == AxisType.Manual)
    except Exception:  # axis_types API absent — assume top level
        return frozenset()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- parameter sharding rules -------------------------------------------------
# Keyed on parameter path suffixes. Matches Meta's tensor-parallel layout that
# the reference converter merges (llama_vqa.py:42-58): column-parallel weights
# (wq/wk/wv/w1/w3, output) split their *output* features; row-parallel (wo/w2)
# split their *input* features; tok_embeddings splits the embedding dim; norms
# and the small adapter/gate/proj trainables replicate.
#
# Our Flax kernels are stored as (in_features, out_features), i.e. the
# transpose of torch Linear weights, so "split output dim" = PartitionSpec on
# axis 1 here.
_TP_RULES = (
    ("attention/wq/kernel", P(None, TP_AXIS)),
    ("attention/wk/kernel", P(None, TP_AXIS)),
    ("attention/wv/kernel", P(None, TP_AXIS)),
    ("attention/wo/kernel", P(TP_AXIS, None)),
    ("feed_forward/w1/kernel", P(None, TP_AXIS)),
    ("feed_forward/w3/kernel", P(None, TP_AXIS)),
    ("feed_forward/w2/kernel", P(TP_AXIS, None)),
    ("output/kernel", P(None, TP_AXIS)),
    ("tok_embeddings/embedding", P(None, TP_AXIS)),
)


def param_pspec(path: str) -> P:
    # stacked layer stack (model/pipeline.py): leading (n_layers,) axis over
    # the pp stages, composed with the per-layer tp rule shifted one axis
    # deeper (the kernels are (L, in, out) there) — pp×tp layouts like
    # P('pp', None, 'tp') come out of the same split-dim table.
    if "layers_stacked" in path:
        for suffix, spec in _TP_RULES:
            if path.endswith(suffix):
                return P(PP_AXIS, *spec)
        return P(PP_AXIS)
    for suffix, spec in _TP_RULES:
        if path.endswith(suffix):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for a parameter pytree (pp/TP rules +
    replication)."""
    def one(key_path, leaf):
        spec = param_pspec(_path_str(key_path))
        # Drop PER-AXIS entries that don't divide the dim evenly (tiny test
        # configs): a composed spec like P('pp', None, 'tp') keeps its pp
        # stage sharding even when tp doesn't divide the feature dim.
        entries = list(spec)
        for axis, name in enumerate(entries):
            if name is None:
                continue
            size = mesh.shape.get(name, 1)
            if size > 1 and leaf.shape[axis] % size != 0:
                entries[axis] = None
        if all(e is None for e in entries):
            entries = []
        return NamedSharding(mesh, P(*entries))

    return jax.tree_util.tree_map_with_path(one, params)
