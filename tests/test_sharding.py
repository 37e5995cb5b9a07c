"""Mesh + tensor-parallel sharding tests on the 8-virtual-CPU-device mesh
(the TPU-native analog of multi-node tests without a cluster, SURVEY.md §4).

TP rules mirror the reference checkpoint's split-dim table
(reference: llama_vqa.py:42-58)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flipped_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
from flipped_tpu.core.mesh import (DP_AXIS, TP_AXIS, make_mesh, param_pspec,
                                   param_shardings)
from flipped_tpu.data import add_accum_axis, make_synthetic_items, pack_train_batch
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.text import MockTokenizer
from flipped_tpu.train import (make_optimizer, make_train_step,
                               partition_params)


def cpu8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs[:8]


def test_param_pspec_rules():
    # column-parallel → out-features axis (flax kernel axis 1)
    assert param_pspec("layers_0/attention/wq/kernel") == P(None, TP_AXIS)
    assert param_pspec("layers_3/feed_forward/w1/kernel") == P(None, TP_AXIS)
    assert param_pspec("output/kernel") == P(None, TP_AXIS)
    # row-parallel → in-features axis (flax kernel axis 0)
    assert param_pspec("layers_0/attention/wo/kernel") == P(TP_AXIS, None)
    assert param_pspec("layers_9/feed_forward/w2/kernel") == P(TP_AXIS, None)
    # embeddings split their feature dim; everything else replicates
    assert param_pspec("tok_embeddings/embedding") == P(None, TP_AXIS)
    assert param_pspec("norm/weight") == P()
    assert param_pspec("adapter_query") == P()
    assert param_pspec("layers_0/attention/gate1") == P()


def test_mesh_shapes():
    devs = cpu8()
    m = make_mesh(MeshConfig(dp=4, tp=2), devices=devs)
    assert m.shape == {"dp": 4, "pp": 1, "sp": 1, "tp": 2}
    m = make_mesh(MeshConfig(dp=-1, tp=2), devices=devs)
    assert m.shape == {"dp": 4, "pp": 1, "sp": 1, "tp": 2}
    m = make_mesh(MeshConfig(dp=-1, sp=2, tp=2), devices=devs)
    assert m.shape == {"dp": 2, "pp": 1, "sp": 2, "tp": 2}
    m = make_mesh(MeshConfig(dp=-1, pp=2, tp=2), devices=devs)
    assert m.shape == {"dp": 2, "pp": 2, "sp": 1, "tp": 2}
    # explicit smaller mesh → first dp*pp*sp*tp devices
    m = make_mesh(MeshConfig(dp=3, tp=2), devices=devs)
    assert m.shape == {"dp": 3, "pp": 1, "sp": 1, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(dp=5, tp=2), devices=devs)


def test_tp_sharded_train_step_matches_single_device():
    """Identical losses on a dp4×tp2 mesh vs one device — GSPMD collectives
    must not change the math."""
    devs = cpu8()
    cfg = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=128,
                      multiple_of=16, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    model = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32)
    items = make_synthetic_items(tok, 8, max_feats=4, max_seq_len=96,
                                 visual_dim=16, seed=0)
    batch = pack_train_batch(items, 4)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.array(batch["vqa_tokens"][:1]),
                        jnp.array(batch["video"][:1]), None,
                        jnp.array(batch["vqa_video_start"][:1]),
                        jnp.array(batch["vqa_splice"][:1]))["params"]
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(lr=1e-2, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=4, world_batch=8)
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, vaq=True, qav=True)
    b = {k: jnp.array(v) for k, v in add_accum_axis(batch, 2).items()}

    # single (CPU) device baseline
    cpu0 = devs[0]
    with jax.default_device(cpu0):
        t1, o1, m1 = jax.jit(step)(
            jax.device_put(trainable, cpu0), jax.device_put(opt_state, cpu0),
            jax.device_put(frozen, cpu0),
            {k: jax.device_put(v, cpu0) for k, v in b.items()})
        loss_1dev = float(m1.loss)
    # at S<~90 the synthetic prompts overflow and every label is masked —
    # a zero loss would make the equality assertions vacuous
    assert loss_1dev > 1.0, loss_1dev

    # dp4×tp2 mesh
    mesh = make_mesh(MeshConfig(dp=4, tp=2), devices=devs)
    from jax.sharding import NamedSharding
    with mesh:
        ts = param_shardings(mesh, trainable)
        fs = param_shardings(mesh, frozen)
        t_sh = jax.device_put(trainable, ts)
        f_sh = jax.device_put(frozen, fs)
        o_sh = jax.device_put(opt_state, NamedSharding(mesh, P()))
        b_sh = {k: jax.device_put(v, NamedSharding(mesh, P(None, DP_AXIS)))
                for k, v in b.items()}
        t2, o2, m2 = step(t_sh, o_sh, f_sh, b_sh)
        loss_mesh = float(m2.loss)
        # wq really is TP-sharded (dim 32 over tp=2 divides)
        assert fs["layers_0"]["attention"]["wq"]["kernel"].spec == P(None, TP_AXIS)

    np.testing.assert_allclose(loss_mesh, loss_1dev, rtol=2e-5, atol=2e-5)
    # updated trainables agree too
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5), t1, t2)


@pytest.mark.parametrize("preset,adapter_layer,tp", [
    ("llama13B", 40, 4), ("llama13B", 40, 8),
    ("llama33B", 60, 4), ("llama33B", 60, 8),
])
def test_large_preset_tp_shardings(preset, adapter_layer, tp):
    """Scale-readiness of the 13B/33B presets for tensor parallelism: the
    REAL param shape trees (via eval_shape — no 13B materialization on CPU)
    must shard under the split-dim rules at tp=4/8 with no silent
    replication fallback on any TP-ruled kernel (reference TP layout:
    llama_vqa.py:42-58; 13B runs use adapter_layer 40,
    run-nextqa13B-array.sh:30)."""
    from flipped_tpu.core.config import MODEL_PRESETS
    from flipped_tpu.core.mesh import param_pspec, _path_str

    devs = cpu8()
    pre = MODEL_PRESETS[preset]
    cfg = ModelConfig(dim=pre["dim"], n_layers=pre["n_layers"],
                      n_heads=pre["n_heads"], vocab_size=32000,
                      multiple_of=256, max_seq_len=128, adapter_len=10,
                      adapter_layer=adapter_layer, max_feats=10)
    model = FlippedVQAModel(cfg)
    B, S, F = 2, cfg.max_seq_len, cfg.max_feats
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((B, S), jnp.int32), jnp.zeros((B, F, 768), jnp.float32),
        None, jnp.zeros((B,), jnp.int32), jnp.zeros((B, F), jnp.int32))

    mesh = make_mesh(MeshConfig(dp=8 // tp, tp=tp), devices=devs)
    shardings = param_shardings(mesh, shapes["params"])

    n_sharded = 0
    flat = jax.tree_util.tree_flatten_with_path(shapes["params"])[0]
    flat_sh = jax.tree_util.tree_flatten_with_path(shardings)[0]
    for (path, leaf), (_, sh) in zip(flat, flat_sh):
        rule = param_pspec(_path_str(path))
        if any(ax is not None for ax in rule):
            # the rule must have APPLIED — every TP dim divides at tp=4/8
            assert sh.spec == rule, (
                f"{_path_str(path)} {leaf.shape} fell back to replication "
                f"at tp={tp}")
            axis = next(i for i, ax in enumerate(rule) if ax is not None)
            assert leaf.shape[axis] % tp == 0
            n_sharded += 1
        else:
            assert sh.spec == P()
    # all layers' 7 TP-ruled kernels + output head + tok embeddings
    assert n_sharded == cfg.n_layers * 7 + 2


def test_tp8_train_step_matches_single_device():
    """Full tp=8 (dp=1) train step on the virtual mesh matches one device —
    the head-dim collectives at maximum TP width do not change the math."""
    devs = cpu8()
    cfg = ModelConfig(dim=64, n_layers=2, n_heads=8, vocab_size=128,
                      multiple_of=16, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    model = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32)
    items = make_synthetic_items(tok, 4, max_feats=4, max_seq_len=96,
                                 visual_dim=16, seed=1)
    batch = pack_train_batch(items, 4)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.array(batch["vqa_tokens"][:1]),
                        jnp.array(batch["video"][:1]), None,
                        jnp.array(batch["vqa_video_start"][:1]),
                        jnp.array(batch["vqa_splice"][:1]))["params"]
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(lr=1e-2, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=4, world_batch=4)
    opt_state = tx.init(trainable)
    step = make_train_step(model, tx, vaq=True, qav=True)
    b = {k: jnp.array(v) for k, v in add_accum_axis(batch, 1).items()}

    cpu0 = devs[0]
    with jax.default_device(cpu0):
        _, _, m1 = jax.jit(step)(
            jax.device_put(trainable, cpu0), jax.device_put(opt_state, cpu0),
            jax.device_put(frozen, cpu0),
            {k: jax.device_put(v, cpu0) for k, v in b.items()})
        loss_1dev = float(m1.loss)

    from jax.sharding import NamedSharding
    mesh = make_mesh(MeshConfig(dp=1, tp=8), devices=devs)
    with mesh:
        t_sh = jax.device_put(trainable, param_shardings(mesh, trainable))
        f_sh = jax.device_put(frozen, param_shardings(mesh, frozen))
        o_sh = jax.device_put(opt_state, NamedSharding(mesh, P()))
        b_sh = {k: jax.device_put(v, NamedSharding(mesh, P(None, DP_AXIS)))
                for k, v in b.items()}
        _, _, m2 = step(t_sh, o_sh, f_sh, b_sh)
        loss_mesh = float(m2.loss)
    np.testing.assert_allclose(loss_mesh, loss_1dev, rtol=2e-5, atol=2e-5)


def test_indivisible_dims_fall_back_to_replication():
    devs = cpu8()
    mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=devs)
    # vocab 126 not divisible by 4 → replicate instead of error
    params = {"output": {"kernel": jnp.zeros((32, 126))}}
    sh = param_shardings(mesh, params)
    assert sh["output"]["kernel"].spec == P()


def test_loader_shards_mapping(monkeypatch):
    """loader_shards maps processes to dp row-groups: with tp inside a
    process it degrades to per-process slicing; with tp spanning processes
    every process in one dp row-group gets the SAME loader shard."""
    import flipped_tpu.core.mesh as mesh_mod
    from flipped_tpu.core.mesh import loader_shards

    class _FakeMesh:
        def __init__(self, tp):
            self.shape = {DP_AXIS: -1, TP_AXIS: tp}

    def fake(local, proc_idx, proc_cnt):
        monkeypatch.setattr(mesh_mod.jax, "local_device_count", lambda: local)
        monkeypatch.setattr(mesh_mod.jax, "process_index", lambda: proc_idx)
        monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: proc_cnt)

    # tp=1, 4 procs × 1 device: classic DistributedSampler slicing
    fake(1, 2, 4)
    assert loader_shards(_FakeMesh(1)) == (2, 4)
    # tp=2 inside each 4-device process: still per-process
    fake(4, 1, 2)
    assert loader_shards(_FakeMesh(2)) == (1, 2)
    # tp=2 across 2 procs × 1 device: both procs share shard 0 of 1
    fake(1, 0, 2)
    assert loader_shards(_FakeMesh(2)) == (0, 1)
    fake(1, 1, 2)
    assert loader_shards(_FakeMesh(2)) == (0, 1)
    # tp=4 across 4 procs × 2 devices: groups of 2 procs per dp row
    fake(2, 3, 4)
    assert loader_shards(_FakeMesh(4)) == (1, 2)


# --- sequence parallelism (sp axis, core/mesh.py) -----------------------------

def test_sp_sharded_train_step_matches_single_device():
    """Identical losses on a dp2×sp2×tp2 mesh (all three axes live) vs one
    device — the sequence-parallel sharding constraints must not change the
    math, only the layout."""
    from jax.sharding import NamedSharding
    devs = cpu8()
    cfg = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=128,
                      multiple_of=16, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    plain = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32)
    spmod = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            seq_shard=True)
    items = make_synthetic_items(tok, 4, max_feats=4, max_seq_len=96,
                                 visual_dim=16, seed=0)
    batch = pack_train_batch(items, 4)
    params = plain.init(jax.random.PRNGKey(0),
                        jnp.array(batch["vqa_tokens"][:1]),
                        jnp.array(batch["video"][:1]), None,
                        jnp.array(batch["vqa_video_start"][:1]),
                        jnp.array(batch["vqa_splice"][:1]))["params"]
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(lr=1e-2, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=4, world_batch=4)
    opt_state = tx.init(trainable)
    b = {k: jnp.array(v) for k, v in add_accum_axis(batch, 2).items()}

    cpu0 = devs[0]
    with jax.default_device(cpu0):
        step1 = make_train_step(plain, tx, vaq=True, qav=True)
        t1, o1, m1 = jax.jit(step1)(
            jax.device_put(trainable, cpu0), jax.device_put(opt_state, cpu0),
            jax.device_put(frozen, cpu0),
            {k: jax.device_put(v, cpu0) for k, v in b.items()})
        loss_1dev = float(m1.loss)
    assert loss_1dev > 1.0, loss_1dev   # see overflow note above

    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=devs)
    assert mesh.shape == {"dp": 2, "pp": 1, "sp": 2, "tp": 2}
    step = make_train_step(spmod, tx, vaq=True, qav=True)
    with mesh:
        t_sh = jax.device_put(trainable, param_shardings(mesh, trainable))
        f_sh = jax.device_put(frozen, param_shardings(mesh, frozen))
        o_sh = jax.device_put(opt_state, NamedSharding(mesh, P()))
        b_sh = {k: jax.device_put(v, NamedSharding(mesh, P(None, DP_AXIS)))
                for k, v in b.items()}
        t2, o2, m2 = step(t_sh, o_sh, f_sh, b_sh)
        loss_mesh = float(m2.loss)

    np.testing.assert_allclose(loss_mesh, loss_1dev, rtol=2e-5, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5), t1, t2)


def test_sp_cuts_per_device_activation_memory():
    """The reason sp exists: on the SAME mesh, turning the residual-stream
    constraints on must cut XLA's per-device temp footprint (activations
    shard S/sp ways; attention still all-gathers its own K/V)."""
    from jax.sharding import NamedSharding
    devs = cpu8()
    cfg = ModelConfig(dim=128, n_layers=2, n_heads=4, vocab_size=256,
                      multiple_of=64, max_seq_len=512, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    items = make_synthetic_items(tok, 2, max_feats=4, max_seq_len=512,
                                 visual_dim=16, seed=0)
    batch = pack_train_batch(items, 4)
    mesh = make_mesh(MeshConfig(dp=1, sp=4, tp=1), devices=devs[:4])
    tcfg = TrainConfig(lr=1e-2, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=4, world_batch=2)
    b = {k: jnp.array(v) for k, v in add_accum_axis(batch, 1).items()}

    # init once with the plain model (params are structurally identical;
    # the sp model cannot init outside a mesh — its constraints need one)
    plain = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            remat=False)
    params = plain.init(jax.random.PRNGKey(0),
                        jnp.array(batch["vqa_tokens"][:1]),
                        jnp.array(batch["video"][:1]), None,
                        jnp.array(batch["vqa_video_start"][:1]),
                        jnp.array(batch["vqa_splice"][:1]))["params"]

    def temp_bytes(seq_shard):
        model = FlippedVQAModel(cfg, dtype=jnp.float32,
                                frozen_dtype=jnp.float32, remat=False,
                                seq_shard=seq_shard)
        trainable, frozen = partition_params(params)
        opt_state = tx.init(trainable)
        step = make_train_step(model, tx, vaq=True, qav=True)
        with jax.set_mesh(mesh):
            t_sh = jax.device_put(trainable, param_shardings(mesh, trainable))
            f_sh = jax.device_put(frozen, param_shardings(mesh, frozen))
            o_sh = jax.device_put(opt_state, NamedSharding(mesh, P()))
            b_sh = {k: jax.device_put(v,
                                      NamedSharding(mesh, P(None, DP_AXIS)))
                    for k, v in b.items()}
            lowered = jax.jit(step).lower(t_sh, o_sh, f_sh, b_sh)
            ma = lowered.compile().memory_analysis()
        return ma.temp_size_in_bytes

    replicated_t, sharded_t = temp_bytes(False), temp_bytes(True)
    assert sharded_t < 0.7 * replicated_t, (replicated_t, sharded_t)


def test_cli_sp_flag_reaches_mesh_config():
    from flipped_tpu.core.config import get_args_parser, run_config_from_args
    args = get_args_parser().parse_args(
        ["--dp", "2", "--sp", "2", "--tp", "2"])
    run_cfg = run_config_from_args(args)
    assert (run_cfg.mesh.dp, run_cfg.mesh.sp, run_cfg.mesh.tp) == (2, 2, 2)


def test_sp_flash_train_step_matches_einsum_path():
    """Composed sequence-parallel FLASH path: the full train step with
    seq_shard=True + use_flash=True (shard_map'd streaming kernels, Pallas
    interpreter) matches the einsum-path step on the same dp2×sp2×tp2 mesh.
    The kernels run bf16 dots internally, so tolerance is loose-ish."""
    import flipped_tpu.model.pallas.flash_attention as fa
    from jax.sharding import NamedSharding
    devs = cpu8()
    cfg = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=128,
                      multiple_of=16, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    # remat=True matches the trainer default — the shard_map'd kernels must
    # survive jax.checkpoint replaying their forward inside the backward
    einsum_m = FlippedVQAModel(cfg, dtype=jnp.float32,
                               frozen_dtype=jnp.float32, seq_shard=True,
                               remat=True)
    flash_m = FlippedVQAModel(cfg, dtype=jnp.float32,
                              frozen_dtype=jnp.float32, seq_shard=True,
                              use_flash=True, remat=True)
    items = make_synthetic_items(tok, 4, max_feats=4, max_seq_len=96,
                                 visual_dim=16, seed=0)
    batch = pack_train_batch(items, 4)
    params = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32
                             ).init(jax.random.PRNGKey(0),
                                    jnp.array(batch["vqa_tokens"][:1]),
                                    jnp.array(batch["video"][:1]), None,
                                    jnp.array(batch["vqa_video_start"][:1]),
                                    jnp.array(batch["vqa_splice"][:1])
                                    )["params"]
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(lr=1e-2, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=4, world_batch=4)
    opt_state = tx.init(trainable)
    b = {k: jnp.array(v) for k, v in add_accum_axis(batch, 2).items()}
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=devs)

    # host copies: the step donates its inputs, so each run() re-puts
    host = jax.tree_util.tree_map(np.asarray,
                                  (trainable, frozen, opt_state, b))

    def run(model):
        tr_h, fz_h, op_h, b_h = host
        step = make_train_step(model, tx, vaq=True, qav=True)
        with jax.set_mesh(mesh):
            t_sh = jax.device_put(tr_h, param_shardings(mesh, trainable))
            f_sh = jax.device_put(fz_h, param_shardings(mesh, frozen))
            o_sh = jax.device_put(op_h, NamedSharding(mesh, P()))
            b_sh = {k: jax.device_put(v,
                                      NamedSharding(mesh, P(None, DP_AXIS)))
                    for k, v in b_h.items()}
            t2, _, m2 = step(t_sh, o_sh, f_sh, b_sh)
            return float(m2.loss), jax.tree_util.tree_map(np.asarray, t2)

    loss_e, t_e = run(einsum_m)
    assert loss_e > 1.0, loss_e         # see overflow note above
    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        loss_f, t_f = run(flash_m)
    finally:
        fa.INTERPRET = old

    np.testing.assert_allclose(loss_f, loss_e, rtol=5e-3)
    # updated trainables stay close (one AdamW step; bf16 kernel dots)
    flat_e = jax.tree_util.tree_leaves(t_e)
    flat_f = jax.tree_util.tree_leaves(t_f)
    for a, w in zip(flat_f, flat_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=0.1, atol=5e-3)


def test_sp_flash_with_int4_backbone():
    """The long-context capacity composition: sequence-parallel FLASH
    attention over a w4a8 (packed int4 + int8-activation, scan-formulation)
    backbone — finite loss and gradients on the dp2×sp2×tp2 mesh."""
    import flipped_tpu.model.pallas.flash_attention as fa
    from flipped_tpu.ckpt.quantize import randomize_quantized
    from flipped_tpu.core.config import quant_flags
    from jax.sharding import NamedSharding
    devs = cpu8()
    cfg = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=128,
                      multiple_of=16, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    model = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            seq_shard=True, use_flash=True, remat=True,
                            **quant_flags("w4a8"))
    items = make_synthetic_items(tok, 4, max_feats=4, max_seq_len=96,
                                 visual_dim=16, seed=0)
    batch = pack_train_batch(items, 4)
    params = model.clone(seq_shard=False, use_flash=False).init(
        jax.random.PRNGKey(0), jnp.array(batch["vqa_tokens"][:1]),
        jnp.array(batch["video"][:1]), None,
        jnp.array(batch["vqa_video_start"][:1]),
        jnp.array(batch["vqa_splice"][:1]))["params"]
    trainable, frozen = partition_params(params)
    frozen = randomize_quantized(frozen, seed=1)
    tcfg = TrainConfig(lr=1e-2, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=4, world_batch=4)
    opt_state = tx.init(trainable)
    b = {k: jnp.array(v) for k, v in add_accum_axis(batch, 2).items()}
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=devs)

    step = make_train_step(model, tx, vaq=True, qav=True)
    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        with jax.set_mesh(mesh):
            t_sh = jax.device_put(trainable, param_shardings(mesh, trainable))
            f_sh = jax.device_put(frozen, param_shardings(mesh, frozen))
            o_sh = jax.device_put(opt_state, NamedSharding(mesh, P()))
            b_sh = {k: jax.device_put(v,
                                      NamedSharding(mesh, P(None, DP_AXIS)))
                    for k, v in b.items()}
            _, _, m2 = step(t_sh, o_sh, f_sh, b_sh)
            loss = float(m2.loss)
            gnorm = float(m2.grad_norm)
    finally:
        fa.INTERPRET = old
    assert np.isfinite(loss) and np.isfinite(gnorm) and gnorm > 0


def test_dp_flash_dispatch_matches_einsum_path():
    """Multi-chip WITHOUT sequence parallelism: under a dp2×tp2 mesh (sp=1)
    a use_flash model routes attention through the shard_map'd streaming
    wrappers (Attention._attend_fn — a bare pallas_call cannot live inside
    a GSPMD-partitioned jit) and the full train step matches the einsum
    path on the same mesh."""
    import flipped_tpu.model.pallas.flash_attention as fa
    from jax.sharding import NamedSharding
    devs = cpu8()
    cfg = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=128,
                      multiple_of=16, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    einsum_m = FlippedVQAModel(cfg, dtype=jnp.float32,
                               frozen_dtype=jnp.float32, remat=True)
    flash_m = FlippedVQAModel(cfg, dtype=jnp.float32,
                              frozen_dtype=jnp.float32, use_flash=True,
                              remat=True)
    items = make_synthetic_items(tok, 4, max_feats=4, max_seq_len=96,
                                 visual_dim=16, seed=0)
    batch = pack_train_batch(items, 4)
    params = einsum_m.init(jax.random.PRNGKey(0),
                           jnp.array(batch["vqa_tokens"][:1]),
                           jnp.array(batch["video"][:1]), None,
                           jnp.array(batch["vqa_video_start"][:1]),
                           jnp.array(batch["vqa_splice"][:1]))["params"]
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(lr=1e-2, vaq=True, qav=True)
    tx = make_optimizer(tcfg, steps_per_epoch=4, world_batch=4)
    opt_state = tx.init(trainable)
    b = {k: jnp.array(v) for k, v in add_accum_axis(batch, 2).items()}
    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=devs[:4])

    host = jax.tree_util.tree_map(np.asarray,
                                  (trainable, frozen, opt_state, b))

    def run(model):
        tr_h, fz_h, op_h, b_h = host
        step = make_train_step(model, tx, vaq=True, qav=True)
        with jax.set_mesh(mesh):
            t_sh = jax.device_put(tr_h, param_shardings(mesh, trainable))
            f_sh = jax.device_put(fz_h, param_shardings(mesh, frozen))
            o_sh = jax.device_put(op_h, NamedSharding(mesh, P()))
            b_sh = {k: jax.device_put(v,
                                      NamedSharding(mesh, P(None, DP_AXIS)))
                    for k, v in b_h.items()}
            t2, _, m2 = step(t_sh, o_sh, f_sh, b_sh)
            return float(m2.loss), jax.tree_util.tree_map(np.asarray, t2)

    loss_e, t_e = run(einsum_m)
    assert loss_e > 1.0, loss_e
    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        loss_f, t_f = run(flash_m)
    finally:
        fa.INTERPRET = old

    np.testing.assert_allclose(loss_f, loss_e, rtol=5e-3)
    flat_e = jax.tree_util.tree_leaves(t_e)
    flat_f = jax.tree_util.tree_leaves(t_f)
    for a, w in zip(flat_f, flat_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=0.1, atol=5e-3)


def test_manual_axes_detects_shard_map_context():
    """core/mesh.manual_axes must see axes bound Manual inside a shard_map
    body — every nested-context dispatch (pallas_mesh_dispatch, the sp
    flash wrappers, the weight-only dequant taint) keys off it. Regression
    for a silent dead-code bug: str(AxisType.Manual) == 'AxisType.Manual'
    (repr is 'Manual'), so a str(t) == 'Manual' comparison matched nothing
    and every nested detection downstream was inert."""
    from flipped_tpu.core.mesh import manual_axes
    devs = cpu8()
    mesh = make_mesh(MeshConfig(dp=2, pp=2), devices=devs[:4])
    seen = {}

    def f(x):
        seen["inside"] = manual_axes()
        return x * 2

    with jax.set_mesh(mesh):
        seen["outside"] = manual_axes()
        # partial-auto shard_map can't run eagerly (CLAUDE.md) — jit it
        out = jax.jit(jax.shard_map(f, in_specs=P("pp"), out_specs=P("pp"),
                                    axis_names={"pp"}, check_vma=False))(
            jnp.ones((4,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(out), 2.0)
    assert seen["outside"] == frozenset()
    assert seen["inside"] == frozenset({"pp"})
