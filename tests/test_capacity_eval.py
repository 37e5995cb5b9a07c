"""Eval-path capacity at the long-context config the streaming kernels
were built for.

The train side has AOT capacity evidence (tests/test_int4.py,
tests/test_pipeline.py::test_pp_33b_step_compiles_within_stage_hbm); this
file bounds the EVAL half of the runtime story (reference:
engine.py:59-145) where a CPU AOT compile is an honest upper bound: the
7B S=4096 cached scorer. The other capacity configs (13B w4a8 batch 8
eval AND generation; S=4096 generation) are evidenced by MEASURED v5e
rows in docs/PERF.md instead — their CPU lowerings route the grouped
quant matmuls and KV-decode through XLA-fallback / interpreter-shaped
programs whose temp footprint overstates the TPU production graph by
3-8× (e.g. 13B w4a8 eval: 20.9 GiB of CPU-compile temps vs a measured
0.347 s/batch run inside a 16 GB chip), so asserting a 16 GB budget on
them would fail on artifacts the chip never allocates.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flipped_tpu.core.config import MODEL_PRESETS, ModelConfig, quant_flags
from flipped_tpu.data import make_synthetic_items, pack_eval_batch
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.text import MockTokenizer
from flipped_tpu.train import make_eval_step, partition_params


@pytest.fixture
def interpret_pallas(monkeypatch):
    """Lower the Pallas kernels under the interpreter so the CPU AOT
    analysis models the TPU production graph (block-streaming attention)
    instead of the dense O(S²) XLA attention fallback."""
    from flipped_tpu.model.pallas import flash_attention as fa
    from flipped_tpu.model.pallas import quant_matmul as qm
    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(qm, "INTERPRET", True)


def test_s4k_cached_eval_compiles_within_hbm(interpret_pallas):
    """The prefix-shared cached scorer at 7B S=4096 w8a8 batch 2 must fit
    a 16 GB chip — compiled (AOT memory analysis), not shape-tree math.
    Fails if the long-context eval working set regresses past the chip."""
    pre = MODEL_PRESETS["llama7B"]
    cfg = ModelConfig(dim=pre["dim"], n_layers=pre["n_layers"],
                      n_heads=pre["n_heads"], vocab_size=32000,
                      multiple_of=256, max_seq_len=4096, adapter_len=10,
                      adapter_layer=pre["n_layers"], max_feats=10)
    B = 2
    model = FlippedVQAModel(cfg, use_flash=True, **quant_flags("w8a8"))
    tok = MockTokenizer(cfg.vocab_size)
    items = make_synthetic_items(tok, B, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len, split="val",
                                 visual_dim=cfg.visual_dim, seed=0)
    batch = pack_eval_batch(items, cfg.max_feats)
    span = -(-int(batch["span_need"]) // 8) * 8
    b_abs = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                     np.asarray(v).dtype)
             for k, v in batch.items()
             if isinstance(v, np.ndarray)
             and k not in ("answer", "qtype", "qid",
                           "span_need", "span_exact")}
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((B, cfg.max_seq_len), jnp.int32),
        jnp.zeros((B, cfg.max_feats, cfg.visual_dim), jnp.float32),
        None, jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, cfg.max_feats), jnp.int32))["params"]
    trainable, frozen = partition_params(shapes)
    step = make_eval_step(model, cached=True, span_len=span)
    fn = jax.jit(lambda t, f, b: step(t, f, b))
    ma = fn.lower(trainable, frozen, b_abs).compile().memory_analysis()
    used = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    hbm = 16 * 1024**3
    assert used < 0.80 * hbm, (
        f"7B S=4096 cached-eval working set {used / 1024**3:.2f} GiB "
        f"exceeds budget: args={ma.argument_size_in_bytes / 1024**3:.2f} "
        f"temps={ma.temp_size_in_bytes / 1024**3:.2f} "
        f"out={ma.output_size_in_bytes / 1024**3:.2f}")
