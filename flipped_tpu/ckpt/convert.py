"""Offline converter: Meta LLaMA consolidated.*.pth → safetensors for JAX.

Replaces the reference's in-process checkpoint ingestion (reference:
llama_vqa.py:6-68): instead of torch.load-ing shards inside every training
process, conversion happens once offline (torch required only here), writing
one bf16 safetensors file the JAX loader memory-maps.

The tensor-parallel shard merge reproduces the reference's split-dim table
(llama_vqa.py:32-58): column-parallel weights (wq/wk/wv/w1/w3, output)
concatenate on dim 0, row-parallel (wo/w2) and tok_embeddings on dim 1, norms
broadcast. Torch Linear weights are (out, in); Flax kernels are (in, out), so
every matmul weight transposes on the way through.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List

import numpy as np

# Names relative to a layer prefix; value = concat dim for TP shard merge
# (reference: llama_vqa.py:50-58), -1 = broadcast.
_LAYER_SPLIT_DIMS = {
    "attention_norm.weight": -1,
    "ffn_norm.weight": -1,
    "attention.wq.weight": 0,
    "attention.wk.weight": 0,
    "attention.wv.weight": 0,
    "feed_forward.w1.weight": 0,
    "feed_forward.w3.weight": 0,
    "attention.wo.weight": 1,
    "feed_forward.w2.weight": 1,
}
_TOP_SPLIT_DIMS = {
    "tok_embeddings.weight": 1,
    "norm.weight": -1,
    "output.weight": 0,
}

# torch Linear (out,in) → flax kernel (in,out)
_TRANSPOSE_SUFFIXES = (".wq.weight", ".wk.weight", ".wv.weight", ".wo.weight",
                       ".w1.weight", ".w2.weight", ".w3.weight")


def split_dim_table(n_layers: int) -> Dict[str, int]:
    table = dict(_TOP_SPLIT_DIMS)
    for i in range(n_layers):
        for k, d in _LAYER_SPLIT_DIMS.items():
            table[f"layers.{i}.{k}"] = d
    return table


def merge_shards(shards: List[dict], n_layers: int) -> dict:
    """Concatenate Meta's tensor-parallel shards into one replica
    (reference: llama_vqa.py:25-58)."""
    if len(shards) == 1:
        return shards[0]
    import torch

    table = split_dim_table(n_layers)
    merged = {}
    for name, dim in table.items():
        if name not in shards[0]:
            continue
        if dim < 0:
            merged[name] = shards[0][name].clone()
        else:
            merged[name] = torch.cat([s[name] for s in shards], dim=dim)
        for s in shards:
            del s[name]
    return merged


def torch_name_to_flax_path(name: str) -> str:
    """'layers.3.attention.wq.weight' → 'layers_3/attention/wq/kernel'."""
    parts = name.split(".")
    if parts[0] == "layers":
        parts = [f"layers_{parts[1]}"] + parts[2:]
    if name == "tok_embeddings.weight":
        return "tok_embeddings/embedding"
    if parts[-1] == "weight":
        leaf = "kernel" if (name == "output.weight"
                            or name.endswith(_TRANSPOSE_SUFFIXES)) else "weight"
        parts[-1] = leaf
    return "/".join(parts)


def needs_transpose(name: str) -> bool:
    return name == "output.weight" or name.endswith(_TRANSPOSE_SUFFIXES)


def convert_meta_checkpoint(model_dir: str, out_path: str) -> dict:
    """Convert {model_dir}/consolidated.*.pth (+ params.json) to a bf16
    safetensors file with flax-path keys. Returns params.json contents."""
    import torch
    from safetensors.torch import save_file

    model_dir = Path(model_dir)
    with open(model_dir / "params.json") as f:
        params = json.load(f)

    ckpts = sorted(model_dir.glob("consolidated.*.pth"))
    if not ckpts:
        raise FileNotFoundError(f"no consolidated.*.pth under {model_dir}")
    shards = [torch.load(p, map_location="cpu", weights_only=True)
              for p in ckpts]
    state = merge_shards(shards, params["n_layers"])

    out = {}
    for name, tensor in state.items():
        if "rope.freqs" in name:  # precomputed on the fly in our model
            continue
        t = tensor.t() if needs_transpose(name) else tensor
        out[torch_name_to_flax_path(name)] = t.to(torch.bfloat16).contiguous()
    save_file(out, out_path, metadata={"params": json.dumps(params)})
    return params


def load_frozen_params(path: str) -> dict:
    """Load a converted safetensors file into a nested flax param dict of
    jnp bf16 arrays (no torch needed)."""
    from safetensors import safe_open
    import jax.numpy as jnp

    tree: dict = {}
    with safe_open(path, framework="flax") as f:
        for key in f.keys():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = f.get_tensor(key)
    return tree


def export_reference_style(params: dict, n_shards: int, out_dir: str,
                           model_params: dict):
    """Inverse converter (test/roundtrip aid): write flax params back as
    Meta-style consolidated.*.pth shards split along the reference dims."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = v

    walk(params, "")
    table = split_dim_table(model_params["n_layers"])

    torch_state = {}
    for path, arr in flat.items():
        parts = path.split("/")
        if parts[0].startswith("layers_"):
            name = "layers." + parts[0].split("_", 1)[1] + "." + ".".join(parts[1:])
        else:
            name = ".".join(parts)
        name = name.replace("/", ".")
        name = name.replace(".kernel", ".weight").replace(".embedding", ".weight")
        if name not in table:
            continue  # trainables are not part of Meta checkpoints
        t = torch.tensor(np.asarray(arr, dtype=np.float32))
        if needs_transpose(name):
            t = t.t().contiguous()
        torch_state[name] = t

    shards = [dict() for _ in range(n_shards)]
    for name, t in torch_state.items():
        dim = table[name]
        if dim < 0 or n_shards == 1:
            for s in shards:
                s[name] = t.clone()
        else:
            for s, chunk in zip(shards, torch.chunk(t, n_shards, dim=dim)):
                s[name] = chunk.contiguous()
    for i, s in enumerate(shards):
        torch.save(s, os.path.join(out_dir, f"consolidated.{i:02d}.pth"))
    with open(os.path.join(out_dir, "params.json"), "w") as f:
        json.dump(model_params, f)
