from .convert import (convert_meta_checkpoint, export_reference_style,
                      load_frozen_params, merge_shards, needs_transpose,
                      split_dim_table, torch_name_to_flax_path)
from .manager import CheckpointManager
from .quantize import dequantize_kernel, quantize_frozen, quantize_kernel
from .rotate import Rotation, fwht, rotate_params

__all__ = [
    "convert_meta_checkpoint", "export_reference_style", "load_frozen_params",
    "merge_shards", "needs_transpose", "split_dim_table",
    "torch_name_to_flax_path", "CheckpointManager", "dequantize_kernel",
    "quantize_frozen", "quantize_kernel", "Rotation", "fwht",
    "rotate_params",
]
