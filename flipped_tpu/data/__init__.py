from .batching import (Item, add_accum_axis, make_synthetic_items,
                       pack_eval_batch, pack_train_batch)

__all__ = ["Item", "add_accum_axis", "make_synthetic_items",
           "pack_eval_batch", "pack_train_batch"]
