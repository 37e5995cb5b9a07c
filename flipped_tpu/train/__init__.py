from .objectives import (Losses, ce_ignore_index, compute_objective_losses,
                         fused_forward, lm_ce_rowwise_chunked, option_scores,
                         option_scores_cached, token_ce_unreduced)
from .optim import (TRAINABLE_MARKERS, cast_partitions, is_trainable,
                    lr_schedule, make_optimizer, merge_params,
                    partition_params)
from .step import (TrainMetrics, make_eval_step, make_train_step,
                   required_eval_span)

__all__ = [
    "Losses", "ce_ignore_index", "compute_objective_losses", "fused_forward",
    "lm_ce_rowwise_chunked", "option_scores", "option_scores_cached",
    "token_ce_unreduced",
    "TRAINABLE_MARKERS",
    "cast_partitions", "is_trainable", "lr_schedule", "make_optimizer",
    "merge_params", "partition_params", "TrainMetrics", "make_eval_step",
    "make_train_step", "required_eval_span",
]
