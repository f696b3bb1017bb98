from .losses import (TEXT_PROMPT_ROWS, TextProjector, kd_loss,
                     l2_normalize, project_text)
from .state import (FROZEN_KEY, TrainState, count_params, make_optimizer,
                    merge_params, split_params,
                    warmup_cosine_epoch_schedule)
from .train_step import (make_embed_step, make_eval_step, make_train_step,
                         multitask_logits, tile_tasks)

__all__ = [
    "TEXT_PROMPT_ROWS", "TextProjector", "kd_loss", "l2_normalize",
    "project_text", "FROZEN_KEY", "TrainState", "count_params",
    "make_optimizer", "merge_params", "split_params",
    "warmup_cosine_epoch_schedule", "make_embed_step", "make_eval_step",
    "make_train_step", "multitask_logits", "tile_tasks",
]
