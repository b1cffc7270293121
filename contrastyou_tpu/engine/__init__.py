from .bundle import ModelBundle
from .checkpoint import (extract_model_params, load_checkpoint, save_checkpoint,
                         restore_train_state)
from .hooks import StepContext, TrainerHook, check_hook_names, combined_taps
from .optim import create_optimizer, warmup_cosine_schedule
from .state import TrainState
from .steps import build_eval_step, build_train_step, init_train_state
from .trainer import Trainer

__all__ = ["ModelBundle", "extract_model_params", "load_checkpoint",
           "save_checkpoint", "restore_train_state", "StepContext", "TrainerHook",
           "check_hook_names", "combined_taps", "create_optimizer",
           "warmup_cosine_schedule", "TrainState", "build_eval_step",
           "build_train_step", "init_train_state", "Trainer"]
