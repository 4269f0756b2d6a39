"""Training runtime: optimizer/schedules, checkpointing, metrics, train loop."""

from multilingual_text_to_speech_tpu.training.schedule import (
    cos_decay,
    step_decay_schedule,
    teacher_forcing_ratio,
)
from multilingual_text_to_speech_tpu.training.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from multilingual_text_to_speech_tpu.training.trainer import TrainState, Trainer

__all__ = [
    "cos_decay", "step_decay_schedule", "teacher_forcing_ratio",
    "save_checkpoint", "load_checkpoint",
    "TrainState", "Trainer",
]
