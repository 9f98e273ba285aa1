"""Training/evaluation engine: fused jitted train steps (sampling ->
augmentation -> forward/backward -> update in one XLA program), eval loops
with single- and multi-segment (majority-vote) protocols, early stopping and
checkpointing with real resume."""

from audio_few_shot_learning_tpu.train.state import TrainState, create_train_state  # noqa: F401
from audio_few_shot_learning_tpu.train.engine import Trainer  # noqa: F401
from audio_few_shot_learning_tpu.train.evaluate import (  # noqa: F401
    majority_vote_accuracy,
    majority_vote_accuracy_host,
)
from audio_few_shot_learning_tpu.train.early_stopping import EarlyStopping  # noqa: F401
