"""Early stopping on validation accuracy.

Port of reference callbacks/early_stopping.py:15-70: saves on every
improvement (strictly greater than best + delta), warns at 0.8*patience,
stops at patience. Checkpoint IO is delegated to a callback so the trainer
controls the format.
"""

from __future__ import annotations

from typing import Callable, Optional


class Colors:
    GREEN = "\033[92m"
    RED = "\033[91m"
    ENDC = "\033[0m"


class EarlyStopping:
    def __init__(
        self,
        patience: int = 7,
        verbose: bool = False,
        delta: float = 0.0,
        save_fn: Optional[Callable[[], None]] = None,
        trace_func: Callable = print,
    ):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.save_fn = save_fn
        self.trace_func = trace_func
        self.counter = 0
        self.best_score: Optional[float] = None
        self.early_stop = False
        self.val_accuracy_max = -float("inf")

    def __call__(self, val_accuracy: float, epoch: int) -> None:
        score = val_accuracy
        if self.best_score is None:
            self.best_score = score
            self._save(val_accuracy, epoch)
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= int(0.8 * self.patience):
                self.trace_func(
                    f"Epoch: {epoch}. EarlyStopping counter: {self.counter} out of {self.patience}"
                )
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self._save(val_accuracy, epoch)
            self.counter = 0

    def _save(self, val_accuracy: float, epoch: int) -> None:
        if self.verbose:
            if self.val_accuracy_max > 0:
                inc = (val_accuracy - self.val_accuracy_max) / self.val_accuracy_max * 100
            else:
                inc = 0.0
            color = Colors.GREEN if inc > 0 else Colors.RED
            self.trace_func(
                f"Epoch: {epoch}. Validation accuracy increased "
                f"({self.val_accuracy_max:.6f} --> {val_accuracy:.6f}), "
                f"{color}({inc:.2f}%){Colors.ENDC} Saving model ..."
            )
        if self.save_fn is not None:
            self.save_fn()
        self.val_accuracy_max = val_accuracy
