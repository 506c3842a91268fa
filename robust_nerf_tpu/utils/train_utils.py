"""Small training utilities — running averages and early stopping.

Parity with the reference's utils (noisy_src/utils.py:195-252). The
reference defines these but never wires them into its loops; here
EarlyStopping backs the training loop's opt-in --early_stop_patience
flag (training/train.py) and AverageMeter remains available to user
training scripts.
"""

from __future__ import annotations


class AverageMeter:
    """Running average of a scalar metric
    (reference: noisy_src/utils.py:195-215)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class EarlyStopping:
    """Stop when a monitored metric hasn't improved for `patience` checks
    (reference: noisy_src/utils.py:218-252)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0,
                 mode: str = "max"):
        assert mode in ("max", "min")
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best = None
        self.counter = 0
        self.should_stop = False

    def step(self, value: float) -> bool:
        """Record a new metric value; returns True if training should stop."""
        improved = (
            self.best is None
            or (self.mode == "max" and value > self.best + self.min_delta)
            or (self.mode == "min" and value < self.best - self.min_delta)
        )
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop
